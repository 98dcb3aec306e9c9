package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of join (DuckDB/kdb `ASOF LEFT JOIN` semantics): each
  * left row picks up the right row with the greatest `rightTime <=
  * leftTime` for the same key, inclusive on equality.
  *
  * Spark has no native as-of join; the naive formulation — a range
  * join + per-left-row argmax — explodes into |L|·|R| per key. Both
  * forms here avoid any row expansion:
  *
  *   - [[asof]]: tag + union both sides, one window per key sorted by
  *     (time, side) carrying the last right payload forward. ONE
  *     shuffle+sort of |L|+|R| total.
  *   - [[asofBucketed]]: the 100 TB path for hot keys. `asof` sorts each
  *     key's full history in one task; with a 15-value key that is 15
  *     tasks for 100 TB. Bucketing the timeline caps a task at one
  *     (key, bucket) slice: per-bucket carry-ins are derived from a tiny
  *     key×bucket relation, then the window runs within (key, bucket).
  *
  * Requirement (both forms): `right` is unique per (keys, rightTime) —
  * equal-time right duplicates would make the match order-dependent.
  * Pre-aggregate the right side to enforce it.
  */
object AsofJoin {

  private def payloadOf(right: DataFrame, keys: Seq[String]): Seq[String] =
    right.columns.filterNot(keys.contains).toSeq

  /** Simple form: one window per key over the tagged union. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: Column, rightTime: Column): DataFrame = {
    val payload = payloadOf(right, keys)
    val rpType = StructType(payload.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++ Seq(
        leftTime.as("__t"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rpType).as("__rp")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        rightTime.as("__t"), lit(0).as("__side"),
        lit(null).cast(StructType(left.schema.fields)).as("__l"),
        struct(payload.map(col): _*).as("__rp")): _*)
    // right (side 0) sorts before left (side 1) at equal time → inclusive <=
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payload.map(c => col(s"__rp.$c").as(c)): _*)
  }

  /** Scale form: `bucket` maps a time to a coarse bucket id (e.g. week).
    * Carry-ins — the key's latest right row from any STRICTLY earlier
    * bucket — are computed over one row per (key, bucket), then each
    * (key, bucket) windows independently.
    */
  def asofBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: Column, rightTime: Column,
                   bucket: Column => Column): DataFrame = {
    val payload = payloadOf(right, keys)
    val rpType = StructType(payload.map(c => right.schema(c)))
    val keyCols = keys.map(col)

    val lb = left.withColumn("__t", leftTime).withColumn("__b", bucket(col("__t")))
    val tType = lb.schema("__t").dataType
    val rb = right.withColumn("__t", rightTime).withColumn("__b", bucket(col("__t")))
      .withColumn("__rp", struct(payload.map(col): _*))

    // Latest right row per (key, bucket) — one row per key×bucket.
    val perBucket = Window.partitionBy((keys :+ "__b").map(col): _*).orderBy(col("__t").desc)
    val latest = rb
      .withColumn("__rn", row_number().over(perBucket)).filter(col("__rn") === 1)
      .select(keyCols ++ Seq(col("__b"), col("__rp")): _*)

    // Carry-in per left bucket: markers (side 0) sort BEFORE same-bucket
    // right rows (side 1), so the running last sees only earlier buckets.
    val markers = lb.select(keyCols :+ col("__b"): _*).distinct()
      .withColumn("__mside", lit(0)).withColumn("__rp", lit(null).cast(rpType))
    val wc = Window.partitionBy(keyCols: _*)
      .orderBy(col("__b").asc, col("__mside").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = markers.unionByName(latest.withColumn("__mside", lit(1)))
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(wc))
      .filter(col("__mside") === 0 && col("__rp").isNotNull)
      .select(keyCols ++ Seq(col("__b"), col("__rp")): _*)

    // Local union per (key, bucket): carry-in (pre 0) < any timed row.
    val lRows = lb.select(
      keyCols ++ Seq(col("__b"), lit(1).as("__pre"), col("__t"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rpType).as("__rp")): _*)
    val rRows = rb.select(
      keyCols ++ Seq(col("__b"), lit(1).as("__pre"), col("__t"), lit(0).as("__side"),
        lit(null).cast(StructType(left.schema.fields)).as("__l"), col("__rp")): _*)
    val cRows = carry.select(
      keyCols ++ Seq(col("__b"), lit(0).as("__pre"), lit(null).cast(tType).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(StructType(left.schema.fields)).as("__l"), col("__rp")): _*)
    val wl = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__pre").asc, col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lRows.unionByName(rRows).unionByName(cRows)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(wl))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payload.map(c => col(s"__rp.$c").as(c)): _*)
  }
}
