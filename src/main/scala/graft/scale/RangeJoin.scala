package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed bounded-range join: pair each left row with the right rows
  * of the same key whose time falls in `[leftTime - window, leftTime)`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin — O(|L|·|R|)
  * per key and a driver OOM once neither side broadcasts. Bucketing both
  * sides by `window`-wide time buckets turns it into an equi-join: a match
  * at distance < window can only sit in the left row's own bucket or the
  * one before it, so the left side fans out exactly 2× and everything else
  * is a plain shuffled hash join on (key, bucket) — AQE-skew-splittable,
  * no row explosion beyond the true result.
  *
  * Returns INNER pairs (every left column plus `right`'s non-key columns).
  * Left-outer aggregates are recovered by re-joining the grouped result
  * onto the left side — exploding candidates first would duplicate
  * unmatched left rows under a direct outer join.
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: Column, rightTime: Column, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    // exact for any µs timestamp in double (|values| < 2^53)
    def bucketOf(t: Column): Column =
      floor(unix_micros(t) / lit(windowMicros.toDouble)).cast("long")
    val payload = right.columns.filterNot(keys.contains).toSeq
    val l = left
      .withColumn("__lt", leftTime)
      .withColumn("__b", explode(array(bucketOf(col("__lt")) - 1, bucketOf(col("__lt")))))
    val r = right
      .withColumn("__rt", rightTime)
      .withColumn("__b", bucketOf(col("__rt")))
      .select((keys :+ "__b").map(col) ++ Seq(col("__rt")) ++ payload.map(col): _*)
    l.join(r, keys :+ "__b")
      .filter(unix_micros(col("__rt")) >= unix_micros(col("__lt")) - lit(windowMicros) &&
        col("__rt") < col("__lt"))
      .drop("__b", "__lt", "__rt")
  }
}
