package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB tier: bucketed co-located
  * joins and salted skew joins (SURVEY §4 — the reference's manual hash
  * partitioning by key, done the Spark way).
  */
object Partitioning {

  /** Persist a table bucketed by a join key. Two tables bucketed the same
    * way join WITHOUT a shuffle — at 100 TB this converts the recurring
    * fact⋈fact shuffle into local merges. Requires saveAsTable (bucket
    * metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted join for skewed keys: explode the small/build side `salt`
    * ways, scatter the skewed probe side uniformly, join on (key, salt).
    * AQE's skew-join handles moderate skew automatically; salting is for
    * pathological single-key hotspots.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedProbe = skewed.withColumn("__salt",
      (abs(xxhash64(monotonically_increasing_id())) % salt).cast("int"))
    val saltedBuild = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedProbe.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe two-stage aggregation for low-cardinality / hot grouping
    * keys. A plain `groupBy(key)` over a 15-value key yields at most 15
    * final-stage groups — fine for algebraic aggregates (partial
    * aggregation already fans the work out), but `count(DISTINCT v)`,
    * collects, and any holistic aggregate funnel every row of a hot key
    * through one task. Salting by a hash of the DISTINCT column spreads
    * stage 1 over `key × salt` groups while keeping the decomposition
    * exact: each distinct `v` lands in exactly one salt bucket, so
    * per-bucket distinct counts sum to the true distinct count.
    *
    * `partial` aggregates run per (key, salt); `merge` aggregates combine
    * the per-bucket partials per key (refer to partial aliases by name).
    */
  def saltedTwoStage(df: DataFrame, keys: Seq[String], saltOf: Column, salt: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", pmod(xxhash64(saltOf), lit(salt.toLong)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Exact distinct count per hot key, salted on the distinct column. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], distinctCol: String,
      salt: Int, alias: String): DataFrame =
    saltedTwoStage(df, keys, col(distinctCol), salt)(
      Seq(countDistinct(col(distinctCol)).as("__pd")),
      Seq(sum(col("__pd")).as(alias)))
}
