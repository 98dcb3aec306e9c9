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
}
