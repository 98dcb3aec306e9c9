package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S12 parquet archive sink [spec-only worker in the reference]
  * (config/config.yaml:160-174, docs/architecture.md:196-199): events
  * partitioned `dt=YYYY-MM-DD/topic=…`, snappy. Dynamic partition
  * pruning then makes day/topic-scoped reads scan only their slices —
  * the 100 TB layout the reference's archive worker describes.
  */
object Archive {

  /** Topic routing (S13): event_type → kafka-style topic name
    * (snowflake_loader.py:190-197).
    */
  def topicFor(eventType: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(eventType.isin("view", "click"), "frontend.user.interaction")
      .when(eventType.isin("signup", "purchase"), "text.agent.turn.completed")
      .otherwise("agent.tool.invoked")

  /** Write the archive layout. */
  def writeArchive(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("topic", topicFor(col("event_type")))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .partitionBy("dt", "topic")
      .parquet(outDir)

  /** Day/topic-scoped read — partition filters prune at planning time. */
  def readDay(spark: SparkSession, dir: String, day: String, topic: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("dt") === day && col("topic") === topic)

  /** Append a new day's slice WITHOUT rewriting existing partitions —
    * the archive worker's incremental mode. Schema may have evolved
    * since earlier days were written (new producer fields); parquet
    * keeps each file's own schema, so appends never rewrite history.
    */
  def appendDay(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("topic", topicFor(col("event_type")))
      .write.mode("append")
      .option("compression", "snappy")
      .partitionBy("dt", "topic")
      .parquet(outDir)

  /** Schema-evolution read (config/config.yaml:214-220 archive worker
    * spec: "schema evolution"): `mergeSchema` unions every file's
    * footer schema, so days written before a column existed surface it
    * as NULL and new-schema days keep their values. mergeSchema pays a
    * footer read per file at planning time — that is why it is a
    * dedicated entry point and not the default `readDay` path (at 100 TB
    * pin the merged schema in a catalog after one discovery pass).
    */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Pruned read over an evolved archive: merged schema + partition
    * filters still prune to the day/topic slice.
    */
  def readDayEvolved(spark: SparkSession, dir: String, day: String, topic: String): DataFrame =
    readEvolved(spark, dir)
      .filter(col("dt") === day && col("topic") === topic)

  /** Compact one day's partitions — the small-files maintenance pass a
    * micro-batched archive needs: each streaming batch appends a file
    * per partition per trigger, and a year of 1-minute triggers is half
    * a million footers per day-scan. Rewrites ONLY the target day
    * (dynamic partition overwrite — other days' files are never
    * touched), coalescing to `filesPerPartition` files per (dt, topic).
    * Returns the compacted day's row count for the caller's
    * before/after invariant check.
    */
  def compactDay(spark: SparkSession, dir: String, day: String,
      filesPerPartition: Int = 1): Long = {
    // localCheckpoint breaks the plan's file-source lineage: Spark
    // (rightly) refuses to overwrite a path it is concurrently reading;
    // the checkpoint materializes the slice first (at 100 TB this is a
    // per-day slice, not the archive)
    val compacted = spark.read.parquet(dir).filter(col("dt") === day)
      .repartition(filesPerPartition, col("topic"))
      .localCheckpoint()
    val n = compacted.count()
    compacted.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy("dt", "topic")
      .parquet(dir)
    n
  }
}
