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
}
