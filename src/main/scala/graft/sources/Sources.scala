package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch source operators (SURVEY §2.1).
  *
  * The reference's connector I/O (Marketo REST lifecycle, WebSocket/REST
  * pollers, Kafka clients — S1/S3/S4/S5/S6/S7 transport halves) is
  * process plumbing outside a zero-egress query engine; what lands here
  * is their data-plane semantics: CSV parsing with explicit schema, and
  * incremental checkpoint scans.
  */
object Sources {

  /** S1 data-plane: header CSV with explicit schema + permissive mode and
    * a corrupt-record column (the Pydantic-reject analog: bad rows land
    * in the dead-letter column instead of killing the batch).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** S2: incremental scan — rows strictly after the checkpoint, plus the
    * next checkpoint value (max watermark in the batch, or the old one if
    * the batch is empty — the reference's monotonic advance,
    * marketo_extractor.py:54-83,303-330).
    */
  def incrementalScan(df: DataFrame, watermarkCol: String, lastCheckpoint: Long): (DataFrame, Long) = {
    val batch = df.filter(col(watermarkCol) > lit(lastCheckpoint))
    val next = batch.agg(max(col(watermarkCol))).head().get(0) match {
      case null => lastCheckpoint
      case v: Long => math.max(v, lastCheckpoint)
      case v: Number => math.max(v.longValue(), lastCheckpoint)
    }
    (batch, next)
  }
}
