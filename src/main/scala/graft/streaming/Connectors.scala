package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}
import org.apache.spark.sql.types._

/** Production connector shells for the transports the reference uses:
  * Kafka source/sink (S6/S7, config/config.yaml:24-90) and JDBC upsert /
  * warehouse DDL (S8/S10, enhanced_kpi_consumer.py:395-536,
  * snowflake_loader.py:55-136).
  *
  * This environment is zero-egress and ships no Kafka connector jar, so
  * these builders are compile/plan-checked: everything up to (but not
  * including) `.load()`/`.start()` is constructed and tested, the
  * envelope decode and SQL generation are fully executable, and nothing
  * here opens a connection until a caller starts the returned
  * reader/writer against a reachable endpoint.
  */
object Connectors {

  // ---- S7: Kafka source ----

  /** Configured Kafka micro-batch reader: 3-topic subscribe, bounded
    * per-trigger batch (the consumer's poll ≤100/batch pacing,
    * enhanced_kpi_consumer.py:86-101,320-342). Caller runs `.load()`.
    */
  def kafkaReader(spark: SparkSession, bootstrap: String, topics: Seq[String],
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Long = 10000L): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .option("failOnDataLoss", "false")

  /** The fixed schema Kafka's `.load()` returns — used by tests to drive
    * decodeEnvelope with a static frame in place of a live topic.
    */
  val KafkaWireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The reference's JSON event envelope (base_transformer.py:109-124)
    * with a caller-supplied payload schema for `data`.
    */
  def envelopeSchema(dataSchema: DataType): StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("source", StringType),
    StructField("ts_ms", LongType),
    StructField("data", dataSchema),
    StructField("metadata", MapType(StringType, StringType))))

  /** Decode Kafka wire records into flattened envelopes — the from_json
    * half of S7, identical for live topics and test frames.
    */
  def decodeEnvelope(wire: DataFrame, dataSchema: DataType): DataFrame =
    wire.select(
      col("topic"),
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), envelopeSchema(dataSchema)).as("env"))
      .select(col("topic"), col("key"), col("env.*"))

  // ---- S6: Kafka sink ----

  /** JSON-serialize rows into the envelope wire format keyed by entity id,
    * with the producer tuning the reference pins: idempotence + snappy
    * (marketo_extractor.py:253-266, config.yaml:70-80). Caller runs
    * `.start()`.
    */
  def kafkaWriter(df: DataFrame, bootstrap: String, topic: String,
      keyCol: Column, checkpointDir: String): DataStreamWriter[Row] =
    df.select(keyCol.cast("string").as("key"),
        to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("kafka.enable.idempotence", "true")
      .option("kafka.compression.type", "snappy")
      .option("kafka.acks", "all")
      .option("checkpointLocation", checkpointDir)

  // ---- S8: JDBC upsert sink ----

  /** The exact INSERT … ON CONFLICT DO UPDATE statement shape the
    * consumer generates (enhanced_kpi_consumer.py:403-434) — pure and
    * unit-testable.
    */
  def upsertSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
    val updates = cols.filterNot(keys.contains)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keys.mkString(", ")}) DO UPDATE SET $updates"
  }

  /** foreachBatch JDBC upsert: per micro-batch, each partition opens one
    * connection and executes the ON CONFLICT statement as a JDBC batch —
    * the streaming form of D1/D2 against a mutable store. Caller runs
    * `.start()`; partition count bounds connection fan-out (the
    * reference's 5–20 pool, enhanced_kpi_consumer.py:375-380).
    */
  def jdbcUpsertSink(df: DataFrame, url: String, table: String,
      keys: Seq[String], maxConnections: Int = 8): DataStreamWriter[Row] =
    df.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val cols = batch.columns.toSeq
        val sql = upsertSql(table, cols, keys)
        batch.coalesce(maxConnections).foreachPartition {
          (rows: Iterator[Row]) =>
            val conn = java.sql.DriverManager.getConnection(url)
            try {
              val st = conn.prepareStatement(sql)
              rows.foreach { r =>
                cols.indices.foreach(i => st.setObject(i + 1, r.get(i)))
                st.addBatch()
              }
              st.executeBatch()
              ()
            } finally conn.close()
        }
    }

  // ---- S10: warehouse sink DDL bootstrap ----

  /** StructType → CREATE TABLE DDL, mirroring the loader's bootstrap
    * types (snowflake_loader.py:59-104): semi-structured columns land as
    * VARIANT, timestamps as TIMESTAMP_TZ.
    */
  def ddlFor(table: String, schema: StructType): String = {
    def sqlType(dt: DataType): String = dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case DoubleType | FloatType => "DOUBLE"
      case BooleanType => "BOOLEAN"
      case TimestampType => "TIMESTAMP_TZ"
      case DateType => "DATE"
      case d: DecimalType => s"NUMBER(${d.precision},${d.scale})"
      case _: StructType | _: MapType | _: ArrayType => "VARIANT"
      case _ => "VARCHAR"
    }
    val cols = schema.fields
      .map(f => s"${f.name.toUpperCase} ${sqlType(f.dataType)}").mkString(", ")
    s"CREATE TABLE IF NOT EXISTS $table ($cols)"
  }
}
