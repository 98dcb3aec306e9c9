package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Connectors

/** Compile/plan checks for the Kafka + JDBC connector shells (S6/S7/S8/S10).
  * The envelope decode and SQL generation are executed for real; the
  * reader/writer builders are constructed but never started (no Kafka
  * connector or database exists in this environment).
  */
class ConnectorsSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  /** eventStream reads a directory of events files (it infers the ts
    * encoding from the footer schema) — stage the single parquet file
    * like the streaming suite does, rather than pointing it at the
    * mixed-table sf root.
    */
  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_conn_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("kafka reader/writer builders configure without starting") {
    val reader = Connectors.kafkaReader(spark, "broker:9092",
      Seq("marketo.leads.delta", "frontend.user.interaction", "text.agent.turn.completed"))
    assert(reader != null)
    val writer = Connectors.kafkaWriter(
      graft.streaming.Streams.eventStream(spark, eventsDir),
      "broker:9092", "frontend.user.interaction", col("user_id"), "/tmp/ck")
    assert(writer != null)
  }

  test("envelope decode round-trips the reference wire format") {
    import spark.implicits._
    val dataSchema = StructType(Seq(
      StructField("lead_id", LongType), StructField("email", StringType)))
    val wire = Seq(
      ("""{"event_id":"e1","event_type":"marketo.lead.updated","source":"marketo",
          "ts_ms":1705320000000,"data":{"lead_id":7,"email":"a@b.co"},
          "metadata":{"transformer":"marketo","version":"1"}}""".replaceAll("\n\\s*", ""),
        "7", "marketo.leads.delta"))
      .toDF("json", "k", "topic")
      .select(col("k").cast("binary").as("key"), col("json").cast("binary").as("value"),
        col("topic"), lit(0).as("partition"), lit(0L).as("offset"),
        current_timestamp().as("timestamp"), lit(0).as("timestampType"))
    val decoded = Connectors.decodeEnvelope(wire, dataSchema).collect().head
    assert(decoded.getAs[String]("event_id") == "e1")
    assert(decoded.getAs[String]("key") == "7")
    assert(decoded.getAs[org.apache.spark.sql.Row]("data").getAs[Long]("lead_id") == 7L)
    assert(decoded.getAs[Map[String, String]]("metadata")("transformer") == "marketo")
  }

  test("upsert SQL matches the consumer's ON CONFLICT statement shape") {
    val sql = Connectors.upsertSql("marketo_leads",
      Seq("lead_id", "email", "updated_at"), Seq("lead_id"))
    assert(sql ==
      "INSERT INTO marketo_leads (lead_id, email, updated_at) VALUES (?, ?, ?) " +
        "ON CONFLICT (lead_id) DO UPDATE SET email = EXCLUDED.email, " +
        "updated_at = EXCLUDED.updated_at")
  }

  test("jdbc upsert sink builds a foreachBatch writer without starting") {
    val w = Connectors.jdbcUpsertSink(
      graft.streaming.Streams.eventStream(spark, eventsDir),
      "jdbc:postgresql://db:5432/etl", "agent_turns", Seq("session_id", "turn_id"))
    assert(w != null)
  }

  test("warehouse DDL bootstrap mirrors the loader's type map") {
    val ddl = Connectors.ddlFor("frontend_events", StructType(Seq(
      StructField("event_id", StringType),
      StructField("ts", TimestampType),
      StructField("tokens_in", LongType),
      StructField("cost", DecimalType(10, 6)),
      StructField("metadata", MapType(StringType, StringType)))))
    assert(ddl == "CREATE TABLE IF NOT EXISTS frontend_events (EVENT_ID VARCHAR, " +
      "TS TIMESTAMP_TZ, TOKENS_IN BIGINT, COST NUMBER(10,6), METADATA VARIANT)")
  }
}
