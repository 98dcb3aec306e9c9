package graft

import java.nio.file.{Files, Paths, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Guards against silent testdata-encoding drift: the driver's testdata
  * generator has shipped `events.ts` as parquet TIMESTAMP(NANOS) (reads as
  * long under nanosAsLong=true), as timestamp[us] NTZ (TIMESTAMP_NTZ), and
  * as timestamp[us] UTC (TIMESTAMP) across regenerations — and one such
  * flip cost round 5 nine oracle queries. This spec writes the same events
  * data in all three encodings and asserts every registered events-reading
  * query (the nine that broke) analyzes and returns identical results on
  * each.
  */
class EncodingDriftSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  val EventQueries = Seq(
    "q_sessionize", "q_journey", "q_running_total", "q_event_gaps",
    "q_session_summary", "q_envelope_flatten", "q_event_payload",
    "q_range_clicks", "q_rolling_user_features")

  /** Build a sibling of the sf dir where every table but events is a
    * symlink and events.parquet is re-encoded per `enc`.
    */
  def encodedDir(enc: String): String = {
    val base = Files.createTempDirectory(s"graft_enc_$enc")
    val src = Paths.get(sf)
    Files.list(src).forEach { p: Path =>
      if (p.getFileName.toString != "events.parquet")
        Files.createSymbolicLink(base.resolve(p.getFileName), p)
    }
    val ev = Tables.events(spark, sf) // normalized TimestampType
    val out = base.resolve("events.parquet").toString
    enc match {
      case "long" => // nanos-as-long, what TIMESTAMP(NANOS) reads as
        ev.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
          .write.mode("overwrite").parquet(out)
      case "ntz" =>
        ev.withColumn("ts", col("ts").cast(TimestampNTZType))
          .write.mode("overwrite").parquet(out)
      case "ltz" =>
        val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        try ev.withColumn("ts", col("ts").cast(TimestampType))
          .write.mode("overwrite").parquet(out)
        finally prev.foreach(spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    }
    base.toString
  }

  test("all events queries agree across ts encodings (long-nanos, us-NTZ, us-LTZ)") {
    val dirs = Seq("long", "ntz", "ltz").map(e => e -> encodedDir(e))
    // sanity: the three dirs really present three distinct raw ts types
    val rawTypes = dirs.map { case (_, d) =>
      spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    }
    assert(rawTypes.distinct.size == 3, s"encodings collapsed: $rawTypes")
    val qs = SparkEntry.queries
    for (name <- EventQueries) {
      assert(qs.contains(name), s"$name not registered")
      val results = dirs.map { case (enc, d) =>
        val rows = qs(name)(spark, d).collect().map(_.toString).sorted.toSeq
        enc -> rows
      }
      val (refEnc, ref) = results.head
      for ((enc, rows) <- results.tail) {
        assert(rows.size == ref.size, s"$name: $enc rows=${rows.size} vs $refEnc=${ref.size}")
        assert(rows == ref, s"$name: $enc differs from $refEnc")
      }
    }
  }
}
