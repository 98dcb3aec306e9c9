package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources
import graft.stages.Validation

/** Source-side operators: CSV parse with dead-letter column (S1),
  * incremental checkpoint scan (S2), validation split + error rate
  * (P1–P3), and approx-distinct accuracy.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  test("CSV round-trip parses with schema; corrupt rows go to the dead-letter column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val f = java.nio.file.Paths.get(dir, "leads.csv")
    java.nio.file.Files.writeString(f,
      "id,email,score\n1,a@b.com,10\n2,c@d.org,20\nnot_a_number,x,y\n")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("email", StringType), StructField("score", IntegerType)))
    val df = Sources.readCsv(spark, f.toString, schema).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String]("_corrupt_record").startsWith("not_a_number"))
  }

  test("incremental checkpoint scan advances monotonically and is exactly-once") {
    val ev = Tables.events(spark, sf).withColumn("w", unix_millis(col("ts")))
    val (b1, ck1) = Sources.incrementalScan(ev, "w", 0L)
    assert(b1.count() == ev.count())
    // re-scan from the new checkpoint: empty batch, checkpoint unchanged
    val (b2, ck2) = Sources.incrementalScan(ev, "w", ck1)
    assert(b2.count() == 0 && ck2 == ck1)
    // mid-stream checkpoint: batch strictly after it, union is complete
    val mid = ev.agg(expr("percentile_approx(w, 0.5)")).head().get(0)
      .asInstanceOf[Number].longValue()
    val (b3, ck3) = Sources.incrementalScan(ev, "w", mid)
    assert(b3.count() == ev.filter(col("w") > mid).count())
    assert(ck3 == ck1)
  }

  test("validation split partitions rows and reports the error rate (P1-P3)") {
    import spark.implicits._
    val df = Seq(("a", "x"), (null, "y"), ("c", null), ("d", "z"))
      .toDF("id", "payload")
    val (ok, dead) = Validation.split(df, Seq("id", "payload"))
    assert(ok.count() == 2 && dead.count() == 2)
    assert(Validation.errorRate(df, dead) == 0.5)
    // P2 whitelist
    val wl = Validation.whitelist(Seq("click", "page_view", "bogus").toDF("event_type"),
      "event_type", Validation.AllowedEventTypes)
    assert(wl.collect().map(_.getString(0)).toSet == Set("click", "page_view"))
  }

  test("archive schema evolution: two schema versions write, merged read sees both") {
    import graft.sources.Archive
    val dir = java.nio.file.Files.createTempDirectory("graft_archive_evo").toString
    val ev = Tables.events(spark, sf)
    val day1 = ev.select(date_format(col("ts"), "yyyy-MM-dd")).orderBy(col("ts")).head().getString(0)
    // v1: original producer schema
    Archive.writeArchive(ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day1), dir)
    // v2: later days arrive with a NEW column the old files don't have
    val later = ev.filter(date_format(col("ts"), "yyyy-MM-dd") =!= day1)
      .withColumn("schema_version", lit(2))
    Archive.appendDay(later, dir)
    val merged = Archive.readEvolved(spark, dir)
    assert(merged.columns.contains("schema_version"))
    // old-schema rows surface the new column as NULL; new rows keep it
    assert(merged.filter(col("dt") === day1 && col("schema_version").isNull).count() ==
      ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day1).count())
    assert(merged.filter(col("schema_version") === 2).count() ==
      ev.filter(date_format(col("ts"), "yyyy-MM-dd") =!= day1).count())
    // pruned evolved read still partition-prunes and sees the column
    val topic = "frontend.user.interaction"
    val one = Archive.readDayEvolved(spark, dir, day1, topic)
    assert(one.columns.contains("schema_version"))
    assert(one.count() > 0)
  }

  test("archive compaction: one day's small files coalesce; data and other days untouched") {
    import graft.sources.Archive
    val dir = java.nio.file.Files.createTempDirectory("graft_archive_cmp").toString
    val ev = Tables.events(spark, sf)
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy(col("d")).limit(2).collect().map(_.getString(0))
    val (day1, day2) = (days(0), days(1))
    val slice = ev.filter(date_format(col("ts"), "yyyy-MM-dd").isin(day1, day2))
    // 5 appends of row-slices → many small files per (dt, topic)
    Archive.writeArchive(slice.filter(col("event_id") % 5 === 0), dir)
    (1 to 4).foreach(i => Archive.appendDay(slice.filter(col("event_id") % 5 === i), dir))
    def files(day: String): Set[String] = {
      val root = java.nio.file.Paths.get(dir)
      val out = scala.collection.mutable.Set[String]()
      java.nio.file.Files.walk(root).forEach { p =>
        val s = p.toString
        if (s.contains(s"dt=$day") && s.endsWith(".parquet")) out += s
      }
      out.toSet
    }
    val before1 = files(day1); val before2 = files(day2)
    assert(before1.size > 3, s"fixture should create many small files, got ${before1.size}")
    val expected = spark.read.parquet(dir).filter(col("dt") === day1)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val n = Archive.compactDay(spark, dir, day1)
    assert(n == expected.size)
    val after1 = files(day1)
    // one file per (dt=day1, topic) partition
    val topics1 = spark.read.parquet(dir).filter(col("dt") === day1)
      .select("topic").distinct().count()
    assert(after1.size == topics1, s"expected $topics1 files, got ${after1.size}")
    // content identical, other day's files untouched
    val got = spark.read.parquet(dir).filter(col("dt") === day1)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
    assert(files(day2) == before2, "compaction must not rewrite other days")
  }

  test("approx_count_distinct honors its published contract row") {
    // the registered query publishes (event_type, n_events, exact_users,
    // within_rsd); the oracle asserts within_rsd TRUE — this spec checks
    // the same contract plus that exact_users really is countDistinct
    val rows = analytics.Relational.approxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val k = r.getString(0)
      assert(r.getLong(2) == exact(k), s"$k: exact_users drifted")
      assert(r.getBoolean(3), s"$k: HLL estimate outside its rsd contract")
    }
  }
}
