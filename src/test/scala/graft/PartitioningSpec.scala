package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.Partitioning

/** Bucketed co-located joins and salted skew joins — correctness plus the
  * plan-shape property that makes them worth it (no exchange between
  * bucketed sides).
  */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Partitioning.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_orderkey", 8)
    Partitioning.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 8)
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // a sort-merge join between co-bucketed tables needs no Exchange
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"))
    if (!plan.contains("BroadcastHashJoin")) {
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    }
    // correctness vs plain join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("salted join equals the plain join result") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = Partitioning.saltedJoin(li, ord, "l_orderkey", salt = 4)
    assert(salted.count() == plain.count())
    val pSum = plain.agg(sum(col("l_quantity") * col("o_totalprice"))).head().getDouble(0)
    val sSum = salted.agg(sum(col("l_quantity") * col("o_totalprice"))).head().getDouble(0)
    assert(math.abs(pSum - sSum) < 1e-6 * math.abs(pSum))
  }

  test("salted two-stage aggregation equals the plain groupBy") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val salted = Partitioning.saltedTwoStage(ev, Seq("user_id"), col("event_id"), 8)(
      Seq(count(lit(1)).as("__c"), countDistinct(col("event_id")).as("__d")),
      Seq(sum(col("__c")).as("n"), sum(col("__d")).as("d")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
    val cd = Partitioning.saltedCountDistinct(ev, Seq("user_id"), "event_id", 8, "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cd == plain.map { case (k, (_, d)) => k -> d })
  }
}
