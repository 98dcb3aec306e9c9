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
}
