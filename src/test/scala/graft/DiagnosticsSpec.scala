package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Events, ScaleQueries}

/** Property gates for the wave-3 diagnostics: cohort retention, k-means
  * cluster balance, retrieval metrics, shard manifest — the accounting
  * identities a hash-compare against the oracle cannot articulate.
  */
class DiagnosticsSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  test("cohort retention: offset 0 is total, cells bounded by cohort size") {
    val rows = Events.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    // cohorts partition the user base
    val cohortSizes = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(r => r.getAs[Long]("cohort_wk") -> r.getAs[Long]("cohort_users")).toMap
    assert(cohortSizes.values.sum == users)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_users"))
      assert(r.getAs[Long]("week_offset") >= 0L)
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
      if (r.getAs[Long]("week_offset") == 0L) assert(ret == 1.0)
    }
  }

  test("state dwell: matches the naive per-user lead recomputation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val naive = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._2, r._3))
      s.sliding(2).filter(_.length == 2).map(p => p(0)._4 -> (p(1)._2 - p(0)._2))
    }.toSeq.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val grand = naive.values.map(_._2).sum
    val got = graft.analytics.Events.stateDwell(spark, sf).collect()
    assert(got.length == naive.size)
    var shareSum = 0.0
    got.foreach { r =>
      val (n, tot) = naive(r.getString(0))
      assert(r.getAs[Long]("n_intervals") == n)
      assert(r.getAs[Long]("total_dwell_us") == tot)
      assert(r.getAs[Double]("avg_dwell_us") ==
        math.floor(tot.toDouble / n * 1e2 + 0.5) / 1e2)
      shareSum += r.getAs[Double]("dwell_share")
    }
    assert(math.abs(shareSum - 1.0) < 1e-5)
    assert(grand == got.map(_.getAs[Long]("total_dwell_us")).sum)
  }

  test("skew profile: matches a local frequency recomputation on one key") {
    val freq = Tables.events(spark, sf).select("user_id").collect()
      .map(_.getLong(0)).groupBy(identity).map(_._2.length.toLong)
    def snap6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val r = graft.analytics.Audit.skewProfile(spark, sf).collect()
      .find(_.getString(0) == "events.user_id").get
    assert(r.getAs[Long]("n_rows") == freq.sum)
    assert(r.getAs[Long]("n_keys") == freq.size.toLong)
    assert(r.getAs[Long]("max_freq") == freq.max)
    assert(r.getAs[Double]("skew_ratio") ==
      snap6(freq.max.toDouble / (freq.sum.toDouble / freq.size)))
    assert(r.getAs[Double]("top1_share") == snap6(freq.max.toDouble / freq.sum))
    // every profiled relation: ratio >= 1 (max >= mean), share in (0, 1]
    graft.analytics.Audit.skewProfile(spark, sf).collect().foreach { row =>
      assert(row.getAs[Double]("skew_ratio") >= 1.0 - 1e-6)
      val s = row.getAs[Double]("top1_share")
      assert(s > 0 && s <= 1.0)
    }
  }

  test("cluster balance: shares sum to one, members account the corpus") {
    val rows = ScaleQueries.clusterBalance(spark, sf).collect()
    assert(rows.length == ScaleQueries.KmeansK)
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == n)
    val pct = rows.map(_.getAs[Double]("pct_vecs")).sum
    assert(math.abs(pct - 1.0) < 1e-4, s"pct_vecs sums to $pct")
    val ipct = rows.map(_.getAs[Double]("inertia_pct")).sum
    assert(math.abs(ipct - 1.0) < 1e-4, s"inertia_pct sums to $ipct")
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_dist2") >= 0.0)
      assert(r.getAs[Double]("inertia") >= 0.0)
    }
  }

  test("retrieval metrics: bounded, recall monotone in the probe budget") {
    val rows = ScaleQueries.retrievalMetrics(spark, sf)
      .orderBy(col("nprobe")).collect()
    assert(rows.length == ScaleQueries.AnnRecallProbes.length)
    rows.foreach { r =>
      Seq("recall_at_10", "mrr", "ndcg_at_10").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v")
      }
      // a found truth item implies every rank metric is positive
      if (r.getAs[Long]("n_overlap") > 0) {
        assert(r.getAs[Double]("mrr") > 0.0)
        assert(r.getAs[Double]("ndcg_at_10") > 0.0)
      }
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("recall_at_10") >= a.getAs[Double]("recall_at_10"))
      case _ => ()
    }
    // probing every cell must recover ground truth on this small corpus
    assert(rows.last.getAs[Double]("recall_at_10") > 0.5)
  }

  test("event transitions: pane decomposition equals the naive lag chain") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    val naive = ev
      .withColumn("prev", lag(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // tiny pane width forces many panes per user — the boundary path
    // carries most pairs, which is exactly what must stay equivalent
    val paned = graft.scale.SlidingAgg.transitionCounts(
      ev, Seq("user_id"), col("ts"), col("event_type"), col("event_id"), 3600L * 1000000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(paned == naive)
    assert(paned.nonEmpty)
  }

  test("event transitions: probabilities row-normalize to one") {
    val rows = analytics.Events.eventTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prev")).foreach { case (prev, rs) =>
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$prev row sums to $psum")
    }
  }

  test("pq distortion: one row per subspace, shares sum to one") {
    val rows = ScaleQueries.pqDistortion(spark, sf).collect()
    assert(rows.length == graft.scale.ProductQuantize.M)
    val n = Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == n)
      assert(r.getAs[Double]("avg_dist2") >= 0.0)
      assert(r.getAs[Double]("max_dist2") >= r.getAs[Double]("avg_dist2"))
    }
    val share = rows.map(_.getAs[Double]("dist2_share")).sum
    assert(math.abs(share - 1.0) < 1e-4, s"shares sum to $share")
  }

  test("transition counts: pane equivalence holds for random pane widths") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    val naive = {
      import org.apache.spark.sql.expressions.Window
      ev.withColumn("prev", lag(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    }
    // widths spanning sub-second to multi-month panes — every regime of
    // the intra/boundary split must agree with the naive chain
    Seq(1L, 997L, 3600L * 1000000, 30L * 86400 * 1000000).foreach { pane =>
      val paned = graft.scale.SlidingAgg.transitionCounts(
        ev, Seq("user_id"), col("ts"), col("event_type"), col("event_id"), pane)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(paned == naive, s"pane $pane diverges")
    }
  }

  test("pareto: cumulative share is a monotone permutation ending at one") {
    val rows = analytics.Relational.revenuePareto(spark, sf)
      .orderBy(col("cum_share")).collect()
    val parts = Tables.lineitem(spark, sf).select("l_partkey").distinct().count()
    assert(rows.length == parts)
    // monotone in descending-revenue order; last share is 1
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("revenue") >= b.getAs[Double]("revenue") ||
          a.getAs[Double]("cum_share") < b.getAs[Double]("cum_share"))
      case _ => ()
    }
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-4)
    // classes are exactly the share-threshold partition (the synthetic
    // revenue is near-uniform, so the A-class PART share tracks its
    // revenue share — no skew assertion, only the boundary invariant)
    rows.foreach { r =>
      val cls = r.getAs[String]("abc_class")
      val share = r.getAs[Double]("cum_share")
      val expect = if (share <= analytics.Relational.ParetoA) "A"
        else if (share <= analytics.Relational.ParetoB) "B" else "C"
      assert(cls == expect, s"share $share classed $cls")
    }
    assert(rows.map(_.getAs[String]("abc_class")).toSet == Set("A", "B", "C"))
  }

  test("pareto plan: the cumulative window is band-partitioned, never global") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      analytics.Relational.revenuePareto(spark, sf).explain("formatted")
    }
    val p = out.toString
    assert(p.contains("hashpartitioning(band"),
      s"per-band window not partitioned by band:\n$p")
  }

  test("daily anomaly: z-scores center on zero, flag matches the threshold") {
    val rows = analytics.Events.dailyAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    val zmean = rows.map(_.getAs[Double]("z")).sum / rows.length
    assert(math.abs(zmean) < 1e-2, s"z mean $zmean")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_anomaly") ==
        (math.abs(r.getAs[Double]("z")) >= analytics.Events.AnomalyZ))
    }
    val n = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == n)
  }

  test("rfm: segments partition the customer base, names from the fixed set") {
    val rows = analytics.Relational.rfmSegments(spark, sf).collect()
    val names = Set("champion", "loyal", "new", "at_risk", "hibernating")
    assert(rows.map(_.getAs[String]("segment")).toSet.subsetOf(names))
    val customers = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == customers)
    assert(rows.length > 1, "cuts must split the base into several segments")
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_recency_days") >= 0.0)
      assert(r.getAs[Double]("avg_frequency") >= 1.0)
      assert(r.getAs[Double]("avg_monetary") > 0.0)
    }
  }

  test("basket pairs: support floor holds, lift consistent with counts") {
    val rows = analytics.Relational.basketPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val nOrders = Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"))
      val np = r.getAs[Long]("n_pair")
      assert(np >= analytics.Relational.BasketMinSupport)
      // a pair occurs at most as often as either member
      assert(np <= r.getAs[Long]("n_p1") && np <= r.getAs[Long]("n_p2"))
      val lift = r.getAs[Double]("lift")
      val expected = np.toDouble * nOrders /
        (r.getAs[Long]("n_p1") * r.getAs[Long]("n_p2"))
      assert(math.abs(lift - expected) < 1e-4)
      assert(lift > 0.0)
    }
  }

  test("shard manifest rolls up exactly to the training-shards accounting") {
    val manifest = ScaleQueries.shardManifest(spark, sf).collect()
    assert(manifest.nonEmpty)
    val rolled = manifest.groupBy(r =>
      (r.getAs[String]("split"), r.getAs[String]("source")))
      .map { case (k, rs) =>
        k -> (rs.map(_.getAs[Long]("n_docs")).sum,
          rs.map(_.getAs[Long]("n_tokens")).sum, rs.length.toLong)
      }
    val shards = ScaleQueries.trainingShards(spark, sf).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("n_bins"))).toMap
    assert(rolled.keySet == shards.keySet)
    rolled.foreach { case (k, v) => assert(v == shards(k), s"mismatch at $k") }
    // checksums: non-degenerate (distinct member sets give distinct xors
    // with overwhelming probability over 52-bit hashes)
    val checks = manifest.map(_.getAs[Long]("checksum"))
    assert(checks.distinct.length > checks.length / 2)
  }
}
