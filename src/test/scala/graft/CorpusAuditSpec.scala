package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{CorpusAudit, CorpusQueries}

/** Property + plan gates for the corpus-audit tier
  * (analytics/CorpusAudit.scala): hand-computed AUC fixtures the oracle
  * hash-compare cannot articulate, crafted-leak detection for the split
  * audit, boilerplate threshold behavior, funnel monotonicity, mojibake
  * stratum arithmetic, and the plan shapes (hash-keyed exchanges, no
  * corpus-wide window) that make these survive 100 TB.
  */
class CorpusAuditSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  /** The split-assignment bucket, computed JVM-side with the same
    * md5-prefix formula the queries use — for crafting fixture docs that
    * land in chosen splits.
    */
  private def bucket(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100
  }

  test("auc: hand-computed fixtures — separation, ties, midrank mix") {
    val s = spark; import s.implicits._
    def auc(rows: Seq[(Double, Boolean)]): (Double, Long, Long) = {
      val r = CorpusAudit.aucOf(rows.toDF("prob", "keep")).collect().head
      (r.getAs[Double]("auc"), r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    }
    // perfect separation
    val (a1, p1, n1) = auc(Seq((0.1, false), (0.2, false), (0.3, true), (0.4, true)))
    assert(a1 == 1.0 && p1 == 2 && n1 == 2)
    // inverted separation
    val (a0, _, _) = auc(Seq((0.9, false), (0.8, false), (0.3, true), (0.4, true)))
    assert(a0 == 0.0)
    // all tied: midrank gives exactly 0.5
    val (at, _, _) = auc(Seq((0.5, true), (0.5, true), (0.5, false), (0.5, false)))
    assert(at == 0.5)
    // mixed with one tie: pairs (.2T vs .1F)=1, (.2T vs .2F)=.5,
    // (.3T vs .1F)=1, (.3T vs .2F)=1 → 3.5/4
    val (am, _, _) = auc(Seq((0.1, false), (0.2, true), (0.2, false), (0.3, true)))
    assert(am == 0.875)
  }

  test("auc on the corpus: well-defined, both classes present, gini consistent") {
    val r = CorpusAudit.classifierAuc(spark, sf).collect().head
    assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(r.getAs[Double]("gini") - (2 * auc - 1)) < 1e-9)
  }

  test("auc plan: instances collapse to a per-prob aggregate before any window") {
    val p = plan(CorpusAudit.classifierAuc(spark, sf))
    // the window may only see the bounded distinct-prob relation — the
    // grouping exchange on prob must exist upstream of it
    assert(p.contains("Window"))
    assert(p.contains("hashpartitioning(prob"), s"no per-prob aggregate:\n$p")
  }

  test("split leakage: a crafted shared paragraph across splits is caught") {
    val s = spark; import s.implicits._
    val shared = (1 to 16).map(i => s"tok$i").mkString(" ")
    // force one doc into train (bucket < 80) and one into test (>= 90)
    def find(pred: Long => Boolean, tag: String): String =
      Iterator.from(0).map(i => s"$shared $tag$i").find(t => pred(bucket(t))).get
    val trainDoc = find(_ < 80, "extraa")
    val testDoc = find(_ >= 90, "extrab")
    val docs = Seq((1L, "src0", trainDoc), (2L, "src1", testDoc))
      .toDF("doc_id", "source", "text")
    val rows = CorpusAudit.splitLeakage(docs).collect()
    val bySplit = rows.map(r => r.getAs[String]("split") -> r).toMap
    assert(bySplit.contains("train") && bySplit.contains("test"))
    // the shared 16-word leading paragraph leaks; the distinct tails don't
    Seq("train", "test").foreach { sp =>
      assert(bySplit(sp).getAs[Long]("n_leaked_hashes") == 1L, sp)
      assert(bySplit(sp).getAs[Long]("n_leaked_paras") == 1L, sp)
    }
  }

  test("split leakage: exact-duplicate documents can never leak (same split)") {
    val s = spark; import s.implicits._
    // identical text ⇒ identical bucket ⇒ same split: the leakage audit
    // over a corpus of exact duplicates reports zero leaked hashes
    val t = (1 to 32).map(i => s"dup$i").mkString(" ")
    val docs = Seq((1L, "a", t), (2L, "b", t), (3L, "c", t))
      .toDF("doc_id", "source", "text")
    val rows = CorpusAudit.splitLeakage(docs).collect()
    assert(rows.length == 1) // one split only
    assert(rows.head.getAs[Long]("n_leaked_hashes") == 0L)
  }

  test("boilerplate: df >= 3 flags all instances, df == 2 flags none") {
    val s = spark; import s.implicits._
    val boiler = (1 to 16).map(i => s"nav$i").mkString(" ")
    val pair = (1 to 16).map(i => s"dup$i").mkString(" ")
    def uniq(tag: String) = (1 to 16).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, "s0", s"$boiler ${uniq("a")}"),
      (2L, "s0", s"$boiler ${uniq("b")}"),
      (3L, "s1", s"$boiler ${uniq("c")}"),
      (4L, "s1", s"$pair ${uniq("d")}"),
      (5L, "s1", s"$pair ${uniq("e")}"))
      .toDF("doc_id", "source", "text")
    val rows = CorpusAudit.boilerplate(docs).collect()
    val byS = rows.map(r => r.getAs[String]("source") -> r).toMap
    // s0: 2 boiler instances of the df=3 paragraph; s1: 1 (the pair stays)
    assert(byS("s0").getAs[Long]("boiler_paras") == 2L)
    assert(byS("s1").getAs[Long]("boiler_paras") == 1L)
    rows.foreach { r =>
      assert(r.getAs[Long]("boiler_tokens") <= r.getAs[Long]("n_tokens"))
      val pct = r.getAs[Double]("pct_boiler_tokens")
      assert(pct >= 0.0 && pct <= 1.0)
    }
  }

  test("boilerplate plan: text never shuffles, keeper logic is agg-only") {
    val p = plan(CorpusAudit.boilerplateQ(spark, sf))
    assert(!p.contains("Window"), s"window in boilerplate:\n$p")
    assert(p.contains("hashpartitioning(ph"), s"no ph-keyed exchange:\n$p")
  }

  test("funnel: stages are monotone non-increasing and anchored at the corpus") {
    val rows = CorpusAudit.pipelineFunnel(spark, sf)
      .orderBy(col("stage")).collect()
    assert(rows.length == 5)
    val n = Tables.documents(spark, sf).count()
    assert(rows.head.getAs[Long]("n_docs") == n)
    assert(rows.head.getAs[Double]("pct_docs") == 1.0)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_docs") <= a.getAs[Long]("n_docs"))
      assert(b.getAs[Long]("n_tokens") <= a.getAs[Long]("n_tokens"))
    }
    // thresholds must actually gate something and leave something
    assert(rows.last.getAs[Long]("n_docs") > 0)
    assert(rows.last.getAs[Long]("n_docs") < n)
  }

  test("threshold sweep: monotone in the cut, anchored at the 0.5 pair set") {
    val rows = CorpusAudit.dupThresholdSweep(spark, sf)
      .orderBy(col("threshold")).collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_pairs") <= a.getAs[Long]("n_pairs"))
        assert(b.getAs[Long]("n_dup_docs") <= a.getAs[Long]("n_dup_docs"))
      case _ => ()
    }
    // the 0.5 row IS the registered near-dup pair relation
    val exact = graft.analytics.ScaleQueries.jaccardPairs(spark, sf).count()
    assert(rows.head.getAs[Double]("threshold") == 0.5)
    assert(rows.head.getAs[Long]("n_pairs") == exact)
    rows.foreach { r =>
      val pct = r.getAs[Double]("pct_dup_docs")
      assert(pct >= 0.0 && pct <= 1.0)
      // a pair touches two docs; distinct docs can't exceed 2×pairs
      assert(r.getAs[Long]("n_dup_docs") <= 2 * r.getAs[Long]("n_pairs"))
    }
  }

  test("znorm: per-source z has ~zero mean, winsor stays in [-3, 3]") {
    val rows = CorpusAudit.scoreZnorm(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val zw = r.getAs[Double]("z_winsor")
      assert(zw >= -3.0 && zw <= 3.0)
    }
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val zs = rs.map(_.getAs[Double]("z"))
      val mean = zs.sum / zs.length
      assert(math.abs(mean) < 1e-3, s"$src mean z = $mean")
      // some spread unless the source is constant-scored
      assert(zs.distinct.length > 1, s"$src z degenerate")
    }
  }

  test("znorm plan: per-source stats broadcast back, docs never reshuffle") {
    val p = plan(CorpusAudit.scoreZnorm(spark, sf))
    assert(p.contains("BroadcastExchange"), s"stats not broadcast:\n$p")
  }

  test("data card: one row per source, every rate well-formed and consistent") {
    val rows = CorpusAudit.dataCard(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.length == docs.select("source").distinct().count())
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val pctCols = Seq("english_pct", "dup_token_pct", "boiler_token_pct",
      "pii_doc_pct", "moji_doc_pct", "gopher_keep_pct", "clf_keep_pct", "avg_prob")
    rows.foreach { r =>
      pctCols.foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v")
      }
    }
    // the card must agree with the standalone reports it reuses
    val moji = CorpusAudit.mojibake(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("pct_flagged")).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("moji_doc_pct") == moji(r.getAs[String]("source")))
    }
  }

  test("mojibake: per-class counts follow the injection strata exactly") {
    val docs = Tables.documents(spark, sf)
    def stratum(m: Int): Long = docs.filter(col("doc_id") % m === 0).count()
    val rows = CorpusAudit.mojibake(spark, sf).collect()
    // ' cafÃ© naÃ¯ve' carries TWO mojibake digraphs; the others one each
    assert(rows.map(_.getAs[Long]("n_mojibake")).sum ==
      2 * stratum(3) + stratum(5))
    assert(rows.map(_.getAs[Long]("n_replacement")).sum == stratum(7))
    assert(rows.map(_.getAs[Long]("n_control")).sum == stratum(11))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
      val pct = r.getAs[Double]("pct_flagged")
      assert(pct >= 0.0 && pct <= 1.0)
    }
  }

  test("spearman: doubled midranks — tie fixture, permutation-sum invariant") {
    val s = spark; import s.implicits._
    // values 5,5,2,9,9,9,1 → midranks: 1→1, 2→2, 5→(3+4)/2=3.5, 9→(5+6+7)/2=6
    val df = Seq(5, 5, 2, 9, 9, 9, 1).toDF("v")
    val got = CorpusAudit.doubledRanks(df, "v", "r2").collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("r2")).toMap
    assert(got == Map(1 -> 2L, 2 -> 4L, 5 -> 7L, 9 -> 12L))
    // joined back, doubled midranks always sum to n(n+1)
    val n = 7L
    val tot = df.join(CorpusAudit.doubledRanks(df, "v", "r2"), "v")
      .agg(sum("r2")).collect().head.getLong(0)
    assert(tot == n * (n + 1))
  }

  test("spearman: matches the naive full-window rank correlation at sf0.001") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val scored = graft.analytics.ScaleQueries.qualityClassify(docs)
      .select(col("doc_id"), col("prob"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    // naive oracle: corpus-wide midranks via avg(row_number) per value —
    // the decomposition this query exists to avoid at scale
    def midrank(v: String) = avg(row_number().over(Window.orderBy(col(v))))
      .over(Window.partitionBy(col(v)))
    val naive = scored
      .withColumn("rx", midrank("prob"))
      .withColumn("ry", midrank("n_chars"))
      .agg(corr(col("rx"), col("ry"))).collect().head.getDouble(0)
    val got = CorpusAudit.spearmanQuality(spark, sf).collect().head
    assert(got.getAs[Long]("n") == scored.count())
    assert(math.abs(got.getAs[Double]("rho_len_quality") - naive) < 2e-4,
      s"got ${got.getAs[Double]("rho_len_quality")} naive $naive")
  }

  test("lang confusion: cells account the corpus, shares row-normalize") {
    val rows = CorpusAudit.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Double]("share")))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum == total)
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val s = cells.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-5, s"$lang shares sum to $s")
    }
    // detector classes stay within its vocabulary
    val classes = rows.map(_._2).toSet
    assert(classes.subsetOf(Set("english", "spanish", "french", "unknown")))
  }

  test("neyman: allocation matches a local recomputation; shares sum to ~1") {
    def snap(x: Double, s: Int) = {
      val p = math.pow(10, s); math.floor(x * p + 0.5) / p
    }
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = rows.groupBy(_._1).map { case (s, xs) =>
      val v = xs.map(_._2)
      val n = v.length.toLong
      val sx = v.sum
      val sxx = v.map(x => x * x).sum
      val sig = snap(math.sqrt(math.max(
        (sxx.toDouble - sx.toDouble * sx.toDouble / n) / n, 0.0)), 6)
      s -> ((n, sig))
    }
    val t = snap(bySrc.values.map { case (n, sig) => n.toDouble * sig }.sum, 0)
    val got = CorpusAudit.neymanAlloc(spark, sf).collect()
    assert(got.length == bySrc.size)
    var shareSum = 0.0
    got.foreach { r =>
      val (n, sig) = bySrc(r.getString(0))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Double]("sigma_chars") == sig)
      val share = snap(n.toDouble * sig / t, 6)
      assert(r.getAs[Double]("alloc_share") == share)
      assert(r.getAs[Long]("alloc_n") ==
        snap(CorpusAudit.AuditBudget.toDouble * (n.toDouble * sig / t), 0).toLong)
      shareSum += share
    }
    // shares sum to Σterms/t_snapped: the unit-grid snap of t moves the
    // total by up to 0.5/t, plus 5e-7 half-up wander per source
    assert(math.abs(shareSum - 1.0) <= 0.5 / t + 5e-7 * bySrc.size)
  }

  test("spearman plan: rank joins broadcast, corpus never globally sorted") {
    // spearmanQuality itself returns a localCheckpoint (cache-release
    // pattern), so assemble the same pre-checkpoint composition here
    val docs = Tables.documents(spark, sf)
    val scored = graft.analytics.ScaleQueries.qualityClassify(docs)
      .select(col("doc_id"), col("prob"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    val p = plan(scored.join(
      broadcast(CorpusAudit.doubledRanks(scored, "prob", "rx")), "prob"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    // the only Sort+Window pair may run over the bounded distinct-value
    // relations (partial agg upstream); a corpus-wide window would show a
    // Window directly over the document scan with no aggregate between
    assert(p.contains("Window"))
    assert(p.contains("HashAggregate"))
  }
}
