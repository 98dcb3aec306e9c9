package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // ObjectHashAggregate falls back to SORT-BASED aggregation after
      // 128 distinct keys per task (the default) — at volume that turns
      // every bounded-buffer typed aggregate (TopK, VecSum, sketches,
      // capped collect_list) into a full sort of its input stream
      // (measured at the sf10 stress: knn-graph pair agg 345 s -> 114 s,
      // knn-delta 34 s -> 11 s just from this). Graft's typed buffers
      // are all size-capped (TopK k<=50, VecSum dim doubles, bucket
      // caps on collect_list), so half a million live groups per task
      // is ~100 MB worst case -- keep the hash path.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "524288")
      // Long sweeps accumulate shuffle files across hundreds of jobs and
      // the ContextCleaner only frees them on driver GC — with a large
      // pre-touched heap GC may never fire and iterative CC/absorption
      // loops filled 76 GB of /tmp at the r9 sf10 sweep (q_dup_clusters,
      // "No space left on device"). A 60 s periodic GC keeps shuffle
      // cleanup flowing; negligible cost at these heap sizes.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-ups absorb JVM/codegen/page-cache cost outside any query's
    // timing. Each is individually best-effort: a missing table must
    // cost that table's queries -1, not abort the whole bench.
    def warm(body: => Unit): Unit = try body catch { case _: Throwable => () }
    warm { spark.range(1000000L).selectExpr("sum(id)").collect() }
    warm { spark.read.parquet(s"$sfDir/lineitem.parquet").count() }
    // string/codegen warm-up — the first string-heavy query otherwise
    // absorbs ~3s of JIT cost
    warm {
      spark.read.parquet(s"$sfDir/events.parquet")
        .selectExpr("upper(event_type) t", "length(props) l")
        .groupBy("t").sum("l").collect()
    }
    // pre-fault the other two hot tables: the first documents query in
    // sorted order otherwise pays the corpus page-cache read + string
    // JIT inside ITS timing (observed: a 10x one-off on one bench run)
    warm {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("length(text) l", "lower(source) s")
        .groupBy("s").sum("l").collect()
    }
    warm {
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + x) d")
        .agg(org.apache.spark.sql.functions.sum("d")).collect()
    }
    // A query that throws must surface as an error, never as a (fast)
    // timing: an analysis exception takes ~0.05 s and would otherwise
    // masquerade as a 10x improvement in round-over-round diffs.
    //
    // Warm repetitions per query: the first (cold) timing stays the
    // primary "queries" column, the min of the later passes lands in
    // "queries_warm". The first execution of a query shape pays ~1-3 s
    // of codegen+JIT and page-cache effects that a single sample cannot
    // separate from plan changes — a warm column in the artifact itself
    // ends the per-round ritual of exonerating cold outliers by hand
    // (see BASELINE.md "Host regression"). DEFAULT 2 since r9: three
    // consecutive rounds of cold-only driver artifacts manufactured
    // phantom regressions (the r7 q_p* and r8 q_s* "slow windows");
    // cross-round comparisons must use the warm column.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    // SPARK_GRAFT_BENCH_ONLY (builder-only, comma-separated substrings)
    // restricts the run to matching query names — used for targeted
    // stress runs (e.g. the sf10 scale-family pass) where the exact
    // quadratic verification tier would be run outside its documented
    // bounded regime. The driver sets no filter and benches everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    // SPARK_GRAFT_BENCH_SKIP (builder-only, comma-separated EXACT names)
    // removes queries from a sweep. Exists for the full-registry sf10
    // stress: the exact quadratic verification tier (q_jaccard_pairs,
    // q_dup_clusters, ...) is documented bounded-verification-only and
    // OOMs by design outside its regime — a sweep that dies there
    // forfeits the timings of every query after it (two full-sweep
    // attempts lost to q_dup_clusters at sf10). Skips are exact-name so
    // a skip can never silently swallow a scale-safe LSH sibling
    // (q_dup_clusters_lsh) via substring match. The driver sets no skip.
    val skip = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").toSet.filter(_.nonEmpty)).getOrElse(Set.empty[String])
    // Seeded order shuffle: a fixed alphabetical order let every
    // host-noise window land on an alphabetically contiguous block of
    // queries, which reads exactly like a targeted regression (r7 q_p*,
    // r8 q_s* — both exonerated only by forensic alphabet analysis).
    // Shuffling decorrelates run position from query name; the seed is
    // recorded in the artifact so any run is reproducible, and
    // SPARK_GRAFT_BENCH_SEED pins it for A/B runs.
    val seed = sys.env.get("SPARK_GRAFT_BENCH_SEED").map(_.toLong)
      .getOrElse(System.currentTimeMillis())
    val rng = new scala.util.Random(seed)
    // Warm-rep hygiene (r9 "what's wrong" #3): localCheckpoint RDDs
    // from a completed rep are freed only when the driver GC enqueues
    // their weak refs and the ContextCleaner drains them — with a
    // pre-touched 24g heap GC may not fire for minutes, so a warm rep
    // of a checkpoint-heavy query (CC loops, LSH families) could run
    // AGAINST the cold rep's lingering blocks and exceed cold
    // in-JVM. An explicit GC + a short cleaner drain between reps
    // sits OUTSIDE both timings and makes the warm column mean warm.
    def reapBetweenReps(): Unit = {
      System.gc()
      Thread.sleep(250)
    }
    def runOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (String, Seq[Either[String, Double]]) = {
      val cold = timed(fn)
      val rest0 = if (cold.isRight) (2 to reps).map { _ =>
        reapBetweenReps(); timed(fn)
      } else Nil
      // Self-exonerating warm column on the heavy tail (cold > 5 s):
      // a SINGLE warm sample can land inside a host-noise window and
      // read as warm>cold — two r10 sf10 anomalies (q_triangle_count
      // 236.9 warm vs 154.2 cold, q_containment_lsh 92.2 vs 76.4)
      // each needed a manual multi-rep re-run to exonerate. Guarantee
      // ≥2 warm samples for heavy queries so min-warm absorbs one
      // noise window; cheap queries keep the configured reps.
      val extraWarm = cold match {
        case Right(v) if v > 5.0 => (2 - rest0.count(_.isRight)).max(0)
        case _ => 0
      }
      val rest = rest0 ++ (1 to extraWarm).map { _ =>
        reapBetweenReps(); timed(fn)
      }
      // Incremental per-query line: a run killed or crashed mid-sweep
      // keeps every completed timing in the log (the aggregate JSON is
      // only written at the end). One line per query, greppable.
      val shown = (cold +: rest).map {
        case Right(v) => f"$v%.3f"
        case Left(e) => s"err:$e"
      }.mkString(" ")
      println(s"[bench] $name $shown")
      name -> (cold +: rest)
    }
    val registryTimings: Seq[(String, Seq[Either[String, Double]])] =
      rng.shuffle(SparkEntry.queries.toSeq.sortBy(_._1))
        .filter { case (name, _) => only.isEmpty || only.exists(name.contains) }
        .filter { case (name, _) => !skip.contains(name) }
        .map { case (name, fn) => runOne(name, fn) }
    // Artifact arm (VERDICT r11 #1): the production-topology rows —
    // build each shared artifact once (its cost is a row), then the
    // Θ(artifact) consumer forms. Runs AFTER the shuffled registry
    // sweep, in declaration order (builds precede consumers — run order
    // is semantic here, so no seed shuffle). Same only/skip filters so
    // targeted stress runs stay targeted.
    val artBase = sys.env.getOrElse("SPARK_GRAFT_ART_DIR", "/tmp/graft_bench_artifacts")
    val artifactTimings: Seq[(String, Seq[Either[String, Double]])] =
      Artifacts.phases(artBase)
        .filter { case (name, _) => only.isEmpty || only.exists(name.contains) }
        .filter { case (name, _) => !skip.contains(name) }
        .map { case (name, fn) => runOne(name, fn) }
    val timings = registryTimings ++ artifactTimings
    // Artifact order is sorted by name regardless of run order — the
    // cross-round diff should not churn on the shuffle.
    val results: Seq[(String, Either[String, Double])] =
      timings.map { case (name, runs) => name -> runs.head }.sortBy(_._1)
    val warmResults: Seq[(String, Either[String, Double])] =
      timings.collect { case (name, runs) if runs.size > 1 =>
        val oks = runs.tail.collect { case Right(v) => v }
        name -> (if (oks.nonEmpty) Right(oks.min) else runs.tail.head)
      }.sortBy(_._1)
    def fmt(v: Double): String = f"$v%.3f"
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def qjson(rs: Seq[(String, Either[String, Double])]): String =
      rs.map {
        case (k, Right(v)) => "\"" + k + "\":" + fmt(v)
        case (k, Left(e))  => "\"" + k + "\":{\"err\":" + jstr(e) + "}"
      }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(_)) => k }
    val total = results.collect { case (_, Right(v)) => v }.sum
    val warmPart =
      if (warmResults.isEmpty) ""
      else {
        val wTotal = warmResults.collect { case (_, Right(v)) => v }.sum
        s""","total_warm":${fmt(wTotal)},"queries_warm":${qjson(warmResults)}"""
      }
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","errors":${errs.size},"seed":$seed,"reps":$reps,"queries":${qjson(results)}$warmPart,"sf":"$sfDir"}"""
    // Round 4's driver artifact captured only a truncated stdout TAIL of
    // the (single, ~4 KB) bench line and parsed nothing. Defense in
    // depth: (1) the full per-query JSON goes to a FILE, (2) the full
    // line prints FIRST, (3) the LAST line is a compact summary — same
    // schema, queries trimmed to the slowest 15 — that survives any
    // tail window of a few hundred bytes.
    // Default embeds the core count: the r12 driver ran the bench at 32
    // AND 8 cores and both runs wrote bench_full.json — the second
    // clobbered the first and the per-query 32-core map survived only as
    // a truncated stdout tail (VERDICT r12 finding #4). The summary-line
    // contract is unchanged; the artifact name is what moves.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"bench_full_c$cpus.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full + "\n")
    catch { case _: Throwable => () }
    println(full)
    // Summary line keeps all errors (they must never scroll off) plus the
    // slowest 15 successes.
    val slowest = results.filter(_._2.isLeft) ++
      results.collect { case ok @ (_, Right(_)) => ok }
        .sortBy { case (_, Right(v)) => -v; case _ => 0.0 }.take(15)
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"errors":${errs.size},"queries":${qjson(slowest)},"queries_full":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
