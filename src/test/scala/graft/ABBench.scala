package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session A/B harness (CLAUDE.md bench discipline: cross-round
  * bench deltas are noise-dominated at sf1, so plan changes are
  * adjudicated by alternating old/new in ONE session). Holds the
  * round-2 string-keyed / posexplode variants purely as baselines;
  * the production paths live in analytics/ScaleQueries and scale/KMeans.
  *
  * Run: sbt "Test/runMain graft.ABBench /tmp/sf1 2"
  */
object ABBench {

  // ---- legacy (round-2) variants, verbatim shapes ----

  private def ngramStringKeyed(spark: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    val bigrams = when(size(w) >= 2,
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    Tables.documents(spark, dir)
      .select(graft.functions.TextAnalysis.language(col("text")).as("language"),
        split(trim(lower(col("text"))), "\\s+").as("w"))
      .select(col("language"), explode(bigrams).as("bigram"))
      .groupBy(col("language"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("language"))
      .agg(graft.scale.TopK.topKStr(col("c").cast("double"), col("bigram"), 5).as("top"))
      .select(col("language"), posexplode(col("top")).as(Seq("rank0", "e")))
      .select(col("language"), (col("rank0") + 1).as("rank"),
        col("e.id").as("bigram"), col("e.score").cast("long").as("n"))
  }

  private def tfidfStringKeyed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    tf.join(df, "term").crossJoin(n)
      .withColumn("tfidf",
        Num.r(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .groupBy("doc_id")
      .agg(graft.scale.TopK.topKStr(col("tfidf"), col("term"), 3).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("rank0", "e")))
      .select(col("doc_id"), (col("rank0") + 1).as("rank"),
        col("e.id").as("term"), col("e.score").as("tfidf"))
  }

  private def bm25StringKeyed(spark: SparkSession, dir: String): DataFrame = {
    val terms = analytics.ScaleQueries.Bm25Terms
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = broadcast(dl.agg(sum(col("dl")).as("sdl"), count(lit(1)).as("nd")))
    val qdf = tf.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.filter(col("term").isin(terms: _*))
      .join(broadcast(qdf), "term").join(dl, "doc_id").crossJoin(stats)
      .withColumn("s",
        log((col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / (col("sdl").cast("double") / col("nd")))))
      .groupBy("doc_id").agg(Num.r(sum(col("s")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(10)
  }

  /** Round-2..4 jaccardPairs shape: separate per-doc size aggregate (a
    * second full shingling scan) + two size joins after the pair count.
    */
  private def jaccardSizeJoins(spark: SparkSession, dir: String): DataFrame = {
    import graft.scale.Dedup
    val docs = Tables.documents(spark, dir)
    val sh = docs
      .select(col("doc_id"), explode(Dedup.shingleHashes(col("text"), 3)).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + 2, size(col("ds"))),
        y => struct(x.as("d1"), y.as("d2")))))
    val inter = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= Dedup.MaxGroup)
      .select(explode(pairs).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("c").cast("double") / (col("s1.n_sh") + col("s2.n_sh") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  private def jsonPropsGetJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        Num.savg(sum(col("value")), count(col("value")), 2, 4).as("avg_value"),
        max(col("k")).as("max_k"))

  /** Round-3 trainingMix shape: decontaminate's eval-shingle broadcast
    * built from the SHARED per-doc shingle relation (filter after the
    * corpus-wide distinct) instead of shingling the eval docs
    * separately — the only plan difference the round-4
    * `decontaminateAgainst` refactor introduced, and the suspect for
    * the 5→41 s q_training_mix swing in BENCH_r04.
    */
  private def trainingMixSharedShd(spark: SparkSession, dir: String): DataFrame = {
    import graft.analytics.ScaleQueries
    import graft.functions.TextAnalysis
    val w = col("w")
    val tri = when(size(w) >= 3,
      zip_with(slice(w, lit(1), size(w) - 2),
        zip_with(slice(w, lit(2), size(w) - 2), slice(w, lit(3), size(w) - 2),
          (b, c) => concat(b, lit(" "), c)),
        (a, bc) => concat(a, lit(" "), bc)))
      .otherwise(array().cast("array<string>"))
    val shd = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), explode(tri).as("s"))
      .distinct()
    val ev = broadcast(
      shd.filter(col("doc_id") % 25 === 0).select(col("s").as("ev_s")).distinct())
    val contaminated = shd.join(ev, col("s") === col("ev_s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("ev_s")).as("n_overlap"))
      .filter(col("n_overlap") > 0)
      .filter(Num.r(col("n_overlap").cast("double") / col("n_shingles"), 6) >= 0.5)
      .select("doc_id")
    val passRep = ScaleQueries.repetitionFilter(spark, dir)
      .filter(col("keep")).select("doc_id")
    val t = col("text")
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      TextAnalysis.language(t).as("language"),
      graft.functions.Scoring.completenessScore(t).as("quality"),
      TextAnalysis.bpeTokenCount(t).as("n_tokens"),
      md5(t).as("digest"))
    val kept = scored
      .filter(col("language") === "english" && col("quality") >= 60.0)
      .join(passRep, "doc_id")
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    val canonical = kept.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("digest")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    canonical.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      Num.savg(sum(col("quality")), count(lit(1)), 0, 4).as("avg_quality"),
      min(col("doc_id")).as("min_doc_id"))
  }

  /** Round-2..5 corpusCuration canonical step: row_number window over
    * digest (sorts every partition) vs the grouped min-struct argmin
    * (partial aggregation map-side, no sort).
    */
  private def curationWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextAnalysis
    val t = col("text")
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      TextAnalysis.language(t).as("language"),
      graft.functions.Scoring.completenessScore(t).as("quality"),
      TextAnalysis.bpeTokenCount(t).as("n_tokens"),
      md5(t).as("digest"))
    val kept = scored.filter(col("language") === "english" && col("quality") >= 60.0)
    val canonical = kept
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("digest")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    canonical.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      Num.savg(sum(col("quality")), count(lit(1)), 0, 4).as("avg_quality"),
      min(col("doc_id")).as("min_doc_id"))
  }

  /** Round-≤5 map-stage text features: bpeTokenCount as
    * size(regexp_extract_all(...)) (materializes every token) and
    * language over the full lowered word array — the shapes the round-6
    * codegen'd scan counters (BpeCount/WsTokenCount, split-limit
    * language) replaced. Same downstream curation plan as
    * corpusCuration.
    */
  private def curationRegexFeatures(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Normalize, TextAnalysis}
    val t = col("text")
    val words = slice(split(lower(Normalize.wsTrim(t)), "\\s+"), 1, 50)
    def tokenMatches(list: Seq[String]) =
      size(filter(words, w => w.isInCollection(list)))
    val en = tokenMatches(TextAnalysis.EnglishWords)
    val es = tokenMatches(TextAnalysis.SpanishWords)
    val fr = tokenMatches(TextAnalysis.FrenchWords)
    val lang = when(t.isNull || t === "", "unknown")
      .otherwise(when(en >= es && en >= fr, "english")
        .when(es > fr, "spanish").when(fr > 0, "french").otherwise("unknown"))
    val nTokens = when(t.isNull, 0)
      .otherwise(size(regexp_extract_all(t, lit(TextAnalysis.BpeTokenRe), lit(0))))
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      lang.as("language"),
      graft.functions.Scoring.completenessScore(t).as("quality"),
      nTokens.as("n_tokens"),
      md5(t).as("digest"))
    val kept = scored.filter(col("language") === "english" && col("quality") >= 60.0)
    val canonical = kept
      .groupBy(col("digest"))
      .agg(min(struct(col("doc_id"), col("source"), col("n_tokens"),
        col("quality"))).as("c"))
      .select(col("c.doc_id").as("doc_id"), col("c.source").as("source"),
        col("c.n_tokens").as("n_tokens"), col("c.quality").as("quality"))
    canonical.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      Num.savg(sum(col("quality")), count(lit(1)), 0, 4).as("avg_quality"),
      min(col("doc_id")).as("min_doc_id"))
  }

  /** knnGraph's shuffle-join form: probe side salted into hash slices,
    * candidate side replicated per slice (K×S-way parallelism). The
    * production fallback when the vector table outgrows a broadcast;
    * the registered query broadcasts.
    */
  private def knnGraphSalted(spark: SparkSession, dir: String): DataFrame = {
    import graft.analytics.ScaleQueries.{KmeansK, KnnGraphK, KnnGraphSalt}
    import graft.scale.Similarity
    val emb = Tables.embeddings(spark, dir)
    val trained = graft.scale.KMeans.fit(emb, KmeansK, iters = 1)
    val asg = graft.scale.KMeans.assign(emb, trained)
    val a = asg.select(col("cluster"), col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"),
      pmod(xxhash64(col("vec_id")), lit(KnnGraphSalt.toLong)).as("slice"))
    val b = asg.select(col("cluster"), col("vec_id").as("nbr_id"),
      col("embedding").as("nbr_emb"),
      Similarity.norm(col("embedding")).as("nbr_nrm"))
      .withColumn("slice", explode(lit((0L until KnnGraphSalt.toLong).toArray)))
    val den = col("nrm") * col("nbr_nrm")
    a.join(b, Seq("cluster", "slice"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("cluster"), col("vec_id"), col("nbr_id"),
        Num.r(when(den > 0,
          Similarity.dot(col("embedding"), col("nbr_emb")) / den)
          .otherwise(0.0), 6).as("cos_sim"))
      .groupBy(col("cluster"), col("vec_id"))
      .agg(graft.scale.TopK.topK(col("cos_sim"), col("nbr_id"), KnnGraphK).as("top"))
      .select(col("cluster"), col("vec_id"), posexplode(col("top")).as(Seq("rank0", "e")))
      .select(col("cluster"), col("vec_id"), (col("rank0") + 1).as("rank"),
        col("e.id").as("nbr_id"), col("e.score").as("cos_sim"))
  }

  private def kmeansStepPosexplode(emb: DataFrame, cs: graft.scale.KMeans.Centroids): Long =
    graft.scale.KMeans.assign(emb, cs)
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(avg(col("x").cast("double")).as("cx"))
      .count()

  private def kmeansStepVecSum(emb: DataFrame, cs: graft.scale.KMeans.Centroids): Long =
    graft.scale.KMeans.assign(emb, cs)
      .groupBy(col("cluster"))
      .agg(graft.scale.VecSum.vecSum(col("embedding")).as("vs"))
      .count()

  // ---- round-6 fifth-session baselines: naive window / join shapes vs
  // the registered pane-decomposed / histogram / conditional-agg plans ----

  /** Trigram extraction as the naive per-user double-lag window (one
    * task per user's full history). */
  private def trigramNaive(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("p1", lag(col("event_type"), 1).over(w))
      .withColumn("p2", lag(col("event_type"), 2).over(w))
      .filter(col("p2").isNotNull)
      .groupBy(col("p2").as("e1"), col("p1").as("e2"), col("event_type").as("e3"))
      .agg(count(lit(1)).as("n"))
  }

  /** WAU as the naive day-grid range join (every event joins every
    * report day whose window covers it — |days|-way theta join). */
  private def wauRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = ud.select(col("day")).distinct().withColumnRenamed("day", "rday")
    ud.join(days, col("day") >= date_sub(col("rday"), 6) && col("day") <= col("rday"))
      .groupBy(col("rday")).agg(countDistinct(col("user_id")).as("wau"))
  }

  /** Latency quantiles as the naive row_number window over fact rows. */
  private def latencyWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy(col("lat"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("lat"))
      .withColumn("r", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_orderpriority")))
      .filter(col("r") === expr("(cnt + 1) div 2") ||
        col("r") === expr("(9 * cnt + 9) div 10") ||
        col("r") === expr("(99 * cnt + 99) div 100"))
  }

  /** Last-touch attribution through the UNBUCKETED as-of join (one task
    * per user's full touch+purchase history). */
  private def attributionAsofSimple(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val touches = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("ts").as("touch_ts"), col("event_type").as("touch_type"))
    graft.scale.AsofJoin.asof(purchases, touches, Seq("user_id"),
      col("ts"), col("touch_ts"))
      .groupBy(coalesce(col("touch_type"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("rev"))
  }

  /** Gini through the naive global per-nation rank window. */
  private def giniWindow(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(Num.ssum(sum(col("o_totalprice")), 2, 2).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name").orderBy(col("rev").asc, col("c_custkey").asc)
    rev.withColumn("i", row_number().over(w))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), Num.r(sum(col("rev")), 2).as("sy"),
        Num.r(sum(col("i") * col("rev")), -2).as("siy"))
      .select(col("n_name"),
        Num.r(lit(2.0) * col("siy") / (col("n") * col("sy")) -
          (col("n") + lit(1L)) / col("n"), 6).as("gini"))
  }

  /** Snapshot diff as the naive two-snapshot full-outer join. */
  private def snapshotJoin(spark: SparkSession, dir: String): DataFrame = {
    def state(cut: String) = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), Num.ssum(sum(col("o_totalprice")), 2, 2).as("rev"))
    val t1 = state(analytics.Audit.SnapT1)
      .select(col("o_custkey"), col("n").as("n_old"), col("rev").as("rev_old"))
    val t2 = state(analytics.Audit.SnapT2)
      .select(col("o_custkey"), col("n").as("n_new"), col("rev").as("rev_new"))
    t1.join(t2, Seq("o_custkey"), "full_outer")
      .filter(coalesce(col("n_new"), lit(0L)) > coalesce(col("n_old"), lit(0L)))
  }

  /** The r7-RETIRED 7-chunk SimHash banding (single ~9-bit chunks,
    * radius+1 pigeonhole), kept as the A/B control: at 500 k docs its
    * 512-value bucket space saturates against the MaxGroup drop cap and
    * it silently recovered only 8.1 M of 53.9 M true radius-6 pairs
    * (sf10 stress). The registered ScaleQueries.simhashPairs now bands
    * on C(8,2) chunk PAIRS (16-bit buckets) — exact recall, 4× band
    * expansion.
    */
  private def simhashPairs7chunk(spark: SparkSession, dir: String): DataFrame = {
    import graft.scale.{Dedup, SimHash64}
    import graft.analytics.ScaleQueries.SimHamming
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), SimHash64.simhash64(col("text")).as("sig"))
    val chunks: Seq[(Int, Int)] = // (bit offset, width): 7 chunks / 64 bits
      Seq((0, 10), (10, 9), (19, 9), (28, 9), (37, 9), (46, 9), (55, 9))
    val chunkArr = array(chunks.zipWithIndex.map { case ((off, w), i) =>
      struct(lit(i).as("chunk_idx"),
        expr(s"(sig >> $off) & ${(1L << w) - 1}").as("chunk"))
    }: _*)
    val pairs = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
        struct(x.getField("doc_id").as("d1"), y.getField("doc_id").as("d2"),
          bit_count(x.getField("sig").bitwiseXOR(y.getField("sig"))).as("hamming")))))
    sigs.select(explode(chunkArr).as("c"), col("doc_id"), col("sig"))
      .groupBy(col("c.chunk_idx").as("chunk_idx"), col("c.chunk").as("chunk"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= Dedup.MaxGroup)
      .select(explode(pairs).as("p"))
      .filter(col("p.hamming") <= SimHamming)
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"), col("p.hamming").as("hamming"))
      .distinct()
  }

  /** The pre-r10 sessionIds composition, verbatim: prevTime for break
    * flags, runningSum for the prefix — each pane-decomposed but each
    * branching the big relation into its own window + carry subtrees
    * (4 passes total). Baseline for the sessentry_* arms.
    */
  private def sessionIdsLegacy(df: DataFrame, keys: Seq[String],
      time0: org.apache.spark.sql.Column, tiebreak: org.apache.spark.sql.Column,
      gapMicros: Long, paneMicros: Long): DataFrame = {
    val flagged = graft.scale.SlidingAgg.prevTime(
      df, keys, time0, tiebreak, paneMicros, "__pv")
      .withColumn("__brk",
        when(col("__pv").isNull || col("__us") - col("__pv") > gapMicros, 1.0)
          .otherwise(0.0))
      .drop("__us")
    graft.scale.SlidingAgg.runningSum(
      flagged, keys, time0, tiebreak, col("__brk"), paneMicros, "__sid")
      .withColumn("session_id", col("__sid").cast("long"))
      .drop("__pv", "__brk", "__sid")
  }

  private def sessionEntryLegacy(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionIdsLegacy(
      Tables.events(spark, dir).select("user_id", "ts", "event_id", "event_type"),
      Seq("user_id"), col("ts"), col("event_id"),
      gapMicros = 1800L * 1000000L, paneMicros = 86400L * 1000000L)
    val perSession = sess.groupBy(col("user_id"), col("session_id"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("entry_type"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"),
        count(lit(1)).as("n_events"))
    perSession.groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"),
        Num.r(sum(col("n_events")).cast("double") / count(lit(1)), 4).as("avg_events"),
        Num.r(sum(col("converted")).cast("double") / count(lit(1)), 6).as("conversion_rate"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val reps = if (args.length > 1) args(1).toInt else 2
    // optional third arg: only run A/B entries whose name contains one
    // of the comma-separated filters
    val only = (if (args.length > 2) args(2) else "").split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // ObjectHashAggregate falls back to SORT-BASED aggregation after
      // 128 distinct keys per task (the default); graft's typed buffers
      // are size-capped, so keep the hash path (see Bench.scala).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "524288")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("length(text) l").agg(sum(col("l"))).collect()
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("upper(event_type) t", "length(props) l")
      .groupBy("t").sum("l").collect()

    def time(name: String)(body: => Unit): Unit = if (only.exists(name.contains)) {
      val t0 = System.nanoTime()
      body
      println(f"[ab] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val emb = Tables.embeddings(spark, sfDir)
    lazy val seeds = graft.scale.KMeans.seeds(emb, 8)
    for (i <- 0 until reps) {
      time(s"ngram_string_$i") { ngramStringKeyed(spark, sfDir).count() }
      time(s"ngram_hashed_$i") { analytics.ScaleQueries.ngramTopK(spark, sfDir).count() }
      time(s"tfidf_string_$i") { tfidfStringKeyed(spark, sfDir).count() }
      time(s"tfidf_hashed_$i") { analytics.ScaleQueries.tfidfTopTerms(spark, sfDir).count() }
      time(s"bm25_string_$i") { bm25StringKeyed(spark, sfDir).count() }
      time(s"bm25_hashed_$i") { analytics.ScaleQueries.bm25Search(spark, sfDir).count() }
      time(s"jaccard_sizejoin_$i") { jaccardSizeJoins(spark, sfDir).count() }
      time(s"jaccard_carried_$i") { analytics.ScaleQueries.jaccardPairs(spark, sfDir).count() }
      time(s"json_getjson_$i") { jsonPropsGetJson(spark, sfDir).count() }
      time(s"json_fromjson_$i") { analytics.Events.jsonProps(spark, sfDir).count() }
      time(s"kmeans_posexplode_$i") { kmeansStepPosexplode(emb, seeds) }
      time(s"kmeans_vecsum_$i") { kmeansStepVecSum(emb, seeds) }
      time(s"curation_window_$i") { curationWindow(spark, sfDir).count() }
      time(s"curation_argmin_$i") { analytics.ScaleQueries.corpusCuration(spark, sfDir).count() }
      time(s"trainmix_sharedshd_$i") { trainingMixSharedShd(spark, sfDir).count() }
      time(s"trainmix_current_$i") { analytics.ScaleQueries.trainingMix(spark, sfDir).count() }
      time(s"q1_pricing_$i") { analytics.Relational.pricingSummary(spark, sfDir).count() }
      time(s"q3_shipping_$i") { analytics.Relational.shippingPriority(spark, sfDir).count() }
      time(s"decontaminate_$i") { analytics.ScaleQueries.decontaminate(spark, sfDir).count() }
      // r5 bench-anomaly adjudication set (VERDICT r5 "pending A/B"):
      // unchanged plans timed repeatedly in one JVM to separate host
      // noise from plan causes
      time(s"canlsh_$i") { analytics.ScaleQueries.canonicalDocsLsh(spark, sfDir).count() }
      time(s"revnation_$i") { analytics.Relational.revenueByNation(spark, sfDir).count() }
      time(s"rollup_$i") { analytics.Relational.rollupRevenue(spark, sfDir).count() }
      time(s"combined_$i") { analytics.TransformQueries.combinedScore(spark, sfDir).count() }
      time(s"curation_regexfeat_$i") { curationRegexFeatures(spark, sfDir).count() }
      time(s"labelcent_posexplode_$i") {
        emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("label"), col("pos"))
          .agg(avg(col("x").cast("double")).as("cx"))
          .groupBy(col("label"))
          .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
          .select(col("label"), transform(col("pairs"), p => p.getField("cx")).as("centroid"))
          .count()
      }
      time(s"labelcent_vecsum_$i") { graft.scale.Similarity.labelCentroids(emb).count() }
      time(s"dupclust_exact_$i") { analytics.ScaleQueries.dupClusters(spark, sfDir).count() }
      time(s"dupclust_lsh_$i") { analytics.ScaleQueries.dupClustersLsh(spark, sfDir).count() }
      time(s"knngraph_$i") { analytics.ScaleQueries.knnGraph(spark, sfDir).count() }
      time(s"knngraph_salted_$i") { knnGraphSalted(spark, sfDir).count() }
      time(s"lrtrain_$i") { analytics.ScaleQueries.lrTrain(spark, sfDir).count() }
      time(s"deltadedup_$i") { analytics.ScaleQueries.deltaDedup(spark, sfDir).count() }
      time(s"bigramlp_$i") { analytics.ScaleQueries.bigramLogprob(spark, sfDir).count() }
      time(s"unigramlp_$i") { analytics.ScaleQueries.unigramLogprob(spark, sfDir).count() }
      time(s"knndelta_$i") { analytics.ScaleQueries.knnDelta(spark, sfDir).count() }
      // r13 control arms: the join fallbacks, forced via the cell-table
      // budget conf (byte-identical to the r12 paths)
      time(s"knndelta_join_$i") {
        spark.conf.set("spark.graft.knn.cellTableRows", "0")
        try analytics.ScaleQueries.knnDelta(spark, sfDir).count()
        finally spark.conf.unset("spark.graft.knn.cellTableRows")
      }
      time(s"semneardup_kernel_$i") {
        analytics.ScaleQueries.semanticNearDup(spark, sfDir,
          salt = analytics.ScaleQueries.parallelismSalt(spark)).count()
      }
      time(s"semneardup_join_$i") {
        spark.conf.set("spark.graft.knn.cellTableRows", "0")
        try analytics.ScaleQueries.semanticNearDup(spark, sfDir,
          salt = analytics.ScaleQueries.parallelismSalt(spark)).count()
        finally spark.conf.unset("spark.graft.knn.cellTableRows")
      }
      time(s"embedneardup_kernel_$i") {
        analytics.ScaleQueries.embedNearDup(spark, sfDir).count()
      }
      time(s"embedneardup_join_$i") {
        spark.conf.set("spark.graft.knn.cellTableRows", "0")
        try analytics.ScaleQueries.embedNearDup(spark, sfDir).count()
        finally spark.conf.unset("spark.graft.knn.cellTableRows")
      }
      time(s"hybrid_$i") { analytics.ScaleQueries.hybridSearch(spark, sfDir).count() }
      time(s"shards_$i") { analytics.ScaleQueries.trainingShards(spark, sfDir).count() }
      time(s"qualitysample_$i") { analytics.ScaleQueries.qualitySample(spark, sfDir).count() }
      time(s"splitassign_$i") { analytics.ScaleQueries.splitAssign(spark, sfDir).count() }
      // round-6 second-session wave: legacy shapes vs registered plans
      time(s"paradedup_window_$i") { paragraphDedupWindow(spark, sfDir).count() }
      time(s"paradedup_argmin_$i") { analytics.CorpusQueries.paragraphDedup(spark, sfDir).count() }
      time(s"globalindex_naive_$i") {
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("n_chars"),
            (org.apache.spark.sql.functions.row_number().over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("n_chars"), col("doc_id"))).cast("long") - 1)
              .as("global_idx"))
          .count()
      }
      time(s"globalindex_bucketed_$i") { analytics.CorpusQueries.globalIndex(spark, sfDir).count() }
      time(s"cov_posexplode_$i") {
        // dim²-ish row expansion baseline: one row per (vector, i, j)
        emb.select(posexplode(col("embedding")).as(Seq("i", "x")), col("embedding"))
          .select(col("i"), col("x"), posexplode(col("embedding")).as(Seq("j", "y")))
          .filter(col("j") >= col("i"))
          .groupBy(col("i"), col("j"))
          .agg(sum(col("x").cast("double") * col("y").cast("double")).as("s2"))
          .count()
      }
      time(s"cov_vecsum_$i") { analytics.CorpusStats.embedCovariance(spark, sfDir).count() }
      time(s"pca_project_$i") { analytics.CorpusStats.pcaProject(spark, sfDir).count() }
      time(s"vocabentropy_$i") { analytics.CorpusStats.vocabEntropy(spark, sfDir).count() }
      time(s"sourcekl_$i") { analytics.CorpusStats.sourceKl(spark, sfDir).count() }
      time(s"semdecont_$i") { analytics.CorpusStats.semanticDecontaminate(spark, sfDir).count() }
      // round-6 third-session wave: legacy window shapes vs the
      // registered bounded-aggregate / bucket-decomposed plans
      time(s"zipf_window_$i") { zipfWindow(spark, sfDir).count() }
      time(s"zipf_topk_$i") { analytics.CorpusDiversity.zipfFit(spark, sfDir).count() }
      time(s"heaps_window_$i") { heapsWindow(spark, sfDir).count() }
      time(s"heaps_bucketed_$i") { analytics.CorpusDiversity.heapsFit(spark, sfDir).count() }
      time(s"proto_window_$i") { prototypesWindow(spark, sfDir).count() }
      time(s"proto_topk_$i") { analytics.ScaleQueries.clusterPrototypes(spark, sfDir).count() }
      time(s"ngramdiv_$i") { analytics.CorpusDiversity.ngramDiversity(spark, sfDir).count() }
      time(s"fertility_$i") { analytics.CorpusDiversity.tokenFertility(spark, sfDir).count() }
      time(s"jlproject_$i") { analytics.CorpusDiversity.jlProject(spark, sfDir).count() }
      time(s"kcenter_$i") { analytics.CorpusDiversity.coresetKcenter(spark, sfDir).count() }
      // round-6 fourth-session wave (audit tier): corpus-wide-window /
      // instance-level-join baselines vs the registered bounded plans
      time(s"auc_window_$i") { aucWindow(spark, sfDir).count() }
      time(s"auc_bounded_$i") { analytics.CorpusAudit.classifierAuc(spark, sfDir).count() }
      time(s"leakage_instjoin_$i") { leakageInstJoin(spark, sfDir).count() }
      time(s"leakage_collapsed_$i") { analytics.CorpusAudit.splitLeakageQ(spark, sfDir).count() }
      time(s"boiler_$i") { analytics.CorpusAudit.boilerplateQ(spark, sfDir).count() }
      time(s"funnel_$i") { analytics.CorpusAudit.pipelineFunnel(spark, sfDir).count() }
      time(s"mojibake_$i") { analytics.CorpusAudit.mojibake(spark, sfDir).count() }
      time(s"sweep_$i") { analytics.CorpusAudit.dupThresholdSweep(spark, sfDir).count() }
      time(s"znorm_$i") { analytics.CorpusAudit.scoreZnorm(spark, sfDir).count() }
      time(s"datacard_$i") { analytics.CorpusAudit.dataCard(spark, sfDir).count() }
      time(s"cohort_$i") { analytics.Events.cohortRetention(spark, sfDir).count() }
      time(s"clusterbal_$i") { analytics.ScaleQueries.clusterBalance(spark, sfDir).count() }
      time(s"retmetrics_$i") { analytics.ScaleQueries.retrievalMetrics(spark, sfDir).count() }
      time(s"manifest_$i") { analytics.ScaleQueries.shardManifest(spark, sfDir).count() }
      time(s"rfm_$i") { analytics.Relational.rfmSegments(spark, sfDir).count() }
      time(s"basket_grouped_$i") { analytics.Relational.basketPairs(spark, sfDir).count() }
      time(s"basket_selfjoin_$i") { basketSelfJoin(spark, sfDir).count() }
      time(s"transitions_$i") { analytics.Events.eventTransitions(spark, sfDir).count() }
      time(s"dailyanomaly_$i") { analytics.Events.dailyAnomaly(spark, sfDir).count() }
      time(s"pareto_$i") { analytics.Relational.revenuePareto(spark, sfDir).count() }
      time(s"pqdistortion_$i") { analytics.ScaleQueries.pqDistortion(spark, sfDir).count() }
      // round-6 fifth-session wave: naive baselines vs registered plans
      time(s"trigram_naive_$i") { trigramNaive(spark, sfDir).count() }
      time(s"trigram_paned_$i") { analytics.Events.journeyTrigrams(spark, sfDir).count() }
      time(s"wau_rangejoin_$i") { wauRangeJoin(spark, sfDir).count() }
      time(s"wau_fanout_$i") { analytics.Lifecycle.rollingActive(spark, sfDir).count() }
      time(s"latq_window_$i") { latencyWindow(spark, sfDir).count() }
      time(s"latq_hist_$i") { analytics.Relational.latencyQuantiles(spark, sfDir).count() }
      time(s"attrib_asofsimple_$i") { attributionAsofSimple(spark, sfDir).count() }
      time(s"attrib_bucketed_$i") { analytics.Attribution.lastTouch(spark, sfDir).count() }
      time(s"gini_window_$i") { giniWindow(spark, sfDir).count() }
      time(s"gini_banded_$i") { analytics.Relational.revenueGini(spark, sfDir).count() }
      time(s"snapdiff_join_$i") { snapshotJoin(spark, sfDir).count() }
      time(s"snapdiff_condagg_$i") { analytics.Audit.snapshotDiff(spark, sfDir).count() }
      time(s"pagerank_$i") { analytics.ScaleQueries.pagerank(spark, sfDir).count() }
      time(s"attrib_linear_$i") { analytics.Attribution.linearTouch(spark, sfDir).count() }
      time(s"madq_$i") { analytics.RobustStats.valueMad(spark, sfDir).count() }
      time(s"seasonal_$i") { analytics.Relational.seasonalDecompose(spark, sfDir).count() }
      time(s"benford_$i") { analytics.Audit.benford(spark, sfDir).count() }
      // round-7 sf10 stress arms: the fixed-k IVF failure mode vs the
      // raised-cells / salted scale knobs, and 7-chunk vs 8×8-pair
      // simhash banding (opt-in via the name filter — the *_fixed arms
      // are the measured multi-minute regimes)
      time(s"semneardup_fixed_$i") { analytics.ScaleQueries.semanticNearDup(spark, sfDir).count() }
      time(s"semneardup_k64s8_$i") {
        analytics.ScaleQueries.semanticNearDup(spark, sfDir, k = 64, salt = 8).count() }
      // r10 salt-by-parallelism registration: the literal-32 arm vs the
      // derived salt (equal on a 32-core host; the A/B exists so any
      // host where they differ has a recorded comparison)
      time(s"semneardup_salt32_$i") {
        analytics.ScaleQueries.semanticNearDup(spark, sfDir, salt = 32).count() }
      time(s"semneardup_psalt_$i") {
        analytics.ScaleQueries.semanticNearDup(spark, sfDir,
          salt = analytics.ScaleQueries.parallelismSalt(spark)).count() }
      time(s"knngraph_cells8_$i") { analytics.ScaleQueries.knnGraph(spark, sfDir).count() }
      time(s"knngraph_cells64_$i") {
        analytics.ScaleQueries.knnGraph(spark, sfDir, cells = 64).count() }
      time(s"simhash_7chunk_$i") { simhashPairs7chunk(spark, sfDir).count() }
      time(s"simhash_8x8pair_$i") { analytics.ScaleQueries.simhashPairs(spark, sfDir).count() }
      time(s"minhash_pairs_$i") { analytics.ScaleQueries.minhashPairs(spark, sfDir).count() }
      // round-7 sixth-session wave: corpus-wide-window baselines vs the
      // registered bounded-histogram decompositions, plus the new graph
      // and collocation plans for trend tracking
      time(s"spearman_window_$i") { spearmanWindowed(spark, sfDir).count() }
      time(s"spearman_hist_$i") { analytics.CorpusAudit.spearmanQuality(spark, sfDir).count() }
      time(s"ks_window_$i") { ksWindowed(spark, sfDir).count() }
      time(s"ks_hist_$i") { analytics.CorpusStats.ksDrift(spark, sfDir).count() }
      time(s"triangle_$i") { analytics.ScaleQueries.triangleCount(spark, sfDir).count() }
      time(s"coherence_$i") { analytics.ScaleQueries.graphCoherence(spark, sfDir).count() }
      time(s"pmi_$i") { analytics.ScaleQueries.pmiCollocations(spark, sfDir).count() }
      // r10 shared kNN-graph artifact (VERDICT r9 #2): build the edge
      // relation ONCE, then every graph consumer runs Θ(edges) against
      // the parquet. Compare gshared_* against the composed arms above
      // (pagerank/triangle/coherence each pay the full cell-join floor).
      time(s"gshared_build_$i") {
        analytics.ScaleQueries.knnGraphBuild(spark, sfDir, "/tmp/knn_edges_ab").count() }
      time(s"gshared_pagerank_$i") {
        analytics.ScaleQueries.pagerankOn(Tables.embeddings(spark, sfDir),
          spark.read.parquet("/tmp/knn_edges_ab")
            .select(col("vec_id").as("src"), col("nbr_id").as("dst"))).count() }
      time(s"gshared_triangle_$i") {
        analytics.ScaleQueries.triangleStatsOf(
          spark.read.parquet("/tmp/knn_edges_ab")
            .select(col("vec_id").as("a"), col("nbr_id").as("b"))).count() }
      time(s"gshared_coherence_$i") {
        analytics.ScaleQueries.graphCoherenceOn(Tables.embeddings(spark, sfDir),
          spark.read.parquet("/tmp/knn_edges_ab")
            .select(col("vec_id"), col("nbr_id"))).count() }
      // r10 fused session ids: the prevTime∘runningSum composition paid
      // the events relation four times (two window sorts, two carry
      // aggregates, two joins); the fused form shuffles+sorts it once
      // behind a checkpoint. Same output by SlidingAggSpec equality.
      time(s"sessentry_legacy_$i") { sessionEntryLegacy(spark, sfDir).count() }
      time(s"sessentry_fused_$i") {
        analytics.Events.sessionEntryConversion(spark, sfDir).count() }
      // r11 DBSCAN labels artifact (VERDICT r10 #2): build the per-point
      // label parquet ONCE, then the stats rollup is Θ(labels) — compare
      // dbstats_artifact against the composed arm that re-runs the whole
      // quotient + neighbor-join + CC pipeline.
      time(s"dbscan_build_$i") {
        analytics.Density.dbscanBuild(spark, sfDir, "/tmp/dbscan_labels_ab").count() }
      time(s"dbstats_artifact_$i") {
        analytics.Density.dbscanStatsOn(
          spark.read.parquet("/tmp/dbscan_labels_ab")).count() }
      time(s"dbstats_composed_$i") {
        analytics.Density.dbscanStats(spark, sfDir).count() }
      // r11 preference game-graph artifact: the offers collapse is the
      // family's only corpus-sized work — build the pair graph ONCE,
      // then every consumer (BT, transitivity, win-rate CIs) runs
      // Θ(pairs) against the parquet. Compare *_artifact vs *_composed.
      time(s"pref_games_build_$i") {
        analytics.Preference.gamesBuild(spark, sfDir, "/tmp/pref_games_ab").count() }
      time(s"pref_bt_artifact_$i") {
        analytics.Preference.btRatingOf(
          spark.read.parquet("/tmp/pref_games_ab")).count() }
      time(s"pref_bt_composed_$i") {
        analytics.Preference.btRating(spark, sfDir).count() }
      time(s"pref_trans_artifact_$i") {
        analytics.Preference.transitivityOf(
          spark.read.parquet("/tmp/pref_games_ab")).count() }
      time(s"pref_winci_artifact_$i") {
        analytics.Preference.pairWinrateCiOf(
          spark.read.parquet("/tmp/pref_games_ab")).count() }
      // r12 linear-state exponential-smoothing folds (VERDICT r11 #5):
      // the `acc || array(...)` HOF fold (O(grid²) interpreted churn in
      // ArrayAggregate) vs the SeqFold Catalyst expression (O(grid)
      // Scala loop). Output bit-identical by ForecastSpec's pin.
      time(s"holt_hof_$i") { analytics.Forecast.holtForecastHof(spark, sfDir).count() }
      time(s"holt_fold_$i") { analytics.Forecast.holtForecast(spark, sfDir).count() }
      time(s"hw_hof_$i") { analytics.Forecast.holtWintersHof(spark, sfDir).count() }
      time(s"hw_fold_$i") { analytics.Forecast.holtWinters(spark, sfDir).count() }
    }
    spark.stop()
  }

  /** Naive Spearman: corpus-wide midranks from row_number/avg windows
    * over the FULL scored relation — one task sorts the corpus twice.
    * The shape CorpusAudit.spearmanQuality's bounded value-histogram
    * decomposition exists to avoid.
    */
  private def spearmanWindowed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val scored = analytics.ScaleQueries.qualityClassify(docs)
      .select(col("doc_id"), col("prob"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    def midrank(v: String) =
      avg(row_number().over(Window.orderBy(col(v))))
        .over(Window.partitionBy(col(v)))
    scored.withColumn("rx", midrank("prob"))
      .withColumn("ry", midrank("n_chars"))
      .agg(corr(col("rx"), col("ry")).as("rho"))
  }

  /** Naive KS: row-level cumulative counts from a corpus-wide
    * single-partition range window (plus a per-source one) — the CDFs
    * CorpusStats.ksOf derives from the bounded value histogram instead.
    */
  private def ksWindowed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir).select(col("source"), col("n_chars"))
    val wAll = Window.orderBy(col("n_chars"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wSrc = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val bySrc = broadcast(d.groupBy("source").agg(count(lit(1)).as("ns")))
    val tot = broadcast(d.agg(count(lit(1)).as("n")))
    d.withColumn("call", count(lit(1)).over(wAll))
      .withColumn("cs", count(lit(1)).over(wSrc))
      .join(bySrc, "source").crossJoin(tot)
      .select(col("source"), col("ns"), col("n"),
        abs(col("cs") * (col("n") - col("ns")) -
          (col("call") - col("cs")) * col("ns")).as("num"))
      .groupBy(col("source"), col("ns"), col("n"))
      .agg(max(col("num")).as("m"))
      .select(col("source"), col("ns").as("n_docs"),
        when(col("ns") * (col("n") - col("ns")) =!= 0,
          Num.r(col("m").cast("double") /
            (col("ns") * (col("n") - col("ns"))).cast("double"), 6))
          .as("ks_len"))
  }

  /** Basket pairs via the corpus-wide self-join — the shape the grouped
    * per-basket expansion replaces (every (order, part) row joins every
    * co-row; at scale the join output is the same Σ C(basket, 2) but the
    * probe side re-shuffles the full relation instead of expanding
    * locally inside the already-grouped basket).
    */
  private def basketSelfJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = li.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("p2"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= analytics.Relational.BasketMinSupport)
  }

  /** Legacy AUC: rank every DOCUMENT with a corpus-wide single-partition
    * window (the textbook rank-sum formulation) — the shape the bounded
    * distinct-prob relation replaces. Baseline only: ties get arbitrary
    * rank order here, so this arm is a timing shape, not an oracle.
    */
  private def aucWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val scored = analytics.ScaleQueries.qualityClassify(docs)
      .select(col("doc_id"), col("prob"))
      .join(analytics.CorpusQueries.gopherFlags(docs)
        .select(col("doc_id"), col("keep")), "doc_id")
    scored
      .withColumn("rn", row_number().over(
        Window.orderBy(col("prob"), col("doc_id"))))
      .agg(
        sum(when(col("keep"), col("rn")).otherwise(0L)).as("rank_sum"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_neg"))
      .select(Num.r((col("rank_sum") - col("n_pos") * (col("n_pos") + 1) / 2)
        .cast("double") / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Legacy split-leakage spread: per-hash countDistinct over the raw
    * instance relation and a join back at instance granularity — the
    * pre-collapse shape (every paragraph instance crosses the spread
    * join instead of one row per (hash, split)).
    */
  private def leakageInstJoin(spark: SparkSession, dir: String): DataFrame = {
    import analytics.CorpusQueries.ParaSize
    val bucket = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 100
    val splitCol = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    val inst = Tables.documents(spark, dir)
      .select(splitCol.as("split"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("split"), explode(expr(
        s"transform(sequence(1, size(w), $ParaSize), s -> slice(w, s, $ParaSize))"))
        .as("p"))
      .select(col("split"),
        conv(substring(md5(array_join(col("p"), " ")), 1, 13), 16, 10)
          .cast("long").as("ph"))
    val spread = inst.groupBy(col("ph"))
      .agg(countDistinct(col("split")).as("n_splits"))
    inst.join(spread, "ph")
      .groupBy(col("split")).agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("n_leaked_paras"))
  }

  /** Legacy top-K for the Zipf fit: a row_number window over the whole
    * per-source vocabulary — the per-source sort the bounded TopKAgg
    * heap avoids.
    */
  private def zipfWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, dir)
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .select(col("source"), xxhash64(col("term")).as("th"))
      .groupBy(col("source"), col("th")).agg(count(lit(1)).as("c"))
    val top = tf
      .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("th").asc)))
      .filter(col("rank") <= analytics.CorpusDiversity.ZipfTopK)
      .select(col("source"), col("rank").cast("double").as("rank"),
        col("c").cast("double").as("c"))
    val s = top.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      Num.r(sum(log(col("rank"))), 9).as("sx"),
      Num.r(sum(log(col("c"))), 9).as("sy"),
      Num.r(sum(log(col("rank")) * log(col("c"))), 9).as("sxy"),
      Num.r(sum(log(col("rank")) * log(col("rank"))), 9).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    s.select(col("source"), col("n").as("n_terms"), Num.r(slope, 6).as("slope"))
  }

  /** Legacy cumulative sums for the Heaps fit: one per-source window
    * over every document — a single task holds a whole source's history
    * (the shape the bucket decomposition replaces).
    */
  private def heapsWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val tc = docs.select(col("source"), col("doc_id"),
      graft.functions.TextAnalysis.wordCount(col("text")).cast("long").as("t"))
    val nw = docs
      .select(col("source"), col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .select(col("source"), xxhash64(col("term")).as("th"), col("doc_id"))
      .groupBy(col("source"), col("th")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("source"), col("doc_id")).agg(count(lit(1)).as("newt"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pts = tc.join(nw, Seq("source", "doc_id"), "left")
      .select(col("source"), sum(col("t")).over(w).as("n"),
        sum(coalesce(col("newt"), lit(0L))).over(w).as("v"))
      .filter(col("n") > 0 && col("v") > 0)
      .select(col("source"), log(col("n").cast("double")).as("x"),
        log(col("v").cast("double")).as("y"))
    pts.groupBy(col("source")).agg(
      count(lit(1)).as("n"), Num.r(sum(col("x") * col("y")), 9).as("sxy"))
  }

  /** Legacy prototype selection: row_number window over every cluster
    * member — the per-cluster sort the negated-score TopKAgg avoids.
    */
  private def prototypesWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val trained = graft.scale.KMeans.fit(emb, analytics.ScaleQueries.KmeansK, iters = 1)
    graft.scale.KMeans.assign(emb, trained)
      .select(col("cluster"), Num.r(col("dist2"), 6).as("d"), col("vec_id"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("cluster"))
        .orderBy(col("d").asc, col("vec_id").asc)))
      .filter(col("rank") <= analytics.ScaleQueries.ProtoK)
  }

  /** Legacy keeper election for paragraph dedup: a row_number window
    * over every paragraph instance per hash — the per-hash sort the
    * registered grouped-min-struct plan avoids.
    */
  private def paragraphDedupWindow(spark: SparkSession, dir: String): DataFrame = {
    import analytics.CorpusQueries.ParaSize
    val inst = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), col("source"), posexplode(expr(
        s"transform(sequence(1, size(w), $ParaSize), s -> slice(w, s, $ParaSize))"))
        .as(Seq("para_idx", "p")))
      .select(col("doc_id"), col("source"), col("para_idx").cast("int").as("para_idx"),
        size(col("p")).as("n_tokens"),
        conv(substring(md5(array_join(col("p"), " ")), 1, 13), 16, 10)
          .cast("long").as("ph"))
    val keeper = inst.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ph"))
          .orderBy(col("doc_id"), col("para_idx"))))
    keeper
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("rn") === 1, 0L).otherwise(1L)).as("n_removed"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(when(col("rn") === 1, col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .withColumn("pct_tokens_removed",
        Num.r((col("tokens_total") - col("tokens_kept")).cast("double") /
          col("tokens_total"), 6))
  }
}
