package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Archive

/** Physical-plan quality gates — the 100 TB design checks (SURVEY §4):
  * filters reach the parquet scan, projections prune columns, small dims
  * broadcast, top-k avoids global sort, archive reads prune partitions.
  * These assert on explain output so a regression in plan shape fails CI,
  * not just a benchmark.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("Q1 filter is pushed to the parquet scan and columns are pruned") {
    val p = plan(analytics.Relational.pricingSummary(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    assert(p.contains("ReadSchema"))
    // only the referenced columns are read, not the 11-column table
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"))
    // codegen ids only materialize in the executed (post-AQE) plan
    val df = analytics.Relational.pricingSummary(spark, sf)
    df.collect()
    // "*(n)" operator prefix marks a WholeStageCodegen stage
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("revenue-by-nation broadcasts every dimension side") {
    val p = plan(analytics.Relational.revenueByNation(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected >=3 broadcast joins:\n$p")
  }

  test("top-k executes as TakeOrderedAndProject, not a global sort") {
    val p = plan(analytics.Relational.topCustomers(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("grouped aggregates use partial (map-side) aggregation") {
    val p = plan(analytics.Relational.sessionKpis(spark, sf))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("driver entry point returns rows (smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every registered oracle has a matching query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("cosine top-k broadcasts the query vector and avoids a global sort") {
    val p = plan(analytics.ScaleQueries.cosineTopK(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("funnel_ref pushes the 7-day window filter to the parquet scan") {
    val p = plan(analytics.Events.funnelRef(spark, sf))
    // the ts >= asOf - 7d predicate must reach PushedFilters, not sit in
    // a post-scan Filter — at 100 TB this is the difference between
    // reading a week and reading the archive
    assert(p.contains("PushedFilters") && p.contains("ts"), p)
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("IsNotNull") || pushed.contains("GreaterThanOrEqual"), pushed)
  }

  // each physical node appears once in the formatted tree as "Name (id)"
  private def nodeCount(p: String, name: String): Int =
    (name + " \\(\\d+\\)").r.findAllIn(p).size

  test("corpus curation is two shuffles: digest argmin + final aggregate") {
    val p = plan(analytics.ScaleQueries.corpusCuration(spark, sf))
    assert(nodeCount(p, "Exchange") <= 2,
      s"curation pipeline grew extra shuffles:\n$p")
    // the canonical step is a grouped argmin with map-side partial
    // aggregation, not a row_number window (no per-partition sort)
    assert(!p.contains("Window"), s"curation regressed to a window:\n$p")
    assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("quality classifier runs entirely in the scan stage: zero shuffles") {
    val p = plan(analytics.ScaleQueries.qualityClassifier(spark, sf))
    assert(nodeCount(p, "Exchange") == 0, s"classifier inference should not shuffle:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("bpe pairs shuffle word types then pair counts; top pairs without global sort") {
    val p = plan(analytics.ScaleQueries.bpePairs(spark, sf))
    assert(nodeCount(p, "Exchange") <= 2, s"bpe pair counting grew extra shuffles:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top pairs should avoid a global sort:\n$p")
  }

  test("bpe trainer: one corpus shuffle to word types, one bounded pair aggregate") {
    val wf = graft.scale.BpeTrain.wordTypes(Tables.documents(spark, sf))
    val p = plan(graft.scale.BpeTrain.pairCounts(wf))
    // corpus → word types is the ONLY corpus-wide exchange; the pair
    // aggregate shuffles the (bounded) pair vocabulary
    assert(nodeCount(p, "Exchange") <= 2, s"bpe iteration grew extra shuffles:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("delta dedup gates with a bloom probe and broadcasts the survivors") {
    val df = analytics.ScaleQueries.deltaDedup(spark, sf)
    val p = plan(df)
    assert(p.contains("might_contain"), s"bloom gate missing from delta plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"survivor verification should broadcast:\n$p")
  }

  test("hard negatives broadcast the query set and aggregate with the bounded heap") {
    val p = plan(analytics.ScaleQueries.hardNegatives(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("Window"), s"hard negatives should not window:\n$p")
  }

  test("corpus sampling filters before any shuffle (map-side mixing)") {
    val p = plan(analytics.ScaleQueries.corpusSample(spark, sf))
    // the bucket filter is a scan-stage Filter; the only exchange is the
    // final per-source aggregate
    assert(nodeCount(p, "Exchange") <= 1, s"sampling should not shuffle docs:\n$p")
  }

  test("exact jaccard carries set sizes: no joins, three shuffles total") {
    val p = plan(analytics.ScaleQueries.jaccardPairs(spark, sf))
    // sizes ride the inverted-index rows, so the plan is aggregate-only:
    // (shingle, doc) shuffle → pair-count shuffle — a join appearing here
    // means the second corpus-shingling scan + size joins regressed back
    assert(!p.contains("Join"), s"jaccard pairs reintroduced a join:\n$p")
    assert(nodeCount(p, "Exchange") <= 3, s"jaccard grew extra shuffles:\n$p")
  }

  test("winnow fingerprint overlap is a pure aggregate chain (no joins)") {
    val p = plan(analytics.ScaleQueries.winnowPairs(spark, sf))
    assert(!p.contains("Join"), s"winnow pairs should not join:\n$p")
    assert(nodeCount(p, "Exchange") <= 3, s"winnow grew extra shuffles:\n$p")
  }

  test("IVF-PQ search plans as one filtered scan: no joins, top-k without sort") {
    val emb = Tables.embeddings(spark, sf)
    val model = graft.scale.IvfPq.fit(emb)
    val p = plan(graft.scale.IvfPq.search(emb, model, 1L, 10))
    // all model state is foldable literals, the cell probe is a scan
    // filter, and ADC is a projection — a Join or extra Exchange here
    // means the index stopped being a one-scan read
    assert(!p.contains("Join"), s"ivfpq search grew a join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"ivfpq lost bounded top-k:\n$p")
    assert(nodeCount(p, "Exchange") <= 1, s"ivfpq search grew shuffles:\n$p")
  }

  test("persisted IVF-PQ codes search prunes partitions on the cell column") {
    val emb = Tables.embeddings(spark, sf)
    val model = graft.scale.IvfPq.fit(emb)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_codes").toString
    graft.scale.IvfPq.writeCodes(emb, model, path)
    val codes = spark.read.parquet(path)
    val df = graft.scale.IvfPq.searchCodes(codes, emb, model, 1L, 10, nprobe = 2)
    val p = plan(df)
    // the probe filter must land on the PARTITION column of the codes
    // table — at corpus scale this is what makes a search read
    // ~nprobe/CoarseK of the index files instead of all of them
    assert(p.contains("PartitionFilters") &&
      p.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("cell")),
      s"cell probe did not become a partition filter:\n$p")
    assert(!p.contains("Join"), s"codes search grew a join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"codes search lost bounded top-k:\n$p")
    // and the probed search result matches the in-memory residual path
    val viaCodes = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaResid = graft.scale.IvfPq.search(emb, model, 1L, 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaCodes == viaResid, s"stored-codes ADC diverged from residual ADC")
  }

  test("as-of join plans no nested loop and a bounded shuffle count") {
    val p = plan(analytics.ScaleQueries.asofPurchase(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // markers + latest-per-bucket + carry window + local window, all on
    // key or (key, bucket) — anything beyond ~8 exchanges means a stage
    // stopped reusing the partitioning
    assert(nodeCount(p, "Exchange") <= 8, s"as-of grew extra shuffles:\n$p")
  }

  test("tfidf ranks through the bounded top-k aggregate, not a window sort") {
    val p = plan(analytics.ScaleQueries.tfidfTopTerms(spark, sf))
    assert(p.contains("ObjectHashAggregate"), s"expected TopKStrAgg:\n$p")
    assert(!p.contains("Window"), s"per-doc ranking must not window-sort:\n$p")
  }

  test("bm25 broadcasts stats and takes top-10 without a global sort") {
    val p = plan(analytics.ScaleQueries.bm25Search(spark, sf))
    assert(p.contains("BroadcastExchange"), s"corpus stats should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"limit should not global-sort:\n$p")
    // r12 one-pass design: the tokenize + xxhash64 term hashing happens
    // exactly once, inside the per-doc (dl, tf_k) aggregate behind an
    // eager checkpoint — the scoring plan must read that checkpoint, not
    // re-tokenize the corpus (the old tf/dl/qdf/stats composition
    // tokenized it four times; a parquet scan here would mean the
    // checkpoint barrier regressed)
    assert(p.contains("Scan ExistingRDD"), s"scoring should read the " +
      s"checkpointed per-doc relation:\n$p")
    assert(!p.contains("Scan parquet"), s"corpus must not be re-tokenized " +
      s"in the scoring plan:\n$p")
  }

  test("ngram top-k resolves winners through broadcast joins, no window sort") {
    val p = plan(analytics.ScaleQueries.ngramTopK(spark, sf))
    assert(!p.contains("Window"), s"ranking must stay in the bounded heap:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"kth-cut and winner-resolve joins should broadcast:\n$p")
    assert(p.contains("xxhash64"), s"count shuffle should key on hashed bigrams:\n$p")
  }

  test("lossy heavy hitters: sketch candidates and total broadcast; no extra shuffle") {
    val p = plan(analytics.ScaleQueries.heavyHittersLossy(spark, sf))
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      s"candidate set and total should broadcast:\n$p")
    // the single-row total rides a broadcast cross join (fine); only a
    // real cartesian materialization would be wrong
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ObjectHashAggregate"), s"expected MisraGriesAgg:\n$p")
  }

  test("decontamination broadcasts the eval side and works with an external eval table") {
    import spark.implicits._
    // a genuinely external eval table — NOT derived from the corpus
    val corpus = Tables.documents(spark, sf)
    val evalText = corpus.orderBy("doc_id").select("text").head().getString(0)
    val evalDocs = Seq((900001L, evalText), (900002L, "zz unseen benchmark prompt"))
      .toDF("doc_id", "text")
    val df = analytics.ScaleQueries.decontaminateAgainst(corpus, evalDocs)
    val p = plan(df)
    assert(p.contains("BroadcastExchange"), s"eval shingles should broadcast:\n$p")
    // docs sharing the eval doc's shingles are flagged; nothing matches noise
    assert(df.count() >= 1)
  }

  test("training mix broadcasts the contamination side") {
    val p = plan(analytics.ScaleQueries.trainingMix(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"contamination anti-join should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("knn graph: cell-restricted equi-join + bounded top-k, no window, no cartesian") {
    // bounded-regime path (r13): the pair stage is the broadcast
    // cell-table kernel materialized behind a checkpoint — the returned
    // plan must be the checkpoint scan, with no window/cartesian ever
    val p = plan(analytics.ScaleQueries.knnGraph(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), s"knn graph regressed to a window rank:\n$p")
    assert(p.contains("ExistingRDD"), s"expected the checkpointed kernel:\n$p")
    // fallback path (past the cell-table budget): the per-cell compare
    // must stay a streaming equi-join on cluster ranked by the bounded
    // TopKAgg, not an all-pairs product or a per-vector window sort
    spark.conf.set("spark.graft.knn.cellTableRows", "0")
    val pj =
      try plan(analytics.ScaleQueries.knnGraph(spark, sf))
      finally spark.conf.unset("spark.graft.knn.cellTableRows")
    assert(!pj.contains("CartesianProduct"), pj)
    assert(!pj.contains("Window"), s"knn fallback regressed to a window rank:\n$pj")
    assert(pj.contains("topk"), s"expected the bounded TopKAgg:\n$pj")
  }

  test("split assignment is map-side: one accounting shuffle only") {
    val p = plan(analytics.ScaleQueries.splitAssign(spark, sf))
    assert(nodeCount(p, "Exchange") <= 1, s"split assignment grew shuffles:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("lr training step: gradient is one scan-stage aggregate, no joins") {
    // the per-step plan the trainer builds: features + sigmoid are
    // scan-stage expressions feeding a single partial/final aggregate
    val t = col("text")
    val f = Tables.documents(spark, sf).select(
      (log(lit(1.0) + col("n_chars")) / lit(10.0)).as("x1"),
      when(col("doc_id") % 3 === 0, 1.0).otherwise(0.0).as("y"))
    val g = f.agg(Num.savg(sum(col("x1") - col("y")), count(lit(1)), 6, 9).as("gb"))
    val p = plan(g)
    assert(!p.contains("Join"), p)
    assert(nodeCount(p, "Exchange") <= 1, s"gradient aggregate grew shuffles:\n$p")
    assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("training shards: three shuffles, no cartesian, partial aggregation") {
    val p = plan(analytics.ScaleQueries.trainingShards(spark, sf))
    // digest argmin + pack window on (split, source) + final aggregate
    assert(nodeCount(p, "Exchange") <= 3, s"shard pipeline grew shuffles:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("quality sample ranks through the bounded top-k aggregate, not a window") {
    val p = plan(analytics.ScaleQueries.qualitySample(spark, sf))
    assert(!p.contains("Window"), s"quality sampling regressed to a window rank:\n$p")
    assert(p.contains("topk"), s"expected the bounded TopKAgg:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("knn delta broadcasts the increment against one history scan") {
    // bounded-regime path (r13): the probe stage is the broadcast
    // cell-table kernel materialized behind a checkpoint — the returned
    // plan must be the checkpoint scan, with no window/cartesian ever
    val p = plan(analytics.ScaleQueries.knnDelta(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), s"ranking must be the bounded TopKAgg:\n$p")
    assert(p.contains("ExistingRDD"), s"expected the checkpointed kernel:\n$p")
    // fallback path (past the cell-table budget): the delta must ride as
    // a broadcast against one streaming history scan, ranked by TopKAgg
    spark.conf.set("spark.graft.knn.cellTableRows", "0")
    val pj =
      try plan(analytics.ScaleQueries.knnDelta(spark, sf))
      finally spark.conf.unset("spark.graft.knn.cellTableRows")
    assert(pj.contains("BroadcastHashJoin"), s"delta side should broadcast:\n$pj")
    assert(!pj.contains("CartesianProduct"), pj)
    assert(!pj.contains("Window"), s"ranking must be the bounded TopKAgg:\n$pj")
    assert(pj.contains("topk"), s"expected the bounded TopKAgg:\n$pj")
  }

  test("bigram logprob shuffles hashed longs only (no string shuffle keys)") {
    val p = plan(analytics.ScaleQueries.bigramLogprob(spark, sf))
    // every Exchange partitions on the hashed columns (ph/gh) or doc_id,
    // never on a raw bigram string (formatted explain lists partitioning
    // in the node's Arguments line)
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"no hash exchanges found:\n$p")
    assert(exchanges.forall(l =>
      l.contains("ph#") || l.contains("gh#") || l.contains("doc_id#")),
      s"unexpected shuffle keys:\n${exchanges.mkString("\n")}")
  }

  test("snapshot diff computes both snapshots in one scan and one shuffle") {
    val p = plan(analytics.Audit.snapshotDiff(spark, sf))
    assert(!p.contains("Join"), s"CDC diff must not join two snapshots:\n$p")
    assert(nodeCount(p, "Exchange") <= 1, s"snapshot diff grew extra shuffles:\n$p")
    // exactly one orders scan feeds both conditional snapshots (formatted
    // explain prints one Location line per scan node)
    val scans = p.linesIterator.count(_.contains("Location: InMemoryFileIndex"))
    assert(scans == 1, s"expected one scan, saw $scans:\n$p")
  }

  test("integrity audit rides two real joins; the rule unpivot is a 1x1 cross") {
    val p = plan(analytics.Audit.integrityAudit(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // lineitem is scanned once (the full-outer join carries all its rules)
    val scans = p.linesIterator.count(l =>
      l.contains("Location: InMemoryFileIndex") && l.contains("lineitem.parquet"))
    assert(scans == 1, s"lineitem should scan once, saw $scans:\n$p")
  }

  test("linear attribution: bounded equi-join fan-out, no nested loop") {
    val p = plan(analytics.Attribution.linearTouch(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join regressed to a nested loop:\n$p")
  }

  test("recency engagement is one aggregate over one scan — no window, no join") {
    val p = plan(analytics.Attribution.recencyEngagement(spark, sf))
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must avoid a global sort:\n$p")
  }

  test("revenue trend broadcasts the nation dimension") {
    val p = plan(analytics.Attribution.revenueTrend(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"nation should broadcast:\n$p")
  }

  test("latency quantiles: the histogram is the only fact shuffle, no inner ranking pass") {
    val p = plan(analytics.Relational.latencyQuantiles(spark, sf))
    // one Window total (the cumulative over the bounded histogram) and no
    // row_number re-rank of fact rows
    assert(nodeCount(p, "Window") <= 2, s"expected bounded-relation windows only:\n$p")
    val scans = p.linesIterator.count(l =>
      l.contains("Location: InMemoryFileIndex") && l.contains("lineitem.parquet"))
    assert(scans == 1, s"lineitem should scan once, saw $scans:\n$p")
  }

  test("cube aggregate is one fact shuffle through Expand") {
    val p = plan(analytics.Relational.cubeOrders(spark, sf))
    assert(p.contains("Expand"), s"cube should plan through Expand:\n$p")
    assert(!p.contains("Union"), s"cube must not recompute per grouping set:\n$p")
  }

  test("gini ranks within bands — no corpus-wide unpartitioned sort window") {
    val p = plan(analytics.Relational.revenueGini(spark, sf))
    // every Window partitions on n_name(+band); none is global
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty)
    assert(specs.forall(_.contains("n_name#")), s"global window leaked into gini:\n$p")
  }

  test("benford digit derivation is one scan and a 9-row margin window") {
    val p = plan(analytics.Audit.benford(spark, sf))
    assert(!p.contains("Join"), p)
    val scans = p.linesIterator.count(_.contains("Location: InMemoryFileIndex"))
    assert(scans == 1, s"expected one orders scan:\n$p")
  }

  test("archive layout prunes partitions on day/topic reads") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_archive").toString
    Archive.writeArchive(Tables.events(spark, sf), tmp)
    val day = Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd")).head().getString(0)
    val df = Archive.readDay(spark, tmp, day, "frontend.user.interaction")
    val p = plan(df)
    assert(p.contains("PartitionFilters") && p.contains("dt"))
    assert(df.count() > 0)
    // pruned read only touches one dt/topic slice
    val full = spark.read.parquet(tmp)
    assert(df.count() < full.count())
  }

  test("purchase reach assembles from checkpointed relations — zero events rescans") {
    // trans (≤ |types|² rows) and direct (≤ |types| rows) are
    // localCheckpointed; the r1/r2/r3 step chain and the final 3-way
    // join reference them up to ~15× logically, so the final plan must
    // contain NO events.parquet scan (the one scan ran inside the
    // checkpoint build) — only ExistingRDD reads of the bounded state.
    val p = plan(analytics.Events.purchaseReach(spark, sf))
    val eventsScans = p.linesIterator.count(l =>
      l.contains("Location: InMemoryFileIndex") && l.contains("events"))
    assert(eventsScans == 0,
      s"purchase reach re-derives the transition matrix from raw events:\n$p")
    assert(p.contains("ExistingRDD"), s"expected checkpointed inputs:\n$p")
  }

  test("pmi collocations evaluate the gram-count shuffle once (persisted)") {
    // scored (min-count-pruned gram vocab) has two consumers: the
    // kth-score aggregate and the candidate filter. Unpersisted, each
    // re-runs the full corpus bigram shuffle; the persist makes both
    // read the InMemoryRelation, leaving exactly one documents scan in
    // the final plan (the deliberate string-recovery pass).
    val (scored, out) = analytics.ScaleQueries.pmiPlan(spark, sf)
    try {
      // withCachedData substitutes the persisted subtree: both scored
      // consumers must resolve to InMemoryRelation, and the only
      // remaining documents read is the string-recovery scan.
      val lp = out.queryExecution.withCachedData
      val inMem = lp.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      assert(inMem.size >= 2,
        s"scored gram relation is not read from cache by both consumers:\n$lp")
      // Specifically the documents scans (by path): a V2-migration that
      // stops producing LogicalRelation must FAIL here, not pass
      // vacuously with 0 collected relations.
      val docScans = lp.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if (l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains("documents"))
            case _ => false
          }) => l
      }
      assert(docScans.size == 1,
        s"pmi should read documents exactly once outside the cache, saw ${docScans.size}:\n$lp")
    } finally scored.unpersist()
  }

  test("knn-graph pair stage stays under HotSpot's JIT bytecode refusal") {
    // HotSpot never compiles a method past 8 000 bytecodes
    // (-XX:DontCompileHugeMethods): past the cliff the whole fused stage
    // runs INTERPRETED, ~50× slower — the r7 sf10 stress caught the
    // k-means assign composed as array_min over k literal-centroid
    // structs pushing the knn-graph stage to 47 KB of bytecode (23
    // core-hours, killed). NearestCentroid/MatVecDot keep generated code
    // O(1) in k; this pin fails if a future edit reintroduces
    // expression-count-scaling codegen into the scan/join stages. The
    // raised cells value is the SCALE configuration — code size must not
    // grow with it.
    import org.apache.spark.sql.execution.debug._
    for (cells <- Seq(8, 64)) {
      val df = analytics.ScaleQueries.knnGraph(spark, sf, cells = cells)
      df.collect() // materialize AQE stages so codegen subtrees exist
      val stats = codegenStringSeq(df.queryExecution.executedPlan)
      assert(stats.nonEmpty, "no codegen subtrees found")
      val worst = stats.map(_._3.maxMethodCodeSize).max
      assert(worst < 8000,
        s"cells=$cells: generated method of $worst bytecodes crosses the " +
          s"JIT compile refusal (8000) — the stage would run interpreted")
    }
  }

  test("JL sketch scoring stage stays under the JIT bytecode refusal") {
    import org.apache.spark.sql.execution.debug._
    val df = analytics.CorpusDiversity.annJl(spark, sf)
    df.collect()
    val stats = codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty)
    val worst = stats.map(_._3.maxMethodCodeSize).max
    assert(worst < 8000, s"annJl generated method of $worst bytecodes")
  }

  test("expression-heavy query family stays under the JIT bytecode refusal") {
    // Bulk sweep of every registered query that embeds driver-held
    // matrices/codebooks/literal tables in scan-stage expressions — the
    // family where generated-code size can silently scale with a model
    // constant. Each query executes at sf0.001 and every whole-stage
    // codegen method in its executed (post-AQE) plan must stay JITable.
    import org.apache.spark.sql.execution.debug._
    val heavy = Seq(
      "q_kmeans_assign", "q_semantic_neardup", "q_knn_graph", "q_knn_delta",
      "q_pq_codes", "q_ivfpq_topk", "q_ivfpq_probed", "q_pq_distortion",
      "q_ann_lsh", "q_ann_jl", "q_ann_recall", "q_jl_project",
      "q_retrieval_metrics", "q_hybrid_search", "q_cluster_prototypes",
      "q_embed_neardup", "q_cosine_topk", "q_coreset_kcenter",
      // round-7 sixth-session wave: HOF folds (7-slot seasonal state),
      // graph mean-aggregation, the unrolled 8-step absorption plan, and
      // the rank/histogram decompositions
      "q_holt_winters", "q_graph_coherence", "q_attribution_markov",
      "q_pmi_collocations", "q_spearman_quality", "q_triangle_count")
    val registry = SparkEntry.queries
    val present = heavy.filter(registry.contains)
    assert(present.size >= 12, s"sweep list drifted from the registry: $present")
    present.foreach { name =>
      val df = registry(name)(spark, sf)
      df.collect()
      val stats = codegenStringSeq(df.queryExecution.executedPlan)
      val worst = if (stats.isEmpty) 0 else stats.map(_._3.maxMethodCodeSize).max
      assert(worst < 8000,
        s"$name: generated method of $worst bytecodes crosses the JIT " +
          "compile refusal — the stage would run interpreted at scale")
    }
  }
}
