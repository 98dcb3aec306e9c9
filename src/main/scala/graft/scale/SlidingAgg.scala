package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window aggregation at scale ("overlapping panes").
  *
  * A plain `RANGE BETWEEN w PRECEDING` window partitioned by key sorts
  * each key's FULL history in one task — with a low-cardinality key that
  * is the whole corpus through a handful of tasks. Bucketing time into
  * `window`-wide panes and replicating every row once as read-only
  * context into the NEXT pane makes each (key, pane) self-contained for
  * any trailing frame of length <= pane width: a row's frame reaches at
  * most one pane back, and those rows are present as its pane's context
  * copies. Max task = two panes of one key; total row fan-out exactly 2×.
  *
  * Context rows contribute to other rows' frames but are dropped from
  * the output (their own frames would be truncated).
  */
object SlidingAgg {

  /** Trailing count + sum per row, DuckDB-comparable row set. */
  def trailingCountSum(df: DataFrame, keys: Seq[String], time: Column,
      value: Column, windowMicros: Long,
      outCount: String, outSum: String): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__v", value)
      .withColumn("__b", floor(col("__us") / lit(windowMicros.toDouble)).cast("long"))
    val ctx = base.withColumn("__b", col("__b") + 1).withColumn("__ctx", lit(1))
    val all = base.withColumn("__ctx", lit(0)).unionByName(ctx)
    val w = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__us")).rangeBetween(-windowMicros, 0)
    all
      .withColumn(outCount, count(lit(1)).over(w))
      .withColumn(outSum, sum(col("__v")).over(w))
      .filter(col("__ctx") === 0)
      .drop("__us", "__v", "__b", "__ctx")
  }

  /** Inter-event gap statistics per key, decomposed so no task sorts one
    * key's full history: gaps WITHIN a (key, pane) come from a pane-local
    * lag window; gaps ACROSS panes are the next pane's first timestamp
    * minus this pane's last, computed on the tiny one-row-per-(key, pane)
    * relation (empty panes simply never appear — the lag over present
    * panes bridges them). Everything stays integer µs until the caller
    * divides, so there is no fp drift to snap.
    *
    * Returns per key: n_gaps, sum_gap_us, max_gap_us (gaps between
    * consecutive events in time order; keys with one event drop out).
    */
  def gapStats(df: DataFrame, keys: Seq[String], time: Column,
      paneMicros: Long): DataFrame = {
    val keyCols = keys.map(col)
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val w1 = Window.partitionBy((keys :+ "__b").map(col): _*).orderBy(col("__us"))
    val intra = base
      .withColumn("__g", col("__us") - lag(col("__us"), 1).over(w1))
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(count(col("__g")).as("n_intra"),
        coalesce(sum(col("__g")), lit(0L)).as("s_intra"),
        max(col("__g")).as("m_intra"),
        min(col("__us")).as("lo"), max(col("__us")).as("hi"))
    val w2 = Window.partitionBy(keyCols: _*).orderBy(col("__b"))
    intra
      .withColumn("__bg", col("lo") - lag(col("hi"), 1).over(w2))
      .groupBy(keyCols: _*)
      .agg((sum(col("n_intra")) + count(col("__bg"))).as("n_gaps"),
        (sum(col("s_intra")) + coalesce(sum(col("__bg")), lit(0L))).as("sum_gap_us"),
        greatest(max(col("m_intra")), max(col("__bg"))).as("max_gap_us"))
      .filter(col("n_gaps") > 0)
  }

  /** Consecutive-pair (transition) extraction per key with the same
    * two-level decomposition: pairs WITHIN a (key, pane) come from a
    * pane-local lag window; the pair ACROSS a pane boundary is (last
    * label of the previous present pane, first label of this pane),
    * computed on the tiny one-row-per-(key, pane) relation — so no task
    * ever sorts one key's full history. Ordering is (time µs, tiebreak)
    * end to end, making the chain — and therefore the pair multiset —
    * identical to the naive per-key lag formulation.
    *
    * Returns (prev, next, n): the global transition-pair counts summed
    * over keys.
    */
  def transitionCounts(df: DataFrame, keys: Seq[String], time: Column,
      label: Column, tiebreak: Column, paneMicros: Long): DataFrame = {
    val keyCols = keys.map(col)
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__e", label)
      .withColumn("__t", tiebreak)
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val w1 = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__us"), col("__t"))
    val lagged = base.withColumn("__p", lag(col("__e"), 1).over(w1))
    val intra = lagged.filter(col("__p").isNotNull)
      .groupBy(col("__p").as("prev"), col("__e").as("next"))
      .agg(count(lit(1)).as("n"))
    // one row per (key, pane): first/last label in (time, tiebreak) order
    val panes = base
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(min(struct(col("__us"), col("__t"), col("__e"))).as("fst"),
        max(struct(col("__us"), col("__t"), col("__e"))).as("lst"))
    val w2 = Window.partitionBy(keyCols: _*).orderBy(col("__b"))
    val boundary = panes
      .withColumn("__pl", lag(col("lst.__e"), 1).over(w2))
      .filter(col("__pl").isNotNull)
      .groupBy(col("__pl").as("prev"), col("fst.__e").as("next"))
      .agg(count(lit(1)).as("n"))
    intra.unionByName(boundary)
      .groupBy(col("prev"), col("next")).agg(sum(col("n")).as("n"))
  }

  /** Gap-threshold sessionization counts per key with the same two-level
    * decomposition: session breaks within a pane come from pane-local
    * lags, breaks at pane boundaries from the per-(key, pane) relation;
    * +1 for the key's first event. Equals the naive lag() formulation
    * exactly (integer µs comparisons throughout).
    */
  def sessionCounts(df: DataFrame, keys: Seq[String], time: Column,
      gapMicros: Long, paneMicros: Long): DataFrame = {
    val keyCols = keys.map(col)
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val w1 = Window.partitionBy((keys :+ "__b").map(col): _*).orderBy(col("__us"))
    val intra = base
      .withColumn("__g", col("__us") - lag(col("__us"), 1).over(w1))
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(sum(when(col("__g") > gapMicros, 1L).otherwise(0L)).as("n_breaks"),
        count(lit(1)).as("n_ev"),
        min(col("__us")).as("lo"), max(col("__us")).as("hi"))
    val w2 = Window.partitionBy(keyCols: _*).orderBy(col("__b"))
    intra
      .withColumn("__bg", col("lo") - lag(col("hi"), 1).over(w2))
      .groupBy(keyCols: _*)
      .agg((lit(1L) + sum(col("n_breaks")) +
        sum(when(col("__bg") > gapMicros, 1L).otherwise(0L))).as("n_sessions"),
        sum(col("n_ev")).as("n_events"))
  }

  /** Consecutive-TRIPLE (trigram / Markov-2 path) extraction per key with
    * the pane decomposition generalized one order up. Triples fully
    * inside a (key, pane) come from two pane-local lags. Triples that
    * cross a pane boundary only ever use elements within distance 2 of a
    * boundary — so they are reconstructed from an EDGE STREAM holding at
    * most the first two and last two elements of each pane (≤4 rows per
    * (key, pane), the same bounded-relation discipline as the pair
    * extractor's carry). Within the edge stream, two rows are truly
    * consecutive in the full stream iff they are pane-adjacent (same
    * pane, rank+1 — edge ranks are contiguous at pane edges) or
    * boundary-adjacent (last of its pane followed by rank 1 of the next
    * present pane; any intervening pane's elements would themselves be in
    * the edge stream). A triple passing both adjacency checks with its
    * three elements NOT all in one pane is exactly a cross-boundary
    * triple of the true stream — including chains through 1-event panes.
    *
    * Returns (e1, e2, e3, n): global triple counts summed over keys,
    * identical to the naive two-lag per-key window formulation.
    */
  def trigramCounts(df: DataFrame, keys: Seq[String], time: Column,
      label: Column, tiebreak: Column, paneMicros: Long): DataFrame = {
    val keyCols = keys.map(col)
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__e", label)
      .withColumn("__t", tiebreak)
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val wp = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__us"), col("__t"))
    val intra = base
      .withColumn("__p1", lag(col("__e"), 1).over(wp))
      .withColumn("__p2", lag(col("__e"), 2).over(wp))
      .filter(col("__p2").isNotNull)
      .groupBy(col("__p2").as("e1"), col("__p1").as("e2"), col("__e").as("e3"))
      .agg(count(lit(1)).as("n"))
    val ranked = base
      .withColumn("__r", row_number().over(wp).cast("long"))
      .withColumn("__c", count(lit(1)).over(
        Window.partitionBy((keys :+ "__b").map(col): _*)))
    val edges = ranked.filter(col("__r") <= 2 || col("__r") > col("__c") - 2)
    val we = Window.partitionBy(keyCols: _*).orderBy(col("__us"), col("__t"))
    def adj(x: Column, y: Column): Column =
      (x("__b") === y("__b") && y("__r") === x("__r") + 1) ||
        (x("__b") =!= y("__b") && x("__r") === x("__c") && y("__r") === 1)
    val cur = struct(col("__e"), col("__b"), col("__r"), col("__c"))
    val cross = edges
      .withColumn("__x1", lag(cur, 2).over(we))
      .withColumn("__x2", lag(cur, 1).over(we))
      .filter(col("__x1").isNotNull)
      .filter(adj(col("__x1"), col("__x2")) && adj(col("__x2"), cur))
      .filter(!(col("__x1")("__b") === col("__b") && col("__x2")("__b") === col("__b")))
      .groupBy(col("__x1")("__e").as("e1"), col("__x2")("__e").as("e2"),
        col("__e").as("e3"))
      .agg(count(lit(1)).as("n"))
    intra.unionByName(cross)
      .groupBy(col("e1"), col("e2"), col("e3")).agg(sum(col("n")).as("n"))
  }

  /** Per-row PREVIOUS event time (µs) within a key, pane-decomposed:
    * intra-pane rows get a pane-local lag; each pane's FIRST row gets
    * the latest time of the key's previous non-empty pane, carried over
    * the tiny per-(key, pane) relation. Null for the key's first event —
    * exactly the naive per-key lag. The building block for gap flags /
    * session-id assignment without sorting a key's full history.
    */
  def prevTime(df: DataFrame, keys: Seq[String], time: Column, tiebreak: Column,
      paneMicros: Long, out: String): DataFrame = {
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__t", tiebreak)
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val w1 = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__us"), col("__t"))
    val intra = base.withColumn(out, lag(col("__us"), 1).over(w1))
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
    val carry = base.groupBy((keys :+ "__b").map(col): _*)
      .agg(max(col("__us")).as("__hi"))
      .withColumn("__c", lag(col("__hi"), 1).over(w2))
      .select((keys :+ "__b").map(col) :+ col("__c"): _*)
    intra.join(carry, keys :+ "__b")
      .withColumn(out, coalesce(col(out), col("__c")))
      .drop("__t", "__b", "__c")
  }

  /** Per-row PREVIOUS VALUE of an arbitrary column within a key —
    * [[prevTime]] generalized from the time column to any (non-null)
    * attribute: intra-pane rows get a pane-local lag; each pane's FIRST
    * row gets the value of the latest row of the key's previous
    * non-empty pane, carried as a (time, tiebreak, value) argmax over
    * the tiny per-(key, pane) relation. Null for the key's first row —
    * exactly the naive per-key lag, with no task sorting one key's full
    * history. The change-detection building block (SCD2 interval
    * collapse, dup-run detection).
    */
  def prevValue(df: DataFrame, keys: Seq[String], time: Column, tiebreak: Column,
      value: Column, paneMicros: Long, out: String): DataFrame = {
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__t", tiebreak)
      .withColumn("__v", value)
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val w1 = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__us"), col("__t"))
    // Checkpoint the single windowed pass and derive the carry FROM it
    // (r10, the sessionIds fusion): deriving intra and carry from `base`
    // re-ran the whole upstream subtree per branch — for q_scd2_priority
    // that was the orders scan + the (key, date) argmax collapse TWICE.
    // Partitioning/ordering survive the checkpoint, so the carry groupBy
    // adds no exchange and the join back adds no sort on the big side.
    val intra = base.withColumn(out, lag(col("__v"), 1).over(w1))
      .localCheckpoint()
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
    val carry = intra.groupBy((keys :+ "__b").map(col): _*)
      .agg(max(struct(col("__us"), col("__t"), col("__v"))).as("__lst"))
      .withColumn("__c", lag(col("__lst").getField("__v"), 1).over(w2))
      .select((keys :+ "__b").map(col) :+ col("__c"): _*)
    intra.join(carry, keys :+ "__b")
      .withColumn(out, coalesce(col(out), col("__c")))
      .drop("__t", "__b", "__c", "__v")
  }

  /** Per-row NEXT event time (µs) within a key — the lead-side mirror of
    * [[prevTime]]: intra-pane rows get a pane-local lead; each pane's
    * LAST row gets the earliest time of the key's next non-empty pane.
    * Null for the key's last event. The validity-interval close
    * (valid_to) building block.
    */
  def nextTime(df: DataFrame, keys: Seq[String], time: Column, tiebreak: Column,
      paneMicros: Long, out: String): DataFrame = {
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__t", tiebreak)
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val w1 = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__us"), col("__t"))
    // same checkpoint fusion as prevValue: one windowed pass feeds both
    // the carry aggregate and the join, instead of re-running the
    // upstream subtree per branch
    val intra = base.withColumn(out, lead(col("__us"), 1).over(w1))
      .localCheckpoint()
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
    val carry = intra.groupBy((keys :+ "__b").map(col): _*)
      .agg(min(col("__us")).as("__lo"))
      .withColumn("__c", lead(col("__lo"), 1).over(w2))
      .select((keys :+ "__b").map(col) :+ col("__c"): _*)
    intra.join(carry, keys :+ "__b")
      .withColumn(out, coalesce(col(out), col("__c")))
      .drop("__t", "__b", "__c")
  }

  /** Gap-threshold SESSION-ID assignment per key (1-based, in
    * (time, tiebreak) order) — [[sessionCounts]] upgraded from counts to
    * ids so downstream analytics can aggregate per session, fused into
    * ONE pane-local window pass. The [[prevTime]]∘[[runningSum]]
    * composition this replaces paid the big relation FOUR times (two
    * window sorts + two carry aggregates, each branch re-deriving the
    * events subtree — Catalyst does not CSE logical branches) and
    * measured 18.4 s at the sf10 sweep for q_session_entry vs 1.3 s for
    * the counts-only sibling. Fused: the pane-local break flag
    * (lag(__us)) and its pane-local prefix sum run over the SAME
    * (key, pane)(time, tiebreak) window — the framed sum consumes the
    * lag's output so they stay two WindowExecs, but the second reuses
    * the first's exchange AND sort order, so the big relation is
    * shuffled and sorted once. A localCheckpoint then feeds both the
    * tiny per-(key, pane) carry relation and the final join (explicit
    * persist per the branch-reuse rule; partitioning/ordering survive
    * the checkpoint, so the join back adds no exchange and no sort on
    * the big side). A row's id = carried base of its pane + its
    * pane-local prefix: the carry window only ever holds one row per
    * (key, pane), so no task sorts a key's full history. Integer µs and
    * 0/1 longs end to end — exact in any accumulation order, identical
    * to the naive per-key lag+prefix formulation (SlidingAggSpec pins
    * equality at three pane widths).
    */
  def sessionIds(df: DataFrame, keys: Seq[String], time: Column, tiebreak: Column,
      gapMicros: Long, paneMicros: Long): DataFrame = {
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__t", tiebreak)
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val w1 = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__us"), col("__t"))
    // intra-pane break flag: 1 iff the gap from the pane-local
    // predecessor exceeds the threshold; a pane's FIRST row flags 0 here
    // (null lag → otherwise-branch) — its break is decided in the carry.
    val local = base
      .withColumn("__ibrk",
        when(col("__us") - lag(col("__us"), 1).over(w1) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("__loc", sum(col("__ibrk")).over(
        w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    // one row per (key, pane): first/last time + intra-break total. The
    // pane's first-row break compares against the previous NON-EMPTY
    // pane's last time (ts-ordered ⇒ last = max); the pane base is the
    // cumulative break count of all earlier panes plus its own first-row
    // break.
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
    val carry = local.groupBy((keys :+ "__b").map(col): _*)
      .agg(min(col("__us")).as("__lo"), max(col("__us")).as("__hi"),
        sum(col("__ibrk")).as("__nbrk"))
      .withColumn("__pl", lag(col("__hi"), 1).over(w2))
      .withColumn("__fb",
        when(col("__pl").isNull || col("__lo") - col("__pl") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("__pbase",
        coalesce(sum(col("__nbrk") + col("__fb")).over(
          w2.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + col("__fb"))
      .select((keys :+ "__b").map(col) :+ col("__pbase"): _*)
    local.join(carry, keys :+ "__b")
      .withColumn("session_id", col("__pbase") + col("__loc"))
      .drop("__us", "__t", "__b", "__ibrk", "__loc", "__pbase")
  }

  /** Running (prefix) sum per key without sorting a key's full history
    * in one task: pane-local prefix sums plus a carry of all earlier
    * panes' totals (cumulated over the tiny per-(key, pane) relation).
    * Summation ORDER differs from the strictly sequential window, so
    * downstream consumers must grid-snap before comparing engines —
    * with grid-resident inputs the ulp-level drift cannot flip the snap
    * (a 0.01-grid value sits 0.5 away from the floor boundary).
    */
  def runningSum(df: DataFrame, keys: Seq[String], time: Column, tiebreak: Column,
      value: Column, paneMicros: Long, out: String): DataFrame = {
    val base = df
      .withColumn("__us", unix_micros(time))
      .withColumn("__tb", tiebreak)
      .withColumn("__v", value)
      .withColumn("__b", floor(col("__us") / lit(paneMicros.toDouble)).cast("long"))
    val wLoc = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__us"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same checkpoint fusion as prevValue/nextTime: the single windowed
    // pass feeds both the per-pane totals and the join
    val local = base.withColumn("__loc", sum(col("__v")).over(wLoc))
      .localCheckpoint()
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = local.groupBy((keys :+ "__b").map(col): _*)
      .agg(sum(col("__v")).as("__tot"))
      .withColumn("__prev", sum(col("__tot")).over(wCarry))
      .select((keys :+ "__b").map(col) :+ col("__prev"): _*)
    local.join(carry, keys :+ "__b")
      .withColumn(out, coalesce(col("__prev"), lit(0.0)) + col("__loc"))
      .drop("__us", "__tb", "__v", "__b", "__loc", "__prev")
  }
}
