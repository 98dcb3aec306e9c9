package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Num, Tables}

/** Pairwise-preference aggregation — the RLHF-data tier: given a stream
  * of head-to-head outcomes ("A was preferred over B"), estimate a
  * per-player strength. This is the ranking half of preference-data
  * curation (reward-model training sets, arena-style eval boards,
  * annotator-agreement weighting): the raw pair stream is corpus-sized,
  * the player table is bounded, and the estimate must be reproducible
  * run-to-run.
  *
  * Estimator: Bradley–Terry via the MM (minorization–maximization)
  * fixed-point of Hunter 2004, "MM algorithms for generalized
  * Bradley-Terry models" (Annals of Statistics 32(1)) —
  * p_i ← W_i / Σ_j n_ij / (p_i + p_j), a data-parallel update: one
  * equi-join of the (i, j, n) game relation against the current ratings
  * on each endpoint, one sum per player. A fixed iteration count keeps
  * the operator oracle-expressible (the SQL unrolls the same loop, the
  * pagerank discipline), and a +0.5 win smoothing keeps every rating
  * strictly positive so the update is total (an undefeated-or-winless
  * player otherwise pins a later denominator at 0 — ANSI-mode divide
  * guard by construction, not by CASE).
  *
  * Scale shape: games are PRE-AGGREGATED per unordered pair before the
  * loop (the pair stream collapses to the co-occurrence graph, the only
  * corpus-sized shuffle), the symmetrized graph is persisted once and
  * re-read by all iterations, and each round's ratings relation is
  * player-bounded — it rides as a BROADCAST against the edge relation,
  * so an iteration never reshuffles the graph. Ratings are
  * `localCheckpoint`ed per round: each update references the previous
  * ratings TWICE (both endpoints), so an unbroken lineage would replay
  * round k−1 twice per round — 2^iters plan blowup (the branch-reuse
  * rule, CLAUDE.md).
  *
  * Cross-engine determinism (the pagerank rules): per-edge terms
  * n/(p_i + p_j) are IEEE divisions of identical inputs; each round
  * snaps the per-player inbound sum at 1e-9 and the new rating at 1e-9,
  * so round k+1 starts from bit-identical doubles in both engines; the
  * final mean-normalization snaps the player-bounded sum before its
  * divide (Num grid rule) and the published rating at 1e-6.
  */
object Preference {

  /** Fixed MM iteration count — identical unrolled depth in the oracle.
    * Five rounds is convergence to well inside the 1e-6 display grid on
    * every swept scale; the count is a determinism contract, not a
    * tolerance knob.
    */
  val BtIters = 5

  /** Bradley–Terry ratings from a pre-aggregated game relation
    * `(i, j, n, w)` with i < j, n = decisive games between the pair,
    * w = wins of i over j. Returns one row per player that played ≥ 1
    * decisive game: (player, games, wins, rating), rating normalized to
    * mean 1.0 over rated players.
    */
  def btRatingOf(gd: DataFrame): DataFrame = {
    // Symmetrize so "opponents of i" is one equi-join: each unordered
    // pair contributes a row in both directions. Edge-sized (bounded by
    // co-occurring pairs, not players²) — persisted once for the loop,
    // like pagerankOn's edge relation.
    val sym = gd.select(col("i"), col("j"), col("n"), col("w"))
      .unionByName(gd.select(col("j").as("i"), col("i").as("j"), col("n"),
        (col("n") - col("w")).as("w")))
      .persist()
    sym.count()
    val pl = sym.groupBy(col("i"))
      .agg(sum(col("w")).as("wins"), sum(col("n")).as("games"))
      .localCheckpoint()
    var r = pl.select(col("i"), lit(1.0).as("p"))
    for (_ <- 1 to BtIters) {
      val den = sym
        .join(broadcast(r.select(col("i"), col("p").as("pi"))), "i")
        .join(broadcast(r.select(col("i").as("j"), col("p").as("pj"))), "j")
        .groupBy(col("i"))
        .agg(Num.r(sum(col("n") / (col("pi") + col("pj"))), 9).as("den"))
      r = pl.join(den, "i")
        .select(col("i"), Num.r((col("wins") + lit(0.5)) / col("den"), 9).as("p"))
        .localCheckpoint()
    }
    val mean = r.agg((Num.r(sum(col("p")), 6) / count(lit(1))).as("mp"))
    val out = r.join(pl, "i").crossJoin(broadcast(mean))
      .select(col("i").as("player"), col("games"), col("wins"),
        Num.r(col("p") / col("mp"), 6).as("rating"))
      .localCheckpoint()
    sym.unpersist()
    out
  }

  /** Registered wiring: supplier price competition as the preference
    * stream. Within each order, each supplier's best (minimum) effective
    * unit price competes; for every unordered supplier pair co-occurring
    * in an order, the cheaper one wins (exact-equal offers are a draw
    * and drop — both engines compare the identical IEEE double). The
    * per-(order, supplier) offer collapse and the per-pair game
    * aggregate are the only fact-table shuffles; per-order fan-out is
    * line-count-bounded (≤ C(7,2) pairs), so no key explodes.
    */
  def btRating(spark: SparkSession, dir: String): DataFrame = {
    val offers = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      .agg(min(col("l_extendedprice") * (lit(1.0) - col("l_discount")) /
        col("l_quantity")).as("c"))
    val a = offers.select(col("o"), col("s").as("i"), col("c").as("ci"))
    val b = offers.select(col("o"), col("s").as("j"), col("c").as("cj"))
    val gd = a.join(b, Seq("o"))
      .filter(col("i") < col("j") && col("ci") =!= col("cj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ci") < col("cj"), 1L).otherwise(0L)).as("w"))
    btRatingOf(gd).withColumnRenamed("player", "s_suppkey")
  }

  val btRatingSql: String = {
    val iters = (1 to BtIters).map { k =>
      val prev = s"bt${k - 1}"
      s"""dd$k AS (
         |  SELECT sym.i, ${Num.rSql("sum(sym.n / (pi.p + pj.p))", 9)} AS den
         |  FROM sym JOIN $prev pi ON sym.i = pi.i
         |  JOIN $prev pj ON sym.j = pj.i
         |  GROUP BY 1),
         |bt$k AS (
         |  SELECT pl.i, ${Num.rSql("(pl.wins + 0.5) / d.den", 9)} AS p
         |  FROM pl JOIN dd$k d ON pl.i = d.i)""".stripMargin
    }.mkString(",\n")
    s"""WITH offers AS (
       |  SELECT l_orderkey AS o, l_suppkey AS s,
       |         min(l_extendedprice * (1.0 - l_discount) / l_quantity) AS c
       |  FROM lineitem GROUP BY 1, 2),
       |gd AS (
       |  SELECT a.s AS i, b.s AS j, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN a.c < b.c THEN 1 ELSE 0 END) AS BIGINT) AS w
       |  FROM offers a JOIN offers b ON a.o = b.o AND a.s < b.s AND a.c <> b.c
       |  GROUP BY 1, 2),
       |sym AS MATERIALIZED (
       |  SELECT i, j, n, w FROM gd
       |  UNION ALL SELECT j AS i, i AS j, n, n - w AS w FROM gd),
       |pl AS MATERIALIZED (
       |  SELECT i, CAST(sum(w) AS BIGINT) AS wins,
       |         CAST(sum(n) AS BIGINT) AS games FROM sym GROUP BY 1),
       |bt0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM pl),
       |$iters,
       |mean AS (SELECT ${Num.rSql("sum(p)", 6)} / count(*) AS mp FROM bt$BtIters)
       |SELECT b.i AS s_suppkey, pl.games, pl.wins,
       |       ${Num.rSql("b.p / mean.mp", 6)} AS rating
       |FROM bt$BtIters b JOIN pl ON b.i = pl.i CROSS JOIN mean""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bt_rating" -> btRating)

  val oracles: Map[String, String] = Map(
    "q_bt_rating" -> btRatingSql)
}
