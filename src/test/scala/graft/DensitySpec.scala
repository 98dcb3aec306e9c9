package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.Density

/** DBSCAN structural invariants plus the grid-occupancy data premise.
  *
  * The neighbor stage is a 3×3 cell-bucket probe: candidate volume is
  * Θ(n · occupancy), so the operator's scale envelope rests on the
  * eps-grid staying sparse relative to the probe budget — the same
  * premise class as the LSH MaxGroup caps (RegimeSpec). Asserted at
  * sf0.1, the largest local scale, where density actually grows.
  */
class DensitySpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.1"

  /** Probe budget: a cell holding more points than this makes the
    * candidate join quadratic-in-cell — re-grain eps or pre-sample
    * before trusting the grid shape at a denser corpus. Shared with
    * graft.PremiseCheck (the sf1 sweep's gate).
    */
  val MaxCellOccupancy = Density.DbMaxCellOccupancy

  test("grid premise: max eps-cell occupancy stays under the probe budget at sf0.1") {
    // occupancy is counted over the exact-coordinate QUOTIENT (distinct
    // snapped (x, y) per cell), because that is what the 3×3 probe
    // actually joins — the pipeline collapses duplicate coordinates
    // before the neighbor stage, so a mass-duplicated corpus must not
    // fail this gate (ADVICE r11: the raw-row count and
    // PremiseCheck/quotientStats were asserting two different
    // quantities against the one shared budget)
    val quotient = Tables.embeddings(spark, sf)
      .select(
        Num.r(graft.scale.VectorOps.dot(col("embedding"),
          typedLit((0 until 64).map(j =>
            graft.analytics.CorpusDiversity.jlSign(0, j)))) / lit(4.0), 6)
          .as("x"),
        Num.r(graft.scale.VectorOps.dot(col("embedding"),
          typedLit((0 until 64).map(j =>
            graft.analytics.CorpusDiversity.jlSign(1, j)))) / lit(4.0), 6)
          .as("y"))
      .distinct()
    val occ = quotient
      .select(floor(col("x") * lit(Density.DbCellScale)).as("cx"),
        floor(col("y") * lit(Density.DbCellScale)).as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(occ <= MaxCellOccupancy,
      s"an eps-grid cell holds $occ distinct coordinates (> " +
        s"$MaxCellOccupancy): the cell-probe join is leaving its sparse " +
        "regime — re-grain DbEps or cap cell membership before the " +
        "corpus grows further")
  }

  test("labels partition the corpus: roles are consistent with cluster ids") {
    val out = Density.dbscan(spark, "/root/testdata/sf0.001").cache()
    val n = out.count()
    // scale-agnostic: every embedding row gets exactly one label (the
    // literal corpus count would couple this invariant to the current
    // testdata generation)
    assert(n == Tables.embeddings(spark, "/root/testdata/sf0.001").count())
    // noise ⇔ cluster −1; core/border carry a real (core-id) label
    assert(out.filter(col("role") === "noise" && col("cluster_id") =!= -1L)
      .isEmpty)
    assert(out.filter(col("role") =!= "noise" && col("cluster_id") === -1L)
      .isEmpty)
    // every non-noise label IS a core point's vec_id (min-label = member)
    val labels = out.filter(col("role") =!= "noise")
      .select(col("cluster_id").as("vec_id")).distinct()
    val cores = out.filter(col("role") === "core").select(col("vec_id"))
    assert(labels.join(cores, Seq("vec_id"), "left_anti").isEmpty,
      "a cluster label does not name a core member")
    // a cluster's label is its minimum core vec_id
    val badMin = out.filter(col("role") === "core")
      .groupBy(col("cluster_id")).agg(min(col("vec_id")).as("mn"))
      .filter(col("mn") =!= col("cluster_id"))
    assert(badMin.isEmpty, "cluster label != min core vec_id")
    out.unpersist()
  }

  test("stats rollup reconciles with the per-point relation") {
    val pts = Density.dbscan(spark, "/root/testdata/sf0.001")
    val stats = Density.dbscanStats(spark, "/root/testdata/sf0.001")
    val total = stats.agg(sum(col("n_total"))).head().getLong(0)
    assert(total ==
      Tables.embeddings(spark, "/root/testdata/sf0.001").count())
    val mismatch = stats
      .filter(col("n_core") + col("n_border") =!= col("n_total") &&
        col("cluster_id") =!= -1L)
    assert(mismatch.isEmpty,
      "a non-noise cluster row counts members outside core+border")
    // border points never outnumber what the density premise implies:
    // every border has ≥1 core neighbor, so clusters have ≥1 core
    val coreless = stats.filter(col("cluster_id") =!= -1L && col("n_core") === 0L)
    assert(coreless.isEmpty, "a cluster with zero core members")
    assert(pts.filter(col("role") === "core").count() > 0L)
  }

  test("stats consume the shared labels artifact: artifact form ≡ composed form") {
    // the knnGraphBuild pattern applied to DBSCAN (VERDICT r10 #2): the
    // registered q_dbscan_stats recomputes labels inline for oracle
    // parity; the production path reads dbscanBuild's parquet — the two
    // rollups must be identical row sets
    val dir = "/root/testdata/sf0.001"
    val path = java.nio.file.Files.createTempDirectory("dbscan_labels").toString
    val labels = Density.dbscanBuild(spark, dir, s"$path/labels")
    val viaArtifact = Density.dbscanStatsOn(labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val composed = Density.dbscanStats(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaArtifact == composed)
  }

  test("LOF consumes the shared kNN-graph artifact: artifact form ≡ composed form") {
    // the graph-family pattern (GraphArtifactSpec): the registered
    // composed query rebuilds the graph inline for oracle parity; the
    // production path reads knnGraphBuild's parquet — results must match
    val dir = "/root/testdata/sf0.001"
    val path = java.nio.file.Files.createTempDirectory("lof_edges").toString
    val edges = graft.analytics.ScaleQueries
      .knnGraphBuild(spark, dir, s"$path/edges")
    val viaArtifact = Density.lofOn(edges)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val composed = Density.lofScores(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(viaArtifact == composed)
  }

  test("LOF invariants: densities and scores strictly positive, inliers near 1") {
    val out = Density.lofScores(spark, "/root/testdata/sf0.001").cache()
    assert(out.filter(col("lrd") <= 0.0 || col("lof") <= 0.0).isEmpty)
    // a kNN graph's mass is inliers: the median LOF must sit near 1
    // (the Breunig invariant) — a broken reach/lrd join skews it wildly
    val med = out.stat.approxQuantile("lof", Array(0.5), 0.0).head
    assert(med > 0.5 && med < 2.0, s"median LOF $med implausible")
    out.unpersist()
  }
}
