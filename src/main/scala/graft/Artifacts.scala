package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The production-topology bench arm (VERDICT r11 Next #1).
  *
  * Three query families share an expensive corpus-sized prefix that the
  * composed registrations rebuild per query (kept that way deliberately
  * — each registered query must stand alone for the DuckDB oracle): the
  * kNN edge graph (q_knn_graph / q_pagerank / q_triangle_count /
  * q_graph_coherence / q_lof_scores), the DBSCAN label relation
  * (q_dbscan / q_dbscan_stats), and the preference game graph
  * (q_bt_rating / q_bt_rating_se / q_pair_winrate_ci /
  * q_bt_transitivity). A production fleet builds each artifact once per
  * corpus snapshot and runs every consumer Θ(artifact) — at the r11
  * sf10 sweep the repeated kNN-graph rebuild alone was ~520 s of the
  * 1 587.9 s warm total, so a sweep of composed forms systematically
  * overstates the production cost of the whole graph family.
  *
  * This registry makes that arm a FIRST-CLASS part of the tracked bench
  * artifact: `art_*_build` rows carry the (real, paid-once) build cost,
  * `art_*` consumer rows the Θ(artifact) cost. Bench runs them in this
  * exact order after the registry sweep (builds precede consumers — the
  * one place run order is semantic, so these rows are exempt from the
  * seeded shuffle). Equality artifact ≡ composed is pinned by
  * GraphArtifactSpec / DensitySpec / PreferenceSpec.
  */
object Artifacts {

  def phases(base: String): Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "art_knn_graph_build" -> ((s: SparkSession, d: String) =>
      analytics.ScaleQueries.knnGraphBuild(s, d, s"$base/knn_graph")),
    "art_pagerank" -> ((s: SparkSession, d: String) =>
      analytics.ScaleQueries.pagerankOn(Tables.embeddings(s, d),
        s.read.parquet(s"$base/knn_graph")
          .select(col("vec_id").as("src"), col("nbr_id").as("dst")))),
    "art_triangle_count" -> ((s: SparkSession, d: String) =>
      analytics.ScaleQueries.triangleStatsOf(
        s.read.parquet(s"$base/knn_graph")
          .select(col("vec_id").as("a"), col("nbr_id").as("b")))),
    "art_graph_coherence" -> ((s: SparkSession, d: String) =>
      analytics.ScaleQueries.graphCoherenceOn(Tables.embeddings(s, d),
        s.read.parquet(s"$base/knn_graph")
          .select(col("vec_id"), col("nbr_id")))),
    "art_lof_scores" -> ((s: SparkSession, d: String) =>
      analytics.Density.lofOn(s.read.parquet(s"$base/knn_graph"))),
    "art_dbscan_build" -> ((s: SparkSession, d: String) =>
      analytics.Density.dbscanBuild(s, d, s"$base/dbscan_labels")),
    "art_dbscan_stats" -> ((s: SparkSession, d: String) =>
      analytics.Density.dbscanStatsOn(s.read.parquet(s"$base/dbscan_labels"))),
    "art_games_build" -> ((s: SparkSession, d: String) =>
      analytics.Preference.gamesBuild(s, d, s"$base/games")),
    "art_bt_rating" -> ((s: SparkSession, d: String) =>
      analytics.Preference.btRatingOf(s.read.parquet(s"$base/games"))),
    "art_bt_rating_se" -> ((s: SparkSession, d: String) =>
      analytics.Preference.btRatingSeOf(s.read.parquet(s"$base/games"))),
    "art_pair_winrate_ci" -> ((s: SparkSession, d: String) =>
      analytics.Preference.pairWinrateCiOf(s.read.parquet(s"$base/games"))),
    "art_bt_transitivity" -> ((s: SparkSession, d: String) =>
      analytics.Preference.transitivityOf(s.read.parquet(s"$base/games"))))
}
