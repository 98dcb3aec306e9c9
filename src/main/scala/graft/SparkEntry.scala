package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator group's registry; each key has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (hash-seeded sketches, streaming), in which case the
  * driver records a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Relational.queries ++ analytics.Events.queries ++
      analytics.TransformQueries.queries ++ analytics.ScaleQueries.queries ++
      analytics.ParityQueries.queries ++ analytics.CorpusQueries.queries ++
      analytics.CorpusStats.queries ++ analytics.CorpusDiversity.queries ++
      analytics.CorpusAudit.queries ++ analytics.Audit.queries ++
      analytics.Attribution.queries ++ analytics.Lifecycle.queries ++
      analytics.RobustStats.queries ++ analytics.Forecast.queries ++
      analytics.Preference.queries ++ analytics.Density.queries

  def oracleSql: Map[String, String] =
    analytics.Relational.oracles ++ analytics.Events.oracles ++
      analytics.TransformQueries.oracles ++ analytics.ScaleQueries.oracles ++
      analytics.ParityQueries.oracles ++ analytics.CorpusQueries.oracles ++
      analytics.CorpusStats.oracles ++ analytics.CorpusDiversity.oracles ++
      analytics.CorpusAudit.oracles ++ analytics.Audit.oracles ++
      analytics.Attribution.oracles ++ analytics.Lifecycle.oracles ++
      analytics.RobustStats.oracles ++ analytics.Forecast.oracles ++
      analytics.Preference.oracles ++ analytics.Density.oracles
}
