package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles over a BOUNDED value domain via the value
  * histogram — the third member of the exact-quantile family:
  *
  *   - range-bucket offsets (CorpusQueries.exactQuantiles): unbounded
  *     domains, a second in-bucket ranking pass;
  *   - value histogram (here): domains with bounded distinct values
  *     (days, 2-decimal currency, scores) — the histogram IS the bounded
  *     relation, the cumulative window runs over it, and the quantile is
  *     the first value whose cumulative count reaches the rank. NO
  *     second pass over the data; one fact shuffle end to end;
  *   - mergeable rank sketch (q_approx_quantiles): unbounded domains at
  *     scales where exact state stops paying.
  *
  * Ranks are k = ceil(p·n) computed as integer rationals
  * ((nu·n + de − 1) div de) so no fp product can straddle an integer
  * boundary differently across engines (lower-quantile semantics — no
  * interpolation, hence no cross-engine fp at all).
  */
object ValueQuantiles {

  /** One row per (group, quantile label): groupCols*, p, n_rows, q
    * (the quantile value, named `out`). `specs` are (label, numerator,
    * denominator) rationals.
    *
    * Both the cumulative count AND the per-group total are windows over
    * the SAME group partitioning of the bounded histogram — one
    * exchange, one fact scan (a separate totals aggregate would
    * re-derive the histogram subtree and scan the facts twice; the
    * PlanSpec latency-quantiles gate pins scans == 1). The quantile set
    * rides an explode of the histogram rows (bounded ×|specs| fan-out),
    * filtered to the row whose cumulative range contains each rank.
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], value: Column,
      specs: Seq[(String, Long, Long)], out: String): DataFrame = {
    val g = groupCols.map(col)
    val hist = df.select(g :+ value.as("__v"): _*)
      .groupBy((g :+ col("__v")): _*).agg(count(lit(1)).as("__n"))
    hist
      .withColumn("__cum",
        sum(col("__n")).over(Window.partitionBy(g: _*)
          .orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_rows", sum(col("__n")).over(Window.partitionBy(g: _*)))
      .select(g ++ Seq(col("__v"), col("__n"), col("__cum"), col("n_rows"),
        explode(array(specs.map {
          case (l, nu, de) => struct(lit(l).as("p"), lit(nu).as("nu"), lit(de).as("de"))
        }: _*)).as("__q")): _*)
      .withColumn("__k", expr("(__q.nu * n_rows + __q.de - 1) div __q.de"))
      .filter(col("__k") > col("__cum") - col("__n") && col("__k") <= col("__cum"))
      .select(g ++ Seq(col("__q.p").as("p"), col("n_rows"), col("__v").as(out)): _*)
  }
}
