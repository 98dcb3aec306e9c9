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
}
