package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global-range int8 scalar quantization for embedding columns — the
  * standard 4× compression step before ANN indexing at volume (a 100 TB
  * float corpus becomes 25 TB of int8 codes; distance math stays within
  * ~1% for well-spread dims).
  *
  * Scale shape: the per-dimension min/max table is ONE aggregate over the
  * exploded corpus reduced to a single broadcast row of two arrays; the
  * quantization itself is a map-side HOF over each vector — no shuffle
  * touches the full corpus besides the stat aggregate's partial pass.
  */
object Quantize {

  /** Single-row frame: `mins`/`maxs` arrays indexed by dimension. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .agg(sort_array(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("s"))
      .select(expr("transform(s, e -> e.mn)").as("mins"),
        expr("transform(s, e -> e.mx)").as("maxs"))

  /** Adds `q: array<int>` with each value in [-128, 127]. A collapsed
    * dimension (mx == mn) quantizes to 0.
    */
  def quantize(df: DataFrame, vecCol: String): DataFrame =
    df.crossJoin(broadcast(dimStats(df, vecCol)))
      .withColumn("q", expr(
        s"""transform($vecCol, (x, i) ->
           |  CASE WHEN maxs[i] > mins[i]
           |    THEN CAST(floor((CAST(x AS DOUBLE) - mins[i]) / (maxs[i] - mins[i]) * 255.0 + 0.5) AS INT) - 128
           |    ELSE 0 END)""".stripMargin))
      .drop("mins", "maxs")

  /** Dequantized double vector for `q` given the same stats frame —
    * used to bound reconstruction error in tests.
    */
  def dequantize(df: DataFrame, statsFrame: DataFrame): DataFrame =
    df.crossJoin(broadcast(statsFrame))
      .withColumn("deq", expr(
        """transform(q, (c, i) ->
          |  CASE WHEN maxs[i] > mins[i]
          |    THEN (CAST(c AS DOUBLE) + 128.0) / 255.0 * (maxs[i] - mins[i]) + mins[i]
          |    ELSE mins[i] END)""".stripMargin))
      .drop("mins", "maxs")
}
