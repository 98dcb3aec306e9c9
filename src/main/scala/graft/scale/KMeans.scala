package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over `embeddings(vec_id, embedding
  * array<float>, label)` — the codebook trainer behind IVF coarse
  * quantization (the reference's similarity tier has no trainer; label
  * centroids stood in for one).
  *
  * Spark-first shape, mirroring how MLlib's KMeans drives the loop:
  *  - centroids live on the driver (k×dim doubles — tiny) and are inlined
  *    into the plan as foldable array literals, so ASSIGNMENT is a pure
  *    projection: zero shuffles, whole-stage codegen'd DotProduct per
  *    candidate, and the corpus is scanned exactly once per iteration;
  *  - the UPDATE step is one hash aggregate on cluster with the bounded
  *    vector-sum TypedImperativeAggregate (VecSumAgg): each task holds k
  *    buffers of dim doubles and ships k rows, so the corpus is consumed
  *    in place — no posexplode row expansion between scan and aggregate.
  *
  * Determinism (no RNG): seeds are the k lowest vec_ids in id order, so
  * the whole fit is a pure function of the table and is oracle-expressible
  * by unrolling iterations as SQL CTEs. Distance is squared L2 expanded as
  * v·v − 2·v·c + c·c over the same left-to-right double accumulation as
  * the DuckDB oracle's list_dot_product, and Lloyd's WCSS monotonicity
  * (asserted in KMeansSpec) holds for L2.
  */
object KMeans {

  type Centroids = Seq[(Int, Seq[Double])]

  /** Seed codebook: the k lowest vec_ids, cluster ids 0..k-1 in id order.
    * Element-type agnostic (float embeddings, double residuals).
    */
  def seeds(embeddings: DataFrame, k: Int): Centroids =
    embeddings.orderBy(col("vec_id").asc).limit(k)
      .select(col("embedding")).collect().toSeq.zipWithIndex
      .map { case (r, i) =>
        i -> r.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue).toSeq
      }

  /** Nearest-centroid assignment: (vec_id, embedding, cluster, dist2).
    * One constant-table argmin expression — no join, no shuffle, and
    * O(1) generated-code size in k (the composed array_min-of-k-structs
    * form put fused stages past HotSpot's 8 000-bytecode JIT refusal at
    * k≈64 — see NearestCentroid's scaladoc; bit-identical semantics).
    */
  def assign(embeddings: DataFrame, centroids: Centroids): DataFrame = {
    val best = KMeansExprs.nearestCentroid(col("embedding"), centroids)
    embeddings.select(col("vec_id"), col("embedding"),
      best.getField("c").as("cluster"), best.getField("d").as("dist2"))
  }

  /** One Lloyd update: per-cluster per-dimension mean of the assigned
    * vectors via the bounded vector-sum aggregate (VecSumAgg) — one
    * buffer of dim doubles per cluster per task instead of the 64× row
    * expansion a posexplode would push through the scan. Empty clusters
    * drop out (both engines agree: no rows, no centroid). Collects k
    * (count, sums) rows to the driver; the division happens there (one
    * divide per dimension — the same sum/count avg computes).
    */
  def step(embeddings: DataFrame, centroids: Centroids): Centroids = {
    val rows = assign(embeddings, centroids)
      .groupBy(col("cluster"))
      .agg(VecSum.vecSum(col("embedding")).as("vs"))
      .select(col("cluster"), col("vs.n").as("n"), col("vs.sums").as("sums"))
      .collect()
    rows.map { r =>
      val n = r.getLong(1).toDouble
      r.getInt(0) -> r.getSeq[Double](2).map(_ / n).toSeq
    }.sortBy(_._1)
  }

  /** `iters` Lloyd iterations from the deterministic seeds. */
  def fit(embeddings: DataFrame, k: Int, iters: Int): Centroids =
    (0 until iters).foldLeft(seeds(embeddings, k))((cs, _) => step(embeddings, cs))

  /** Within-cluster sum of squares under a given codebook (convergence
    * metric; strictly non-increasing across Lloyd iterations).
    */
  def wcss(embeddings: DataFrame, centroids: Centroids): Double =
    assign(embeddings, centroids).agg(sum(col("dist2"))).collect()(0).getDouble(0)

  /** IVF top-k over a TRAINED codebook instead of label partitions:
    * probe the nearest centroid to the query, exact cosine only inside
    * that inverted list. Same broadcast-probe shape as Similarity.ivfTopK.
    */
  def ivfTopKTrained(embeddings: DataFrame, centroids: Centroids,
                     queryId: Long, k: Int): DataFrame = {
    val assigned = assign(embeddings, centroids)
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    val probe = assigned.filter(col("vec_id") === queryId)
      .select(col("cluster"))
    assigned.join(broadcast(probe), Seq("cluster"))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qVec))
      .select(col("vec_id"), col("cluster"),
        graft.Num.r(Similarity.cosine(col("embedding"), col("q_embedding")), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }
}
