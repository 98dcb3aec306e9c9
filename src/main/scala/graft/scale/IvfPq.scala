package graft.scale

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ: the production ANN index layout (Jégou et al. 2011 §V;
  * the default quantizer stack in public vector-search engines) —
  * a coarse k-means partitions the space into cells (the inverted
  * file), each vector stores only PQ codes of its RESIDUAL from the
  * cell centroid, and a query probes its nearest cell(s) scoring
  * residual codes by ADC lookup tables.
  *
  * 100 TB shape:
  *  - training touches the corpus twice (coarse fit, residual PQ fit),
  *    all model state is driver-held literals (CoarseK×dim +
  *    M×K×dim/M doubles);
  *  - a search reads ONE cell's codes (≈ corpus/CoarseK vectors × M
  *    bytes), zero joins, zero shuffles before TakeOrderedAndProject —
  *    cell pruning happens at the scan filter, so a partitioned/
  *    bucketed codes table prunes files too;
  *  - everything is a pure function of the table (deterministic seeds,
  *    one Lloyd pass), so the full index + search is DuckDB-oracle
  *    checkable like the flat-PQ and k-means operators.
  */
object IvfPq {

  /** Coarse cells = the k-means tier's codebook size, so the oracle can
    * reuse the exact kmeans CTE chain for the coarse stage.
    */
  val CoarseK = 8

  case class Model(coarse: KMeans.Centroids, books: Seq[KMeans.Centroids])

  /** (vec_id, cell, embedding = double residual v − centroid(cell)). */
  def residuals(embeddings: DataFrame, coarse: KMeans.Centroids): DataFrame =
    KMeans.assign(embeddings, coarse)
      .select(col("vec_id"), col("cluster").as("cell"),
        zip_with(
          transform(col("embedding"), x => x.cast("double")),
          element_at(typedLit(coarse.toMap), col("cluster")),
          (x, c) => x - c).as("embedding"))

  def fit(embeddings: DataFrame): Model = {
    val coarse = KMeans.fit(embeddings, CoarseK, iters = 1)
    Model(coarse, ProductQuantize.fitCodebooks(residuals(embeddings, coarse)))
  }

  /** Probed ADC search: assign the query to its nearest coarse cell,
    * then ADC-score ONLY that cell's residual codes against the query
    * residual. nprobe is fixed at 1 — the scan-filter shape is the
    * point; more probes union more cell filters.
    */
  def search(embeddings: DataFrame, model: Model, queryId: Long, k: Int): DataFrame = {
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).collect()(0)
      .getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue)
    import ProductQuantize.dotD
    // nearest coarse cell, same expanded d2 + smallest-cid tiebreak as
    // the assignment expression
    val cell = model.coarse.map { case (cid, c) =>
      (dotD(qVec, qVec) - 2.0 * dotD(qVec, c) + dotD(c, c), cid)
    }.min._2
    val qRes = qVec.zip(model.coarse.toMap.apply(cell)).map { case (x, c) => x - c }
    ProductQuantize.adcOver(
      residuals(embeddings, model.coarse).filter(col("cell") === cell),
      model.books, qRes, queryId, k)
  }
}
