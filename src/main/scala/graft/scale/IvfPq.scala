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

  /** The nprobe nearest coarse cells to a query vector, by the same
    * expanded d² + smallest-cid tiebreak as the assignment expression.
    */
  def probeCells(model: Model, qVec: Seq[Double], nprobe: Int): Seq[Int] = {
    import ProductQuantize.dotD
    model.coarse.map { case (cid, c) =>
      (dotD(qVec, qVec) - 2.0 * dotD(qVec, c) + dotD(c, c), cid)
    }.sorted.take(nprobe).map(_._2)
  }

  private def queryVec(embeddings: DataFrame, queryId: Long): Seq[Double] =
    embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).collect()(0)
      .getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue)

  /** Per-probed-cell query residuals — the ADC lookup tables are built
    * from these (multi-probe ADC scores each cell's codes against the
    * query's residual FROM THAT CELL's centroid).
    */
  private def qResByCell(model: Model, qVec: Seq[Double], nprobe: Int): Map[Int, Seq[Double]] =
    probeCells(model, qVec, nprobe).map { cell =>
      cell -> qVec.zip(model.coarse.toMap.apply(cell)).map { case (x, c) => x - c }
    }.toMap

  /** Probed ADC search: assign the query to its nprobe nearest coarse
    * cells, then ADC-score ONLY those cells' residual codes, each
    * against the query residual from that cell. The cell filter sits at
    * the scan, so against a cell-partitioned codes table it prunes
    * files; one scan, zero joins either way.
    */
  def search(embeddings: DataFrame, model: Model, queryId: Long, k: Int,
      nprobe: Int = 1): DataFrame = {
    val q = queryVec(embeddings, queryId)
    ProductQuantize.adcProbed(residuals(embeddings, model.coarse),
      model.books, qResByCell(model, q, nprobe), queryId, k)
  }

  /** Multi-probe ADC scores WITH probe rank and no top-k: one scan of
    * the nprobe probed cells returning (vec_id, adc_dist2, pr). Scores
    * don't depend on nprobe — only the candidate set does — so every
    * tier nprobe' ≤ nprobe derives from this one relation by
    * `pr <= nprobe'`; a recall-vs-nprobe sweep costs ONE corpus-cell
    * scan instead of one per operating point.
    */
  def scoredSearch(embeddings: DataFrame, model: Model, queryId: Long,
      nprobe: Int): DataFrame = {
    val q = queryVec(embeddings, queryId)
    val prByCell = probeCells(model, q, nprobe).zipWithIndex
      .map { case (c, i) => c -> (i + 1) }.toMap
    ProductQuantize.adcScored(residuals(embeddings, model.coarse),
      model.books, qResByCell(model, q, nprobe), prByCell, queryId)
  }

  /** The persisted index payload: (vec_id, codes array<int>, cell) —
    * M bytes of codes per vector instead of dim×4 of floats.
    */
  def codes(embeddings: DataFrame, model: Model): DataFrame =
    ProductQuantize.codesOf(residuals(embeddings, model.coarse),
      model.books, carry = Seq("cell"))

  /** Write the codes table partitioned by cell: a probe's cell filter
    * then prunes FILES, so a search reads ~nprobe/CoarseK of the index
    * (which is itself ~M/(4·dim) of the corpus bytes).
    */
  def writeCodes(embeddings: DataFrame, model: Model, path: String): Unit =
    codes(embeddings, model).write.mode("overwrite")
      .partitionBy("cell").parquet(path)

  /** Search the PERSISTED codes table: reads codes, not embeddings —
    * the production shape (index once, search many).
    */
  def searchCodes(codesDf: DataFrame, embeddings: DataFrame, model: Model,
      queryId: Long, k: Int, nprobe: Int = 1): DataFrame = {
    val q = queryVec(embeddings, queryId)
    ProductQuantize.adcCodes(codesDf, model.books,
      qResByCell(model, q, nprobe), queryId, k)
  }
}
