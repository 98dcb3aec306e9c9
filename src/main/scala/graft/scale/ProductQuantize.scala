package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split each embedding into
  * M contiguous subvectors and vector-quantize every subspace against
  * its own small codebook — the memory layout behind IVF-PQ indexes
  * (M log2 K bits per vector instead of dim×4 bytes; here 8×2 bits vs
  * 256 bytes).
  *
  * Spark-first shape, same discipline as scale/KMeans:
  *  - codebooks are trained per subspace by the deterministic Lloyd
  *    trainer (seeds = k lowest vec_ids, one pass) on SLICED embeddings
  *    — M tiny driver-held (K × dim/M) tables;
  *  - code ASSIGNMENT is one corpus scan: per subspace an argmin over K
  *    foldable-literal codewords (hoisted subvector self-dot, codegen'd
  *    DotProduct), then one explode to (vec_id, subspace, code) rows —
  *    zero shuffles, zero joins;
  *  - the whole fit+assign is a pure function of the table, so the
  *    DuckDB oracle unrolls it as CTEs exactly like the k-means one.
  */
object ProductQuantize {

  val M = 8      // subspaces
  val SubDim = 8 // dims per subspace (64-dim embeddings)
  val K = 4      // codewords per subspace (2 bits)

  private def sliceCol(s: Int): Column =
    slice(col("embedding"), s * SubDim + 1, SubDim)

  /** Per-subspace codebooks via the deterministic Lloyd trainer. */
  def fitCodebooks(embeddings: DataFrame, iters: Int = 1): Seq[KMeans.Centroids] =
    (0 until M).map { s =>
      KMeans.fit(
        embeddings.select(col("vec_id"), sliceCol(s).as("embedding")), K, iters)
    }

  /** One-scan code assignment: (vec_id, subspace, code, dist2) rows,
    * dist2 = squared L2 between the subvector and its codeword.
    */
  def assignCodes(embeddings: DataFrame, books: Seq[KMeans.Centroids]): DataFrame = {
    val withSubs = (0 until M).foldLeft(embeddings) { (df, s) =>
      df.withColumn(s"__sv$s", sliceCol(s))
        .withColumn(s"__vv$s", VectorOps.dot(col(s"__sv$s"), col(s"__sv$s")))
    }
    val bests = books.zipWithIndex.map { case (cents, s) =>
      val cands = cents.sortBy(_._1).map { case (cid, c) =>
        val cl = typedLit(c)
        struct(
          (col(s"__vv$s") - lit(2.0) * VectorOps.dot(col(s"__sv$s"), cl) +
            VectorOps.dot(cl, cl)).as("d"),
          lit(cid).as("c"))
      }
      array_min(array(cands: _*)).as(s"__best$s")
    }
    val entries = (0 until M).map { s =>
      struct(lit(s).as("subspace"), col(s"__best$s").getField("c").as("code"),
        col(s"__best$s").getField("d").as("dist2"))
    }
    withSubs
      .select(col("vec_id") +: bests: _*)
      .select(col("vec_id"), explode(array(entries: _*)).as("e"))
      .select(col("vec_id"), col("e.subspace").as("subspace"),
        col("e.code").as("code"), col("e.dist2").as("dist2"))
  }
}
