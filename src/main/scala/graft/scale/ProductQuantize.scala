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
  *  - code ASSIGNMENT is one corpus scan: per subspace a constant-table
  *    argmin (NearestCentroid — O(1) generated-code size in K) — zero
  *    shuffles, zero joins;
  *  - ADC SEARCH is the same scan summing M lookup-table literals, with
  *    top-k via TakeOrderedAndProject;
  *  - the whole fit+assign is a pure function of the table, so the
  *    DuckDB oracle unrolls it as CTEs exactly like the k-means one.
  */
object ProductQuantize {

  val M = 8      // subspaces
  val SubDim = 8 // dims per subspace (64-dim embeddings)
  val K = 4      // codewords per subspace (2 bits)

  private def sliceCol(s: Int): Column =
    slice(col("embedding"), s * SubDim + 1, SubDim)

  /** Per-subspace codebooks via the deterministic Lloyd construction —
    * FUSED across subspaces: one collect for all M seed sets (the K
    * lowest vec_ids, sliced driver-side) and ONE corpus scan per Lloyd
    * iteration (a single explode + (subspace, code) vector-sum
    * aggregate updates all M codebooks together). Per-subspace
    * KMeans.fit would scan the corpus M times per iteration — at
    * 100 TB the fused trainer reads 8× less.
    */
  def fitCodebooks(embeddings: DataFrame, iters: Int = 1): Seq[KMeans.Centroids] = {
    val seedRows = embeddings.orderBy(col("vec_id").asc).limit(K)
      .select(col("embedding")).collect().toSeq
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue))
    var books: Seq[KMeans.Centroids] = (0 until M).map { s =>
      seedRows.zipWithIndex.map { case (v, i) =>
        i -> v.slice(s * SubDim, (s + 1) * SubDim).toSeq
      }
    }
    for (_ <- 0 until iters) {
      val entries = (0 until M).map { s =>
        struct(lit(s).as("s"), col(s"__best$s").getField("c").as("c"),
          col(s"__sv$s").as("sv"))
      }
      val rows = withBests(embeddings, books, keepSubs = true)
        .select(explode(array(entries: _*)).as("e"))
        .groupBy(col("e.s").as("s"), col("e.c").as("c"))
        .agg(VecSum.vecSum(col("e.sv")).as("vs"))
        .select(col("s"), col("c"), col("vs.n").as("n"), col("vs.sums").as("sums"))
        .collect()
      books = (0 until M).map { s =>
        rows.filter(_.getInt(0) == s).map { r =>
          val n = r.getLong(2).toDouble
          r.getInt(1) -> r.getSeq[Double](3).map(_ / n).toSeq
        }.toSeq.sortBy(_._1)
      }
    }
    books
  }

  /** (vec_id, __best0.. __bestM-1) where __bests = struct(d, c) is the
    * per-subspace argmin over the codebook — the shared single-scan
    * projection under code assignment, ADC search, and the fused
    * trainer (which also keeps the subvector columns).
    */
  private def withBests(embeddings: DataFrame, books: Seq[KMeans.Centroids],
      keepSubs: Boolean = false, carry: Seq[String] = Nil): DataFrame = {
    val withSubs = (0 until M).foldLeft(embeddings) { (df, s) =>
      df.withColumn(s"__sv$s", sliceCol(s))
    }
    val bests = books.zipWithIndex.map { case (cents, s) =>
      KMeansExprs.nearestCentroid(col(s"__sv$s"), cents).as(s"__best$s")
    }
    val keep = (if (keepSubs) col("vec_id") +: (0 until M).map(s => col(s"__sv$s"))
                else Seq(col("vec_id"))) ++ carry.map(col)
    withSubs.select(keep ++ bests: _*)
  }

  /** Compact stored-codes layout: (vec_id, carried cols, codes
    * array<int> of length M) — what a persisted PQ index writes: M
    * small ints per vector instead of dim floats.
    */
  def codesOf(vectors: DataFrame, books: Seq[KMeans.Centroids],
      carry: Seq[String] = Nil): DataFrame =
    withBests(vectors, books, carry = carry)
      .select(col("vec_id") +: carry.map(col) :+
        array((0 until M).map(s => col(s"__best$s").getField("c")): _*).as("codes"): _*)

  /** ADC over a STORED codes table (vec_id, cell, codes): per probed
    * cell its own query-residual lookup table (Map[cell, Map[cid, d²]]
    * literals — CoarseK×M×K doubles at most), distance = Σ_s
    * lut[cell][codes[s]]. One scan of M-byte codes, zero joins; with
    * the table partitioned by cell the probe filter prunes files.
    */
  def adcCodes(codes: DataFrame, books: Seq[KMeans.Centroids],
      qResByCell: Map[Int, Seq[Double]], excludeId: Long, k: Int): DataFrame = {
    val dist = books.zipWithIndex.map { case (cents, s) =>
      val lutByCell: Map[Int, Map[Int, Double]] = qResByCell.map { case (cell, qRes) =>
        val qs = qRes.slice(s * SubDim, (s + 1) * SubDim)
        cell -> cents.map { case (cid, c) =>
          cid -> (dotD(qs, qs) - 2.0 * dotD(qs, c) + dotD(c, c))
        }.toMap
      }
      element_at(element_at(typedLit(lutByCell), col("cell")),
        element_at(col("codes"), s + 1))
    }.reduce(_ + _)
    codes
      .filter(col("cell").isin(qResByCell.keys.toSeq: _*) &&
        col("vec_id") =!= excludeId)
      .select(col("vec_id"), graft.Num.r(dist, 6).as("adc_dist2"))
      .orderBy(col("adc_dist2").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Multi-cell ADC scores over residual VECTORS without the top-k:
    * (vec_id, adc_dist2, pr) where pr is the probe rank of the row's
    * cell — lets a recall sweep derive every nprobe tier from ONE scan
    * (candidate scores don't depend on nprobe; only the candidate SET
    * does, and `pr <= n` reconstructs it).
    */
  def adcScored(vectors: DataFrame, books: Seq[KMeans.Centroids],
      qResByCell: Map[Int, Seq[Double]], prByCell: Map[Int, Int],
      excludeId: Long): DataFrame = {
    val dist = books.zipWithIndex.map { case (cents, s) =>
      val lutByCell: Map[Int, Map[Int, Double]] = qResByCell.map { case (cell, qRes) =>
        val qs = qRes.slice(s * SubDim, (s + 1) * SubDim)
        cell -> cents.map { case (cid, c) =>
          cid -> (dotD(qs, qs) - 2.0 * dotD(qs, c) + dotD(c, c))
        }.toMap
      }
      element_at(element_at(typedLit(lutByCell), col("cell")),
        col(s"__best$s").getField("c"))
    }.reduce(_ + _)
    withBests(vectors.filter(col("cell").isin(qResByCell.keys.toSeq: _*)),
        books, carry = Seq("cell"))
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), graft.Num.r(dist, 6).as("adc_dist2"),
        element_at(typedLit(prByCell), col("cell")).as("pr"))
  }

  /** Multi-cell ADC top-k over residual VECTORS (the no-index path):
    * per-cell LUTs, code assignment in the scan (withBests). Reduces to
    * the single-cell adcOver shape when one cell is probed — still one
    * scan, no joins.
    */
  def adcProbed(vectors: DataFrame, books: Seq[KMeans.Centroids],
      qResByCell: Map[Int, Seq[Double]], excludeId: Long, k: Int): DataFrame =
    adcScored(vectors, books, qResByCell,
        qResByCell.keys.map(_ -> 1).toMap, excludeId)
      .select(col("vec_id"), col("adc_dist2"))
      .orderBy(col("adc_dist2").asc, col("vec_id").asc)
      .limit(k)

  /** One-scan code assignment: (vec_id, subspace, code, dist2) rows,
    * dist2 = squared L2 between the subvector and its codeword.
    */
  def assignCodes(embeddings: DataFrame, books: Seq[KMeans.Centroids]): DataFrame = {
    val entries = (0 until M).map { s =>
      struct(lit(s).as("subspace"), col(s"__best$s").getField("c").as("code"),
        col(s"__best$s").getField("d").as("dist2"))
    }
    withBests(embeddings, books)
      .select(col("vec_id"), explode(array(entries: _*)).as("e"))
      .select(col("vec_id"), col("e.subspace").as("subspace"),
        col("e.code").as("code"), col("e.dist2").as("dist2"))
  }

  /** Asymmetric distance computation (ADC) top-k — the search mode PQ
    * codes exist for: the query stays EXACT, each corpus vector is
    * approximated by its codewords, and the distance is a sum of M
    * table lookups. The per-subspace lookup tables (M × K doubles,
    * query-to-codeword squared L2) are computed on the driver and
    * inlined as foldable array literals indexed by the assigned code,
    * so the whole search is ONE scan with zero shuffles and zero joins
    * before TakeOrderedAndProject — at 100 TB a stored-codes variant
    * reads M bytes per vector instead of dim×4, which is the entire
    * point of the layout.
    */
  def adcTopK(embeddings: DataFrame, books: Seq[KMeans.Centroids],
      queryId: Long, k: Int): DataFrame = {
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).collect()(0)
      .getSeq[Float](0).map(_.toDouble)
    adcOver(embeddings, books, qVec, queryId, k)
  }

  /** Dot with the same left-to-right accumulation as DotProduct and the
    * oracle's list_dot_product (CLAUDE.md fp rule: textually parallel).
    */
  private[scale] def dotD(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  /** ADC core over any vector table (float embeddings or double
    * residuals) against an explicit query vector.
    */
  def adcOver(vectors: DataFrame, books: Seq[KMeans.Centroids],
      qVec: Seq[Double], excludeId: Long, k: Int): DataFrame = {
    // lut(s)(cid) = ||q_s − c||² via the SAME expanded q·q − 2·q·c + c·c
    // as the assignment expression and the oracle; a MAP literal keyed
    // by the actual cid, because fit() drops empty clusters and the
    // surviving ids need not be a dense prefix
    val dist = books.zipWithIndex.map { case (cents, s) =>
      val qs = qVec.slice(s * SubDim, (s + 1) * SubDim)
      val lut: Map[Int, Double] = cents.map { case (cid, c) =>
        cid -> (dotD(qs, qs) - 2.0 * dotD(qs, c) + dotD(c, c))
      }.toMap
      element_at(typedLit(lut), col(s"__best$s").getField("c"))
    }.reduce(_ + _)
    withBests(vectors, books)
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), graft.Num.r(dist, 6).as("adc_dist2"))
      .orderBy(col("adc_dist2").asc, col("vec_id").asc)
      .limit(k)
  }
}
