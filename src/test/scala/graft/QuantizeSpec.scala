package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.Quantize

/** int8 scalar quantization: codes stay in range and the dequantized
  * vector lands within half a quantization step of the original in every
  * dimension — the bound that keeps quantized distance math honest.
  */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  test("codes are int8-range and reconstruction is within half a step") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val stats = Quantize.dimStats(emb, "embedding")
    val q = Quantize.quantize(emb, "embedding")
    assert(q.filter(expr("exists(q, c -> c < -128 OR c > 127)")).isEmpty)
    val deq = Quantize.dequantize(q, stats)
    val violations = deq.crossJoin(broadcast(stats))
      .filter(expr(
        """exists(transform(embedding, (x, i) ->
          |  abs(CAST(x AS DOUBLE) - deq[i]) >
          |    (maxs[i] - mins[i]) / 255.0 * 0.5 + 1e-9), b -> b)""".stripMargin))
    assert(violations.isEmpty)
  }

  test("PQ codes are in range, cover every (vec, subspace), and argmin holds") {
    import graft.scale.{ProductQuantize => PQ}
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val books = PQ.fitCodebooks(emb)
    assert(books.size == PQ.M)
    books.foreach(b => assert(b.nonEmpty && b.size <= PQ.K &&
      b.forall(_._2.size == PQ.SubDim)))
    val rows = PQ.assignCodes(emb, books)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val nVecs = emb.count()
    assert(rows.length == nVecs * PQ.M)
    assert(rows.forall { case (_, s, c, d) =>
      s >= 0 && s < PQ.M && c >= 0 && c < PQ.K && d >= -1e-9 })
    // assigned dist2 is the minimum over the subspace's codebook
    val byVecSub = rows.map { case (v, s, c, d) => (v, s) -> (c, d) }.toMap
    val sample = emb.orderBy(col("vec_id")).limit(5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    for ((vid, vec) <- sample; s <- 0 until PQ.M) {
      val sv = vec.slice(s * PQ.SubDim, (s + 1) * PQ.SubDim)
      val dists = books(s).map { case (cid, cvec) =>
        cid -> sv.zip(cvec).map { case (a, b) => (a - b) * (a - b) }.sum }
      val best = dists.minBy { case (cid, d) => (d, cid) }
      val (gotC, gotD) = byVecSub((vid, s))
      assert(gotC == best._1, s"vec $vid sub $s: got $gotC want ${best._1}")
      assert(math.abs(gotD - best._2) < 1e-6)
    }
    // deterministic: a second fit+assign is bit-identical
    val rows2 = PQ.assignCodes(emb, PQ.fitCodebooks(emb))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.sortBy(r => (r._1, r._2)).sameElements(rows2.sortBy(r => (r._1, r._2))))
  }

  test("ADC distance equals the sum of per-subspace codeword distances") {
    import graft.scale.{ProductQuantize => PQ}
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val books = PQ.fitCodebooks(emb)
    val top = PQ.adcTopK(emb, books, 1L, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(top.length == 10)
    assert(!top.map(_._1).contains(1L))
    // rank order is ascending distance with id tiebreak
    assert(top.map(_._2).sameElements(top.map(_._2).sorted))
    // recompute one result by hand: sum over subspaces of
    // ||q_s - codeword(code_s)||²
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val q = vecs(1L)
    val (someId, someD) = top.head
    val v = vecs(someId)
    val expect = (0 until PQ.M).map { s =>
      val sv = v.slice(s * PQ.SubDim, (s + 1) * PQ.SubDim)
      val qs = q.slice(s * PQ.SubDim, (s + 1) * PQ.SubDim)
      val (_, cw) = books(s).minBy { case (cid, c) =>
        (sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid) }
      qs.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    assert(math.abs(someD - expect) < 1e-5, s"adc $someD vs brute $expect")
  }

  test("IVF-PQ search scores only the probed cell and matches brute force") {
    import graft.scale.{IvfPq, KMeans, ProductQuantize => PQ}
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val model = IvfPq.fit(emb)
    val top = IvfPq.search(emb, model, 1L, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(top.nonEmpty && !top.map(_._1).contains(1L))
    assert(top.map(_._2).sameElements(top.map(_._2).sorted))
    // every hit lives in the query's coarse cell
    val cells = KMeans.assign(emb, model.coarse)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qCell = cells(1L)
    top.foreach { case (id, _) => assert(cells(id) == qCell) }
    // brute-force one distance: residual codeword lookup sum
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def resid(id: Long) = vecs(id).zip(model.coarse.toMap.apply(cells(id)))
      .map { case (x, c) => x - c }
    val qr = resid(1L)
    val (someId, someD) = top.head
    val vr = resid(someId)
    val expect = (0 until PQ.M).map { s =>
      val sv = vr.slice(s * PQ.SubDim, (s + 1) * PQ.SubDim)
      val qs = qr.slice(s * PQ.SubDim, (s + 1) * PQ.SubDim)
      val (_, cw) = model.books(s).minBy { case (cid, c) =>
        (sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid) }
      qs.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    assert(math.abs(someD - expect) < 1e-5, s"ivfpq $someD vs brute $expect")
  }

  test("quantized cosine top-10 recalls the exact top-10") {
    import graft.scale.Similarity
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    def topIds(df: org.apache.spark.sql.DataFrame, vecCol: String): Set[Long] = {
      val q = df.filter(col("vec_id") === 1).select(col(vecCol).as("qv"))
      df.filter(col("vec_id") =!= 1).crossJoin(broadcast(q))
        .select(col("vec_id"), Similarity.cosine(col(vecCol), col("qv")).as("c"))
        .orderBy(col("c").desc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
    }
    val exact = topIds(emb, "embedding")
    val stats = Quantize.dimStats(emb, "embedding")
    val dq = Quantize.dequantize(Quantize.quantize(emb, "embedding"), stats)
      .select(col("vec_id"), col("deq"))
    val approx = topIds(dq, "deq")
    val recall = (exact intersect approx).size / 10.0
    assert(recall >= 0.8, s"quantized recall too low: $recall")
  }
}
