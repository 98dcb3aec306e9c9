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
}
