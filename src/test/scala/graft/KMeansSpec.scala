package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.scale.KMeans

/** Lloyd's-invariant checks for the deterministic k-means codebook
  * trainer: WCSS monotonicity, determinism, assignment totality, and the
  * trained-IVF search staying faithful to brute force on its own bucket.
  */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"
  lazy val emb = Tables.embeddings(spark, sf).cache()

  test("WCSS is non-increasing across Lloyd iterations") {
    val w = (0 to 3).map(i => KMeans.wcss(emb, KMeans.fit(emb, 8, i)))
    w.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"WCSS rose: $w")
    }
    assert(w.last < w.head, s"no progress over 3 iterations: $w")
  }

  test("fit is deterministic: two runs produce identical codebooks") {
    val a = KMeans.fit(emb, 8, 2)
    val b = KMeans.fit(emb, 8, 2)
    assert(a == b)
  }

  test("assignment is total and clusters are within range") {
    val n = emb.count()
    val assigned = KMeans.assign(emb, KMeans.fit(emb, 8, 1))
    assert(assigned.count() == n)
    val clusters = assigned.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf((0 until 8).toSet))
    assert(clusters.size > 1, "degenerate single-cluster fit")
  }

  test("trained IVF matches brute force within the probed bucket") {
    val cs = KMeans.fit(emb, 8, 2)
    val ivf = KMeans.ivfTopKTrained(emb, cs, 0L, 5)
      .select("vec_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // every IVF hit must carry the exact brute-force cosine for that id
    val brute = graft.scale.Similarity
      .bruteForceTopK(emb, 0L, 500).select("vec_id", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    ivf.foreach { case (id, sim) =>
      assert(math.abs(brute(id) - sim) < 1e-9, s"vec $id: $sim vs ${brute(id)}")
    }
    assert(ivf.nonEmpty)
  }

  test("assignment plan has no shuffle (centroids are inlined literals)") {
    val plan = KMeans.assign(emb, KMeans.seeds(emb, 8))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffled:\n$plan")
  }
}
