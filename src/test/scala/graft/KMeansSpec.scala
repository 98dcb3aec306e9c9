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

  test("NearestCentroid is bit-identical to the composed array_min form") {
    // The constant-table expression replaced array_min over k
    // struct(d2, cid) candidates (the JIT-cliff fix, r7). The oracle SQL
    // still replays the composed arithmetic, so the two forms must agree
    // to the LAST BIT: same left-to-right dot accumulation, same
    // (vv − 2·dvc) + cc association, same Double.compare ordering with
    // the lowest-cid tiebreak.
    import graft.scale.VectorOps
    val cents = KMeans.fit(emb, 7, 1) // odd k, off the usual 8 path
    val composed = cents.sortBy(_._1).map { case (cid, c) =>
      val cl = typedLit(c)
      struct(
        (VectorOps.dot(col("embedding"), col("embedding")) -
          lit(2.0) * VectorOps.dot(col("embedding"), cl) +
          VectorOps.dot(cl, cl)).as("d"),
        lit(cid).as("c"))
    }
    val both = emb
      .withColumn("__old", array_min(array(composed: _*)))
      .withColumn("__new", graft.scale.KMeansExprs.nearestCentroid(col("embedding"), cents))
      .select(col("vec_id"), col("__old.c").as("oc"), col("__old.d").as("od"),
        col("__new.c").as("nc"), col("__new.d").as("nd"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getInt(1) == r.getInt(3), s"cluster mismatch on vec ${r.getLong(0)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        s"dist2 not bit-identical on vec ${r.getLong(0)}: ${r.getDouble(2)} vs ${r.getDouble(4)}")
    }
  }

  test("MatVecDot is bit-identical to per-row literal dots") {
    import graft.scale.VectorOps
    val rows = (0 until 5).map(k => (0 until 64).map(j =>
      if (((k * 64 + j) * 2654435761L >>> 13) % 2 == 0) 1.0 else -1.0))
    val cmp = emb
      .withColumn("__mv", VectorOps.matVec(col("embedding"), rows))
      .select(col("vec_id"),
        array(rows.map(r => VectorOps.dot(col("embedding"), typedLit(r))): _*).as("lit_dots"),
        col("__mv"))
      .collect()
    cmp.foreach { r =>
      val a = r.getSeq[Double](1)
      val b = r.getSeq[Double](2)
      assert(a.size == b.size)
      a.indices.foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(a(i)) ==
          java.lang.Double.doubleToRawLongBits(b(i)),
          s"component $i differs on vec ${r.getLong(0)}")
      }
    }
  }
}
