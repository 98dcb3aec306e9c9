package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Normalize, Scoring}
import graft.stages.Upsert

/** ScalaCheck properties (SURVEY §5): score clamping, normalizer
  * idempotence, last-write-wins upsert. Driven through the engine in
  * batched DataFrames (one Spark job per property batch, not per case).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  /** scalatestplus isn't in the offline cache; drive ScalaCheck Gens
    * directly with fixed seeds (deterministic, batched into one Spark
    * job per seed).
    */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (1L to 5L).foreach { s =>
      f(gen.pureApply(Gen.Parameters.default, Seed(s)))
    }

  val messyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.const(""), Gen.const("  "),
    Gen.asciiPrintableStr.map(s => s"  $s  "),
    Gen.oneOf("a@b.co", "X@Y.ORG  ", "not an email", "user.name+tag@host.dom"))

  test("normalizers are idempotent: norm(norm(x)) == norm(x)") {
    forAll(Gen.listOfN(50, messyString)) { xs =>
      val df = xs.toDF("x")
        .select(Normalize.normString(col("x")).as("n1"),
          Normalize.normalizeEmail(col("x")).as("e1"),
          Normalize.normalizeEventType(col("x")).as("t1"))
        .select(col("n1"), Normalize.normString(col("n1")).as("n2"),
          col("e1"), Normalize.normalizeEmail(col("e1")).as("e2"),
          col("t1"), Normalize.normalizeEventType(col("t1")).as("t2"))
      df.collect().foreach { r =>
        assert(r.get(0) == r.get(1), s"normString not idempotent: $r")
        assert(r.get(2) == r.get(3), s"normalizeEmail not idempotent: $r")
        assert(r.get(4) == r.get(5), s"normalizeEventType not idempotent: $r")
      }
    }
  }

  test("scores clamp to [0,100] for arbitrary inputs") {
    val gen = for {
      text <- Gen.oneOf(Gen.const(""), Gen.asciiPrintableStr,
        Gen.const("sorry cannot help " * 50), Gen.const("recommend here steps try solution " * 20))
      tokens <- Gen.chooseNum(-100, 5000)
      lat <- Gen.chooseNum(-10.0, 100000.0)
    } yield (text, tokens, lat)
    forAll(Gen.listOfN(50, gen)) { xs =>
      val df = xs.toDF("text", "tokens", "lat").select(
        Scoring.completenessScore(col("text")).as("c"),
        Scoring.relevanceScore(col("text")).as("r"),
        Scoring.helpfulnessScore(col("text")).as("h"),
        Scoring.businessValueScore(col("text"), col("tokens")).as("b"),
        Scoring.efficiencyScore(col("tokens"), col("lat")).as("e"),
        Scoring.engagementScore(col("text"), col("tokens")).as("g"))
      df.collect().foreach { row =>
        (0 until row.length).foreach { i =>
          val v = row.get(i) match {
            case d: Double => d
            case n: Int => n.toDouble
            case other => fail(s"unexpected type $other")
          }
          assert(v >= 0 && v <= 100, s"score out of range: $row")
        }
      }
    }
  }

  test("last-write-wins upsert keeps exactly the max-version row per key") {
    val gen = for {
      key <- Gen.chooseNum(0, 20)
      version <- Gen.chooseNum(0, 1000)
      payload <- Gen.alphaNumStr
    } yield (key, version, payload)
    forAll(Gen.listOfN(200, gen)) { rows =>
      val df = rows.toDF("k", "v", "p")
      val got = Upsert.lastWriteWins(df, Seq("k"), Seq(col("v").desc, col("p").desc))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
      val exp = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
      assert(got.keySet == exp.keySet)
      got.foreach { case (k, v) => assert(v == exp(k)) }
      // idempotence: applying twice changes nothing
      val once = Upsert.lastWriteWins(df, Seq("k"), Seq(col("v").desc, col("p").desc))
      val twice = Upsert.lastWriteWins(once, Seq("k"), Seq(col("v").desc, col("p").desc))
      assert(twice.count() == once.count())
    }
  }

  test("markov attribution matches a local 8-step absorption recomputation") {
    def snap(x: Double, s: Int) = {
      val p = math.pow(10, s); math.floor(x * p + 0.5) / p
    }
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // transition + first-touch counts under the (ts, event_id) order
    val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      counts(("(start)", ordered.head)) =
        counts.getOrElse(("(start)", ordered.head), 0L) + 1
      ordered.sliding(2).filter(_.length == 2).foreach { p =>
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1
      }
    }
    val totals = counts.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val p = counts.map { case ((a, b), n) => (a, b) -> snap(n.toDouble / totals(a), 9) }
    val states = totals.keys.toSeq
    val channels = states.filter(s => s != "(start)" && s != "purchase")
    def reach8(rc: String): Double = {
      val st = states.filter(_ != rc)
      val d = st.map(s =>
        s -> p.getOrElse((s, "purchase"), 0.0)).toMap
      var reach = d
      for (_ <- 2 to analytics.Attribution.MarkovSteps) {
        val prev = reach
        reach = st.map { i =>
          val c = snap(st.filter(j => j != "purchase" && prev.contains(j))
            .map(j => p.getOrElse((i, j), 0.0) * prev(j)).sum, 9)
          i -> snap(d(i) + c, 9)
        }.toMap
      }
      reach("(start)")
    }
    val base = reach8("(none)")
    val eff = channels.map { c =>
      val r = reach8(c)
      c -> (r, if (base > 0) Some(snap(1.0 - r / base, 6)) else None)
    }.toMap
    val tot = snap(eff.values.map(_._2.map(x => math.max(x, 0.0)).getOrElse(0.0)).sum, 9)
    val got = analytics.Attribution.markovAttribution(spark, sf).collect()
    assert(got.length == channels.size)
    got.foreach { r =>
      val ch = r.getString(0)
      val (rr, re) = eff(ch)
      assert(r.getAs[Double]("reach_removed") == rr, s"$ch reach")
      assert(r.getAs[Double]("reach_full") == base, s"$ch base")
      assert(Option(r.getAs[java.lang.Double]("removal_effect"))
        .map(_.doubleValue) == re, s"$ch effect")
      // removing a state only deletes paths: reach can never increase
      assert(rr <= base + 1e-9, s"$ch monotone")
      val wantShare =
        if (tot > 0) Some(snap(re.map(x => math.max(x, 0.0)).getOrElse(0.0) / tot, 6))
        else None
      assert(Option(r.getAs[java.lang.Double]("attribution_share"))
        .map(_.doubleValue) == wantShare, s"$ch share")
    }
  }

  test("CDC apply: snapshot diff applied to the T1 state reproduces the T2 state") {
    val sf = "/root/testdata/sf0.001"
    def stateAt(cut: String) = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), Num.ssum(sum(col("o_totalprice")), 2, 2).as("rev"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val t1 = stateAt(analytics.Audit.SnapT1)
    val t2 = stateAt(analytics.Audit.SnapT2)
    val diff = analytics.Audit.snapshotDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    // every diff row's old side matches T1 and new side matches T2
    diff.foreach { case (k, typ, nOld, nNew, revOld, revNew) =>
      if (typ == "insert") {
        assert(!t1.contains(k) && nOld == 0L && revOld == 0.0, s"bad insert for $k")
      } else {
        assert(typ == "update" && t1(k) == ((nOld, revOld)), s"bad update-old for $k")
      }
      assert(t2(k) == ((nNew, revNew)), s"bad new state for $k")
    }
    // applying the diff to T1 yields exactly T2 (untouched keys carry over)
    val applied = t1 ++ diff.map { case (k, _, _, nNew, _, revNew) => k -> ((nNew, revNew)) }
    assert(applied == t2)
    assert(diff.nonEmpty)
  }
}
