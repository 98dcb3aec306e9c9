package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface of the custom expressions via SparkSessionExtensions. The
  * shared test session was not built with the extensions, so this spec
  * applies the same registrations through the function registry (the
  * injectFunction path is exercised by building the identical triples).
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = Spark.session
    // apply the extension registrations to the existing session
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    Seq(
      ("simhash64", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.SimHash64(e.head)),
      ("dot_product", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.DotProduct(e(0), e(1))),
      ("shingle_hashes", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.ShingleHashes(e.head, GraftExtensions.intArg(e, 1))),
      ("minhash_sig", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.MinHashSig(e.head, GraftExtensions.intArg(e, 1), GraftExtensions.intArg(e, 2))),
      ("poly_hash", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.PolyHash(e.head)),
      ("bpe_token_count", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BpeCount(e.head)),
      ("ws_token_count", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.WsTokenCount(e.head)),
      ("top_k", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.TopKAgg(e(0), e(1), GraftExtensions.intArg(e, 2))),
      ("top_k_str", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.TopKStrAgg(e(0), e(1), GraftExtensions.intArg(e, 2))),
      ("misra_gries", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.MisraGriesAgg(e(0), GraftExtensions.intArg(e, 1))),
      ("count_min", (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.scale.CountMinAgg(e(0), GraftExtensions.intArg(e, 1), GraftExtensions.intArg(e, 2)))
    ).foreach { case (name, builder) =>
      s.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    s
  }

  test("custom expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT simhash64('the quick brown fox') AS h,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       size(shingle_hashes('a b c d', 3)) AS ns,
        |       size(minhash_sig('a b c d e', 2, 16)) AS sig_len
        |""".stripMargin).head()
    assert(r.getAs[Long]("h") == graft.scale.SimHash64.compute("the quick brown fox"))
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Int]("ns") == 2)
    assert(r.getAs[Int]("sig_len") == 16)
  }

  test("top-k aggregates work in SQL GROUP BY") {
    val rows = spark.sql(
      """SELECT g, top_k(s, id, 2) AS t, top_k_str(s, w, 2) AS ts
        |FROM VALUES (1, 3.0D, 10L, 'c'), (1, 5.0D, 11L, 'a'),
        |            (1, 4.0D, 12L, 'b'), (2, 1.0D, 13L, 'z')
        |       AS v(g, s, id, w)
        |GROUP BY g""".stripMargin)
      .collect().map(r => r.getInt(0) -> r).toMap
    val t1 = rows(1).getSeq[org.apache.spark.sql.Row](1)
    assert(t1.map(e => (e.getDouble(0), e.getLong(1))) == Seq((5.0, 11L), (4.0, 12L)))
    val ts1 = rows(1).getSeq[org.apache.spark.sql.Row](2)
    assert(ts1.map(e => (e.getDouble(0), e.getString(1))) == Seq((5.0, "a"), (4.0, "b")))
    assert(rows(2).getSeq[org.apache.spark.sql.Row](1).size == 1)
  }

  test("count_min sketch aggregates in SQL and probes to exact counts") {
    val bytes = spark.sql(
      """SELECT count_min(k, 4, 256) AS sk
        |FROM VALUES (1L), (1L), (1L), (2L), (2L), (3L) AS v(k)""".stripMargin)
      .head().getAs[Array[Byte]]("sk")
    val buf = graft.scale.CMSBuffer.fromBytes(bytes)
    // 3 keys in 256 buckets: estimates are exact here, and never under
    assert(buf.estimate(1L) == 3L && buf.estimate(2L) == 2L && buf.estimate(3L) == 1L)
  }

  test("poly_hash in SQL matches the Column API") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    docs.createOrReplaceTempView("docs_ph")
    val viaSql = spark.sql("SELECT doc_id, poly_hash(text) h FROM docs_ph")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = docs.select(col("doc_id"), graft.scale.PolyHash.polyHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("token-count expressions are callable from SQL and match the Column API") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    docs.createOrReplaceTempView("docs_tc")
    val viaSql = spark.sql(
      "SELECT doc_id, bpe_token_count(text) b, ws_token_count(text) w FROM docs_tc")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val viaCol = docs.select(col("doc_id"),
      graft.functions.BpeCount.bpeCount(col("text")).as("b"),
      graft.functions.WsTokenCount.wsTokenCount(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(viaSql == viaCol)
  }

  test("SQL and Column API produce identical values over documents") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql("SELECT doc_id, simhash64(text) h FROM docs_ext")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = docs.select(col("doc_id"), graft.scale.SimHash64.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }
}
