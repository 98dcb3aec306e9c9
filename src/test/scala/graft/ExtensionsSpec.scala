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
        graft.scale.MinHashSig(e.head, GraftExtensions.intArg(e, 1), GraftExtensions.intArg(e, 2)))
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
