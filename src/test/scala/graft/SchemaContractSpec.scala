package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Loud, early diagnosis of testdata-generator drift. The driver
  * regenerates /root/testdata between rounds and has already changed an
  * encoding under us once (events.ts TIMESTAMP(NANOS) → timestamp[us],
  * which cost round 5 nine oracle queries before anyone knew why). This
  * spec pins each table's column NAMES exactly and each column's type to
  * an allowed family, so the next silent flip fails here with the table
  * and column named instead of as a pile of downstream analysis errors.
  */
class SchemaContractSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  /** Allowed type families: the generator has legitimately flipped
    * within these (timestamps across nanos-long / µs-NTZ / µs-LTZ; key
    * widths int32 vs int64).
    */
  private val ints: Set[DataType] = Set(IntegerType, LongType)
  private val ts: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)

  private def check(table: String, expect: Seq[(String, Set[DataType])]): Unit = {
    val schema = Tables.load(spark, sf, table).schema
    assert(schema.fieldNames.toSeq == expect.map(_._1),
      s"$table columns drifted: got ${schema.fieldNames.toSeq}, " +
        s"expected ${expect.map(_._1)}")
    for ((name, allowed) <- expect) {
      val dt = schema(name).dataType
      assert(allowed.contains(dt),
        s"$table.$name type drifted to $dt (allowed: $allowed) — if the " +
          "generator changed an encoding again, extend the Tables loader " +
          "like the events.ts ts arms, then widen this contract")
    }
  }

  test("all ten testdata tables match the schema contract") {
    check("region", Seq("r_regionkey" -> ints, "r_name" -> Set(StringType)))
    check("nation", Seq("n_nationkey" -> ints, "n_name" -> Set(StringType),
      "n_regionkey" -> ints))
    check("customer", Seq("c_custkey" -> ints, "c_name" -> Set(StringType),
      "c_nationkey" -> ints, "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)))
    check("supplier", Seq("s_suppkey" -> ints, "s_name" -> Set(StringType),
      "s_nationkey" -> ints, "s_acctbal" -> Set(DoubleType)))
    check("part", Seq("p_partkey" -> ints, "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> ints, "p_retailprice" -> Set(DoubleType)))
    check("orders", Seq("o_orderkey" -> ints, "o_custkey" -> ints,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)))
    check("lineitem", Seq("l_orderkey" -> ints, "l_partkey" -> ints,
      "l_suppkey" -> ints, "l_linenumber" -> ints,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> ts))
    check("events", Seq("event_id" -> ints, "ts" -> ts, "user_id" -> ints,
      "event_type" -> Set(StringType), "value" -> Set(DoubleType),
      "props" -> Set(StringType)))
    check("documents", Seq("doc_id" -> ints, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> ints))
    check("embeddings", Seq("vec_id" -> ints,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = true),
        ArrayType(DoubleType), ArrayType(DoubleType, containsNull = true)),
      "label" -> ints))
  }

  test("the normalized events loader always yields TimestampType ts") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
  }
}
