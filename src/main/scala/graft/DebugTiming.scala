package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/sf1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    Tables.events(spark, dir).count()
    (1 to 3).foreach { i =>
      t(s"q_event_norm $i")(analytics.TransformQueries.eventNorm(spark, dir).collect())
    }
    val ev = Tables.events(spark, dir)
    val k = get_json_object(col("props"), "$.k").cast("int")
    t("variant: precompute messy col")(
      ev.withColumn("kk", k)
        .withColumn("messy", when(col("kk") % 3 === 0, upper(col("event_type")))
          .when(col("kk") % 3 === 1, concat(col("event_type"), lit("-EXTRA")))
          .otherwise(col("event_type")))
        .groupBy(graft.functions.Normalize.normalizeEventType(col("messy")).as("n"))
        .agg(count(lit(1))).collect())
    spark.stop()
  }
}
