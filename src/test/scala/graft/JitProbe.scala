package graft

/** Ad-hoc generated-bytecode probe for a named registered query —
  * the iteration tool behind the RegistrySweepSpec JIT pin (running the
  * full 223-query sweep to check one projection split costs minutes;
  * this answers in seconds). Prints every whole-stage method size so a
  * split's effect on the WIDEST method is visible, not just the max.
  *
  * Run: sbt "Test/runMain graft.JitProbe q_lead_geo_ts"
  */
object JitProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.debug._
    val spark = Spark.session
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_lead_geo_ts")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val stats = codegenStringSeq(df.queryExecution.executedPlan)
      val sizes = stats.map(_._3.maxMethodCodeSize).sorted.reverse
      println(s"JITPROBE $name worst=${sizes.headOption.getOrElse(0)} all=${sizes.mkString(",")}")
      if (sys.env.contains("JITPROBE_DUMP")) {
        val (sub, code, st) = stats.maxBy(_._3.maxMethodCodeSize)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/jitprobe_$name.java"), code)
        println(s"JITPROBE dumped worst stage ($st) of:\n$sub\nto /tmp/jitprobe_$name.java")
      }
    }
    spark.stop()
  }
}
