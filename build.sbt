ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "iheardaidatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 128 GiB box; 8g forced frequent GC pauses that dominated bench
  // variance (same query 0.7s-8s across runs)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Fault the whole heap in at JVM start: this host's kernel commits
  // fresh pages ~8x slower than normal (measured: 2 GB of young-gen
  // allocation = 7.5 s cold vs 0.34 s pretouched), which surfaced as
  // 850 ms young-GC pauses and heartbeat stalls whenever G1 grew or
  // recommitted regions mid-query. Paying the fault cost once at
  // startup (~3 s per 4 GB, parallel) keeps GC out of the timed path.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
  // A full-registry sweep generates thousands of whole-stage-codegen
  // classes; the JDK 17 default code cache (240 MB) fills mid-sweep and
  // the sweep's codegen-heaviest queries then pay JIT flush/recompile
  // churn INSIDE their timings (r12 baseline: q_scd2_priority 19.2 s
  // in-sweep vs 5.2 s isolated, q_containment_lsh 36 s cold in-sweep).
  // 512 MB keeps the whole sweep's hot methods resident; same-session
  // A/B in OPTIMIZATION_r12.md.
  "-XX:ReservedCodeCacheSize=512m",
)
