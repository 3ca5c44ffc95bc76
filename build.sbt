ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fstd2pandasspark"
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
// 186 bench queries run in one JVM with MEMORY_AND_DISK caches; a
// small heap ages badly across the run (GC pressure inflated the
// q-series ~28% in round 5's driver bench). Fixed 24g heap
// (-Xms=-Xmx avoids resize pauses) on the 128 GiB box — but only
// when the machine can actually reserve it: -Xms forces the full
// reservation at JVM start, so on a <32 GiB dev box the pin is
// dropped (the heap still grows to -Xmx on demand) instead of
// failing sbt test/run outright. Where total memory is UNKNOWN
// (no /proc/meminfo — macOS/Windows dev boxes), the pin is also
// dropped; set SPARK_DRIVER_MEM explicitly there to force both
// -Xms and -Xmx (it overrides the probe entirely).
val benchHeap = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")
val memKb: Long = try {
  val src = scala.io.Source.fromFile("/proc/meminfo")
  try src.getLines()
    .collectFirst { case l if l.startsWith("MemTotal:") =>
      l.split("\\s+")(1).toLong }.getOrElse(0L)
  finally src.close()
} catch { case _: Throwable => 0L }
val heapPin: Seq[String] =
  if (sys.env.contains("SPARK_DRIVER_MEM") || memKb >= (32L << 20))
    Seq(s"-Xms$benchHeap") else Seq.empty
javaOptions ++= jdk17AddOpens ++ heapPin ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$benchHeap",
  "-XX:+UseG1GC",
  // 180 queries of whole-stage codegen in one JVM generate enough
  // classes to exhaust the default 240 MB JIT code cache, after
  // which late-alphabet queries run partially interpreted (the
  // uniform ~1.5-2x late-run inflation seen on the LSH family)
  "-XX:ReservedCodeCacheSize=1g",
)
// opt-in GC logging for stall adjudication (graft.GcDrain):
// SPARK_GRAFT_GCLOG=/tmp/gc.log adds unified-logging GC output with
// wall-clock timestamps so drain spikes can be correlated to pauses
javaOptions ++= sys.env.get("SPARK_GRAFT_GCLOG")
  .map(f => s"-Xlog:gc*:file=$f:time,uptime,level,tags").toSeq
