package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: adjudicate the f45/f46 drain-spike class (round-10
  * verdict "what's wrong" #2). Runs N alternating reps of
  * f45_stream_dedup (streaming drain) and f46_quick_pressure_sa in
  * one warm JVM, printing WALL-CLOCK START/END stamps per rep so the
  * series can be joined against a `-Xlog:gc*` log written by the same
  * JVM (build.sbt: set SPARK_GRAFT_GCLOG=/path/gc.log).
  *
  * The open question this answers: the ~1-in-8 f45 drain spike
  * (9-16 s vs a 2.4 s floor) was adjudicated "JVM/host pauses" on
  * correlation evidence only — f46 in the same window also inflates —
  * but no GC log had ever been captured during a spike. If a spike
  * rep's window contains multi-second GC pause records, the pause
  * class is named; if the GC log shows only sub-100ms pauses inside a
  * spike window, the JVM is exonerated and the hypothesis moves to
  * host-level contention (CPU steal / page cache).
  *
  * Usage: SPARK_GRAFT_GCLOG=/tmp/gc_drain.log \
  *   runMain graft.GcDrain [sfDir] [reps]
  */
object GcDrain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    def stamp(): String = fmt.format(java.time.Instant.now())
    println(s"[gcdrain] gc log: ${sys.env.getOrElse("SPARK_GRAFT_GCLOG",
      "NOT SET — rerun with SPARK_GRAFT_GCLOG for pause correlation")}")
    // warmup both plans once (codegen fixed cost out of the series)
    Seq("f45_stream_dedup", "f46_quick_pressure_sa").foreach { q =>
      SparkEntry.queries(q)(spark, sfDir).count()
    }
    (1 to reps).foreach { i =>
      Seq("f45_stream_dedup", "f46_quick_pressure_sa").foreach { q =>
        val s0 = stamp()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[gcdrain] rep $i%2d $q start=$s0 end=${stamp()} " +
          f"secs=$secs%6.2f rows=$rows${if (secs > 6) "  <-- SPIKE"
            else ""}")
        graft.core.CacheRegistry.releaseAll()
      }
    }
    spark.stop()
  }
}
