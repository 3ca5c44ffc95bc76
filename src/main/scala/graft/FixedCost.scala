package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: decompose per-query bench cost into first-run fixed cost
  * (Catalyst + codegen compile + JIT) vs steady-state data work, for
  * MANY queries in one warm JVM. For each named query (or all, with
  * "all") it times `reps` consecutive runs; run 1 approximates what
  * the bench pays (every bench query is first-run), run N the
  * distributed data work. Usage:
  *   runMain graft.FixedCost <sfDir> <reps> <q1,q2,...|all>
  */
object FixedCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val which = if (args.length > 2) args(2) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "8192")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"bad SPARK_GRAFT_CONF entry '$kv'")
        }
      }
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    try {
      graft.streaming.StreamDrain.drain(spark,
        spark.readStream.format("rate")
          .option("rowsPerSecond", "1").option("numPartitions", "1")
          .load().groupBy().count(),
        "complete", "fixedcost_warmup", shufflePartitions = 1,
        timeoutMs = 60000L).count()
    } catch { case _: Throwable => () }
    val names = which match {
      case "all" => SparkEntry.queries.keys.toSeq.sorted
      case s => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.US, v)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable => println(s"[fixedcost] $n ERR $e") }
        val s = (System.nanoTime() - t0) / 1e9
        graft.core.CacheRegistry.releaseAll(); spark.catalog.clearCache()
        s
      }
      println(s"[fixedcost] $n ${ts.map(f2).mkString(" ")} " +
        s"fixed=${f2(ts.head - ts.last)}")
    }
    spark.stop()
  }
}
