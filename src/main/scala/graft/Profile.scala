package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one query several times in a warm JVM so per-plan
  * codegen fixed cost (run 1 only) separates from data work (every
  * run). Usage: runMain graft.Profile <sfDir> <query> [repeats]
  * SPARK_GRAFT_CONF="k=v;k=v" applies session-conf overrides (e.g.
  * spark.sql.files.openCostInBytes to A/B the sub-file split).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "p32_tfidf_topk"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            spark.conf.set(k, v)
            println(s"[profile] conf override: $k=$v")
          case _ => sys.error(
            s"SPARK_GRAFT_CONF entry '$kv' is not key=value")
        }
      }
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.core.CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      println(f"[profile] $name run $i: $secs%.2f s ($n rows)")
    }
    spark.stop()
  }
}
