package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level RCA for f21_csv_roundtrip (round-10 verdict
  * item 3 — the suite's slowest query at ~4.6 s local median for a
  * 15k-row catalog roundtrip). Times each stage of the roundtrip in
  * isolation in one warm JVM:
  *   1. catalog read + TT filter + level decode (the input)
  *   2. CsvRecords.write (payload string serialization + CSV sink)
  *   3. CSV scan alone (no payload parse)
  *   4. CsvRecords.read with validateDims on/off (the 14-col window)
  *   5. the final posexplode projection
  * Usage: runMain graft.F21Rca [sfDir] [reps]
  */
object F21Rca {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.install(spark)

    val path = graft.core.Scratch.path("graft_f21_rca")
    def timed(tag: String)(f: => Long): Unit = (1 to reps).foreach {
      i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[f21rca] $tag run $i: ${(System.nanoTime() - t0) /
          1e9}%.2f s ($n rows)")
    }

    def base = graft.fixtures.SyntheticCatalog.catalog(spark, sfDir)
      .filter(col("nomvar") === "TT" && col("rid") > 0)
      .withColumn("ip3", col("rid").cast("int"))
      .withColumn("level",
        graft.ops.IpColumns.decodeValue(col("ip1")))
      .drop("ip1")

    timed("1 catalog+filter+decode") { base.count() }
    timed("2 write csv") {
      graft.sources.CsvRecords.write(base, path,
        extraCols = Seq("level")); 0L
    }
    timed("3 csv scan only") {
      spark.read.option("header", "true").csv(path).count()
    }
    timed("4a read validateDims=false") {
      graft.sources.CsvRecords.read(spark, path,
        validateDims = false).count()
    }
    timed("4b read validateDims=true") {
      graft.sources.CsvRecords.read(spark, path).count()
    }
    timed("5 full (read+explode)") {
      graft.sources.CsvRecords.read(spark, path)
        .select(col("ip3").as("rid"), col("nomvar"), col("etiket"),
          graft.ops.IpColumns.decodeValue(col("ip1")).as("level"),
          col("ni"), col("nj"), posexplode(col("d")))
        .count()
    }
    timed("5a parse forced, no explode (sum(size(d)))") {
      graft.sources.CsvRecords.read(spark, path)
        .agg(sum(size(col("d")))).collect()(0).getLong(0)
    }
    timed("5b explode only, no level decode") {
      graft.sources.CsvRecords.read(spark, path)
        .select(col("ip3"), posexplode(col("d"))).count()
    }
    timed("5c parse materialized, then explode") {
      val parsed = graft.sources.CsvRecords.read(spark, path)
        .persist()
      parsed.count()
      val n = parsed
        .select(col("ip3").as("rid"), col("nomvar"), col("etiket"),
          graft.ops.IpColumns.decodeValue(col("ip1")).as("level"),
          col("ni"), col("nj"), posexplode(col("d")))
        .count()
      parsed.unpersist()
      n
    }
    graft.sources.CsvRecords.read(spark, path)
      .select(col("ip3").as("rid"), posexplode(col("d")))
      .explain("formatted")
    spark.stop()
  }
}
