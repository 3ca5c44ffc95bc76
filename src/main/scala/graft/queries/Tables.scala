package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All query entry points receive `(SparkSession, sfDir)` and read
  * tables through here so every scan benefits from parquet column
  * pruning + predicate pushdown (verified via `.explain`:
  * `PushedFilters`/`ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark 4 reads only
    * as a raw long (spark.sql.legacy.parquet.nanosAsLong). Convert to a
    * micro-precision timestamp (truncation — matching what a native
    * nanos→micros read would do).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = table(s, d, "events")
    // integer `div`, NOT `/`: double division loses precision above
    // 2^53, and nanosecond epochs (~1.7e18) are far beyond it — the
    // double path lands ±hundreds of ns off the exact truncation
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
