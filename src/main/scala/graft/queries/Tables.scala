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
  /** `events.ts` has shipped as three different physical types across
    * driver testdata regenerations; normalize every variant to a plain
    * TIMESTAMP whose epoch-µs equals the file's wall clock read as UTC
    * (what DuckDB's `epoch`/`epoch_ns` on the naive value yields):
    *  - TIMESTAMP(NANOS) → raw long under
    *    spark.sql.legacy.parquet.nanosAsLong; floor-divide to µs.
    *    Integer `div`, NOT `/`: double division loses precision above
    *    2^53 and nanosecond epochs (~1.7e18) are far beyond it.
    *  - Timestamp(isAdjustedToUTC=false, µs) → TIMESTAMP_NTZ in Spark 4;
    *    `timestampdiff` between NTZ operands is pure calendar
    *    arithmetic, so the epoch-µs extraction cannot shift under a
    *    non-UTC session/driver timezone (a session-TZ cast could).
    *  - TIMESTAMP (already adjusted-to-UTC) → as-is.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", timestamp_micros(expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
