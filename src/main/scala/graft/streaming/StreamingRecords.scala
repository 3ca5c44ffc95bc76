package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Decode, IpColumns}

/** Streaming extension point (SURVEY.md §2.10: the reference is
  * batch-only; this is the Spark-native growth path).
  *
  * Arriving CSV record files (CsvRecords cell format) become an
  * unbounded record catalog; the decode layer applies unchanged
  * because it is pure Column expressions. Includes the two canonical
  * streaming shapes over the catalog:
  *  - watermarked windowed counts on the decoded validity time;
  *  - streaming dedup on the 19-column record identity.
  */
object StreamingRecords {

  /** Raw schema of streamed record CSVs (payload still a string). */
  val CsvSchema: StructType = StructType(Seq(
    StructField("nomvar", StringType), StructField("typvar", StringType),
    StructField("etiket", StringType), StructField("dateo", LongType),
    StructField("datev", LongType), StructField("ip1", IntegerType),
    StructField("ip2", IntegerType), StructField("ip3", IntegerType),
    StructField("deet", IntegerType), StructField("npas", IntegerType),
    StructField("datyp", IntegerType), StructField("nbits", IntegerType),
    StructField("grtyp", StringType), StructField("ig1", IntegerType),
    StructField("ig2", IntegerType), StructField("ig3", IntegerType),
    StructField("ig4", IntegerType), StructField("d", StringType)))

  /** `readStream` over a directory of record CSVs -> streaming record
    * catalog with parsed payload and decoded validity timestamp.
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.readStream
      .schema(CsvSchema)
      .option("header", "true")
      .csv(path)
    val rows = transform(split(col("d"), ";"), r => split(r, ","))
    raw
      .withColumn("rows", rows)
      .withColumn("ni", size(col("rows")))
      .withColumn("nj", size(element_at(col("rows"), 1)))
      .withColumn("d", transform(
        sequence(lit(0), col("ni") * col("nj") - 1),
        k => element_at(
          element_at(col("rows"), pmod(k, col("ni")).cast("int") + 1),
          (k / col("ni")).cast("int") + 1).cast("float")))
      .drop("rows")
      .withColumn("nk", lit(1))
      .withColumn("date_of_validity",
        IpColumns.stampToTimestamp(col("datev")))
      .transform(Decode.addGrid)
  }

  /** Watermarked per-variable counts in 1-hour validity windows. */
  def windowedCounts(records: DataFrame): DataFrame =
    records
      .withWatermark("date_of_validity", "2 hours")
      .groupBy(window(col("date_of_validity"), "1 hour"), col("nomvar"))
      .agg(count(lit(1)).as("n_records"),
        approx_count_distinct("grid").as("n_grids"))

  /** Streaming dedup on the record identity (A2 semantics with a
    * watermark bounding the dedup state).
    */
  def dedup(records: DataFrame): DataFrame =
    records
      .withWatermark("date_of_validity", "2 hours")
      .dropDuplicatesWithinWatermark(
        graft.core.Constants.DedupColumns :+ "date_of_validity")
}
