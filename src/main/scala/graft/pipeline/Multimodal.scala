package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat media as opaque `binary` payloads
  * with typed metadata, processed by per-partition batch functions.
  *
  * The image/audio codec libraries are not available in this
  * environment, so [[decodeStub]] is a clearly-marked deterministic
  * fake; the Spark-side shape — binary column + metadata struct +
  * mapPartitions batch decode returning fixed-size feature vectors —
  * is the real, tested plumbing a production codec would plug into
  * (swap `fakeFeatures` for the actual decode).
  */
object Multimodal {

  /** Wrap text rows as (doc_id, payload BINARY, media_meta STRUCT). */
  def toBinaryRecords(df: DataFrame): DataFrame =
    df.withColumn("payload", col("text").cast("binary"))
      .withColumn("media_meta", struct(
        lit("text/plain").as("mime"),
        col("n_chars").as("n_bytes_hint")))

  /** Scalar feature extraction over the payload (expression-only,
    * codegen-friendly): byte length, digest, head codepoint, and a
    * strided codepoint checksum standing in for frame sampling.
    */
  def features(df: DataFrame): DataFrame =
    df.withColumn("byte_len", octet_length(col("text")).cast("long"))
      .withColumn("digest", md5(col("payload")))
      .withColumn("head_cp", ascii(substring(col("text"), 1, 1)))
      .withColumn("cp_sum", expr(
        "aggregate(sequence(1, length(text), 16), 0L, " +
          "(acc, i) -> acc + ascii(substring(text, i, 1)))"))

  val FeatureDim = 8

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType, false),
    StructField("features", ArrayType(FloatType, false), false)))

  /** Batch "decode" per partition: the production shape for media
    * decoding (one codec init per partition, streaming rows through).
    * STUB: features are a deterministic hash-based fake — replace the
    * body of `fakeFeatures` with a real image/audio decode when codec
    * libraries are available.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select("doc_id", "payload").rdd.mapPartitions { it =>
      // real impl: initialize codec once here
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        Row(id, fakeFeatures(payload))
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  private def fakeFeatures(payload: Array[Byte]): Seq[Float] = {
    // deterministic stand-in: strided byte averages
    (0 until FeatureDim).map { k =>
      val slice = payload.indices.filter(_ % FeatureDim == k)
      if (slice.isEmpty) 0f
      else slice.map(i => (payload(i) & 0xFF).toFloat).sum / slice.size
    }
  }
}
