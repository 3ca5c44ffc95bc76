package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
      // guard the sequence: sequence(1, 0) is an error in Spark, so an
      // empty document must short-circuit to 0 instead of crashing
      .withColumn("cp_sum", expr(
        "CASE WHEN length(text) = 0 THEN 0L ELSE " +
          "aggregate(sequence(1, length(text), 16), 0L, " +
          "(acc, i) -> acc + ascii(substring(text, i, 1))) END"))

  val FeatureDim = 8

  /** Batch "decode" per partition: the production shape for media
    * decoding (one codec init per partition, streaming rows through).
    * Typed `Dataset.mapPartitions`, NOT `.rdd` — rows stay Tungsten
    * end to end (deserialize/serialize at the codec boundary only,
    * no RDD↔DataFrame plan break). STUB: features are a
    * deterministic hash-based fake — replace the body of
    * `fakeFeatures` with a real image/audio decode when codec
    * libraries are available.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: initialize codec once here
        it.map { case (id, payload) =>
          (id, fakeFeatures(payload))
        }
      }
      .toDF("doc_id", "features")
  }

  private def fakeFeatures(payload: Array[Byte]): Array[Float] = {
    // deterministic stand-in: strided byte averages. The sum is exact
    // (Long) and rounds once via a double divide, so any engine
    // computing sum/count in integer+double arithmetic agrees
    // bit-for-bit with the emitted float. Single pass over the
    // payload (the per-feature filtered-slice formulation allocated
    // 8 boxed index sequences per row and dominated the batch).
    val sums = new Array[Long](FeatureDim)
    val cnts = new Array[Int](FeatureDim)
    var i = 0
    while (i < payload.length) {
      val k = i % FeatureDim
      sums(k) += (payload(i) & 0xFF).toLong
      cnts(k) += 1
      i += 1
    }
    Array.tabulate(FeatureDim) { k =>
      if (cnts(k) == 0) 0f
      else (sums(k).toDouble / cnts(k)).toFloat
    }
  }

  /** Frame sampling: one row per sampled "frame" of the payload —
    * the Spark shape for video frame extraction (explode, one output
    * row per frame, frame index + offset carried as metadata). The
    * frame boundaries here are a deterministic byte stride standing in
    * for container parsing: frame k covers payload bytes
    * [k*frameBytes, (k+1)*frameBytes). Every sampled frame keeps its
    * index so downstream per-frame decode can re-group to the source.
    * Expression-only (substring on binary is codegen'd); the explode
    * multiplies rows, never payload copies across a shuffle.
    */
  def frameSample(df: DataFrame, frameBytes: Int = 64,
                  everyNth: Int = 4): DataFrame =
    df.select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          greatest(ceil(octet_length(col("payload")).cast("double")
            / frameBytes).cast("int") - 1, lit(0)),
          lit(everyNth))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("frame_offset"),
        substring(col("payload"), col("frame_idx") * frameBytes + 1,
          lit(frameBytes)).as("frame_payload"))

  /** Resize: fixed-target downsample of the payload — the Spark shape
    * for image resizing (payload in, smaller payload out, target size
    * in metadata; per-row expression work, no shuffle). STUB geometry:
    * keeps every ceil(len/targetBytes)-th byte via a strided gather —
    * replace with a real scaler when codec libraries are available.
    * NOTE: stride geometry is byte-based while gathering is by char
    * index — exact only for single-byte payloads (the stub contract;
    * the oracle mirrors the same arithmetic bit-for-bit).
    */
  def resizeStub(df: DataFrame, targetBytes: Int = 32): DataFrame = {
    val len = octet_length(col("payload"))
    val stride = greatest(ceil(len.cast("double") / targetBytes)
      .cast("int"), lit(1))
    df.withColumn("resized",
        when(len === 0, col("payload")).otherwise(
          array_join(transform(
            sequence(lit(1), len, stride),
            i => substring(col("payload").cast("string"), i, lit(1))), "")
            .cast("binary")))
      .withColumn("resize_meta", struct(
        lit(targetBytes).as("target_bytes"),
        octet_length(col("resized")).as("actual_bytes"),
        stride.as("stride")))
  }
}
