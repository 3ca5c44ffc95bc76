package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.PipelineOps.h64

/** End-of-pipeline corpus export: deterministic sharded parquet in
  * the layout a training job consumes.
  *
  * Shard assignment is the content hash p29/p48 use (stable across
  * runs and cluster sizes — adding executors cannot move a doc to a
  * different shard), each shard becomes exactly ONE output task via
  * `repartition(n, shard)`, and rows inside a shard are laid out in
  * the same deterministic hash order p48 packs sequences in, so a
  * reader streaming a shard file sees the training order without any
  * global sort ever happening: ordering work is one
  * sortWithinPartitions, bounded by the shard.
  */
object CorpusSink {

  /** Write `df` (must have doc_id and text) as `nShards` hash-sharded
    * directories under `path` (shard=K subdirs, one file per shard).
    * `format` is "parquet" (default) or "json" — JSON-lines being the
    * interchange format most LLM-training toolchains ingest; the
    * shard layout, one-task-per-shard plan, and in-shard training
    * order are IDENTICAL for both (the format only swaps the
    * FileFormat at the sink). Returns the shard assignment for
    * verification.
    */
  def writeSharded(df: DataFrame, path: String, nShards: Int,
                   format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "json",
      s"corpus_sink: unsupported format '$format' " +
        "(parquet and json-lines are the corpus layouts)")
    val sharded = df
      .withColumn("shard",
        pmod(h64(col("text"), 29), lit(nShards.toLong)).cast("int"))
      .withColumn("ord", h64(col("text"), 31))
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col("doc_id"))
      .drop("ord")
      .write.mode("overwrite").partitionBy("shard").format(format)
      .save(path)
    sharded.select(col("doc_id"), col("shard"))
  }
}
