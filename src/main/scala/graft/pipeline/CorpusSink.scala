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
    * parquet directories under `path` (shard=K subdirs, one file per
    * shard). Returns the shard assignment for verification.
    */
  def writeSharded(df: DataFrame, path: String, nShards: Int)
      : DataFrame = {
    val sharded = df
      .withColumn("shard",
        pmod(h64(col("text"), 29), lit(nShards.toLong)).cast("int"))
      .withColumn("ord", h64(col("text"), 31))
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col("doc_id"))
      .drop("ord")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    sharded.select(col("doc_id"), col("shard"))
  }
}
