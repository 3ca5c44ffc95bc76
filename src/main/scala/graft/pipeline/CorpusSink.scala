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

  /** The one-call exact-dedup maintenance pass for an append-mode
    * corpus sink — the documented cure for the at-least-once replay
    * artifact [[graft.Api.continuousBuild]] leaves behind (a crash
    * between the corpus and index appends replays the batch, so the
    * corpus holds exact doc_id duplicates; no doc is ever lost).
    * Rewrites the parquet corpus at `path` keeping one row per
    * doc_id and swaps with the same two-rename protocol as the index
    * compactions (guarded by [[graft.core.Swaps]]; a crash between
    * the renames leaves both full copies recoverable and every later
    * call refuses loudly until resolved). Returns the number of rows
    * removed. Duplicate rows from the replay are bit-identical, so
    * which row survives per doc_id is immaterial; run it off the
    * serving path — the rewrite reads the corpus once.
    */
  def dedupExact(spark: org.apache.spark.sql.SparkSession,
                 path: String): Long = {
    graft.core.Swaps.guard(spark, path, "corpus_dedup_exact")
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dir),
      s"corpus_dedup_exact: no corpus at $path")
    val corpus = spark.read.parquet(path)
    graft.core.Checks.requireColumns(corpus, "corpus_dedup_exact",
      "doc_id")
    // both counts are parquet-footer reads (no filter, no projection
    // needed) — cheap even at corpus scale
    val before = corpus.count()
    val tmp = new org.apache.hadoop.fs.Path(s"${path}__compact")
    val old = new org.apache.hadoop.fs.Path(s"${path}__old")
    corpus.dropDuplicates("doc_id")
      .write.mode("overwrite").parquet(tmp.toString)
    val after = spark.read.parquet(tmp.toString).count()
    fs.delete(old, true)
    require(fs.rename(dir, old), s"corpus_dedup_exact: cannot move $dir")
    require(fs.rename(tmp, dir), s"corpus_dedup_exact: cannot move $tmp")
    fs.delete(old, true)
    before - after
  }
}
