package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Shared finite-drain harness for the driver-checked streaming
  * queries (f43, f45, q19, q26, q43, p46): run a streaming frame to
  * completion through a memory sink with `Trigger.AvailableNow`, then
  * hand back the sink contents as a lineage-free materialized frame.
  *
  * Hygiene contract (why this exists instead of six inline copies):
  * the checkpoint directory is DELETED and the memory-sink temp view
  * DROPPED before returning — a bench loop that drains hundreds of
  * times must not accumulate /tmp checkpoint dirs or in-memory sink
  * tables. That requires materializing the result first
  * (localCheckpoint), because the sink view's data dies with the
  * view; sink outputs here are bounded fixture-scale aggregates, so
  * pinning them as RDD blocks is cheap and the context cleaner reaps
  * them once the caller's action completes and drops the reference.
  */
object StreamDrain {

  /** Drain `streamed` (a transformed `readStream` frame) and return
    * its full output. `shufflePartitions` sizes the state-store
    * parallelism for the drain only (one store per shuffle
    * partition); the session's setting is restored afterwards.
    */
  def drain(s: SparkSession, streamed: DataFrame, outputMode: String,
            prefix: String, shufflePartitions: Int,
            timeoutMs: Long = 300000L): DataFrame = {
    val qn = prefix + "_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    // checkpoint I/O on scratch (tmpfs where available): offset/state
    // logs are pure overhead for a finite drain, and on the root disk
    // their fsyncs dominate the small fixtures' drain time
    val ckDir = java.nio.file.Files.createTempDirectory(
      graft.core.Scratch.rootPath, s"graft_${prefix}_ck")
    val oldShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    try {
      val q = streamed.writeStream.format("memory").queryName(qn)
        .outputMode(outputMode)
        .option("checkpointLocation", ckDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(timeoutMs)) {
        q.stop()
        throw new IllegalStateException(
          s"streaming drain did not finish within ${timeoutMs / 1000} s")
      }
      // eager localCheckpoint: the result must outlive the sink view
      val out = s.table(qn).localCheckpoint(true)
      s.catalog.dropTempView(qn)
      out
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", oldShuffle)
      deleteRecursively(ckDir.toFile)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
