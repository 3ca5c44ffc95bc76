package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.pipeline.PipelineOps._

/** Streaming near-duplicate detection — the streaming complement of
  * the batch MinHash-LSH pipeline (p02): every arriving document's
  * banded MinHash keys probe per-band-key state holding the first
  * document that produced that key; a later document hitting an
  * existing key is flagged as a near-dup candidate of that first
  * document (same banding guarantee as the batch path: Jaccard ≥ s
  * collides on ≥1 band with high probability).
  *
  * Scale shape: the stream shuffles once on the band key (8 small
  * rows per document); per-key state is ONE long. Total state is
  * O(corpus × bands) keys — inherent to dedup-against-history — so at
  * 100 TB the state store must be RocksDB-backed and can be bounded
  * with an event-time timeout (dedup window) where the product allows
  * forgetting old content.
  */
object StreamingDedup {

  /** A band collision: `doc_id` shares `bkey` with earlier `first_id`. */
  case class BandHit(band: Int, bkey: String, doc_id: Long,
                     first_id: Long)

  /** Flag arriving near-dup candidates. Input needs `doc_id` and
    * `text`; output is one row per (later doc, colliding band).
    * Within a micro-batch the smallest doc_id claims a new key
    * (deterministic; batch arrival order is not).
    */
  def nearDupHits(docs: DataFrame): Dataset[BandHit] = {
    val session = docs.sparkSession
    import session.implicits._
    // fused native kernel — bit-identical to
    // bandKeys(hashedShingles(shingles(words(text)))), one codegen'd
    // call per row (see graft.functions.ShingleSig)
    val bands = docs
      .withColumn("sig",
        graft.functions.GraftFunctions.shingleSig(col("text")))
      .filter(size(col("sig.sh")) > 0)
      .select(col("doc_id").cast("long").as("doc_id"),
        posexplode(col("sig.bks")).as(Seq("band", "bkey")))
      .as[(Long, Int, String)]
    bands.groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Long, BandHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, bkey), rows, state) =>
          val existing = state.getOption
          val ids = rows.map(_._1).toArray.sorted
          val first = existing.getOrElse(ids.head)
          if (existing.isEmpty) state.update(first)
          val dups =
            if (existing.isEmpty) ids.iterator.drop(1) else ids.iterator
          dups.filter(_ != first)
            .map(id => BandHit(band, bkey, id, first))
      }
  }
}
