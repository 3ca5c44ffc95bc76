package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** ONE implementation of the tombstone mechanics both indexes share
  * (LSH: `NearDup.removeFromIndex`, ANN: `AnnIndex.remove`), so the
  * ID-REUSE-FORBIDDEN contract and the probe-side anti-join cannot
  * drift between them. A tombstone set is a parquet dir of single-id
  * rows appended by takedowns; probes drop matching rows, appends
  * reject matching ids loudly, compactions apply the set physically
  * and clear it. Tombstone sets are takedown-sized, never
  * corpus-sized — every join here broadcasts them.
  */
object Tombstones {

  /** The live tombstone set at `dir` (a parquet directory of id
    * rows), None when no removal was ever recorded.
    */
  def at(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Anti-join `df` against the tombstones (if any), with the
    * tombstone id column renamed to `idCol`.
    */
  def drop(df: DataFrame, idCol: String, tombIdCol: String,
           tomb: Option[DataFrame]): DataFrame =
    tomb.fold(df) { t =>
      df.join(broadcast(t.select(col(tombIdCol).as(idCol)).distinct()),
        Seq(idCol), "left_anti")
    }

  /** The append-side guard behind ID-REUSE-FORBIDDEN: appending an
    * id that sits in the live tombstone set would be silently lossy
    * twice — every probe anti-joins the id out (the new rows are
    * invisible), and the next compaction physically deletes them
    * while clearing the tombstone that hid them. Rather than lose a
    * document with no error, the append fails loudly and names the
    * recovery recipe. Cost in the common case (no tombstone dir) is
    * one fs.exists; with live tombstones, a broadcast semi-join of
    * the takedown-sized set against the batch.
    */
  def requireAbsent(ids: DataFrame, idCol: String, tombIdCol: String,
                    tombDir: String, op: String,
                    compactName: String): Unit =
    at(ids.sparkSession, tombDir).foreach { t =>
      val clash = ids.select(col(idCol))
        .join(broadcast(t.select(col(tombIdCol).as(idCol)).distinct()),
          Seq(idCol), "left_semi")
        .limit(5).collect().map(_.get(0))
      require(clash.isEmpty,
        s"$op: ids [${clash.mkString(", ")}] are tombstoned at " +
          s"$tombDir — id reuse after a removal is forbidden (the " +
          "bare-id tombstone would hide the new rows from every probe " +
          "and the next compaction would physically delete them). Run " +
          s"$compactName first (applies tombstones and clears them), " +
          "then re-append; or ingest the corrected document under a " +
          "fresh id.")
    }
}
