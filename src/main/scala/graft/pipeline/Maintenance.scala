package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Data-driven compaction advice for the index family — the consumer
  * the p93/p95 health reports were missing: the reports publish the
  * numbers, this maps the OPERATIONAL debt counters (small-files debt
  * from append-mode increments, logical-delete debt from tombstones)
  * to a compact-now / ok decision a maintenance loop can act on.
  *
  * Why these two counters and not the reports' content metrics:
  * compaction changes exactly two things — it rewrites many small
  * files into few (probe cost proportional to APPEND COUNT goes back
  * to data size) and applies tombstones physically (probes stop
  * paying the anti-join, takedowns become durable in the data). So
  * the decision inputs are precisely the file count and the tombstone
  * row count; bucket skew and norm drift (p93/p95) are CONTENT
  * signals whose cure is re-sharding or re-embedding, not compaction.
  *
  * Both counters are control-plane cheap at any corpus size: a
  * filesystem listing (proportional to file count — the very debt
  * being measured) and a parquet footer count of the takedown-sized
  * tombstone set. [[graft.Api.continuousBuild]] /
  * [[graft.Api.continuousAnnBuild]] accept thresholds as the
  * data-driven alternative to the fixed `compactEvery` cadence.
  */
object Maintenance {

  /** Debt levels above which [[Advice.compactNow]] flips: more than
    * `maxDataFiles` parquet data files across the index's tables, or
    * more than `maxTombstoneRows` live tombstoned ids. Defaults suit
    * a daily-batch pipeline (an append adds at most one file per
    * bucket — 32 by default, after the r13 one-file-per-bucket append
    * fix — so 256 files ≈ a week of daily appends between
    * compactions; 100k tombstones is far below any broadcast limit
    * but enough anti-join debt to be worth clearing).
    */
  case class Thresholds(maxDataFiles: Long = 256L,
                        maxTombstoneRows: Long = 100000L) {
    require(maxDataFiles > 0 && maxTombstoneRows >= 0,
      s"maintenance thresholds must be positive, got $this")
  }

  /** The advisor's verdict: the measured debt counters and whether
    * either crossed its threshold (with the crossings named, so a
    * maintenance log says WHY a compaction ran).
    */
  case class Advice(dataFiles: Long, tombstoneRows: Long,
                    compactNow: Boolean, reasons: Seq[String])

  /** Count parquet data files under the given dirs (missing dirs
    * count zero — a young or never-appended index has no debt).
    */
  private[pipeline] def countParquetFiles(spark: SparkSession,
                                          dirs: Seq[String]): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    dirs.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) 0L
      else {
        var n = 0L
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1L
        }
        n
      }
    }.sum
  }

  private[pipeline] def tombstoneRows(spark: SparkSession,
                                      tombDir: String): Long =
    graft.core.Tombstones.at(spark, tombDir).map(_.count()).getOrElse(0L)

  private[pipeline] def advise(dataFiles: Long, tombs: Long,
                               th: Thresholds): Advice = {
    val reasons = Seq(
      if (dataFiles > th.maxDataFiles)
        Some(s"data files $dataFiles > ${th.maxDataFiles}")
      else None,
      if (tombs > th.maxTombstoneRows)
        Some(s"tombstone rows $tombs > ${th.maxTombstoneRows}")
      else None).flatten
    Advice(dataFiles, tombs, reasons.nonEmpty, reasons)
  }
}
