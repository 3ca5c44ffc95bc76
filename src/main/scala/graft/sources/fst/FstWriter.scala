package graft.sources.fst

import java.util.UUID
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S8: standard-file writer. `write` mode runs metadata_cleanup first,
  * then encodes records per partition in batches of
  * `maxRecordsPerFile` (the reference's 128-row materialize batching,
  * /root/reference/fstpy/std_writer.py:127-155 + FSTPY_NUM_ROWS).
  * Payloads are written Fortran-flat (column-major), matching the
  * catalog layout.
  */
object FstWriter {

  val Columns: Seq[String] = Seq("nomvar", "typvar", "etiket", "ni",
    "nj", "nk", "dateo", "ip1", "ip2", "ip3", "deet", "npas", "datyp",
    "nbits", "grtyp", "ig1", "ig2", "ig3", "ig4", "datev", "d")

  def write(df: DataFrame, path: String, maxRecordsPerFile: Int = 128,
            cleanup: Boolean = true): Unit = {
    val prepared0 = if (cleanup) graft.ops.Select.metadataCleanup(df) else df
    val prepared = prepared0.select(
      Columns.map(c => col(c).cast(FstTable.Schema(c).dataType)): _*)

    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    val dir = new Path(path)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)

    prepared.foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val efs = FileSystem.get(new java.net.URI(path),
          new Configuration())
        var batchNo = 0
        it.grouped(maxRecordsPerFile).foreach { batch =>
          val records = batch.map { r =>
            val meta = FstFormat.Meta(
              r.getString(0), r.getString(1), r.getString(2),
              r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6),
              r.getInt(7), r.getInt(8), r.getInt(9), r.getInt(10),
              r.getInt(11), r.getInt(12), r.getInt(13), r.getString(14),
              r.getInt(15), r.getInt(16), r.getInt(17), r.getInt(18),
              r.getLong(19), 0, 0)
            val d = r.getSeq[Float](20).toArray
            (meta, d)
          }
          val bytes = FstFormat.writeFile(records.toSeq)
          val name = s"part-${UUID.randomUUID().toString.take(8)}-$batchNo.fst"
          val out = efs.create(new Path(dir, name))
          try out.write(bytes) finally out.close()
          batchNo += 1
        }
    }
  }
}
