package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog constructors and documentation helpers. */
object Catalogs {

  /** Truncate plan lineage at an operator-chain boundary.
    *
    * Catalog operators (decode -> select_with_meta -> unit_convert ->
    * quick_pressure) each reference their input DataFrame several
    * times (data/meta splits, summary joins), so composing many of
    * them in one lazy plan grows the logical tree multiplicatively —
    * driver-side planning slows down and can exhaust the heap long
    * before any data moves. The pandas reference sidesteps this by
    * materializing at EVERY step; in Spark the idiomatic fix is
    * lineage truncation at the boundaries the user chooses.
    * `stage` does that with an eager localCheckpoint (executor-local
    * MEMORY_AND_DISK blocks — no HDFS round-trip; at cluster scale
    * prefer staging the small post-selection catalog, not the raw
    * scan).
    */
  def stage(df: DataFrame): DataFrame = df.localCheckpoint()

  /** S12 create_empty_dataframe
    * (/root/reference/fstpy/dataframe.py:675-700): n default records.
    */
  def createEmpty(spark: SparkSession, numRows: Long): DataFrame =
    spark.range(numRows).select(
      col("id").as("rid"),
      lit(" ").as("nomvar"), lit("P").as("typvar"),
      lit(" ").as("etiket"),
      lit(1).as("ni"), lit(1).as("nj"), lit(1).as("nk"),
      lit(0L).as("dateo"),
      lit(0).as("ip1"), lit(0).as("ip2"), lit(0).as("ip3"),
      lit(0).as("deet"), lit(0).as("npas"),
      lit(133).as("datyp"), lit(16).as("nbits"),
      lit("G").as("grtyp"),
      lit(0).as("ig1"), lit(0).as("ig2"), lit(0).as("ig3"),
      lit(0).as("ig4"),
      lit(0L).as("datev"),
      lit(null).cast("array<float>").as("d"))

  /** P14 column_descriptions
    * (/root/reference/fstpy/utils.py:111-151): documentation for the
    * base + decoded columns.
    */
  val ColumnDescriptions: Map[String, String] = Map(
    "nomvar" -> "variable name",
    "typvar" -> "type of field (forecast, analysis, climatology) + modifier flag",
    "etiket" -> "label: run + label + implementation + ensemble member",
    "ni" -> "first dimension of the data field",
    "nj" -> "second dimension of the data field",
    "nk" -> "third dimension of the data field (1 for 2D fields)",
    "dateo" -> "date of observation (CMC date stamp)",
    "datev" -> "date of validity (CMC date stamp)",
    "ip1" -> "encoded vertical level",
    "ip2" -> "encoded forecast hour (or user defined)",
    "ip3" -> "user defined identifier / interval bound",
    "deet" -> "length of a time step in seconds",
    "npas" -> "time step number",
    "datyp" -> "data type of the elements",
    "nbits" -> "number of bits kept per element",
    "grtyp" -> "type of geographical projection",
    "ig1" -> "first grid descriptor",
    "ig2" -> "second grid descriptor",
    "ig3" -> "third grid descriptor",
    "ig4" -> "fourth grid descriptor",
    "grid" -> "grid identity (ig1+ig2, or ip1+ip2 for coordinate records)",
    "d" -> "field payload (Fortran-order flattened ni x nj floats)",
    "level" -> "decoded ip1 level value",
    "ip1_kind" -> "decoded ip1 kind",
    "ip1_pkind" -> "printable ip1 kind",
    "surface" -> "whether the level is a surface level",
    "follow_topography" -> "whether the level kind follows topography",
    "ascending" -> "level sort order for the kind",
    "unit" -> "unit name from the variable dictionary",
    "description" -> "variable description from the dictionary",
    "date_of_observation" -> "decoded dateo timestamp",
    "date_of_validity" -> "decoded datev timestamp",
    "forecast_hour" -> "deet * npas seconds",
    "data_type_str" -> "datyp letter alias",
    "vctype" -> "vertical-coordinate type of the record's grid/kind")
}
