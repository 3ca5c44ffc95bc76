package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.meta.Lookups

/** The `add_*` decode-transformer family: each is a
  * `DataFrame => DataFrame` widening the record catalog with decoded
  * metadata columns, composed by [[decodeMetadata]]
  * (reference: /root/reference/fstpy/dataframe.py:20-629).
  *
  * All transformers are pure Column expressions (whole-stage codegen,
  * no UDFs) and recompute unconditionally — Catalyst prunes unused
  * columns, so recomputation is free when a column is dropped later.
  */
object Decode {

  import graft.core.Constants._

  /** P1 add_grid_column (/root/reference/fstpy/dataframe.py:20-46):
    * coordinate records key their grid by (ip1,ip2); HY is grid-less;
    * data records key by (ig1,ig2).
    */
  def addGrid(df: DataFrame): DataFrame =
    df.withColumn("grid",
      when(col("nomvar").isin(GridFromIpNomvars: _*),
        concat(col("ip1").cast("string"), col("ip2").cast("string")))
        .when(col("nomvar") === "HY", lit("None"))
        .otherwise(
          concat(col("ig1").cast("string"), col("ig2").cast("string"))))

  def gridSql: String =
    "CASE WHEN nomvar IN ('^>', '>>', '^^', '!!', '!!SF') THEN " +
      "CAST(ip1 AS VARCHAR) || CAST(ip2 AS VARCHAR) " +
      "WHEN nomvar = 'HY' THEN 'None' " +
      "ELSE CAST(ig1 AS VARCHAR) || CAST(ig2 AS VARCHAR) END"

  /** P3 typvar modifier flags
    * (/root/reference/fstpy/dataframe.py:104-141).
    */
  val FlagChars: Seq[(String, String)] = Seq(
    "multiple_modifications" -> "M", "zapped" -> "Z", "filtered" -> "F",
    "interpolated" -> "I", "unit_converted" -> "U", "bounded" -> "B",
    "missing_data" -> "?", "ensemble_extra_info" -> "!")

  def addFlags(df: DataFrame): DataFrame = {
    val t2 = when(length(col("typvar")) === 2, substring(col("typvar"), 2, 1))
      .otherwise(lit(""))
    FlagChars.foldLeft(df) { case (acc, (name, ch)) =>
      acc.withColumn(name, t2 === ch)
    }
  }

  def flagSql(name: String): String = {
    val ch = FlagChars.toMap.apply(name)
    val esc = if (ch == "'") "''" else ch
    s"(CASE WHEN length(typvar) = 2 THEN substring(typvar, 2, 1) ELSE '' END) = '$esc'"
  }

  /** P4 etiket parse (/root/reference/fstpy/std_dec.py:268-323).
    * Absent pieces are empty strings (the reference uses None; we keep
    * the columns non-null strings for clean relational behavior).
    */
  def addParsedEtiket(df: DataFrame): DataFrame = {
    val e = col("etiket")
    val run = "[RGPEAIMWNC_][0-9RLHMEA_]"
    val w = "[A-Za-z0-9_]"
    val impl = "[NPX]"
    val cmcNo = s"^$run$w{5}$impl$$"
    val cmcEns = s"^$run$w{5}$impl$w{3}$$"
    val spNo = s"^$run$w{6}$impl$$"
    val spEns = s"^$run$w{6}$impl$w{3}$$"
    df.withColumn("label",
        when(e.rlike(cmcNo) || e.rlike(cmcEns), substring(e, 3, 5))
          .when(e.rlike(spNo) || e.rlike(spEns), substring(e, 3, 6))
          .otherwise(e))
      .withColumn("run",
        when(e.rlike(cmcNo) || e.rlike(cmcEns) || e.rlike(spNo) ||
          e.rlike(spEns), substring(e, 1, 2)).otherwise(lit("")))
      .withColumn("implementation",
        when(e.rlike(cmcNo) || e.rlike(cmcEns), substring(e, 8, 1))
          .when(e.rlike(spNo) || e.rlike(spEns), substring(e, 9, 1))
          .otherwise(lit("")))
      .withColumn("ensemble_member",
        when(e.rlike(cmcEns), substring(e, 9, 3))
          .when(e.rlike(spEns), substring(e, 10, 3))
          .otherwise(lit("")))
  }

  /** DuckDB twin of [[addParsedEtiket]] as (expr, alias) pairs. */
  def etiketSql: Seq[(String, String)] = {
    val run = "[RGPEAIMWNC_][0-9RLHMEA_]"
    val w = "[A-Za-z0-9_]"
    val cmcNo = s"^$run$w{5}[NPX]$$"
    val cmcEns = s"^$run$w{5}[NPX]$w{3}$$"
    val spNo = s"^$run$w{6}[NPX]$$"
    val spEns = s"^$run$w{6}[NPX]$w{3}$$"
    def m(p: String) = s"regexp_matches(etiket, '$p')"
    Seq(
      (s"CASE WHEN ${m(cmcNo)} OR ${m(cmcEns)} THEN substring(etiket, 3, 5) " +
        s"WHEN ${m(spNo)} OR ${m(spEns)} THEN substring(etiket, 3, 6) " +
        "ELSE etiket END") -> "label",
      (s"CASE WHEN ${m(cmcNo)} OR ${m(cmcEns)} OR ${m(spNo)} OR ${m(spEns)} " +
        "THEN substring(etiket, 1, 2) ELSE '' END") -> "run",
      (s"CASE WHEN ${m(cmcNo)} OR ${m(cmcEns)} THEN substring(etiket, 8, 1) " +
        s"WHEN ${m(spNo)} OR ${m(spEns)} THEN substring(etiket, 9, 1) " +
        "ELSE '' END") -> "implementation",
      (s"CASE WHEN ${m(cmcEns)} THEN substring(etiket, 9, 3) " +
        s"WHEN ${m(spEns)} THEN substring(etiket, 10, 3) " +
        "ELSE '' END") -> "ensemble_member")
  }

  /** P5 unit/description broadcast lookup with ('scalar','') default
    * (/root/reference/fstpy/dataframe.py:358-388).
    */
  def addUnitAndDescription(df: DataFrame): DataFrame = {
    val dims = broadcast(Lookups.stdvarDf(df.sparkSession)
      .withColumnRenamed("unit", "u_unit")
      .withColumnRenamed("description", "u_desc"))
    df.join(dims, df("nomvar") === dims("nomvar"), "left")
      .drop(dims("nomvar"))
      .withColumn("unit", coalesce(col("u_unit"), lit("scalar")))
      .withColumn("description", coalesce(col("u_desc"), lit("")))
      .drop("u_unit", "u_desc")
  }

  /** P6 decoded dates (/root/reference/fstpy/dataframe.py:390-436). */
  def addDecodedDates(df: DataFrame): DataFrame =
    df.withColumn("date_of_observation",
        IpColumns.stampToTimestamp(col("dateo")))
      .withColumn("date_of_validity",
        IpColumns.stampToTimestamp(col("datev")))

  /** P7 forecast_hour = deet*npas seconds
    * (/root/reference/fstpy/std_dec.py:89-103). Stored as whole
    * seconds (long) rather than an interval type for clean parquet
    * round-trips and oracle comparison.
    */
  def addForecastHour(df: DataFrame): DataFrame =
    df.withColumn("forecast_hour",
      (col("deet").cast("long") * col("npas").cast("long")))

  /** P8 datyp -> letter (/root/reference/fstpy/dataframe.py:471-496). */
  def addDataTypeStr(df: DataFrame): DataFrame = {
    val m = DatypDict.foldLeft(lit(""): Column) { case (acc, (k, v)) =>
      when(col("datyp") === k, lit(v)).otherwise(acc)
    }
    df.withColumn("data_type_str", m)
  }

  def datypStrSql: String =
    "(CASE " + DatypDict.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN datyp = $k THEN '$v' "
    }.mkString + "ELSE '' END)"

  /** P9 ip decode columns (/root/reference/fstpy/dataframe.py:500-578
    * + decode_ip123 /root/reference/fstpy/std_io.py:814-872):
    * level/ip1_kind/ip1_pkind, ip2_dec/kind/pkind, ip3_dec/kind/pkind,
    * surface, follow_topography, ascending, and interval bounds.
    */
  def addIpInfo(df: DataFrame): DataFrame = {
    val rawIp = col("nomvar").isin(RawIpNomvars: _*)
    val noInterval = col("nomvar").isin(NoIntervalNomvars: _*)

    val v1 = when(rawIp, col("ip1").cast("float"))
      .otherwise(IpColumns.decodeValue(col("ip1")))
    val k1 = when(rawIp, lit(100))
      .otherwise(IpColumns.decodeKind(col("ip1")))
    val v2 = when(rawIp, col("ip2").cast("float"))
      .otherwise(IpColumns.decodeValue(col("ip2")))
    val k2 = when(rawIp, lit(100))
      .when(col("ip2") >= 32768, IpColumns.decodeKind(col("ip2")))
      .otherwise(lit(10))
    val v3 = when(rawIp, col("ip3").cast("float"))
      .otherwise(IpColumns.decodeValue(col("ip3")))
    val k3 = when(rawIp, lit(100))
      .when(col("ip3") >= 32768, IpColumns.decodeKind(col("ip3")))
      .otherwise(lit(100))

    // interval recognition (time interval swaps into ip2, height into ip1)
    val timeInterval = !noInterval && col("ip3") >= 32768 && (k3 === k2)
    val heightInterval = !noInterval && col("ip3") >= 32768 &&
      !(k3 === k2) && (k3 === k1)

    df.withColumn("level", v1)
      .withColumn("ip1_kind", k1)
      .withColumn("ip1_pkind",
        when(k1.isin(-1, 3, 15, 17, 100), lit(""))
          .otherwise(IpColumns.kindToString(k1)))
      .withColumn("ip2_dec", when(timeInterval, v3).otherwise(v2))
      .withColumn("ip2_kind", k2)
      .withColumn("ip2_pkind",
        when(k2.isin(-1, 3, 15, 17, 100), lit(""))
          .otherwise(IpColumns.kindToString(k2)))
      .withColumn("ip3_dec", v3)
      .withColumn("ip3_kind", k3)
      .withColumn("ip3_pkind",
        when(k3.isin(-1, 3, 15, 17, 100), lit(""))
          .otherwise(IpColumns.kindToString(k3)))
      .withColumn("surface", IpColumns.isSurface(k1, v1))
      .withColumn("follow_topography", IpColumns.followsTopography(k1))
      .withColumn("ascending", IpColumns.ascending(k1))
      .withColumn("interval_low",
        when(timeInterval, v3).when(heightInterval, v1).otherwise(lit(null)))
      .withColumn("interval_high",
        when(timeInterval, v2).when(heightInterval, v3).otherwise(lit(null)))
      .withColumn("interval_kind",
        when(timeInterval, k2).when(heightInterval, k1).otherwise(lit(null)))
  }

  /** P10 add_timezone_column
    * (/root/reference/fstpy/dataframe.py:174-205).
    */
  def addTimezone(df: DataFrame, srcCol: String, tz: String): DataFrame =
    df.withColumn(s"${srcCol}_${tz.toLowerCase.replace('/', '_')}",
      from_utc_timestamp(col(srcCol), tz))

  /** P11 shape (/root/reference/fstpy/dataframe.py:291-313). */
  def addShape(df: DataFrame): DataFrame =
    df.withColumn("shape", struct(col("ni"), col("nj")))

  /** P12 add_columns orchestrator
    * (/root/reference/fstpy/dataframe.py:582-629).
    */
  def decodeMetadata(df: DataFrame): DataFrame = {
    val steps: Seq[DataFrame => DataFrame] = Seq(
      addGrid, addFlags, addParsedEtiket, addUnitAndDescription,
      addDecodedDates, addForecastHour, addDataTypeStr, addIpInfo)
    steps.foldLeft(df)((d, f) => f(d))
  }

  /** P13 voir column ordering
    * (/root/reference/fstpy/dataframe.py:634-650).
    */
  val VoirOrder: Seq[String] = Seq(
    "nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo", "ip1",
    "ip2", "ip3", "deet", "npas", "datyp", "nbits", "grtyp", "ig1",
    "ig2", "ig3", "ig4")
}
