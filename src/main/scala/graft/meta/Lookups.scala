package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bundled lookup dimension tables, used as broadcast joins.
  *
  * Data derived from the reference's bundled CSVs
  * (/root/reference/fstpy/csv/stdvar.csv, units.csv,
  * verticalcoordinatetypes.csv, leveltype.csv; loaded at
  * /root/reference/fstpy/__init__.py:137-304). STDVAR here is a curated
  * subset of the most common operational variables — unknown nomvars
  * fall back to ('scalar', '') exactly like the reference
  * (/root/reference/fstpy/std_dec.py:159-167).
  */
object Lookups {

  /** nomvar -> (unit, English description). */
  val StdVar: Seq[(String, String, String)] = Seq(
    ("!!", "scalar", "Vertical coordinate descriptor"),
    ("2Z", "foot", "Tropopause height (edyntrp-glbdiag)"),
    ("DD", "inverseSecond", "Divergence"),
    ("EN", "squareMeter_per_secondSquared", "Turbulent kinetic energy"),
    ("ES", "celsius", "Dew point depression"),
    ("FB", "watt_per_squareMeter", "Downward solar flux"),
    ("GZ", "decameter", "Geopotential height"),
    ("HR", "scalar", "Relative humidity"),
    ("HU", "kilogram_per_kilogram", "Specific humidity"),
    ("HY", "scalar", "Descriptor - GEM hybrid vertical coordinate"),
    ("P0", "millibar", "Surface Pressure"),
    ("PN", "millibar", "Sea Level Pressure"),
    ("PR", "meter", "Quantity of Precipitation"),
    ("PT", "millibar", "Pressure at the Top of the Model"),
    ("PX", "hectoPascal", "Pressure of the Model"),
    ("QC", "kilogram_per_kilogram",
      "Mixing ratio of total condensate (Sundquivst)"),
    ("RT", "meter_per_second", "Total Precipitation Rate"),
    ("SD", "centimeter", "Snow Depth"),
    ("T6", "scalar", "Instantaneous Precipitation Types RA/RS/ZR/IP/SN/NIL"),
    ("TD", "celsius", "Dew Point Temperature"),
    ("TT", "celsius", "Air Temperature"),
    ("TW", "celsius", "Potential Wet-bulb Temperature"),
    ("UU", "knot", "U-Component of the Wind (Along the grid X axis)"),
    ("UV", "knot", "Wind Modulus"),
    ("VT", "celsius", "Virtual Temperature"),
    ("VV", "knot", "V-Component of the Wind (Along the grid Y axis)"),
    ("WD", "degree", "Meteorological Wind Direction"),
    ("WW", "pascal_per_second", "Vertical Motion"))

  /** unit name -> (symbol, SI family expression, bias, factor). */
  val Units: Seq[(String, String, String, Double, Double)] = Seq(
    ("kilogram", "kg", "kg", 0.0, 1.0),
    ("kilogram_per_kilogram", "kg/kg", "kg/kg", 0.0, 1.0),
    ("gram_per_kilogram", "g/kg", "kg/kg", 0.0, 0.001),
    ("meter", "m", "m", 0.0, 1.0),
    ("centimeter", "cm", "m", 0.0, 0.01),
    ("millimeter", "mm", "m", 0.0, 0.001),
    ("foot", "ft", "m", 0.0, 0.3048),
    ("decameter", "dam", "m", 0.0, 10.0),
    ("kilometer", "km", "m", 0.0, 1000.0),
    ("second", "s", "s", 0.0, 1.0),
    ("minute", "min", "s", 0.0, 60.0),
    ("hour", "h", "s", 0.0, 3600.0),
    ("inverseSecond", "1/s", "s^(-1)", 0.0, 1.0),
    ("kelvin", "K", "K", 0.0, 1.0),
    ("celsius", "°C", "K", 273.15, 1.0),
    ("fahrenheit", "°F", "K", 459.67, 0.5555555555),
    ("rankine", "°R", "K", 0.0, 0.5555555555),
    ("meter_per_second", "m/s", "m·s^(-1)", 0.0, 1.0),
    ("kilometer_per_hour", "km/h", "m·s^(-1)", 0.0, 0.277777778),
    ("knot", "kt", "m·s^(-1)", 0.0, 0.514444444),
    ("mile_per_hour", "mph", "m·s^(-1)", 0.0, 0.44704),
    ("pascal", "Pa", "N·m^(-2)", 0.0, 1.0),
    ("hectoPascal", "hPa", "N·m^(-2)", 0.0, 100.0),
    ("millibar", "mbar", "N·m^(-2)", 0.0, 100.0),
    ("pascal_per_second", "Pa/s", "N·m^(-2)·s^(-1)", 0.0, 1.0),
    ("watt_per_squareMeter", "W/m2", "J·s^(-1)·m^(-2)", 0.0, 1.0),
    ("squareMeter_per_secondSquared", "m2/s2", "m^(2)·s^(-2)", 0.0, 1.0),
    ("degree", "°", "", 0.0, 1.0),
    ("percent", "%", "", 0.0, 1.0),
    ("scalar", "", "", 0.0, 1.0))

  /** Vertical-coordinate detection rules:
    * (ip1_kind, toctoc, P0, E1, PT, HY, SF, vcode) -> vctype.
    */
  val VcTypes: Seq[(Int, Boolean, Boolean, Boolean, Boolean, Boolean,
      Boolean, Int, String)] = Seq(
    (5, true, true, false, false, false, false, 5002, "HYBRID_5002"),
    (5, true, true, false, false, false, false, 5003, "HYBRID_5003"),
    (5, true, true, false, false, false, false, 5004, "HYBRID_5004"),
    (5, true, true, false, false, false, false, 5001, "HYBRID_5001"),
    (5, false, true, false, false, false, false, -1, "HYBRID_5001"),
    (5, false, true, false, false, true, false, -1, "HYBRID_5001"),
    (5, true, true, false, false, false, true, -1, "OLD_HYBRID_STAGGERED"),
    (5, true, true, false, false, false, false, 5005, "HYBRID_5005"),
    (2, true, true, false, false, false, false, 5005, "HYBRID_5005"),
    (2, true, false, false, false, false, false, 5005, "HYBRID_5005"),
    (5, true, false, false, false, false, false, 5005, "HYBRID_5005"),
    (4, true, false, false, false, false, false, 5005, "HYBRID_5005"),
    (4, true, true, false, false, false, false, 5005, "HYBRID_5005"),
    (4, false, false, false, false, false, false, -1, "METER_GROUND_LEVEL"),
    (2, true, true, false, false, false, false, 2001, "PRESSURE_2001"),
    (2, false, false, false, false, false, false, -1, "PRESSURE_2001"),
    (1, true, true, false, false, false, false, 1002, "ETA_1002"),
    (1, true, true, false, true, false, false, 1002, "ETA_1002"),
    (1, false, true, false, true, false, false, -1, "ETA_1002"),
    (1, false, true, false, true, true, false, -1, "ETA_1002"),
    (1, true, true, false, false, false, false, 1001, "SIGMA_1001"),
    (1, false, true, false, false, false, false, -1, "SIGMA_1001"),
    (1, false, true, true, true, false, false, -1, "ETA_SEF"),
    (1, false, true, false, false, true, false, -1, "HYBRID_NORMALIZED_1003"),
    (7, false, false, false, false, false, false, -1, "PRESSURE_2001"),
    (0, false, false, false, false, false, false, -1, "METER_SEA_LEVEL"))

  /** Vcode families used by metadata_cleanup's `!!` filtering
    * (/root/reference/fstpy/dataframe_utils.py:265-289).
    */
  val HybridVcodes: Seq[Int] =
    Seq(1003, 5001, 5002, 5003, 5004, 5005, 5100, 5999, 21001, 21002)
  val SigmaVcodes: Seq[Int] = Seq(1001, 1002)
  val PressureVcodes: Seq[Int] = Seq(2001)

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  def stdvarDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("nomvar", StringType, false),
      StructField("unit", StringType, false),
      StructField("description", StringType, false)))
    spark.createDataFrame(
      StdVar.map { case (n, u, d) => Row(n, u, d) }.asJava, schema)
  }

  def unitsDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("unit_name", StringType, false),
      StructField("unit_symbol", StringType, false),
      StructField("unit_expression", StringType, false),
      StructField("unit_bias", DoubleType, false),
      StructField("unit_factor", DoubleType, false)))
    spark.createDataFrame(
      Units.map { case (n, s, e, b, f) => Row(n, s, e, b, f) }.asJava, schema)
  }

  def vctypesDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("ip1_kind", IntegerType, false),
      StructField("toctoc", BooleanType, false),
      StructField("P0", BooleanType, false),
      StructField("E1", BooleanType, false),
      StructField("PT", BooleanType, false),
      StructField("HY", BooleanType, false),
      StructField("SF", BooleanType, false),
      StructField("vcode", IntegerType, false),
      StructField("vctype", StringType, false)))
    spark.createDataFrame(
      VcTypes.map(t => Row(t._1, t._2, t._3, t._4, t._5, t._6, t._7,
        t._8, t._9)).asJava, schema)
  }
}
