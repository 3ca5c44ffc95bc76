package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid/geo kernels.
  *
  * M14 (Z-grid path): 2D LA/LO records generated from the grid's
  * `>>` (longitude axis, ni x 1) and `^^` (latitude axis, 1 x nj)
  * deformation records (/root/reference/fstpy/std_grid.py:128-203) —
  * the 2D field is the axis outer product in Fortran order.
  *
  * M15: is_global_grid / longitude-repetition classification
  * (/root/reference/fstpy/std_grid.py:208-270) with the reference's
  * epsilon comparisons (C16, std_grid.py:272-282).
  */
object Grids {

  /** Emit LA and LO records (2D lat/lon) for every grid that has both
    * deformation records.
    */
  def latLon2d(df: DataFrame): DataFrame = {
    val g = if (df.columns.contains("grid")) df else Decode.addGrid(df)
    val lon = g.filter(col("nomvar") === ">>").select(
      col("grid"), col("d").as("lon_ax"), col("ni").as("g_ni"))
    val lat = g.filter(col("nomvar") === "^^").select(
      col("grid").as("lat_grid"), col("d").as("lat_ax"),
      col("nj").as("g_nj"))
    val joined = lon.join(lat, col("grid") === col("lat_grid"))
    val ks = sequence(lit(0), col("g_ni") * col("g_nj") - 1)
    val la = joined.select(col("grid"), lit("LA").as("nomvar"),
      col("g_ni").as("ni"), col("g_nj").as("nj"),
      transform(ks, k => element_at(col("lat_ax"),
        (k / col("g_ni")).cast("int") + 1)).as("d"))
    val lo = joined.select(col("grid"), lit("LO").as("nomvar"),
      col("g_ni").as("ni"), col("g_nj").as("nj"),
      transform(ks, k => element_at(col("lon_ax"),
        pmod(k, col("g_ni")).cast("int") + 1)).as("d"))
    la.unionByName(lo)
  }

  val Epsilon = 0.001

  private def eq(a: Column, b: Column): Column =
    abs(a - b) <= Epsilon
  private def ge(a: Column, b: Column): Column =
    (a > b) || eq(a, b)
  private def le(a: Column, b: Column): Column =
    (a < b) || eq(a, b)
  private def ltS(a: Column, b: Column): Column =
    (a < b) && !eq(a, b)

  /** (global_grid, repetition) per the reference's rule table. Inputs:
    * grtyp, ni, dlon (L grids), first/last longitude of the flattened
    * axis (Z/L grids).
    */
  def isGlobalGrid(grtyp: Column, ni: Column, dlon: Column,
                   lonFirst: Column, lonLast: Column)
      : (Column, Column) = {
    val nb = ni.cast("double") * dlon
    val lFmodNonZero = lit(360.0) % dlon =!= 0.0
    val global =
      when(grtyp.isin("A", "G"), lit(true))
        .when(grtyp === "B", lit(true))
        .when(grtyp === "Z", eq(lonFirst, lonLast))
        .when(grtyp === "L" && lFmodNonZero,
          ge(nb, lit(360.0)) && !le(lonLast, nb + dlon - 360.0) &&
            ltS(lonLast, lit(360.0)))
        .when(grtyp === "L", eq(nb, lit(360.0)) ||
          eq(nb, lit(360.0) + dlon))
        .otherwise(lit(false))
    val repetition =
      when(grtyp === "B", lit(true))
        .when(grtyp === "Z", eq(lonFirst, lonLast))
        .when(grtyp === "L" && lFmodNonZero,
          ge(nb, lit(360.0)) && le(lonLast, nb + dlon - 360.0))
        .when(grtyp === "L", eq(nb, lit(360.0) + dlon))
        .otherwise(lit(false))
    (global, repetition)
  }

  /** DuckDB twins of [[isGlobalGrid]]. */
  def isGlobalGridSql(grtyp: String, ni: String, dlon: String,
                      lonFirst: String, lonLast: String)
      : (String, String) = {
    val e = Epsilon
    def eqs(a: String, b: String) = s"(abs(($a) - ($b)) <= $e)"
    def ges(a: String, b: String) = s"((($a) > ($b)) OR ${eqs(a, b)})"
    def les(a: String, b: String) = s"((($a) < ($b)) OR ${eqs(a, b)})"
    def lts(a: String, b: String) =
      s"((($a) < ($b)) AND NOT ${eqs(a, b)})"
    val nb = s"(CAST($ni AS DOUBLE) * $dlon)"
    val nz = s"(fmod(360.0, $dlon) <> 0.0)"
    val global =
      s"""(CASE WHEN $grtyp IN ('A', 'G') THEN TRUE
        WHEN $grtyp = 'B' THEN TRUE
        WHEN $grtyp = 'Z' THEN ${eqs(lonFirst, lonLast)}
        WHEN $grtyp = 'L' AND $nz THEN (${ges(nb, "360.0")}
          AND NOT ${les(lonLast, s"$nb + $dlon - 360.0")}
          AND ${lts(lonLast, "360.0")})
        WHEN $grtyp = 'L' THEN (${eqs(nb, "360.0")}
          OR ${eqs(nb, s"360.0 + $dlon")})
        ELSE FALSE END)"""
    val rep =
      s"""(CASE WHEN $grtyp = 'B' THEN TRUE
        WHEN $grtyp = 'Z' THEN ${eqs(lonFirst, lonLast)}
        WHEN $grtyp = 'L' AND $nz THEN (${ges(nb, "360.0")}
          AND ${les(lonLast, s"$nb + $dlon - 360.0")})
        WHEN $grtyp = 'L' THEN ${eqs(nb, s"360.0 + $dlon")}
        ELSE FALSE END)"""
    (global, rep)
  }

  /** M13/M14 (regular-grid path): LA/LO generation for cylindrical
    * grids from their public definitions — 'A' (global, cell-centered
    * latitudes: dlat = 180/nj, lat_1 = -90 + dlat/2, lon_1 = 0),
    * 'B' (global, pole-to-pole inclusive: dlat = 180/(nj-1),
    * lat_1 = -90, repeated longitude), 'L' (lat0/lon0/dlat/dlon given
    * — the IG packing decode is the external librmn cigaxg kernel, so
    * params arrive decoded). Input: one row per grid with columns
    * grid, grtyp, ni, nj, lat0, lon0, dlat, dlon (ignored for A/B).
    * Output: LA + LO records, Fortran-flat like [[latLon2d]].
    */
  def latLonRegular(params: DataFrame): DataFrame = {
    val niD = col("ni").cast("double")
    val njD = col("nj").cast("double")
    val dlat = when(col("grtyp") === "A", lit(180.0) / njD)
      .when(col("grtyp") === "B", lit(180.0) / (njD - 1))
      .otherwise(col("dlat"))
    val dlon = when(col("grtyp") === "A", lit(360.0) / niD)
      .when(col("grtyp") === "B", lit(360.0) / (niD - 1))
      .otherwise(col("dlon"))
    val lat0 = when(col("grtyp") === "A", lit(-90.0) + lit(90.0) / njD)
      .when(col("grtyp") === "B", lit(-90.0))
      .otherwise(col("lat0"))
    val lon0 = when(col("grtyp").isin("A", "B"), lit(0.0))
      .otherwise(col("lon0"))
    val ks = sequence(lit(0), col("ni") * col("nj") - 1)
    val la = params.select(col("grid"), lit("LA").as("nomvar"),
      col("ni"), col("nj"),
      transform(ks, k =>
        (lat0 + floor(k / col("ni")) * dlat).cast("float")).as("d"))
    val lo = params.select(col("grid"), lit("LO").as("nomvar"),
      col("ni"), col("nj"),
      transform(ks, k =>
        (lon0 + pmod(k, col("ni")) * dlon).cast("float")).as("d"))
    la.unionByName(lo)
  }

  /** M12 get_df_from_grid (/root/reference/fstpy/std_grid.py:13-44):
    * record constructors from horizontal grid-definition params — Z/Y
    * grids emit a `>>` (ni x 1 longitude axis) and a `^^` (1 x nj
    * latitude axis) record; U grids emit one `^>` record holding the
    * packed axes. Input: one row per grid with columns grtyp, ni, nj,
    * ig1, ig2 (the grid link, stored as ip1/ip2 of the coordinate
    * records), grref, ig1ref..ig4ref, ax, ay, axy.
    */
  def dfFromGrid(params: DataFrame): DataFrame = {
    def rec(nomvar: String, ni: Column, nj: Column, d: Column) = Seq(
      lit(nomvar).as("nomvar"), lit("X").as("typvar"),
      lit("").as("etiket"),
      ni.cast("int").as("ni"), nj.cast("int").as("nj"), lit(1).as("nk"),
      lit(0L).as("dateo"),
      col("ig1").cast("int").as("ip1"), col("ig2").cast("int").as("ip2"),
      lit(0).as("ip3"), lit(0).as("deet"), lit(0).as("npas"),
      lit(5).as("datyp"), lit(32).as("nbits"),
      col("grref").as("grtyp"),
      col("ig1ref").cast("int").as("ig1"),
      col("ig2ref").cast("int").as("ig2"),
      col("ig3ref").cast("int").as("ig3"),
      col("ig4ref").cast("int").as("ig4"),
      lit(0L).as("datev"), d.as("d"))
    val zy = params.filter(col("grtyp").isin("Z", "Y"))
    val xx = zy.select(rec(">>", col("ni"), lit(1), col("ax")): _*)
    val yy = zy.select(rec("^^", lit(1), col("nj"), col("ay")): _*)
    val u = params.filter(col("grtyp") === "U")
      .select(rec("^>", size(col("axy")), lit(1), col("axy")): _*)
    xx.unionByName(yy).unionByName(u)
  }
}
