package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G5/§1.5: xarray-style cube assembly — pivot the record catalog into
  * dense (level, i, j) cubes per (grid, nomvar, ip1_kind)
  * (/root/reference/fstpy/xarray_utils.py:10-77).
  *
  * One representative record per level (minimum rid) feeds
  * `sort_array(collect_list(struct(level, d)))`; the flattened result
  * is the Fortran-ordered cube. The collect_list is bounded by
  * levels-per-variable (tens), not by catalog size — safe at scale.
  */
object Cubes {

  /** Variables excluded from cube assembly — the reference's loop
    * skip-list (/root/reference/fstpy/xarray_utils.py:54). NOTE:
    * narrower than VCoord.VcMeta — P0/PT/!!SF DO become variables.
    */
  val CubeSkip: Seq[String] = Seq("!!", ">>", "^^", "^>", "HY")

  /** Representative-record tiebreak: `rid` when present, else the FST
    * source's (path, key) pair — so catalogs straight from
    * `spark.read.format("fstrec")` (no rid column) assemble too.
    */
  private def withRid(df: DataFrame): DataFrame =
    if (df.columns.contains("rid")) df
    else {
      graft.core.Checks.requireColumns(df, "to_cube", "path", "key")
      df.withColumn("rid", struct(col("path"), col("key")))
    }

  /** r14 optimization (guide §2.3 "aggregate before you shuffle"):
    * the representative-record pick used to be a row_number window —
    * which shuffles EVERY payload-bearing row to its group partition
    * and SORTS it there — when all that is needed is the min-rid
    * row's `d` per group. A grouped min_by runs partial (map-side)
    * aggregation, so each map task ships at most one candidate row
    * per group and the per-partition sort disappears; rid is unique
    * (record id / (path,key)), so min_by picks exactly the row the
    * window's rank-1 filter picked, and both order rid structs
    * lexicographically. `graft.cubes.minByPick=off` restores the
    * window pick for paired A/B.
    */
  private def pickMinRid(data: DataFrame, keys: Seq[String])
      : DataFrame = {
    if (!sys.props.get("graft.cubes.minByPick").contains("off"))
      data.groupBy(keys.map(col): _*)
        .agg(min_by(col("d"), col("rid")).as("d"))
    else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy("rid")
      data.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
    }
  }

  def toCube(df0: DataFrame): DataFrame = {
    val df = withRid(df0)
    val g0 = if (df.columns.contains("grid")) df else Decode.addGrid(df)
    val g = if (g0.columns.contains("level")) g0 else Decode.addIpInfo(g0)
    val data = g.filter(!col("nomvar").isin(CubeSkip: _*))
    val picked = pickMinRid(data,
      Seq("grid", "nomvar", "ip1_kind", "level"))
    picked.groupBy("grid", "nomvar", "ip1_kind")
      .agg(sort_array(collect_list(struct(col("level"), col("d"))))
        .as("asc_layers"))
      // layer order follows the kind's ascending flag (the reference
      // sorts by level with ascending=df.ascending.unique()[0],
      // xarray_utils.py:52): descending kinds — pressure, sigma,
      // hybrid — stack top level first
      .withColumn("layers",
        when(IpColumns.ascending(col("ip1_kind")), col("asc_layers"))
          .otherwise(reverse(col("asc_layers"))))
      .select(col("grid"), col("nomvar"), col("ip1_kind"),
        size(col("layers")).as("n_levels"),
        transform(col("layers"), l => l.getField("level")).as("levels"),
        flatten(transform(col("layers"), l => l.getField("d")))
          .as("cube"))
  }

  /** §1.5 timeseries mode (/root/reference/fstpy/xarray_utils.py:
    * 56-58,120-129): stack each variable's records along
    * date_of_validity instead of level. One representative record per
    * (grid, nomvar, ip1_kind, level, datev) — minimum rid; the
    * collect_list is bounded by output times (tens), not catalog size.
    */
  def toCubeTimeseries(df0: DataFrame): DataFrame = {
    val df = withRid(df0)
    val g0 = if (df.columns.contains("grid")) df else Decode.addGrid(df)
    val g = if (g0.columns.contains("level")) g0 else Decode.addIpInfo(g0)
    val data = g.filter(!col("nomvar").isin(CubeSkip: _*))
    val picked = pickMinRid(data,
      Seq("grid", "nomvar", "ip1_kind", "level", "datev"))
    picked.groupBy("grid", "nomvar", "ip1_kind", "level")
      .agg(sort_array(collect_list(struct(col("datev"), col("d"))))
        .as("frames"))
      .select(col("grid"), col("nomvar"), col("ip1_kind"), col("level"),
        size(col("frames")).as("n_times"),
        transform(col("frames"), f => f.getField("datev")).as("times"),
        flatten(transform(col("frames"), f => f.getField("d")))
          .as("cube"))
  }

  /** §1.5 with coordinates: the cube plus the grid's lon (`>>`) and
    * lat (`^^`) axis arrays, like the reference's labeled-DataArray
    * export pulls them per grid
    * (/root/reference/fstpy/xarray_utils.py:140-203). One axis record
    * per grid is chosen deterministically (minimum rid); the
    * coordinate side is tiny (one row per grid) and broadcast-joins
    * into the cube table.
    */
  def toCubeWithCoords(df0: DataFrame): DataFrame = {
    val df = withRid(df0)
    graft.core.Checks.requireColumns(df, "to_cube_with_coords",
      "nomvar", "rid", "d")
    val g = if (df.columns.contains("grid")) df else Decode.addGrid(df)
    // r13 optimization (guide §2.4): one coordinate scan instead of
    // two — min(struct(rid, d)) picks the min-rid axis per nomvar in
    // a single grouped pass (min skips the other nomvar's nulls), so
    // the input is scanned once for both axes and once for the cube.
    val axes = g.filter(col("nomvar").isin(">>", "^^"))
      .groupBy("grid").agg(
        min(when(col("nomvar") === ">>",
          struct(col("rid"), col("d")))).as("lonr"),
        min(when(col("nomvar") === "^^",
          struct(col("rid"), col("d")))).as("latr"))
      .select(col("grid"), col("lonr.d").as("lon"),
        col("latr.d").as("lat"))
    toCube(g).join(broadcast(axes), Seq("grid"), "left")
  }
}
