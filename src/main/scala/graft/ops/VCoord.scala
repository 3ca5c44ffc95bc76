package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.meta.Lookups

/** Vertical-coordinate classification (M8, set_vertical_coordinate_type,
  * /root/reference/fstpy/std_vgrid.py:574-646) and QuickPressure
  * (M2-M5, /root/reference/fstpy/quick_pressure.py:18-83 + pressure
  * formulas /root/reference/fstpy/std_vgrid.py:328-512).
  *
  * Scale shape: classification joins a distinct (grid, ip1_kind) set
  * against per-grid meta summaries and the 26-row rules table — all
  * broadcast; the wide data side is touched once with a broadcast join
  * to pick up its vctype. QuickPressure derives one PX row per distinct
  * (grid, vctype, datev, ip1): the payload math runs on the SMALL
  * level-set side joined with the single P0/PT field per group, never
  * shuffling data payloads.
  */
object VCoord {

  val VcMeta: Seq[String] =
    Seq("^^", ">>", "^>", "!!", "!!SF", "HY", "P0", "PT")

  private def ip1KindCol: Column =
    when(col("nomvar").isin(graft.core.Constants.RawIpNomvars: _*), lit(100))
      .otherwise(IpColumns.decodeKind(col("ip1")))

  /** M8: classify each (grid, ip1_kind) data group into a vctype via
    * per-grid meta existence flags + the VCTYPES rules table; meta rows
    * are tagged UNKNOWN.
    */
  def setVerticalCoordinateType(df: DataFrame): DataFrame = {
    graft.core.Checks.requireColumns(df, "set_vertical_coordinate_type",
      "nomvar", "ip1", "ip2", "ig1", "ig2")
    // Enrich grid/ip1_kind on the WHOLE input up front so the
    // NaN-repair split below carries identical columns on both
    // branches (pass-through rows must not end up with null grid).
    val g0 = if (df.columns.contains("grid")) df else Decode.addGrid(df)
    val g1 = if (g0.columns.contains("ip1_kind")) g0
             else g0.withColumn("ip1_kind", ip1KindCol)
    // NaN-repair path (std_vgrid.py:638-646): when a vctype column is
    // already present, re-classify only the rows where it is missing
    // and pass the correctly-tagged rows through.
    if (g1.columns.contains("vctype")) {
      val missing = g1.filter(col("vctype").isNull).drop("vctype")
      val correct = g1.filter(col("vctype").isNotNull)
      return setVerticalCoordinateType(missing).unionByName(correct)
    }
    val g = g1
    // meta subset is small by construction and feeds three branches
    // (flags, vcodes, output union): cache it so the input catalog is
    // not re-scanned per branch and the composed plan stays shallow
    val meta = g.filter(col("nomvar").isin(VcMeta: _*))
      .transform(graft.core.CacheRegistry.persist(_))
    val noMeta = g.filter(!col("nomvar").isin(VcMeta: _*))

    val flags = meta.groupBy("grid").agg(
      max(col("nomvar") === "!!").as("f_toctoc"),
      max(col("nomvar") === "P0").as("f_p0"),
      max(col("nomvar") === "E1").as("f_e1"),
      max(col("nomvar") === "PT").as("f_pt"),
      max(col("nomvar") === "HY").as("f_hy"),
      max(col("nomvar") === "!!SF").as("f_sf"))
    val vcodes = meta.filter(col("nomvar") === "!!")
      .groupBy("grid").agg(sort_array(collect_set(col("ig1"))).as("vcodes"))

    val rules = Lookups.vctypesDf(g.sparkSession)
      .withColumnRenamed("ip1_kind", "r_kind")
      .withColumnRenamed("vctype", "r_vctype")

    val gk = noMeta.select("grid", "ip1_kind").distinct()
      .join(flags, Seq("grid"), "left")
      .join(vcodes, Seq("grid"), "left")
      .na.fill(false,
        Seq("f_toctoc", "f_p0", "f_e1", "f_pt", "f_hy", "f_sf"))
      .withColumn("vcodes", coalesce(col("vcodes"), array(lit(-1))))
      .withColumn("this_vcode",
        when(size(col("vcodes")) > 1,
          coalesce(element_at(
            filter(col("vcodes"),
              v => floor(v / lit(1000)).cast("int") === col("ip1_kind")),
            1), lit(-1)))
          .otherwise(element_at(col("vcodes"), 1)))
      .join(broadcast(rules),
        col("ip1_kind") === col("r_kind") &&
          col("f_toctoc") === col("toctoc") &&
          col("f_p0") === col("P0") && col("f_e1") === col("E1") &&
          col("f_pt") === col("PT") && col("f_hy") === col("HY") &&
          col("f_sf") === col("SF") &&
          col("this_vcode") === col("vcode"), "left")
      .select(col("grid").as("vg_grid"), col("ip1_kind").as("vg_kind"),
        coalesce(col("r_vctype"), lit("UNKNOWN")).as("vctype"))

    val dataTagged = noMeta
      .join(broadcast(gk),
        col("grid") === col("vg_grid") && col("ip1_kind") === col("vg_kind"),
        "left")
      .drop("vg_grid", "vg_kind")
      .withColumn("vctype", coalesce(col("vctype"), lit("UNKNOWN")))
    dataTagged.unionByName(meta.withColumn("vctype", lit("UNKNOWN")))
  }

  /** DuckDB twin: (grid, ip1_kind, vctype) classification rows for the
    * data side. Expects the `cat` CTE in scope.
    */
  def vctypeSql: String = {
    val vcMetaList = VcMeta.map(s => s"'$s'").mkString("(", ", ", ")")
    val rules = Lookups.VcTypes.map { t =>
      s"(${t._1}, ${t._2}, ${t._3}, ${t._4}, ${t._5}, ${t._6}, ${t._7}, " +
        s"${t._8}, '${t._9}')"
    }.mkString(", ")
    val k = IpColumns.decodeKindSql("ip1")
    s""", g AS (SELECT *, ${Decode.gridSql} AS grid,
    CASE WHEN nomvar IN ('>>', '^^', '^>', '!!') THEN 100 ELSE $k END
      AS ip1_kind FROM cat)
, vmeta AS (SELECT * FROM g WHERE nomvar IN $vcMetaList)
, vdata AS (SELECT * FROM g WHERE nomvar NOT IN $vcMetaList)
, vflags AS (SELECT grid, bool_or(nomvar = '!!') AS f_toctoc,
    bool_or(nomvar = 'P0') AS f_p0, bool_or(nomvar = 'E1') AS f_e1,
    bool_or(nomvar = 'PT') AS f_pt, bool_or(nomvar = 'HY') AS f_hy,
    bool_or(nomvar = '!!SF') AS f_sf FROM vmeta GROUP BY grid)
, vvcodes AS (SELECT grid, list_sort(list(DISTINCT ig1)) AS vcodes
    FROM vmeta WHERE nomvar = '!!' GROUP BY grid)
, vgk AS (SELECT d.grid, d.ip1_kind,
    coalesce(f.f_toctoc, FALSE) AS f_toctoc,
    coalesce(f.f_p0, FALSE) AS f_p0, coalesce(f.f_e1, FALSE) AS f_e1,
    coalesce(f.f_pt, FALSE) AS f_pt, coalesce(f.f_hy, FALSE) AS f_hy,
    coalesce(f.f_sf, FALSE) AS f_sf,
    coalesce(v.vcodes, [-1]) AS vcodes
  FROM (SELECT DISTINCT grid, ip1_kind FROM vdata) d
  LEFT JOIN vflags f ON d.grid = f.grid
  LEFT JOIN vvcodes v ON d.grid = v.grid)
, vgk2 AS (SELECT *, CASE WHEN len(vcodes) > 1 THEN
      coalesce(list_extract(list_filter(vcodes,
        x -> CAST(floor(x / 1000) AS INT) = ip1_kind), 1), -1)
      ELSE vcodes[1] END AS this_vcode FROM vgk)
, vclass AS (SELECT vgk2.grid, vgk2.ip1_kind,
    coalesce(r.vctype, 'UNKNOWN') AS vctype
  FROM vgk2 LEFT JOIN (VALUES $rules)
    AS r(ip1_kind, toctoc, P0, E1, PT, HY, SF, vcode, vctype)
    ON vgk2.ip1_kind = r.ip1_kind AND vgk2.f_toctoc = r.toctoc
    AND vgk2.f_p0 = r.P0 AND vgk2.f_e1 = r.E1 AND vgk2.f_pt = r.PT
    AND vgk2.f_hy = r.HY AND vgk2.f_sf = r.SF
    AND vgk2.this_vcode = r.vcode)"""
  }

  val StandardAtmosphere = 1013.25

  /** M2-M5 QuickPressure: one PX record per (grid, vctype, datev,
    * level), payload from the group's P0/PT fields:
    * sigma 1001 `p = lvl*P0`; eta 1002 `p = lvl*(P0-PT)+PT`;
    * pressure 2001 constant `p = lvl`. Element math runs in DOUBLE and
    * casts once to float32 (the reference's numpy float32 stepwise ops
    * round identically for the single-multiply cases).
    * Container metadata is cloned from the group's minimum-rid row
    * (deterministic stand-in for the reference's first-row clone).
    */
  def quickPressure(df: DataFrame,
                    standardAtmosphere: Boolean = false): DataFrame = {
    graft.core.Checks.requireColumns(df, "quick_pressure", "nomvar",
      "ip1", "datev", "d", "ni", "nj", "nbits", "datyp")
    // deterministic clone tiebreak: rid if present, else the FST
    // source's (path, key) pair — key alone is only unique within one
    // file, so a multi-file catalog needs the path in the ordering.
    // A catalog without either gets a named error.
    val df0 =
      if (df.columns.contains("rid")) df
      else {
        graft.core.Checks.requireColumns(df, "quick_pressure", "key")
        if (df.columns.contains("path"))
          df.withColumn("rid",
            struct(col("path"), col("key").cast("long")))
        else df.withColumn("rid", col("key").cast("long"))
      }
    val vc = setVerticalCoordinateType(df0)
    // The meta subset is small (coordinate/descriptor records) but
    // feeds four lookups below; persisting it keeps the classification
    // joins + full-catalog scan from re-running per lookup.
    val meta = vc.filter(col("nomvar").isin(VcMeta: _*))
      .transform(graft.core.CacheRegistry.persist(_))
    // r14: EAGER materialization of this cache and perLevel (one
    // count() each before the plan fans out) was applied and paired-
    // A/B'd (AbProfile, 7 reps, sf0.1): eager LOST — f19 median 4.11
    // vs 2.94 s lazy, f46 3.22 vs 2.50 (best-of-7 agrees). The two
    // extra serialized fill jobs cost more than the lazy "race":
    // within one action, BlockManager's per-block get-or-compute
    // locking already makes concurrent legs share each cache fill,
    // so the feared f20-style duplicate subtree evaluation does not
    // materialize here. (The eager build also planned 6 SortMergeJoin
    // as 12 static BroadcastHashJoin from known cache sizes —
    // plans/r14/f19_quick_pressure_{before,after}.txt — and still
    // lost: AQE converts those joins at runtime anyway.) Lazy kept.
    val data = vc.filter(!col("nomvar").isin(VcMeta: _*))
      .filter(col("ip1") =!= 0 && col("vctype") =!= "UNKNOWN" &&
        !col("nomvar").isin("PX", "PXSA"))

    val repCols = Seq("typvar", "ni", "nj", "nk", "dateo", "ip2", "ip3",
      "deet", "npas", "grtyp", "ig1", "ig2", "ig3", "ig4")
    // ONE aggregation pass over the (large) data side: one row per
    // distinct level group, carrying that group's min-rid metadata
    // clone. Both `reps` and `levels` derive from this tiny persisted
    // table, so payload-bearing rows are scanned once, not twice.
    val perLevel = data
      .groupBy("grid", "vctype", "datev", "ip1").agg(
        min("rid").as("lrid"),
        min_by(struct(repCols.map(col): _*), col("rid")).as("lrep"))
      .transform(graft.core.CacheRegistry.persist(_))
    val reps = perLevel.groupBy("grid", "vctype", "datev").agg(
      min_by(col("lrep"), col("lrid")).as("rep"))
      .select(col("grid"), col("vctype"), col("datev"),
        col("rep.*"))

    val levels = perLevel.select("grid", "vctype", "datev", "ip1")
      .withColumn("level", IpColumns.decodeValue(col("ip1")))

    // Descriptor sides are deduplicated to one row per join key
    // (deterministic lowest-rid pick): duplicate P0/PT/!! records —
    // e.g. overlapping files read before a dedup pass — must not fan
    // the emitted PX rows out; the reference clones from the single
    // first matching row.
    val p0s = meta.filter(col("nomvar") === "P0")
      .groupBy(col("grid").as("p_grid"), col("datev").as("p_datev"))
      .agg(min_by(struct(col("d"), col("nbits"), col("datyp")),
        col("rid")).as("r"))
      .select(col("p_grid"), col("p_datev"), col("r.d").as("p0_d"),
        col("r.nbits").as("p0_nbits"), col("r.datyp").as("p0_datyp"))
    val pts = meta.filter(col("nomvar") === "PT")
      .groupBy(col("grid").as("t_grid"), col("datev").as("t_datev"))
      .agg(min_by(col("d"), col("rid")).as("pt_d"))
    // J1: the `!!` A/B table of the grid (column j = (ip1, A, B),
    // Fortran (3 x nj); pref lives at d[1][1] — std_vgrid.py:276-282)
    val tts = meta.filter(col("nomvar") === "!!")
      .groupBy(col("grid").as("g_tt"))
      .agg(min_by(struct(col("d"), col("nj")), col("rid")).as("r"))
      .select(col("g_tt"), col("r.d").as("tt_d"),
        col("r.nj").as("tt_nj"))
    // grid-less HY descriptor: ptop/pref/rcoef (std_vgrid.py:440-445);
    // the global aggregate always yields one row (nulls when absent)
    val hyAgg = meta.filter(col("nomvar") === "HY").agg(
      min(element_at(col("d"), 1)).as("hy_ptop"),
      min(col("ig1")).as("hy_pref"),
      min(col("ig2")).as("hy_rc"))

    val HybridToctoc =
      Seq("HYBRID_5002", "HYBRID_5003", "HYBRID_5004", "HYBRID_5005")

    // Join strategy (r13 optimization pass, examined and LEFT ALONE):
    // the descriptor/rep sides here are metadata-bounded and look like
    // broadcast candidates, but AQE (on in every driving session)
    // already converts these joins at runtime from their actual sizes;
    // explicit broadcast()/shuffle_hash hints were paired-A/B'd
    // (AbProfile, 8 reps, sf0.1) and measured neutral-to-worse — the
    // extra eager broadcast-build jobs cost more than the saved
    // conversion. OPTIMIZATION_r13.md "f19/f46" has the numbers.
    val joined = levels
      .join(reps, Seq("grid", "vctype", "datev"))
      .join(p0s, col("grid") === col("p_grid") &&
        col("datev") === col("p_datev"), "left")
      .join(pts, col("grid") === col("t_grid") &&
        col("datev") === col("t_datev"), "left")
      .join(tts, col("grid") === col("g_tt"), "left")
      .crossJoin(broadcast(hyAgg))
      .withColumn("jidx", coalesce(array_position(
        transform(sequence(lit(0), col("tt_nj") - 1),
          j => element_at(col("tt_d"), (j * 3 + 1).cast("int"))
            .cast("int")),
        col("ip1")), lit(0L)))
      .filter(
        (col("vctype") === "SIGMA_1001" && col("p0_d").isNotNull) ||
        (col("vctype") === "ETA_1002" && col("p0_d").isNotNull &&
          col("pt_d").isNotNull) ||
        (col("vctype") === "HYBRID_5001" && col("p0_d").isNotNull &&
          col("hy_pref").isNotNull) ||
        (col("vctype").isin(HybridToctoc: _*) &&
          col("p0_d").isNotNull && col("tt_d").isNotNull &&
          col("jidx") > 0) ||
        (col("vctype") === "PRESSURE_2001"))

    val lvlD = col("level").cast("double")
    // hybrid 5001 coefficients (std_vgrid.py:464-476)
    val etatop = col("hy_ptop").cast("double") / col("hy_pref")
    val rcoef = col("hy_rc").cast("double") / lit(1000.0)
    val bb5001 = pow((lvlD - etatop) / (lit(1.0) - etatop), rcoef)
    val aa5001 = col("hy_pref") * (lvlD - bb5001)
    // hybrid 5002-5005 table coefficients (std_vgrid.py:276-295)
    val aTab = element_at(col("tt_d"),
      ((col("jidx") - 1) * 3 + 2).cast("int")).cast("double")
    val bTab = element_at(col("tt_d"),
      ((col("jidx") - 1) * 3 + 3).cast("int")).cast("double")
    val prefTab = element_at(col("tt_d"), 5).cast("double")

    val dCol =
      if (!standardAtmosphere)
        when(col("vctype") === "SIGMA_1001",
          transform(col("p0_d"),
            x => (lvlD * x.cast("double")).cast("float")))
        .when(col("vctype") === "ETA_1002",
          zip_with(col("p0_d"), col("pt_d"), (a, b) =>
            (lvlD * (a.cast("double") - b.cast("double")) +
              b.cast("double")).cast("float")))
        .when(col("vctype") === "HYBRID_5001",
          transform(col("p0_d"),
            x => (aa5001 + bb5001 * x.cast("double")).cast("float")))
        .when(col("vctype").isin(HybridToctoc: _*),
          transform(col("p0_d"), x =>
            (exp(aTab + bTab * log(x.cast("double") * 100 / prefTab))
              / 100).cast("float")))
        .otherwise(array_repeat(col("level"),
          (col("ni") * col("nj")).cast("int")))
      else {
        val term0 = etatop
        val term4 = lvlD - term0
        val term6 = pow(
          when(term4 < 0, lit(0.0)).otherwise(term4) *
            (lit(1.0) / (lit(1.0) - term0)), rcoef)
        when(col("vctype") === "SIGMA_1001",
          transform(col("p0_d"),
            _ => (lvlD * lit(StandardAtmosphere)).cast("float")))
        .when(col("vctype") === "ETA_1002",
          zip_with(col("p0_d"), col("pt_d"), (_, b) =>
            (b.cast("double") * (lit(1.0) - lvlD) +
              lvlD * lit(StandardAtmosphere)).cast("float")))
        .when(col("vctype") === "HYBRID_5001",
          transform(col("p0_d"), _ =>
            (col("hy_pref") * (lvlD - term6) +
              term6 * lit(StandardAtmosphere)).cast("float")))
        .when(col("vctype").isin(HybridToctoc: _*),
          transform(col("p0_d"), _ =>
            (exp(aTab + bTab *
              log(lit(StandardAtmosphere * 100.0) / prefTab))
              / 100).cast("float")))
        .otherwise(array_repeat(col("level"),
          (col("ni") * col("nj")).cast("int")))
      }

    joined.select(
      lit(if (standardAtmosphere) "PXSA" else "PX").as("nomvar"),
      col("typvar"), lit("PRESSR").as("etiket"),
      col("ni"), col("nj"), col("nk"), col("dateo"), col("ip1"),
      col("ip2"), col("ip3"), col("deet"), col("npas"),
      when(col("vctype") === "PRESSURE_2001", lit(5))
        .otherwise(col("p0_datyp")).as("datyp"),
      when(col("vctype") === "PRESSURE_2001", lit(32))
        .otherwise(col("p0_nbits")).as("nbits"),
      col("grtyp"), col("ig1"), col("ig2"), col("ig3"), col("ig4"),
      col("datev"), col("grid"), col("vctype"), col("level"),
      dCol.as("d"))
  }

  /** M16 get_df_from_vgrid (/root/reference/fstpy/std_vgrid.py:749-791):
    * one `!!` record per vertical-grid descriptor row. Input columns:
    * kind, version, ni, nj, vtbl (the flattened A/B table payload),
    * ip1, ip2. The toctoc link is ig1 = kind*1000 + version (the
    * reference's zero-padded string concat).
    */
  def dfFromVgrid(desc: DataFrame): DataFrame =
    desc.select(
      lit("!!").as("nomvar"), lit("X").as("typvar"), lit("").as("etiket"),
      col("ni").cast("int").as("ni"), col("nj").cast("int").as("nj"),
      lit(1).as("nk"), lit(0L).as("dateo"),
      col("ip1").cast("int").as("ip1"), col("ip2").cast("int").as("ip2"),
      lit(0).as("ip3"), lit(0).as("deet"), lit(0).as("npas"),
      lit(5).as("datyp"), lit(64).as("nbits"), lit("X").as("grtyp"),
      (col("kind") * 1000 + col("version")).cast("int").as("ig1"),
      lit(0).as("ig2"), lit(0).as("ig3"), lit(0).as("ig4"),
      lit(0L).as("datev"), col("vtbl").as("d"))
}
