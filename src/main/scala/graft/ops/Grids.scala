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
    * deformation records (Z/Y path), plus every U grid's `^>` record
    * (subgrid-concat path, std_grid.py:166-176: the two subgrids'
    * fields concatenate along the nj axis, which in Fortran-flat
    * layout is plain array concatenation).
    *
    * `^>` payload convention (librmn's exact tictac layout is part of
    * the external ezscint boundary; this packing is the library's own,
    * pinned by [[dfFromGrid]] + the driver round-trip): per subgrid
    * `[ni, nj, lon_axis(ni), lat_axis(nj)]`, two subgrids
    * back-to-back; both subgrids share ni.
    *
    * `cacheCoords = true` persists the coordinate-record subset (two
    * >>/^^ rows per grid — metadata-scale at any corpus size) via
    * [[graft.core.CacheRegistry]] and MATERIALIZES it with an eager
    * count() before the four-way branch fan-out, so an expensive
    * input is scanned once per action instead of once per branch
    * (six scans in the r13-before f30 plan). Like `matchesAgainst`,
    * the cache is pinned until the caller runs
    * `CacheRegistry.releaseAll()` — harness-owned lifecycles only.
    * The default stays LAZY: no job is triggered by building the
    * frame, and a small or already-local input (f57's synthesized
    * U-grid) does not pay a fixed materialization action it cannot
    * amortize (r13 measured that collateral at ~1.5x the query).
    */
  def latLon2d(df: DataFrame, cacheCoords: Boolean = false)
      : DataFrame = {
    val g0 = if (df.columns.contains("grid")) df else Decode.addGrid(df)
    // r13 optimization (guide §2.4 "remove passes"): the four output
    // branches (LA, LO, U-LA, U-LO) each re-derived their axis rows
    // from the FULL input — six catalog scans per action in the f30
    // plan. The coordinate-record subset is metadata-scale by
    // construction (two >>/^^ rows per grid, axis-sized payloads), so
    // persist it once and fan the branches out from the cache: the
    // input is scanned ONCE per action regardless of branch count.
    // r14: the persist decision is the CALLER's (cacheCoords) — f30's
    // catalog scan amortizes it, f57's tiny local frame does not.
    val gSub = g0.filter(col("nomvar").isin(">>", "^^", "^>"))
      .select(col("grid"), col("nomvar"), col("ni"), col("nj"),
        col("d"))
    val g =
      if (cacheCoords) {
        val c = gSub.transform(graft.core.CacheRegistry.persist(_))
        // materialize BEFORE the four-way fan-out (f20 lesson):
        // branches racing through the uncached plan in one job would
        // each re-run the full input scan the cache exists to avoid
        c.count()
        c
      } else gSub
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

    // U path: unpack both subgrids' axes out of the ^> payload, build
    // each sub-field as the usual axis outer product, concatenate.
    //
    // TOTALITY: Catalyst pushes the caller's inferred `size(d) > 0`
    // generate-filter through the union, and predicate-codegen
    // subexpression elimination evaluates these expressions on rows
    // the `nomvar = '^>'` conjunct would discard — so every
    // expression here must be ANSI-safe for ARBITRARY payloads:
    // dims clamp to [0, size(d)] (a raw `sequence(0, ni*nj-1)` with
    // ni = 0 even yields a DESCENDING [0, -1] — Spark infers step
    // -1 — and then divides by zero), lookups are try_element_at,
    // and slice starts stay positive by construction.
    // try_cast, NOT cast: a foreign row's payload float can be NaN or
    // exceed int range, and a plain .cast("int") would throw under
    // ANSI; try_cast nulls those, and the coalesce turns them into an
    // empty dim. (A double-typed clamp would also be total, but its
    // comparison tree measured ~40x slower in the pushed predicate —
    // keep the arithmetic int end-to-end.)
    val dSz = size(col("d"))
    def dim(idx: Column) = least(dSz, greatest(lit(0),
      coalesce(try_element_at(col("d"), idx).try_cast("int"), lit(0))))
    val u = g.filter(col("nomvar") === "^>")
      .withColumn("u_ni1", dim(lit(1)))
      .withColumn("u_nj1", dim(lit(2)))
      .withColumn("u_lon1", slice(col("d"), lit(3), col("u_ni1")))
      .withColumn("u_lat1",
        slice(col("d"), col("u_ni1") + 3, col("u_nj1")))
      .withColumn("u_b2", col("u_ni1") + col("u_nj1") + lit(2))
      .withColumn("u_ni2", dim(col("u_b2") + 1))
      .withColumn("u_nj2", dim(col("u_b2") + 2))
      .withColumn("u_lon2",
        slice(col("d"), col("u_b2") + 3, col("u_ni2")))
      .withColumn("u_lat2",
        slice(col("d"), col("u_b2") + col("u_ni2") + 3, col("u_nj2")))
    def outer(ni: Column, nj: Column, lonAx: Column, latAx: Column)
        : (Column, Column) = {
      // the product is guarded in LONG: two clamped-but-garbage dims
      // (each <= size(d)) can multiply past Int.MaxValue, which would
      // ANSI-overflow — and a plausible ^> record can't reach 2^26
      // field points (its payload would need >= 2*sqrt(n) axis floats)
      val n = ni.cast("long") * nj.cast("long")
      val kk = when(n > 0 && n <= (1L << 26),
        sequence(lit(0), (n - 1).cast("int")))
        .otherwise(array().cast("array<int>"))
      (transform(kk, k =>
        try_element_at(latAx, (k / ni).cast("int") + 1)),
        transform(kk, k =>
          try_element_at(lonAx, pmod(k, ni).cast("int") + 1)))
    }
    val (la1, lo1) =
      outer(col("u_ni1"), col("u_nj1"), col("u_lon1"), col("u_lat1"))
    val (la2, lo2) =
      outer(col("u_ni2"), col("u_nj2"), col("u_lon2"), col("u_lat2"))
    val uLa = u.select(col("grid"), lit("LA").as("nomvar"),
      col("u_ni1").as("ni"), (col("u_nj1") + col("u_nj2")).as("nj"),
      concat(la1, la2).as("d"))
    val uLo = u.select(col("grid"), lit("LO").as("nomvar"),
      col("u_ni1").as("ni"), (col("u_nj1") + col("u_nj2")).as("nj"),
      concat(lo1, lo2).as("d"))

    la.unionByName(lo).unionByName(uLa).unionByName(uLo)
  }

  /** Per-tile 2D lat/lon for `#` (tile) grids — the reference
    * dispatches `#` through the same per-record grid definition as
    * Z/Y/U (std_grid.py:74-79): a tile record's ni x nj window starts
    * at 1-BASED offsets (ig3, ig4) into the parent `>>`/`^^` axes it
    * references via ig1/ig2 (the LAM tiling convention). One LA + LO
    * pair per DISTINCT tile geometry (grid, i0, j0, ni, nj); the
    * offsets ride along in the output so downstream code can place
    * each tile in the parent plane.
    *
    * Scale shape: the distinct() collapses the (bounded) tile
    * geometry set before any axis join, the axes join is keyed on
    * `grid`, and the outer product is expression-only — same totality
    * guards as the U path (clamped slice starts/lengths, sizes taken
    * from the actually-sliced arrays).
    */
  def latLonTiles(df: DataFrame): DataFrame = {
    val g = if (df.columns.contains("grid")) df else Decode.addGrid(df)
    val lon = g.filter(col("nomvar") === ">>").select(
      col("grid"), col("d").as("lon_ax"))
    val lat = g.filter(col("nomvar") === "^^").select(
      col("grid").as("lat_grid"), col("d").as("lat_ax"))
    // meta records never carry grtyp '#' (their grtyp is the
    // reference grid type), so the grtyp filter alone isolates tiles
    val tiles = g.filter(col("grtyp") === "#")
      .select(col("grid"), col("ni").as("t_ni"), col("nj").as("t_nj"),
        col("ig3").as("i0"), col("ig4").as("j0"))
      .distinct()
    val j = tiles.join(lon, Seq("grid"))
      .join(lat, col("grid") === col("lat_grid"))
      .withColumn("t_lon", slice(col("lon_ax"),
        greatest(col("i0"), lit(1)), greatest(col("t_ni"), lit(0))))
      .withColumn("t_lat", slice(col("lat_ax"),
        greatest(col("j0"), lit(1)), greatest(col("t_nj"), lit(0))))
    val ni = size(col("t_lon"))
    val nj = size(col("t_lat"))
    val n = ni * nj
    val kk = when(n > 0, sequence(lit(0), n - 1))
      .otherwise(array().cast("array<int>"))
    def rec(nomvar: String, d: Column) =
      j.select(col("grid"), lit(nomvar).as("nomvar"),
        col("i0"), col("j0"), ni.as("ni"), nj.as("nj"), d.as("d"))
    rec("LA", transform(kk, k =>
        try_element_at(col("t_lat"), (k / ni).cast("int") + 1)))
      .unionByName(rec("LO", transform(kk, k =>
        try_element_at(col("t_lon"), pmod(k, ni).cast("int") + 1))))
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

  // ---------------------------------------------------------------
  // M13 extended path: E / G / N / S grid geometry. The reference
  // delegates these to the ezscint C kernel (rmn.gdll/decodeGrid,
  // std_grid.py:51-109, 128-203); the MATH is public geodesy,
  // re-expressed here as codegen'd Column HOFs — no UDF, no driver
  // compute. Convention notes (the bit-exact ezscint conventions live
  // only in C, so each is documented and pinned by round-trip tests):
  //  - N/S: polar stereographic true at 60°, sphere radius 6371 km;
  //    grid (i,j) 1-based, pole at (pi,pj), d60 = grid length [m] at
  //    60°, dgrw = angle from Greenwich to the grid's +X axis;
  //    sin(lat) = (re² - r²)/(re² + r²) with re = 1.866025·R/d60 in
  //    grid units.
  //  - E: rotated global lat/lon; (lat1,lon1) and (lat2,lon2) lie on
  //    the rotated equator ((lat1,lon1) at rotated (0,0)); A-style
  //    cell-centered rotated latitudes.
  //  - G: global Gaussian grid, rows south→north at the Legendre-root
  //    latitudes, longitudes regular from 0.
  // ---------------------------------------------------------------

  val EarthRadiusM = 6371000.0
  /** 1 + sin(60°): the polar-stereographic scale factor. */
  val PsScale = 1.8660254037844386
  private val D2R = math.Pi / 180.0
  private val R2D = 180.0 / math.Pi

  /** sin(latitude) array of the nj Gaussian latitudes — the roots of
    * Legendre P_nj — descending (north→south), via 8 Newton steps on
    * the ascending recurrence. Everything runs inside built-in
    * higher-order functions: the per-step (P_n, P_{n-1}) pair is
    * bound once through a single-element `aggregate` acting as a
    * let-binding, so the expression tree stays linear in the step
    * count.
    */
  def gaussianRoots(nj: Column): Column =
    transform(sequence(lit(1), nj), i => {
      val n = nj.cast("double")
      val x0 = cos(lit(math.Pi) * (i.cast("double") - 0.25) / (n + 0.5))
      aggregate(sequence(lit(1), lit(8)), x0, (x, _) => {
        val leg = aggregate(
          sequence(lit(1), nj),
          struct(x.as("p1"), lit(1.0).as("p0")),
          (acc, k) => {
            val kd = k.cast("double")
            val p = ((lit(2.0) * kd - 1.0) * x * acc.getField("p1") -
              (kd - 1.0) * acc.getField("p0")) / kd
            when(k === 1, acc)
              .otherwise(struct(p.as("p1"),
                acc.getField("p1").as("p0")))
          })
        aggregate(array(leg), x, (xc, s) =>
          xc - s.getField("p1") * (xc * xc - 1.0) /
            (n * (xc * s.getField("p1") - s.getField("p0"))))
      })
    })

  /** LA/LO generation for E / G / N / S grids. Input: one row per
    * grid with columns grid, grtyp, ni, nj, plus per-family params —
    * pi, pj, d60, dgrw (N/S) and lat1, lon1, lat2, lon2 (E); unused
    * params may hold anything. Output shape matches [[latLon2d]]
    * (Fortran-flat LA + LO records); values are rounded to 1e-6
    * degrees so the float surface is stable across trig libraries.
    */
  def latLonGeo(params: DataFrame): DataFrame = {
    // E rotation basis from the two equator points: a = unit(p1)
    // maps to rotated (0,0); c = unit(a × b) is the rotated pole;
    // bb = c × a completes the right-handed frame. true = a·x' +
    // bb·y' + c·z' for the rotated unit vector (x', y', z').
    val withB = params
      .withColumn("e_ax", cos(col("lat1") * D2R) * cos(col("lon1") * D2R))
      .withColumn("e_ay", cos(col("lat1") * D2R) * sin(col("lon1") * D2R))
      .withColumn("e_az", sin(col("lat1") * D2R))
      .withColumn("e_bx", cos(col("lat2") * D2R) * cos(col("lon2") * D2R))
      .withColumn("e_by", cos(col("lat2") * D2R) * sin(col("lon2") * D2R))
      .withColumn("e_bz", sin(col("lat2") * D2R))
      .withColumn("e_ux", col("e_ay") * col("e_bz") - col("e_az") * col("e_by"))
      .withColumn("e_uy", col("e_az") * col("e_bx") - col("e_ax") * col("e_bz"))
      .withColumn("e_uz", col("e_ax") * col("e_by") - col("e_ay") * col("e_bx"))
      // non-E rows carry zero params (a = b -> |a × b| = 0): keep the
      // normalization total under ANSI mode; E rows with coincident
      // or antipodal defining points are genuinely degenerate
      .withColumn("e_un",
        when(col("grtyp") === "E", sqrt(col("e_ux") * col("e_ux") +
          col("e_uy") * col("e_uy") + col("e_uz") * col("e_uz")))
          .otherwise(lit(1.0)))
      .withColumn("e_cx", col("e_ux") / col("e_un"))
      .withColumn("e_cy", col("e_uy") / col("e_un"))
      .withColumn("e_cz", col("e_uz") / col("e_un"))
      .withColumn("e_mx", col("e_cy") * col("e_az") - col("e_cz") * col("e_ay"))
      .withColumn("e_my", col("e_cz") * col("e_ax") - col("e_cx") * col("e_az"))
      .withColumn("e_mz", col("e_cx") * col("e_ay") - col("e_cy") * col("e_ax"))
      // Gaussian sin-latitudes once per row, not per point
      .withColumn("gl", when(col("grtyp") === "G",
        gaussianRoots(col("nj"))))

    val ks = sequence(lit(0), col("ni") * col("nj") - 1)
    def i1(k: Column) = pmod(k, col("ni")).cast("double") + 1.0
    def j1(k: Column) = floor(k / col("ni")).cast("double") + 1.0
    def rnd(c: Column) = round(c, 6).cast("float")

    // polar stereographic inverse
    def psR2(k: Column): Column = {
      val x = i1(k) - col("pi"); val y = j1(k) - col("pj")
      x * x + y * y
    }
    def psRe2: Column = {
      val re = lit(PsScale * EarthRadiusM) / col("d60")
      re * re
    }
    def psLat(k: Column): Column =
      asin((psRe2 - psR2(k)) / (psRe2 + psR2(k))) * R2D
    def psTheta(k: Column): Column =
      atan2(j1(k) - col("pj"), i1(k) - col("pi")) * R2D

    // rotated lat/lon: rotated cell (i,j) -> true unit vector
    def rotTrue(k: Column): (Column, Column, Column) = {
      val phi = (lit(-90.0) + (j1(k) - 0.5) *
        (lit(180.0) / col("nj"))) * D2R
      val lam = (i1(k) - 1.0) * (lit(360.0) / col("ni")) * D2R
      val ux = cos(phi) * cos(lam)
      val uy = cos(phi) * sin(lam)
      val uz = sin(phi)
      (col("e_ax") * ux + col("e_mx") * uy + col("e_cx") * uz,
        col("e_ay") * ux + col("e_my") * uy + col("e_cy") * uz,
        col("e_az") * ux + col("e_mz") * uy + col("e_cz") * uz)
    }

    val laD =
      when(col("grtyp") === "N", transform(ks, k => rnd(psLat(k))))
        .when(col("grtyp") === "S", transform(ks, k => rnd(-psLat(k))))
        .when(col("grtyp") === "E", transform(ks, k => {
          val (_, _, tz) = rotTrue(k)
          rnd(asin(tz) * R2D)
        }))
        .when(col("grtyp") === "G", transform(ks, k =>
          // roots descend from north; south-first rows negate
          rnd(-asin(element_at(col("gl"), j1(k).cast("int"))) * R2D)))
    val loD =
      when(col("grtyp") === "N",
        transform(ks, k => rnd(pmod(psTheta(k) + col("dgrw"), lit(360.0)))))
        .when(col("grtyp") === "S",
          transform(ks, k => rnd(pmod(col("dgrw") - psTheta(k), lit(360.0)))))
        .when(col("grtyp") === "E", transform(ks, k => {
          val (tx, ty, _) = rotTrue(k)
          rnd(pmod(atan2(ty, tx) * R2D, lit(360.0)))
        }))
        .when(col("grtyp") === "G", transform(ks, k =>
          rnd(pmod(k, col("ni")) * lit(360.0) / col("ni"))))

    val la = withB.select(col("grid"), lit("LA").as("nomvar"),
      col("ni"), col("nj"), laD.as("d"))
    val lo = withB.select(col("grid"), lit("LO").as("nomvar"),
      col("ni"), col("nj"), loD.as("d"))
    la.unionByName(lo)
  }

  // ---------------------------------------------------------------
  // M13 closure: IG word <-> degrees packing. The reference passes
  // raw ig1-4 straight to the external ezscint kernel
  // (`c_ezqkdef(ni, nj, grtyp, ig1, ig2, ig3, ig4, 0)`,
  // std_grid.py:99) and never spells the packing out, so librmn's
  // exact cigaxg/cxgaig quantization stays the declared external
  // boundary; this pair is the library's own documented convention —
  // an exact inverse pair at its stated resolutions, pinned by a
  // round-trip property test and driver query f58.
  //
  // Per grtyp (resolutions chosen so real-world descriptors
  // round-trip exactly):
  //  - L: ig1 = (lat0+90)*100, ig2 = lon0*100 (centidegrees),
  //       ig3 = dlat*1000, ig4 = dlon*1000 (millidegrees);
  //  - E: ig1 = (lat1+90)*100, ig2 = lon1*100,
  //       ig3 = (lat2+90)*100, ig4 = lon2*100 (centidegrees);
  //  - N/S: ig1 = pi*100, ig2 = pj*100 (centi-grid-units),
  //       ig3 = d60/10 (decameters), ig4 = dgrw*100 (centidegrees);
  //  - A/B/G: no params — all IG words zero.
  // ---------------------------------------------------------------

  /** Encode per-grtyp params (the [[latLonRegular]]/[[latLonGeo]]
    * input columns) into ig1..ig4.
    */
  def igEncode(params: DataFrame): DataFrame = {
    def r100(c: Column) = round(c * 100).cast("int")
    val (ig1, ig2, ig3, ig4) = (
      when(col("grtyp") === "L", r100(col("lat0") + 90))
        .when(col("grtyp") === "E", r100(col("lat1") + 90))
        .when(col("grtyp").isin("N", "S"), r100(col("pi")))
        .otherwise(lit(0)),
      when(col("grtyp") === "L", r100(col("lon0")))
        .when(col("grtyp") === "E", r100(col("lon1")))
        .when(col("grtyp").isin("N", "S"), r100(col("pj")))
        .otherwise(lit(0)),
      when(col("grtyp") === "L", round(col("dlat") * 1000).cast("int"))
        .when(col("grtyp") === "E", r100(col("lat2") + 90))
        .when(col("grtyp").isin("N", "S"),
          round(col("d60") / 10).cast("int"))
        .otherwise(lit(0)),
      when(col("grtyp") === "L", round(col("dlon") * 1000).cast("int"))
        .when(col("grtyp") === "E", r100(col("lon2")))
        .when(col("grtyp").isin("N", "S"), r100(col("dgrw")))
        .otherwise(lit(0)))
    params.withColumn("ig1", ig1).withColumn("ig2", ig2)
      .withColumn("ig3", ig3).withColumn("ig4", ig4)
  }

  /** Exact inverse of [[igEncode]]: decode ig1..ig4 into the
    * per-grtyp param columns (unused params are 0.0, as
    * [[latLonGeo]] expects).
    */
  def igDecode(df: DataFrame): DataFrame = {
    def d100(c: Column) = c.cast("double") / 100
    def pick(l: Column, e: Column, ns: Column) =
      when(col("grtyp") === "L", l)
        .when(col("grtyp") === "E", e)
        .when(col("grtyp").isin("N", "S"), ns)
        .otherwise(lit(0.0))
    df
      .withColumn("lat0", pick(d100(col("ig1")) - 90, lit(0.0), lit(0.0)))
      .withColumn("lon0", pick(d100(col("ig2")), lit(0.0), lit(0.0)))
      .withColumn("dlat",
        pick(col("ig3").cast("double") / 1000, lit(0.0), lit(0.0)))
      .withColumn("dlon",
        pick(col("ig4").cast("double") / 1000, lit(0.0), lit(0.0)))
      .withColumn("lat1", pick(lit(0.0), d100(col("ig1")) - 90, lit(0.0)))
      .withColumn("lon1", pick(lit(0.0), d100(col("ig2")), lit(0.0)))
      .withColumn("lat2", pick(lit(0.0), d100(col("ig3")) - 90, lit(0.0)))
      .withColumn("lon2", pick(lit(0.0), d100(col("ig4")), lit(0.0)))
      .withColumn("pi", pick(lit(0.0), lit(0.0), d100(col("ig1"))))
      .withColumn("pj", pick(lit(0.0), lit(0.0), d100(col("ig2"))))
      .withColumn("d60",
        pick(lit(0.0), lit(0.0), col("ig3").cast("double") * 10))
      .withColumn("dgrw", pick(lit(0.0), lit(0.0), d100(col("ig4"))))
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
    // '#' (tile) grids share the Z/Y axes-record shape: the parent
    // `>>`/`^^` cover the FULL plane and tiles window into them via
    // ig3/ig4 (std_grid.py:74-79), so their grid-params emit the same
    // records
    val zy = params.filter(col("grtyp").isin("Z", "Y", "#"))
    val xx = zy.select(rec(">>", col("ni"), lit(1), col("ax")): _*)
    val yy = zy.select(rec("^^", lit(1), col("nj"), col("ay")): _*)
    val u = params.filter(col("grtyp") === "U")
      .select(rec("^>", size(col("axy")), lit(1), col("axy")): _*)
    xx.unionByName(yy).unionByName(u)
  }
}
