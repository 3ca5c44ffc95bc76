package graft.fixtures

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{IpCodec, RmnDate}

/** Deterministic FST record catalog derived from the driver's
  * `orders` parquet table, with a DuckDB CTE twin ([[sqlCte]]) built
  * from the same Scala-computed literals — so every FST-domain query
  * can be driver-verified against a DuckDB oracle at any scale factor.
  *
  * Layout (rid = o_orderkey):
  *  - five grids, one per vertical-coordinate regime:
  *    gid 0 = pressure levels (kind 2, PRESSURE_2001),
  *    gid 1 = sigma levels + P0 (kind 1, SIGMA_1001),
  *    gid 2 = sigma levels + P0 + PT (kind 1, ETA_1002),
  *    gid 3 = hybrid levels + P0 + !! vcode 5005 (HYBRID_5005),
  *    gid 4 = hybrid levels + P0 + HY (kind 5, HYBRID_5001);
  *  - 4 levels, 5 forecast hours, 6 nomvars, 4 typvars, 4 etikets;
  *  - payload d = 4x3 Fortran field, d[k] = (rid%100 + k)/2;
  *  - literal coordinate/meta rows (>>, ^^ per grid; P0 gid1-4;
  *    PT gid2; !! gid3; HY) with negative rids.
  *
  * Schema per FIXTURES.md §1 (= reference BASE_COLUMNS,
  * /root/reference/fstpy/__init__.py:355) plus rid.
  */
object SyntheticCatalog {

  val D0Epoch: Long = 1594728000L // 2020-07-14T12:00:00Z
  val D0: Long = RmnDate.fromEpochSeconds(D0Epoch) // = 442998800

  val Nomvars = Seq("TT", "UU", "VV", "ES", "GZ", "HU")
  val Typvars = Seq("P", "PU", "PM", "PI")
  val Etikets = Seq("R1_V710_N", "G133K80P", "G133K80P001", "OPERATION")
  val PressureLevels = Seq(1000f, 850f, 500f, 250f)
  val SigmaLevels = Seq(1.0f, 0.85f, 0.5f, 0.25f)
  val Datyps = Seq(5, 1, 133, 134)
  val Nbits = Seq(32, 24, 16, 12)

  /** Level kind per gid: pressure, sigma, sigma(eta), hybrid, hybrid. */
  val GidKinds: IndexedSeq[Int] = IndexedSeq(2, 1, 1, 5, 5)
  val NumGrids: Int = GidKinds.length

  /** ip1 literal for (gid, lv): index gid*4+lv. */
  val Ip1: IndexedSeq[Int] = (0 until NumGrids).flatMap { gid =>
    (0 until 4).map { lv =>
      if (gid == 0) IpCodec.encode(PressureLevels(lv), 2)
      else IpCodec.encode(SigmaLevels(lv), GidKinds(gid))
    }
  }

  /** dateo literal for hour index h (hours = 6h): D0 - 6h*3600 s. */
  val Dateo: IndexedSeq[Long] =
    (0 until 5).map(h => RmnDate.fromEpochSeconds(D0Epoch - h * 6 * 3600L))

  // ---------- Spark side ----------

  private val catalogSchema = StructType(Seq(
    StructField("rid", LongType, false),
    StructField("nomvar", StringType, false),
    StructField("typvar", StringType, false),
    StructField("etiket", StringType, false),
    StructField("ni", IntegerType, false),
    StructField("nj", IntegerType, false),
    StructField("nk", IntegerType, false),
    StructField("dateo", LongType, false),
    StructField("ip1", IntegerType, false),
    StructField("ip2", IntegerType, false),
    StructField("ip3", IntegerType, false),
    StructField("deet", IntegerType, false),
    StructField("npas", IntegerType, false),
    StructField("datyp", IntegerType, false),
    StructField("nbits", IntegerType, false),
    StructField("grtyp", StringType, false),
    StructField("ig1", IntegerType, false),
    StructField("ig2", IntegerType, false),
    StructField("ig3", IntegerType, false),
    StructField("ig4", IntegerType, false),
    StructField("datev", LongType, false),
    StructField("d", ArrayType(FloatType, false), false)))

  /** The 9 coordinate/meta rows (shared literal table, mirrored in
    * [[metaValuesSql]]). Fields ordered as [[catalogSchema]].
    */
  val MetaRows: Seq[(Long, String, String, String, Int, Int, Int, Long,
      Int, Int, Int, Int, Int, Int, Int, String, Int, Int, Int, Int,
      Long, Seq[Float])] = {
    val gg = (gid: Int) => 33792 + gid
    val deform = (0 until NumGrids).flatMap { gid =>
      Seq(
        (-(gid * 2 + 1).toLong, ">>", "X", "GRID", 4, 1, 1, D0,
          gg(gid), 77761, 0, 0, 0, 5, 32, "E", 900, 0, 43200, 43200, D0,
          Seq(10f, 20f, 30f, 40f)),
        (-(gid * 2 + 2).toLong, "^^", "X", "GRID", 1, 3, 1, D0,
          gg(gid), 77761, 0, 0, 0, 5, 32, "E", 900, 0, 43200, 43200, D0,
          Seq(45f, 46f, 47f)))
    }
    val p0 = (1 to 4).map { gid =>
      (-(10 + gid).toLong, "P0", "P", "OPERATION", 4, 3, 1, D0,
        0, 0, 0, 0, 0, 5, 32, "Z", gg(gid), 77761, 1, 0, D0,
        (0 until 12).map(k => 1000f + k))
    }
    val pt = Seq(
      (-15L, "PT", "P", "OPERATION", 4, 3, 1, D0,
        0, 0, 0, 0, 0, 5, 32, "Z", gg(2), 77761, 1, 0, D0,
        (0 until 12).map(_ => 10f)))
    // !! vcode 5005 for gid 3: payload is the (3 x 6) A/B table —
    // column j holds (ip1, A, B); slot j=1 carries pref in A
    // (the reference reads pref = d[1][1] and inner-joins the ip1 row
    // against the data levels, std_vgrid.py:276-282)
    val ttFlat: Seq[Float] = {
      val cols: Seq[(Float, Float, Float)] =
        Seq((0f, 0f, 0f), (1f, 100000f, 0f)) ++
          (0 until 4).map { lv =>
            (Ip1(3 * 4 + lv).toFloat,
              math.log(SigmaLevels(lv).toDouble * 100000.0).toFloat, 1f)
          }
      cols.flatMap { case (a, b, c) => Seq(a, b, c) }
    }
    val tt = Seq(
      (-16L, "!!", "X", "TOCTOC", 3, 6, 1, D0,
        gg(3), 77761, 0, 0, 0, 5, 32, "X", 5005, 0, 0, 0, D0, ttFlat))
    // grid-less hybrid descriptor: ptop = d[0] Pa, pref = ig1,
    // rcoef = ig2/1000 (std_vgrid.py:440-445)
    val hy = Seq(
      (-17L, "HY", "X", "OPERATION", 1, 1, 1, D0,
        IpCodec.encode(0.3f, 5), 0, 0, 0, 0, 5, 32, "X", 800, 1000, 0,
        0, D0, Seq(10f)))
    deform ++ p0 ++ pt ++ tt ++ hy
  }

  private def pick(arr: Seq[Any], idx: org.apache.spark.sql.Column) =
    element_at(array(arr.map {
      case i: Int => lit(i); case l: Long => lit(l); case f: Float => lit(f)
      case s: String => lit(s); case x => lit(x.toString)
    }: _*), (idx + 1).cast("int"))

  /** Build the catalog (data rows from orders + literal meta rows). */
  def catalog(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val rid = col("o_orderkey").cast("long")
    val gid = pmod(rid, lit(5))
    val lv = pmod(rid, lit(4))
    val hr = pmod(rid, lit(5)) * 6
    val data = orders.select(
      rid.as("rid"),
      pick(Nomvars, pmod(rid, lit(6))).as("nomvar"),
      pick(Typvars, pmod(expr("o_orderkey div 7"), lit(4))).as("typvar"),
      pick(Etikets, pmod(expr("o_orderkey div 5"), lit(4))).as("etiket"),
      lit(4).as("ni"), lit(3).as("nj"), lit(1).as("nk"),
      pick(Dateo, pmod(rid, lit(5))).cast("long").as("dateo"),
      pick(Ip1, gid * 4 + lv).cast("int").as("ip1"),
      hr.cast("int").as("ip2"),
      lit(0).as("ip3"),
      lit(300).as("deet"),
      (hr * 12).cast("int").as("npas"),
      pick(Datyps, lv).cast("int").as("datyp"),
      pick(Nbits, lv).cast("int").as("nbits"),
      lit("Z").as("grtyp"),
      (lit(33792) + gid).cast("int").as("ig1"),
      lit(77761).as("ig2"),
      lit(1).as("ig3"),
      lit(0).as("ig4"),
      lit(D0).as("datev"),
      transform(sequence(lit(0), lit(11)),
        k => ((pmod(rid, lit(100)) + k).cast("double") / lit(2))
          .cast("float")).as("d"))
    val meta = spark.createDataFrame(
      spark.sparkContext.parallelize(MetaRows.map(t => Row(
        t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9, t._10,
        t._11, t._12, t._13, t._14, t._15, t._16, t._17, t._18, t._19,
        t._20, t._21, t._22)), 1), catalogSchema)
    data.unionByName(meta)
  }

  // ---------- DuckDB side ----------

  private def sqlList(xs: Seq[Any]): String = xs.map {
    case s: String => s"'$s'"
    case f: Float => f.toString
    case x => x.toString
  }.mkString("[", ", ", "]")

  private def metaValuesSql: String = MetaRows.map { t =>
    val d = t._22.map(v => s"CAST(${v} AS FLOAT)").mkString("[", ", ", "]")
    s"(CAST(${t._1} AS BIGINT), '${t._2}', '${t._3}', '${t._4}', " +
      s"${t._5}, ${t._6}, ${t._7}, CAST(${t._8} AS BIGINT), ${t._9}, " +
      s"${t._10}, ${t._11}, ${t._12}, ${t._13}, ${t._14}, ${t._15}, " +
      s"'${t._16}', ${t._17}, ${t._18}, ${t._19}, ${t._20}, " +
      s"CAST(${t._21} AS BIGINT), $d)"
  }.mkString(",\n    ")

  /** DuckDB CTE `cat` equivalent to [[catalog]]. Prepend to oracles:
    * `WITH cat AS (...) SELECT ... FROM cat`.
    */
  def sqlCte: String = {
    val nv = sqlList(Nomvars)
    val tv = sqlList(Typvars)
    val et = sqlList(Etikets)
    val ip1 = sqlList(Ip1)
    val dto = sqlList(Dateo)
    val dtp = sqlList(Datyps)
    val nbt = sqlList(Nbits)
    s"""cat AS (
  SELECT o_orderkey AS rid,
    list_extract($nv, CAST(o_orderkey % 6 AS INT) + 1) AS nomvar,
    list_extract($tv, CAST((o_orderkey // 7) % 4 AS INT) + 1) AS typvar,
    list_extract($et, CAST((o_orderkey // 5) % 4 AS INT) + 1) AS etiket,
    4 AS ni, 3 AS nj, 1 AS nk,
    CAST(list_extract($dto, CAST(o_orderkey % 5 AS INT) + 1) AS BIGINT) AS dateo,
    CAST(list_extract($ip1, CAST((o_orderkey % 5) * 4 + (o_orderkey % 4) AS INT) + 1) AS INT) AS ip1,
    CAST((o_orderkey % 5) * 6 AS INT) AS ip2,
    0 AS ip3,
    300 AS deet,
    CAST((o_orderkey % 5) * 6 * 12 AS INT) AS npas,
    CAST(list_extract($dtp, CAST(o_orderkey % 4 AS INT) + 1) AS INT) AS datyp,
    CAST(list_extract($nbt, CAST(o_orderkey % 4 AS INT) + 1) AS INT) AS nbits,
    'Z' AS grtyp,
    CAST(33792 + o_orderkey % 5 AS INT) AS ig1,
    77761 AS ig2, 1 AS ig3, 0 AS ig4,
    CAST($D0 AS BIGINT) AS datev,
    list_transform(range(0, 12), k -> CAST(CAST(o_orderkey % 100 + k AS DOUBLE) / 2 AS FLOAT)) AS d
  FROM orders
  UNION ALL
  SELECT * FROM (VALUES
    $metaValuesSql)
    AS m(rid, nomvar, typvar, etiket, ni, nj, nk, dateo, ip1, ip2, ip3,
         deet, npas, datyp, nbits, grtyp, ig1, ig2, ig3, ig4, datev, d)
)"""
  }
}
