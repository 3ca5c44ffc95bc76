package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GridsUSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("U-grid subgrid-concat lat/lon from a ^> record") {
    import spark.implicits._
    val axy = Seq(2f, 2f, 0f, 90f, -10f, 10f,
      2f, 3f, 45f, 135f, -20f, 0f, 20f)
    val recs = Seq(("u1", "^>", axy.size, 1, axy))
      .toDF("grid", "nomvar", "ni", "nj", "d")
    val out = Grids.latLon2d(recs)
    val la = out.filter(col("nomvar") === "LA")
      .select("ni", "nj", "d").as[(Int, Int, Seq[Float])].head()
    val lo = out.filter(col("nomvar") === "LO")
      .select("ni", "nj", "d").as[(Int, Int, Seq[Float])].head()
    assert(la._1 == 2 && la._2 == 5)
    assert(la._3 == Seq(-10f, -10f, 10f, 10f, -20f, -20f, 0f, 0f, 20f, 20f))
    assert(lo._3 == Seq(0f, 90f, 0f, 90f, 45f, 135f, 45f, 135f, 45f, 135f))
  }

  test("IG packing is an exact inverse pair at its stated resolutions") {
    import spark.implicits._
    // params on the centi/milli-degree grid (what igEncode quantizes
    // to) must survive encode -> decode bit-exactly
    val rows = (0 until 50).map { i =>
      val lat0 = -90.0 + (i * 367 % 18000) / 100.0
      val lon0 = (i * 911 % 36000) / 100.0
      val dlat = 0.001 + (i * 131 % 5000) / 1000.0
      val dlon = 0.001 + (i * 173 % 5000) / 1000.0
      ("g" + i, "L", lat0, lon0, dlat, dlon,
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    } :+ (("gn", "N", 0.0, 0.0, 0.0, 0.0,
      12.34, 56.78, 47520.0, 123.45, 0.0, 0.0, 0.0, 0.0)) :+
      (("gs", "S", 0.0, 0.0, 0.0, 0.0,
        0.07, 981.44, 120370.0, 359.99, 0.0, 0.0, 0.0, 0.0)) :+
      (("ge", "E", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        -89.99, 0.01, 45.67, 359.99))
    val df = rows.toDF("grid", "grtyp", "lat0", "lon0", "dlat", "dlon",
      "pi", "pj", "d60", "dgrw", "lat1", "lon1", "lat2", "lon2")
    val back = Grids.igDecode(Grids.igEncode(df)
      .select("grid", "grtyp", "ig1", "ig2", "ig3", "ig4"))
    val cols = Seq("grid", "grtyp", "lat0", "lon0", "dlat", "dlon",
      "pi", "pj", "d60", "dgrw", "lat1", "lon1", "lat2", "lon2")
    val exp = df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq).sortBy(_.head.toString)
    val got = back.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq).sortBy(_.head.toString)
    // decode(encode(x)) reproduces x at the packing resolution; the
    // comparison is tolerance-based because ig/1000 and the original
    // double can differ by an ulp even when both print identically
    exp.zip(got).foreach { case (e, g) =>
      assert(e.take(2) == g.take(2), s"key ${e.head}")
      e.drop(2).zip(g.drop(2)).zip(cols.drop(2)).foreach {
        case ((ev: Double, gv: Double), c) =>
          assert(math.abs(ev - gv) < 1e-9, s"${e.head}.$c: $ev != $gv")
        case ((ev, gv), c) => fail(s"${e.head}.$c: $ev/$gv not doubles")
      }
    }
  }

  test("hostile payloads on non-^> rows cannot break the U branch") {
    import spark.implicits._
    // NaN dims, > int-range dims, and big-product dims — all on DATA
    // rows the nomvar filter discards, but which pushed generate-
    // filters + predicate subexpression elimination still evaluate
    val recs = Seq(
      ("g1", ">>", 3, 1, Seq(10f, 20f, 30f)),
      ("g1", "^^", 1, 2, Seq(45f, 46f)),
      ("g1", "TT", 3, 2, Seq(Float.NaN, Float.NaN, 3e9f,
        -7f, 1f, 2f)),
      ("g1", "HU", 3, 2, Seq(46656f, 46656f, 1f, 1f, 1f, 1f)))
      .toDF("grid", "nomvar", "ni", "nj", "d")
    val out = Grids.latLon2d(recs)
      .select(col("nomvar"), posexplode(col("d")))
    assert(out.count() == 12) // LA + LO of the Z grid only
  }

  test("latLon2d with zero ^> rows leaves the Z path untouched") {
    import spark.implicits._
    val recs = Seq(
      ("g1", ">>", 3, 1, Seq(10f, 20f, 30f)),
      ("g1", "^^", 1, 2, Seq(45f, 46f)))
      .toDF("grid", "nomvar", "ni", "nj", "d")
    val out = Grids.latLon2d(recs).orderBy("nomvar")
      .select("nomvar", "ni", "nj", "d")
      .as[(String, Int, Int, Seq[Float])].collect()
    assert(out.length == 2)
    assert(out(0) == (("LA", 3, 2, Seq(45f, 45f, 45f, 46f, 46f, 46f))))
    assert(out(1) == (("LO", 3, 2, Seq(10f, 20f, 30f, 10f, 20f, 30f))))
  }
}
