package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** E/G/N/S grid geometry (Grids.latLonGeo). Each convention the
  * ezscint kernel leaves unspecified is pinned here: Gaussian roots
  * really are Legendre zeros, the polar-stereographic inverse honors
  * its own forward transform, and the E rotation maps its defining
  * points where the convention says.
  */
class GridsGeoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def params(rows: Seq[(String, String, Int, Int, Double,
      Double, Double, Double, Double, Double, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("grid", "grtyp", "ni", "nj", "pi", "pj", "d60", "dgrw",
      "lat1", "lon1", "lat2", "lon2")
  }

  private def field(df: org.apache.spark.sql.DataFrame, grid: String,
                    nomvar: String): Array[Float] =
    df.filter(col("grid") === grid && col("nomvar") === nomvar)
      .select("d").head().getSeq[Float](0).toArray

  test("gaussian latitudes are Legendre roots, symmetric, south-first") {
    val nj = 6
    val out = Grids.latLonGeo(params(Seq(
      ("gG", "G", 4, nj, 0, 0, 0, 0, 0, 0, 0, 0))))
    val la = field(out, "gG", "LA")
    val rows = (0 until nj).map(j => la(j * 4).toDouble)
    // strictly ascending south→north, symmetric about the equator
    assert(rows == rows.sorted)
    rows.zip(rows.reverse).foreach { case (s, n) =>
      assert(math.abs(s + n) < 1e-5)
    }
    // sin(lat) is a zero of P_6 (evaluated independently here)
    def p6(x: Double): Double = {
      var p0 = 1.0; var p1 = x
      for (k <- 2 to 6) {
        val p = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
        p0 = p1; p1 = p
      }
      p1
    }
    // latitudes are rounded to 1e-6 degrees on output, which moves
    // sin(lat) ~1e-8 off the exact root; a wrong root would be O(1)
    rows.foreach { lat =>
      assert(math.abs(p6(math.sin(lat * math.Pi / 180))) < 1e-6,
        s"P6(sin($lat))")
    }
    // all rows of one rank share the latitude; longitudes regular
    val lo = field(out, "gG", "LO")
    assert(la(0) == la(3) && lo.take(4).toSeq ==
      Seq(0f, 90f, 180f, 270f))
  }

  test("gaussian roots converge at operational resolution (nj = 94)") {
    val nj = 94
    val out = Grids.latLonGeo(params(Seq(
      ("gG94", "G", 1, nj, 0, 0, 0, 0, 0, 0, 0, 0))))
    val la = field(out, "gG94", "LA").map(_.toDouble)
    assert(la.length == nj && la.toSeq == la.sorted.toSeq)
    def pn(x: Double): Double = {
      var p0 = 1.0; var p1 = x
      for (k <- 2 to nj) {
        val p = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
        p0 = p1; p1 = p
      }
      p1
    }
    // rounding to 1e-6 degrees moves sin(lat) ~1e-8 off the root and
    // P'_94 = O(n) there, so allow ~n x that
    la.foreach { lat =>
      assert(math.abs(pn(math.sin(lat * math.Pi / 180))) < 1e-5,
        s"P94(sin($lat))")
    }
  }

  test("polar stereographic: pole, 60-degree circle, dgrw rotation") {
    val d60 = 25000.0
    val out = Grids.latLonGeo(params(Seq(
      ("gN", "N", 3, 3, 2, 2, d60, 10, 0, 0, 0, 0),
      ("gS", "S", 3, 3, 2, 2, d60, 10, 0, 0, 0, 0))))
    val laN = field(out, "gN", "LA"); val loN = field(out, "gN", "LO")
    // grid centre = the pole
    assert(math.abs(laN(4) - 90f) < 1e-4)
    val laS = field(out, "gS", "LA")
    assert(math.abs(laS(4) + 90f) < 1e-4)
    // one grid step from the pole along +X: the forward transform
    // says r = re·cos(lat)/(1+sin(lat)) with re in metres — invert
    // independently for r = d60
    val re = Grids.PsScale * Grids.EarthRadiusM
    val expectLat = math.asin((re * re - d60 * d60) /
      (re * re + d60 * d60)) * 180 / math.Pi
    assert(math.abs(laN(5) - expectLat) < 1e-4) // (i,j) = (3,2)
    // +X axis carries longitude dgrw on the north grid
    assert(math.abs(loN(5) - 10f) < 1e-4)
    // +Y axis is 90° east of it
    assert(math.abs(loN(7) - 100f) < 1e-4) // (i,j) = (2,3)
    // south grid spins the opposite way
    val loS = field(out, "gS", "LO")
    assert(math.abs(loS(5) - 10f) < 1e-4)
    assert(math.abs(loS(7) - 280f) < 1e-4)
  }

  test("E rotation: identity points give an unrotated global grid") {
    // equator points at (0,0) and (0,90): a=x̂, pole=ẑ — identity
    val out = Grids.latLonGeo(params(Seq(
      ("gE", "E", 4, 4, 0, 0, 0, 0, 0.0, 0.0, 0.0, 90.0))))
    val la = field(out, "gE", "LA"); val lo = field(out, "gE", "LO")
    // A-style cell-centred latitudes: -90 + (j-0.5)*45
    assert(la.grouped(4).map(_.head).toSeq ==
      Seq(-67.5f, -22.5f, 22.5f, 67.5f))
    assert(lo.take(4).toSeq == Seq(0f, 90f, 180f, 270f))
  }

  test("E rotation: defining points land on the rotated equator") {
    val (lat1, lon1, lat2, lon2) = (35.0, 250.0, 0.0, 340.0)
    val out = Grids.latLonGeo(params(Seq(
      ("gE", "E", 8, 6, 0, 0, 0, 0, lat1, lon1, lat2, lon2))))
    val la = field(out, "gE", "LA"); val lo = field(out, "gE", "LO")
    // every point stays a valid coordinate
    la.foreach(v => assert(v >= -90 && v <= 90))
    lo.foreach(v => assert(v >= 0 && v < 360))
    // rotated (0°, 0°) sits at no grid point (cell-centred), but the
    // rotation must keep great-circle distances: adjacent rotated
    // longitudes at the rotated equator row are 45° apart on the
    // sphere. Check via the haversine between columns of row 3.
    def gc(laA: Double, loA: Double, laB: Double, loB: Double) = {
      val d2r = math.Pi / 180
      math.acos(math.min(1.0,
        math.sin(laA * d2r) * math.sin(laB * d2r) +
          math.cos(laA * d2r) * math.cos(laB * d2r) *
            math.cos((loA - loB) * d2r))) / d2r
    }
    val row = 3 // rotated lat -15°: circle radius cos(15°)
    val idx = (i: Int) => row * 8 + i
    val span = gc(la(idx(0)), lo(idx(0)), la(idx(1)), lo(idx(1)))
    // compare against the direct spherical formula for two points on
    // a parallel separated by 45° of longitude
    val d2r = math.Pi / 180
    val direct = math.acos(
      math.sin(-15 * d2r) * math.sin(-15 * d2r) +
        math.cos(-15 * d2r) * math.cos(-15 * d2r) *
          math.cos(45 * d2r)) / d2r
    assert(math.abs(span - direct) < 1e-3, s"$span vs $direct")
  }
}
