package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GridsTileSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def recs(tiles: Seq[(Int, Int, Int, Int)]) = {
    import spark.implicits._
    val lonAx = (0 until 8).map(i => 10f + i)
    val latAx = (0 until 6).map(j => 40f + j)
    (Seq(("gT", ">>", "L", 8, 1, 0, 0, lonAx),
      ("gT", "^^", "L", 1, 6, 0, 0, latAx)) ++
      tiles.map { case (ni, nj, i0, j0) =>
        ("gT", "TT", "#", ni, nj, i0, j0, Seq.fill(ni * nj)(0f))
      })
      .toDF("grid", "nomvar", "grtyp", "ni", "nj", "ig3", "ig4", "d")
  }

  test("tile lat/lon is the axis window's outer product") {
    import spark.implicits._
    val out = Grids.latLonTiles(recs(Seq((4, 3, 5, 4))))
    val la = out.filter(col("nomvar") === "LA")
      .select("ni", "nj", "d").as[(Int, Int, Seq[Float])].head()
    val lo = out.filter(col("nomvar") === "LO")
      .select("ni", "nj", "d").as[(Int, Int, Seq[Float])].head()
    assert(la._1 == 4 && la._2 == 3)
    // lat window 43..45 (j0=4), each repeated ni=4 times (Fortran)
    assert(la._3 == Seq(43f, 43f, 43f, 43f, 44f, 44f, 44f, 44f,
      45f, 45f, 45f, 45f))
    // lon window 14..17 (i0=5), repeated per row
    assert(lo._3 == Seq(14f, 15f, 16f, 17f, 14f, 15f, 16f, 17f,
      14f, 15f, 16f, 17f))
  }

  test("identical tile geometries collapse; output keyed per tile") {
    val out = Grids.latLonTiles(
      recs(Seq((4, 3, 1, 1), (4, 3, 1, 1), (2, 2, 7, 5))))
    // 2 distinct geometries x (LA + LO)
    assert(out.count() == 4)
    assert(out.select("i0", "j0").distinct().count() == 2)
  }

  test("out-of-range tile window clamps to the available axis") {
    import spark.implicits._
    // i0=7 with ni=4 runs past the 8-long lon axis: window is 17 only
    val out = Grids.latLonTiles(recs(Seq((4, 1, 7, 2))))
    val lo = out.filter(col("nomvar") === "LO")
      .select("ni", "nj", "d").as[(Int, Int, Seq[Float])].head()
    assert(lo._1 == 2 && lo._2 == 1)
    assert(lo._3 == Seq(16f, 17f))
  }

  test("no tiles means no output rows") {
    assert(Grids.latLonTiles(recs(Nil)).count() == 0)
  }
}
