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
