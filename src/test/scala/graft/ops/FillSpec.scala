package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Gap-repair semantics: Fill.forwardFill / Fill.interpolate and the
  * asofJoin tolerance option (pandas ffill / interpolate /
  * merge_asof(tolerance=...) analogs).
  */
class FillSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def frame() = {
    import spark.implicits._
    // (key, ts, v): leading null, interior gap, tail null; key 2 all null
    Seq(
      (1L, 0L, Option.empty[Double]),
      (1L, 10L, Some(1.0)),
      (1L, 20L, None),
      (1L, 30L, None),
      (1L, 40L, Some(4.0)),
      (1L, 50L, None),
      (2L, 10L, Option.empty[Double]))
      .toDF("k", "ts", "v")
  }

  test("forwardFill: latest prior non-null; leading nulls stay null") {
    val got = Fill.forwardFill(frame(), Seq("k"), Seq("ts"), "v", "f")
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(r.fieldIndex("f"))).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, 0L, None), (1L, 10L, Some(1.0)), (1L, 20L, Some(1.0)),
      (1L, 30L, Some(1.0)), (1L, 40L, Some(4.0)), (1L, 50L, Some(4.0)),
      (2L, 10L, None)))
  }

  test("forwardFill limit bounds the propagation distance") {
    val got = Fill.forwardFill(frame(), Seq("k"), Seq("ts"), "v", "f",
      limit = Some(1))
      .orderBy("k", "ts").collect()
      .map(r => Option(r.get(r.fieldIndex("f")))
        .map(_.asInstanceOf[Double]))
    // ts=20 is 1 row after the value at ts=10 -> filled; ts=30 is 2
    // rows after -> beyond limit, stays null; ts=50 is 1 after 40
    assert(got.toSeq == Seq(None, Some(1.0), Some(1.0), None,
      Some(4.0), Some(4.0), None))
  }

  test("interpolate: linear by ts position, one-sided fallback, " +
    "all-null group stays null") {
    val got = Fill.interpolate(frame(), Seq("k"), "ts", Seq("ts"),
      "v", "i")
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(r.fieldIndex("i"))).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, 0L, Some(1.0)),  // bfill at the head
      (1L, 10L, Some(1.0)),
      (1L, 20L, Some(2.0)), // 1 + (4-1)*(20-10)/(40-10)
      (1L, 30L, Some(3.0)),
      (1L, 40L, Some(4.0)),
      (1L, 50L, Some(4.0)), // ffill at the tail
      (2L, 10L, None)))     // no neighbor at all
  }

  test("interpolate: equal anchor positions fall back to the prior " +
    "anchor instead of dividing by zero") {
    import spark.implicits._
    // three rows at the SAME ts; ordering tiebreak is the id column
    val df = Seq((1L, 10L, 1L, Some(1.0)), (1L, 10L, 2L, None),
      (1L, 10L, 3L, Some(2.0))).toDF("k", "ts", "id", "v")
    val got = Fill.interpolate(df, Seq("k"), "ts", Seq("ts", "id"),
      "v", "i").orderBy("id").collect()
      .map(r => Option(r.get(r.fieldIndex("i")))
        .map(_.asInstanceOf[Double]))
    assert(got.toSeq == Seq(Some(1.0), Some(1.0), Some(2.0)))
  }

  test("asofJoin tolerance voids stale matches, keeps fresh ones") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, 7L), (1L, 240L, 8L))
      .toDF("k", "ts", "rid")
    val got = Temporal.asofJoin(left, right, Seq("k"), "ts",
      Seq("rid"), tolerance = Some(15L))
      .orderBy("ts").collect()
      .map(r => (r.getAs[String]("tag"),
        Option(r.get(r.fieldIndex("asof_rid")))))
    // "a" at 100 matches 90 (gap 10 <= 15); "b" at 250 matches 240
    assert(got.toSeq == Seq(("a", Some(7L)), ("b", Some(8L))))
    val strict = Temporal.asofJoin(left, right, Seq("k"), "ts",
      Seq("rid"), tolerance = Some(5L))
      .orderBy("ts").collect()
      .map(r => Option(r.get(r.fieldIndex("asof_rid"))))
    // both gaps are 10 > 5: voided, left rows preserved
    assert(strict.toSeq == Seq(None, None))
  }
}
