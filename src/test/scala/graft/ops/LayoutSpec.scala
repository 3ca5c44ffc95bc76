package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Z-order key semantics: exact bit interleave, masking, and the
  * locality property the layout exists for.
  */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def z(a: Long, b: Long, bits: Int = 16): Long = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(Layout.zOrderKey(col("a"), col("b"), bits).as("z"))
      .head().getLong(0)
  }

  test("bit interleave: a on even positions, b on odd") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)       // a bit 0 -> position 0
    assert(z(0, 1) == 2L)       // b bit 0 -> position 1
    assert(z(3, 5, 4) == 39L)   // 0b0011 ⋈ 0b0101 = 0b100111
    assert(z(1023, 1023, 10) == (1L << 20) - 1)
  }

  test("out-of-range bits are masked, not smeared") {
    // with 4 bits, a=16 (bit 4) contributes nothing
    assert(z(16, 0, 4) == 0L)
    assert(z(17, 0, 4) == 1L)
  }

  test("locality: a 2^k-aligned z-range spans a bounded coordinate box") {
    import spark.implicits._
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val spans = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zOrderKey(col("x"), col("y"), 5).as("zk"))
      .groupBy(expr("zk div 16").as("region"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .agg(max(col("xs")).as("mx"), max(col("ys")).as("my"))
      .head()
    // a 16-key region is a 4x2 (or 2x4) tile of the grid: both spans
    // bounded by 3 — this is the row-group min/max tightness the
    // layout buys
    assert(spans.getLong(0) <= 3 && spans.getLong(1) <= 3)
  }
}
