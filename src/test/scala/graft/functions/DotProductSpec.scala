package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native graft_dot kernel must be BIT-identical to the HOF form
  * it replaced (per-element double cast, left-to-right fold from 0.0)
  * — every similarity oracle depends on that equality.
  */
class DotProductSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("native dot == HOF dot, bit-for-bit, on float arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1),
        Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(GraftFunctions.dot(col("a"), col("b")).as("nat"),
        hofDot(col("a"), col("b")).as("hof"))
    val bad = df.filter(col("nat") =!= col("hof")).count()
    assert(bad == 0)
  }

  test("native dot == HOF dot on double arrays and mixed literals") {
    import spark.implicits._
    val df = Seq((Seq(1.5f, -2.25f, 3.75f))).toDF("v")
      .select(
        GraftFunctions.dot(col("v"),
          array(lit(0.1), lit(0.2), lit(0.3))).as("nat"),
        hofDot(col("v"), array(lit(0.1), lit(0.2), lit(0.3))).as("hof"))
    val r = df.head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("null semantics match zip_with padding: length mismatch -> null") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(GraftFunctions.dot(col("a"), col("b")).as("nat"),
        hofDot(col("a"), col("b")).as("hof"))
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("whole-stage codegen survives graft_dot (no fallback)") {
    // spark.range gives a codegen-able scan (a local relation plans
    // as LocalTableScan, which never codegens regardless of the
    // expressions on top)
    val df = spark.range(4)
      .select(array(col("id").cast("double"),
          lit(2.0), (col("id") + 1).cast("double")).as("a"),
        array(lit(1.0), lit(0.5), lit(2.0)).as("b"))
      .select(GraftFunctions.dot(col("a"), col("b")).as("d"))
    // no exchange -> no AQE wrapper; the "*(1)" prefix in the plan
    // string marks WholeStageCodegen stage 1 covering the Project
    // that hosts graft_dot
    assert(df.queryExecution.executedPlan.toString
      .contains("*(1) Project [graft_dot"))
    // id=3: 3*1 + 2*0.5 + 4*2 = 12
    assert(df.collect().map(_.getDouble(0)).max == 12.0)
  }
}
