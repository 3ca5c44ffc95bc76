package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PipelineOps._

/** The fused native kernel must be bit-identical to the Column-HOF
  * chain it replaces — the DuckDB oracles mirror the HOF semantics,
  * so any divergence here is an oracle mismatch waiting to happen.
  */
class ShingleSigSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("native kernel equals the HOF chain on documents + edge cases") {
    import spark.implicits._
    assume(new java.io.File("/root/testdata/sf0.001").exists())
    val edge = Seq(
      "", " ", "a", "a b", "a b c", "a b c d",
      "  leading and trailing  ",
      "\ttab\tstays x y z",        // trim strips spaces ONLY
      "dup dup dup dup dup dup",   // repeated shingles dedup
      "line\nbreaks count as ws here too",
      "unicode é ü ñ words mixed in")
      .toDF("text")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(200)
    val all = edge.unionByName(docs)

    val hof = all.select(
      hashedShingles(shingles(words(col("text")))).as("sh_h"),
      bandKeys(hashedShingles(shingles(words(col("text"))))).as("bk_h"),
      col("text"))
    val both = hof.withColumn("s", GraftFunctions.shingleSig(col("text")))
    val bad = both.filter(
      !(col("sh_h") === col("s.sh")) ||
        // HOF bandKeys on an empty hash set yields degenerate digests
        // the pipelines never see (they filter size(sh) > 0 first);
        // the native kernel returns [] there by contract
        (size(col("sh_h")) > 0 && !(col("bk_h") === col("s.bks"))))
    assert(bad.count() == 0,
      bad.select("text").limit(5).collect().mkString("; "))
  }

  test("native jaccard equals the HOF intersect formula") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val a = (0 until (i % 37 + 1)).map(k => (k * 7919L + i) % 1000)
        .distinct
      val b = (0 until (i % 23 + 1)).map(k => (k * 104729L + i) % 1000)
        .distinct
      (a, b)
    } :+ ((Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))) :+
      ((Seq(5L), Seq(9L)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
      jaccard(col("a"), col("b")).as("hof"),
      GraftFunctions.jaccardLong(col("a"), col("b")).as("nat"))
      .filter(!(col("hof") === col("nat")))
    assert(bad.count() == 0)
    // empty-vs-empty parity: the HOF twin's 0/0 double division
    // raises DIVIDE_BY_ZERO under ANSI; the kernel must fail the same
    // way, not return NaN (which would PASS >= filters silently)
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    intercept[Exception] {
      empty.select(jaccard(col("a"), col("b"))).head()
    }
    intercept[Exception] {
      empty.select(GraftFunctions.jaccardLong(col("a"), col("b")))
        .head()
    }
  }

  test("whole-stage codegen keeps the native call inline") {
    // non-literal input: a literal would be constant-folded at plan
    // time (which already proves eval works) and leave no codegen span
    val df = spark.range(4)
      .select(concat(lit("a b c d e w"), col("id")).as("text"))
      .select(GraftFunctions.shingleSig(col("text")).as("s"))
      .select(size(col("s.sh")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen span in plan text
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(4, 4, 4, 4))
  }
}
