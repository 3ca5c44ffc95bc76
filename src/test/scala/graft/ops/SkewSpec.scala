package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Skew.saltedJoin: same result as the plain join, with the hot key
  * actually spread over r sub-keys (the property the operator exists
  * for — if the salt collapsed, one reducer would still take the
  * whole hot key).
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def data() = {
    import spark.implicits._
    // key 0 is hot: 80 of 100 fact rows
    val fact = (0 until 100).map { i =>
      (if (i < 80) 0L else (i % 7).toLong, i.toLong, i * 1.5)
    }.toDF("k", "row_id", "v")
    val dim = (0L until 7L).map(k => (k, s"dim_$k")).toDF("k", "name")
    (fact, dim)
  }

  test("salted join result equals the plain join") {
    val (fact, dim) = data()
    val plain = fact.join(dim, Seq("k"))
      .select("k", "row_id", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(fact, dim, "k", col("row_id"), 4)
      .select("k", "row_id", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("the hot key spreads across all r salt sub-keys") {
    val (fact, _) = data()
    val salts = fact.filter(col("k") === 0L)
      .select(pmod(col("row_id"), lit(4)).cast("int").as("salt"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts == Set(0, 1, 2, 3))
  }

  test("keys missing from the dim drop out (inner-join semantics)") {
    val (fact, dim) = data()
    val out = Skew.saltedJoin(
      fact.withColumn("k", col("k") + 100L), dim, "k",
      col("row_id"), 4)
    assert(out.count() == 0L)
  }
}
