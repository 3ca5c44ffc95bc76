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

  test("AQE splits the hot key at runtime (the complement to salting)") {
    import spark.implicits._
    // 50k rows on ONE key vs 50 rows elsewhere; thresholds lowered so
    // local data sizes trip the same skew detection a real cluster
    // sees at TB scale. Salting (q25) is the plan-level fix when skew
    // is known up front; this pins that the AQE runtime fix is also
    // live for the unknown-skew case.
    val before = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> None,
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> None,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> None,
      "spark.sql.autoBroadcastJoinThreshold" -> None
    ).map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.range(50050).select(
        when(col("id") < 50000, 0L).otherwise(col("id")).as("k"),
        col("id").as("row_id"))
      val dim = spark.range(51000).select(col("id").as("k"),
        (col("id") * 2).as("payload"))
      val joined = fact.join(dim, Seq("k"))
      // collect() drives joined's OWN QueryExecution, so its adaptive
      // plan is final afterwards (count() would plan a separate query)
      assert(joined.collect().length == 50050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SortMergeJoin in:\n$plan")
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("keys missing from the dim drop out (inner-join semantics)") {
    val (fact, dim) = data()
    val out = Skew.saltedJoin(
      fact.withColumn("k", col("k") + 100L), dim, "k",
      col("row_id"), 4)
    assert(out.count() == 0L)
  }
}
