package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale posture: bucketed tables co-locate repeated equi-joins.
  *
  * At 100 TB a hot join key (doc_id, grid, user_id) is worth
  * pre-bucketing: both sides hash-partition into the same bucket
  * layout at WRITE time, so every later join/groupBy on that key runs
  * exchange-free. This spec pins the plan shape: the bucketed join
  * must contain NO shuffle exchange, while the same join on plain
  * parquet shuffles both sides.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft_warehouse").toFile

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", wh.getAbsolutePath)
    // force sort-merge joins so the exchange (not broadcast) is the
    // thing under test
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))

  test("bucketed tables join and aggregate without a shuffle") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, s"text $i", i % 7))
      .toDF("doc_id", "text", "quality")
    val scores = (1L to 1000L).map(i => (i, i * 0.5))
      .toDF("doc_id", "score")

    docs.write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id")
      .saveAsTable("docs_bucketed")
    scores.write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id")
      .saveAsTable("scores_bucketed")
    docs.write.mode("overwrite").saveAsTable("docs_plain")
    scores.write.mode("overwrite").saveAsTable("scores_plain")

    val bucketed = spark.table("docs_bucketed")
      .join(spark.table("scores_bucketed"), "doc_id")
    val plain = spark.table("docs_plain")
      .join(spark.table("scores_plain"), "doc_id")

    assert(shuffles(bucketed) == 0,
      "bucketed equi-join must be exchange-free")
    assert(shuffles(plain) > 0,
      "plain-parquet join is expected to shuffle (sanity check)")
    assert(bucketed.count() == 1000 && plain.count() == 1000)

    // groupBy on the bucket key also rides the existing layout
    val agg = spark.table("docs_bucketed").groupBy("doc_id")
      .agg(count(lit(1)).as("n"))
    assert(shuffles(agg) == 0,
      "groupBy on the bucket key must be exchange-free")
  }
}
