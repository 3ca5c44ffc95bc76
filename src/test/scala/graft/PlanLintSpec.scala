package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over EVERY declared query: builds each physical plan at
  * sf0.001 and rejects scale-killer shapes. A cartesian product
  * sneaking into any operator (e.g. a join key lost in a refactor)
  * fails `sbt test` before the driver or a cluster ever sees it.
  * (`crossJoin(broadcast(oneRowAgg))` plans as
  * BroadcastNestedLoopJoin over a single-row side, which is fine and
  * distinct from CartesianProduct.)
  */
class PlanLintSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Streaming-drain queries: building them EXECUTES the whole
    * stream (staging write + drain) and the returned DataFrame is the
    * memory sink's LocalTableScan — linting it is vacuous and costs
    * full execution. Their plan posture is covered by StreamingSpec.
    */
  private val streamingDrains =
    Set("f43_stream_agg", "f45_stream_dedup", "q19_stream_sessions")

  test("no declared query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).exists())
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => streamingDrains(q._1))
      .foreach { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a cartesian product")
      }
  }
}
