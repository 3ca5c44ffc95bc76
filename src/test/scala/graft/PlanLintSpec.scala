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
    Set("f43_stream_agg", "f45_stream_dedup", "q19_stream_sessions",
      "p46_stream_neardup", "q26_stream_stream_join",
      "q43_stream_enrich")

  /** Queries allowed to plan a GLOBAL sort. Only the human-listing op
    * qualifies: `voir` IS a sorted display (the reference sorts the
    * whole catalog to print it); every other operator must express
    * ordering as TakeOrdered / keyed windows / bounded-domain sorts,
    * or it stops scaling.
    */
  private val globalSortAllowed = Set("f14_voir")

  test("every declared query analyzes+plans cleanly, with no CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).exists())
    // collect ALL problems (attributed per query) instead of dying on
    // the first: a testdata-drift analysis error (round 4: TIMESTAMP_NTZ
    // vs unix_micros) should read as "q16 failed analysis", not as a
    // mystery abort of the cartesian lint.
    val problems = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => streamingDrains(q._1))
      .flatMap { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          val globalSort = plan.linesIterator.exists(l =>
            l.contains("Sort [") && l.contains("], true, 0"))
          if (plan.contains("CartesianProduct"))
            Some(s"$name: plans a CartesianProduct")
          else if (globalSort && !globalSortAllowed(name))
            Some(s"$name: plans a GLOBAL Sort (scale-killer; use " +
              "TakeOrdered / keyed windows, or whitelist a display op)")
          else None
        } catch { case e: Throwable =>
          Some(s"$name: failed analysis/planning — " +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      }
    assert(problems.isEmpty, problems.mkString("\n", "\n", ""))
  }
}
