package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Curation facade: the one-call funnel must agree stage-for-stage
  * with the oracle-checked p47 driver query on the same input.
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("curate matches the p47 funnel accounting on a doubled corpus") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val doubled = base.unionByName(
      base.withColumn("doc_id", col("doc_id") + 2000000L))
    val res = Curation.curate(doubled)
    val got = res.accounting.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val want = graft.SparkEntry
      .queries("p47_curation_funnel")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == want)
    // survivors are consistent with the s3 accounting row
    assert(res.survivors.count() == got("s3_quality")._1)
    // exact dedup halved the doubled corpus
    assert(got("s1_exact")._1 * 2 == got("s0_raw")._1)
    graft.core.CacheRegistry.releaseAll()
    spark.catalog.clearCache()
  }

  test("curate without a lang gate keeps all long-enough survivors") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val gated = Curation.curate(base, lang = Some("en"))
    val open = Curation.curate(base, lang = None)
    assert(open.survivors.count() >= gated.survivors.count())
    graft.core.CacheRegistry.releaseAll()
    spark.catalog.clearCache()
  }
}
