package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CorpusSink: deterministic hash sharding, one file per shard,
  * lossless round-trip, stable in-shard order.
  */
class CorpusSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("sharded write: one file per shard, lossless, stable order") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corpus_sink").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val n = 4
    val assign = CorpusSink.writeSharded(docs, dir, n)

    // every shard directory holds exactly one data file
    (0 until n).foreach { k =>
      val files = new java.io.File(s"$dir/shard=$k")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $k has ${files.length} files")
    }

    // lossless round-trip and assignment agreement
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val mismatch = back.select(col("doc_id"), col("shard"))
      .join(assign.withColumnRenamed("shard", "shard2"), "doc_id")
      .filter(col("shard") =!= col("shard2")).count()
    assert(mismatch == 0L)

    // in-shard order is the deterministic hash order: re-reading one
    // shard file yields rows sorted by (ord, doc_id)
    val shard0 = spark.read
      .parquet(s"$dir/shard=0")
      .withColumn("ord", PipelineOps.h64(col("text"), 31))
      .select("ord", "doc_id").as[(Long, Long)].collect()
    assert(shard0.sameElements(shard0.sortBy(identity)),
      "shard file rows are not in (ord, doc_id) order")
  }

  test("json-lines layout: same shards and order, interchange format") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corpus_sink_jsonl").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val n = 4
    val assign = CorpusSink.writeSharded(docs, dir, n, format = "json")

    // one .json file per shard, each line a JSON object
    (0 until n).foreach { k =>
      val files = new java.io.File(s"$dir/shard=$k")
        .listFiles().filter(_.getName.endsWith(".json"))
      assert(files.length == 1, s"shard $k has ${files.length} files")
      val first = scala.io.Source.fromFile(files.head)
        .getLines().next()
      assert(first.startsWith("{") && first.contains("\"doc_id\""))
    }

    // lossless + identical shard assignment to the parquet layout
    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    val mismatch = back.select(col("doc_id"), col("shard"))
      .join(assign.withColumnRenamed("shard", "shard2"), "doc_id")
      .filter(col("shard") =!= col("shard2")).count()
    assert(mismatch == 0L)

    intercept[IllegalArgumentException] {
      CorpusSink.writeSharded(docs, dir, n, format = "csv")
    }
  }
}
