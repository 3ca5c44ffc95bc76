package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The continuous-corpus-build loop end-to-end: micro-batches of
  * documents arrive as a stream, each batch near-dup-dedups against
  * the corpus accumulated so far (`NearDup.dedupAgainst` inside
  * foreachBatch), and only survivors append. This is the production
  * composition of the streaming source, the asymmetric LSH probe,
  * and the corpus sink — at cluster scale the same foreachBatch body
  * runs against a precomputed corpus signature index.
  */
class IncrementalCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("foreachBatch curation: only novel docs accumulate") {
    import spark.implicits._
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft_inc_cur_src").toString
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_inc_cur_corpus").toString + "/c"

    // batch 1: two distinct docs; batch 2: one near-dup of doc 1
    // (tail perturbation), one novel; batch 3: exact copy of doc 2
    // and a near-dup of batch 2's novel doc; batch 4: two MUTUAL
    // near-dups, both novel vs the corpus — only the min-id one may
    // append (intra-batch election)
    def doc(n: Int): String =
      (1 to 30).map(i => s"w${(i * n) % 17}").mkString(" ")
    val batches = Seq(
      Seq((1L, doc(3)), (2L, doc(5))),
      Seq((3L, doc(3) + " zzz tail"), (4L, doc(11))),
      Seq((5L, doc(5)), (6L, doc(11) + " qq end")),
      Seq((7L, doc(13)), (8L, doc(13) + " tail x")))

    // stage each batch as its own file; one file per trigger ->
    // batches arrive in order
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$stageDir/b$i")
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    def corpusNow(s: SparkSession): Option[DataFrame] =
      if (new java.io.File(corpusDir).exists())
        Some(s.read.parquet(corpusDir))
      else None

    // drive the batches through the foreachBatch body IN ORDER by
    // running one AvailableNow drain per staged directory (a single
    // multi-file drain could order files arbitrarily within a batch)
    batches.indices.foreach { i =>
      val q = spark.readStream.schema(schema)
        .parquet(s"$stageDir/b$i")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // the micro-batch executes on a CLONED session whose
          // function registry lacks the outer session's temp
          // functions — install graft's natives on it explicitly,
          // and read the corpus through the same session
          val bs = batch.sparkSession
          graft.functions.GraftFunctions.install(bs)
          val survivors = corpusNow(bs) match {
            case Some(c) => NearDup.dedupAgainst(c, batch)
            case None => batch
          }
          survivors.write.mode("append").parquet(corpusDir)
          graft.core.CacheRegistry.releaseAll()
          ()
        }
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"graft_inc_cur_ck$i").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), s"batch $i drain timed out")
    }

    val ids = spark.read.parquet(corpusDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 3 (near-dup of 1), 5 (exact dup of 2), 6 (near-dup of 4), and
    // 8 (intra-batch near-dup of 7) must be rejected; 1, 2, 4, 7
    // accumulate
    assert(ids == Seq(1L, 2L, 4L, 7L))

    // and the final corpus is internally near-dup-free
    val (_, _, pairs) = NearDup.lshPairs(spark.read.parquet(corpusDir))
    assert(pairs.count() == 0L)
  }

  test("index-backed foreachBatch curation: probe + append loop " +
    "accumulates the same corpus as the re-shingling loop") {
    import spark.implicits._
    // the production loop: the corpus LSH index is built once
    // (empty), every batch PROBES it (dedupAgainstIndex) and APPENDS
    // its survivors (appendIndex) — the corpus text is never
    // re-shingled. Must accumulate exactly the ids the re-shingling
    // loop above accumulates, and end near-dup-free.
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft_idx_cur_src").toString
    val idx = java.nio.file.Files
      .createTempDirectory("graft_idx_cur_idx").toString + "/ix"
    def doc(n: Int): String =
      (1 to 30).map(i => s"w${(i * n) % 17}").mkString(" ")
    val batches = Seq(
      Seq((1L, doc(3)), (2L, doc(5))),
      Seq((3L, doc(3) + " zzz tail"), (4L, doc(11))),
      Seq((5L, doc(5)), (6L, doc(11) + " qq end")),
      Seq((7L, doc(13)), (8L, doc(13) + " tail x")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$stageDir/b$i")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // bootstrap: an EMPTY index (schema-only parquet) so batch 1
    // probes cleanly and appends the first survivors
    NearDup.writeIndex(Seq.empty[(Long, String)]
      .toDF("doc_id", "text"), idx)
    batches.indices.foreach { i =>
      val q = spark.readStream.schema(schema)
        .parquet(s"$stageDir/b$i")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val bs = batch.sparkSession
          graft.functions.GraftFunctions.install(bs)
          val survivors = NearDup
            .dedupAgainstIndex(bs, idx, batch)
            .select("doc_id", "text")
            .transform(graft.core.CacheRegistry.persist(_))
          survivors.count() // decide survivors BEFORE growing the index
          NearDup.appendIndex(survivors, idx)
          graft.core.CacheRegistry.releaseAll()
          ()
        }
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"graft_idx_cur_ck$i").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), s"batch $i drain timed out")
    }
    // the index's signature table doubles as the corpus membership
    val ids = spark.read.parquet(s"$idx/signatures")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L, 7L),
      s"index-backed loop accumulated $ids")
  }

  test("matchesAgainst cache contract: releaseAll keeps pinned " +
    "storage flat across micro-batches") {
    // matchesAgainst's scaladoc warns that a per-micro-batch loop
    // MUST call CacheRegistry.releaseAll() after consuming each
    // batch's result or N batches pin N re-shingled corpus caches —
    // this drives N batches through foreachBatch and asserts the
    // pinned count actually returns to zero every time (and that the
    // measurement is live: the pre-release count is nonzero).
    import spark.implicits._
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_cc_corpus").toString + "/c"
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft_cc_src").toString
    def doc(n: Int): String =
      (1 to 30).map(i => s"c${(i * n) % 23}").mkString(" ")
    (1L to 40L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(corpusDir)
    val nBatches = 3
    (0 until nBatches).foreach { i =>
      Seq((100L + i, doc(3) + s" tail$i"), (200L + i, doc(7 + i)))
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$stageDir/b$i")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // drop anything a previous test left registered. Context-wide
    // persistent-RDD counts also include localCheckpoint RDDs from
    // earlier tests that the context cleaner removes ASYNCHRONOUSLY,
    // so every assertion below is relative to the SAME batch's
    // pre/post measurement (a fixed floor measured here proved flaky
    // — the floor shrank mid-test).
    graft.core.CacheRegistry.releaseAll()
    spark.catalog.clearCache()
    val pinned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Int, Int)] // (pre-reg, pre-rdd, post-reg, post-rdd)
    (0 until nBatches).foreach { i =>
      val q = spark.readStream.schema(schema)
        .parquet(s"$stageDir/b$i")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val bs = batch.sparkSession
          graft.functions.GraftFunctions.install(bs)
          NearDup.matchesAgainst(bs.read.parquet(corpusDir), batch)
            .collect()
          val preReg = graft.core.CacheRegistry.size
          val preRdd = bs.sparkContext.getPersistentRDDs.size
          graft.core.CacheRegistry.releaseAll()
          pinned.synchronized {
            pinned += ((preReg, preRdd,
              graft.core.CacheRegistry.size,
              bs.sparkContext.getPersistentRDDs.size))
          }
          ()
        }
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"graft_cc_ck$i").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), s"batch $i drain timed out")
    }
    assert(pinned.size == nBatches)
    pinned.zipWithIndex.foreach { case ((preReg, preRdd, postReg,
        postRdd), i) =>
      // the measurement is live: matchesAgainst pinned both
      // signature tables this batch, and they are visible as
      // persistent RDDs
      assert(preReg >= 2 && preRdd >= 2,
        s"batch $i: expected >=2 pinned caches before release, " +
          s"saw registry=$preReg rdds=$preRdd")
      // the contract: releaseAll drops everything the batch pinned
      assert(postReg == 0 && postRdd <= preRdd - preReg,
        s"batch $i: releaseAll left pinned storage behind " +
          s"(registry=$postReg rdds=$postRdd, pre=$preRdd/$preReg)")
    }
    // and no accumulation ACROSS batches: each batch enters with at
    // most what the previous batch left plus its own 2 new pins
    pinned.toList.sliding(2).zipWithIndex.foreach {
      case (List((_, _, _, prevPost), (curReg, curPre, _, _)), i) =>
        assert(curPre <= prevPost + curReg,
          s"batches $i->${i + 1}: pinned storage accumulated " +
            s"(prevPost=$prevPost, pre=$curPre, newPins=$curReg)")
      case _ => ()
    }
  }
}
