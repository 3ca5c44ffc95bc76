package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 training-side operators: LR training (p77), packing
  * report (p78), decontamination matrix (p79), BPE merge loop (p80).
  * Structural + invariant checks; exact values are pinned by the
  * DuckDB oracles.
  */
class TrainOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val rows = df.collect()
    graft.core.CacheRegistry.releaseAll()
    spark.catalog.clearCache()
    (df, rows)
  }

  test("p77: 9 buckets, weights move, accuracy is a valid fraction") {
    val (df, rows) = run("p77_classifier_training")
    assert(rows.length == 9)
    assert(rows.map(_.getInt(df.columns.indexOf("bucket"))).sorted
      .sameElements(0 until 9))
    val w1 = rows.map(_.getDouble(df.columns.indexOf("w1")))
    val w2 = rows.map(_.getDouble(df.columns.indexOf("w2")))
    // round 1 moved off the zero init, round 2 moved again
    assert(w1.exists(_ != 0.0))
    assert(w1.zip(w2).exists { case (a, b) => a != b })
    val acc = rows.head.getDouble(df.columns.indexOf("train_acc"))
    assert(acc >= 0.0 && acc <= 1.0)
    val n = rows.head.getLong(df.columns.indexOf("n_docs"))
    assert(n == spark.read.parquet(s"$dir/documents.parquet").count())
  }

  test("p78: padding bounded by the bin, bins cover the tokens") {
    val (df, rows) = run("p78_packing_report")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tot = r.getLong(df.columns.indexOf("total_tok"))
      val seqs = r.getLong(df.columns.indexOf("n_seqs"))
      val pad = r.getLong(df.columns.indexOf("pad_tok"))
      val util = r.getDouble(df.columns.indexOf("util"))
      assert(pad >= 0 && pad < 2048)
      assert(seqs * 2048 == tot + pad)
      assert(util > 0.0 && util <= 1.0)
    }
  }

  test("p79: rates are fractions, flags bounded by denominators") {
    val (df, rows) = run("p79_decontamination_matrix")
    rows.foreach { r =>
      val suite = r.getInt(df.columns.indexOf("suite"))
      val fl = r.getLong(df.columns.indexOf("n_flagged"))
      val tr = r.getLong(df.columns.indexOf("n_train"))
      val rate = r.getDouble(df.columns.indexOf("rate"))
      assert(suite >= 0 && suite <= 4)
      assert(fl >= 1 && fl <= tr)
      assert(rate > 0.0 && rate <= 1.0)
    }
  }

  test("p81: statuses partition the union of both snapshots") {
    val (df, rows) = run("p81_snapshot_diff")
    val statuses = rows.map(_.getString(df.columns.indexOf("status")))
    assert(statuses.toSet.subsetOf(
      Set("added", "removed", "changed", "unchanged")))
    val byStatus = rows.groupBy(_.getString(df.columns.indexOf("status")))
      .view.mapValues(_.map(_.getLong(df.columns.indexOf("n_docs"))).sum)
      .toMap
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    // every doc is in prev, cur, or both: total diff rows = corpus
    assert(byStatus.values.sum == n)
    // the fixture plants all four classes at ~10% each
    assert(Set("added", "removed", "changed", "unchanged")
      .forall(s => byStatus.getOrElse(s, 0L) > 0L))
    assert(byStatus("unchanged") > byStatus("added"))
  }

  test("p80: three rounds, counts non-increasing, merges distinct") {
    val (df, rows) = run("p80_bpe_merge_train")
    assert(rows.length == 3)
    val byRound = rows.sortBy(_.getInt(df.columns.indexOf("round")))
    val cnts = byRound.map(_.getLong(df.columns.indexOf("cnt")))
    // merging the argmax pair cannot create a pair more frequent
    // than the count just consumed
    assert(cnts.sliding(2).forall { case Array(a, b) => a >= b })
    assert(cnts.forall(_ >= 1))
    val pairs = byRound.map(_.getString(df.columns.indexOf("pair")))
    assert(pairs.distinct.length == 3)
    byRound.foreach { r =>
      assert(r.getLong(df.columns.indexOf("vocab_after")) > 0)
    }
  }
}
