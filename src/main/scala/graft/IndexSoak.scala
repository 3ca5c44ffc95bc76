package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-batch cost of the continuous-build probe, direct vs
  * precomputed index (round 10). The claim under test:
  * `matchesAgainst` re-shingles the WHOLE corpus every batch (its
  * per-batch cost scales with corpus size), while
  * `matchesAgainstIndex` pays only the batch's own shingling plus
  * the band join (its per-batch cost scales with batch size) — at
  * 100 TB the difference is the whole corpus scan, per batch.
  *
  * Fixture: the text soak's corpus (default the 10x planted one,
  * 50k docs) probed by a small batch (tail-perturbed near-dups of
  * corpus docs + novel docs), 3 timed rounds each way in one warm
  * JVM, alternating (paired, AbProfile-style), plus the one-time
  * index build cost and an output-equality assert.
  *
  * Usage: runMain graft.IndexSoak [corpusParquet] [batchSize]
  */
object IndexSoak {
  def main(args: Array[String]): Unit = {
    val corpusPath = if (args.nonEmpty) args(0)
      else "/dev/shm/graft_scratch/graft_soak_10x/documents.parquet"
    val batchSize = if (args.length > 1) args(1).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.install(spark)

    val corpus = spark.read.parquet(corpusPath)
      .select("doc_id", "text")
    val n = corpus.count()
    val batch = corpus.orderBy("doc_id").limit(batchSize / 2)
      .select((col("doc_id") + 90000000L).as("doc_id"),
        concat(col("text"), lit(" zz tail probe")).as("text"))
      .unionByName(spark.range(batchSize / 2)
        .select((col("id") + 95000000L).as("doc_id"),
          concat_ws(" ", (1 to 30).map(i =>
            concat(lit(s"nv${i}x"), col("id"))): _*).as("text")))
      .cache()
    println(s"[idxsoak] corpus $n docs, batch ${batch.count()} docs")

    val idx = graft.core.Scratch.path("graft_idxsoak_index")
    val tb = System.nanoTime()
    graft.pipeline.NearDup.writeIndex(corpus, idx)
    println(f"[idxsoak] one-time writeIndex: ${
      (System.nanoTime() - tb) / 1e9}%.1f s")

    def run(tag: String)(f: => org.apache.spark.sql.DataFrame)
        : Seq[(Long, Boolean, Long, Double)] = {
      val t0 = System.nanoTime()
      // ALL four output columns, including jaccard — a divergence
      // that ties the same best match but perturbs the score must
      // fail the equality assert too
      val rows = f.collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
          r.getDouble(3)))
        .sortBy(_._1).toSeq
      graft.core.CacheRegistry.releaseAll()
      println(f"[idxsoak] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f" (${rows.length} rows, ${rows.count(_._2)} matched)")
      rows
    }
    // untimed warmup of both plans
    run("warmup direct") {
      graft.pipeline.NearDup.matchesAgainst(corpus, batch) }
    run("warmup index") {
      graft.pipeline.NearDup.matchesAgainstIndex(spark, idx, batch) }
    var eq = true
    (1 to 3).foreach { i =>
      val d = run(s"direct round $i") {
        graft.pipeline.NearDup.matchesAgainst(corpus, batch) }
      val x = run(s"index  round $i") {
        graft.pipeline.NearDup.matchesAgainstIndex(spark, idx, batch) }
      eq &&= (d == x)
    }
    println(s"[idxsoak] direct == index output: $eq")
    assert(eq, "index probe diverged from direct probe on the soak corpus")
    spark.stop()
  }
}
