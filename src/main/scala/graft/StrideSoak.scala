package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: adversarial stride-miss soak for
  * [[graft.pipeline.NearDup.matchesAgainst]]'s size-stratified
  * over-cap keep (round-9 verdict item 4).
  *
  * The miss mechanism under test: an over-cap (band, bkey) bucket
  * keeps every ceil(bn/cap)-th member by size rank; a probe whose
  * ONLY size-qualifying partner is stride-skipped in EVERY bucket it
  * shares with the probe loses the match. The fixture constructs the
  * worst case honestly:
  *
  *  - H: a 40-word hot text; K verbatim copies populate every band
  *    bucket H hashes to (all copies share all 8 band keys).
  *  - D (the "band-invisible" sparse qualifier): H plus a GREEDILY
  *    SEARCHED filler suffix — each appended word adds one trailing
  *    shingle, and a candidate word is accepted only if that shingle
  *    displaces NONE of the 16 band-row minhash minima, so D's 8
  *    band keys all stay equal to H's. D therefore appears ONLY in
  *    the hot over-cap buckets, ranked last by size, and the filler
  *    grows D past 2x H's shingle count so every H copy fails the
  *    probe's size-ratio prefilter: D is the unique qualifier.
  *  - P: D plus a filler suffix found the same way (so P's band keys
  *    also all equal H's — every probe key lands in the hot bucket
  *    and nowhere else). jaccard(P, D) ~ 0.98; jaccard(P, H) ~ 0.45
  *    with the size prefilter excluding H outright.
  *
  * For K = 8..13 (sweeping D's size rank through every stride phase
  * at cap 4) it reports: whether the pre-round-9 stride-only rule
  * keeps D (analytic: rank K+1 in a bucket of K+1, kept iff
  * K % ceil((K+1)/cap) == 0), whether the shipped keep-largest rule
  * finds the match end-to-end, and the uncapped control.
  *
  * Usage: runMain graft.StrideSoak
  */
object StrideSoak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def sigOf(texts: Seq[String]): Seq[(Seq[String], Int)] = {
      texts.zipWithIndex.toDF("text", "idx")
        .withColumn("sig",
          graft.functions.GraftFunctions.shingleSig(col("text")))
        .select(col("idx"), col("sig.bks").as("bks"),
          size(col("sig.sh")).as("nsh"))
        .orderBy("idx")
        .collect()
        .map(r => (r.getSeq[String](1).toSeq, r.getInt(2)))
        .toSeq
    }

    val hText = (1 to 40).map(i => s"h$i").mkString(" ")
    val Seq((hBks, hNsh)) = sigOf(Seq(hText))
    println(s"[stride] H: $hNsh shingles, ${hBks.size} band keys")

    // greedy band-invisible growth: append words whose trailing
    // shingle displaces no band-row minimum, until nsh(base+filler)
    // exceeds `targetNsh`
    def growInvisible(base: String, targetNsh: Int, prefix: String)
        : (String, Int) = {
      var text = base
      var n = 0
      var cand = 0
      var rounds = 0
      while (n < targetNsh && rounds < 400) {
        rounds += 1
        val words = (cand until cand + 24).map(j => s"$prefix$j")
        cand += 24
        val sigs = sigOf(words.map(w => s"$text $w"))
        val hit = sigs.zip(words).find { case ((bks, _), _) =>
          bks == hBks
        }
        hit match {
          case Some(((_, nsh), w)) => text = s"$text $w"; n = nsh
          case None => ()
        }
      }
      require(n >= targetNsh,
        s"greedy search stalled at $n shingles (target $targetNsh)")
      (text, n)
    }

    val (dText, dNsh) = growInvisible(hText, (2.2 * hNsh).toInt, "zf")
    println(s"[stride] D: $dNsh shingles (${
      f"${dNsh.toDouble / hNsh}%.2f"}x H), band keys == H's: ${
      sigOf(Seq(dText)).head._1 == hBks}")
    val (pText, pNsh) = growInvisible(dText, dNsh + 2, "yq")
    println(s"[stride] P: $pNsh shingles, band keys == H's: ${
      sigOf(Seq(pText)).head._1 == hBks}; jaccard(P,D)=${
      f"${dNsh.toDouble / pNsh}%.3f"}, jaccard(P,H)=${
      f"${hNsh.toDouble / pNsh}%.3f"} (size prefilter at 0.5 excludes" +
      s" H: ${hNsh < 0.5 * pNsh})")

    val cap = 4
    var oldMisses = 0
    (8 to 13).foreach { k =>
      val corpus = ((1L to k.toLong).map(i => (i, hText)) :+
        (999L, dText)).toDF("doc_id", "text")
      val probe = Seq((5000L, pText)).toDF("doc_id", "text")
      val got = graft.pipeline.NearDup
        .matchesAgainst(corpus, probe, 0.5, bucketCap = cap)
        .collect().map(r => (r.getBoolean(1), r.getLong(2),
          r.getDouble(3))).head
      graft.core.CacheRegistry.releaseAll()
      val ctl = graft.pipeline.NearDup
        .matchesAgainst(corpus, probe, 0.5, bucketCap = 1 << 30)
        .collect().map(r => (r.getBoolean(1), r.getLong(2))).head
      graft.core.CacheRegistry.releaseAll()
      // pre-round-9 stride-only rule, analytically: D at rank K+1 of
      // bn = K+1, kept iff (rank-1) % ceil(bn/cap) == 0
      val stride = math.ceil((k + 1).toDouble / cap).toLong
      val oldKept = k.toLong % stride == 0
      if (!oldKept) oldMisses += 1
      println(f"[stride] K=$k%2d (bn=${k + 1}, stride=$stride): " +
        f"stride-only keeps D: $oldKept%-5s | keep-largest match: " +
        f"${got._1}%-5s id=${got._2} j=${got._3}%.3f | uncapped: " +
        f"${ctl._1} id=${ctl._2}")
      assert(got._1 && got._2 == 999L,
        s"keep-largest rule missed the planted qualifier at K=$k")
      assert(ctl._1 && ctl._2 == 999L, "uncapped control missed")
    }
    println(s"[stride] stride-only rule misses: $oldMisses/6 phases; " +
      "keep-largest: 0/6 (recall 1.0 in every phase)")

    // phase 2: the MIDDLE-GAP residual, measured honestly. The
    // endpoint keep cannot help a qualifier strictly inside the size
    // spectrum: add a band-invisible 4.4x doc L above D, so D (2.2x)
    // is an interior rank — L is inside P's size-ratio window but
    // fails the jaccard verify (|H|/|P u L| ~ 0.18), so D stays the
    // unique TRUE match and its survival is pure stride luck. The
    // documented bound this measures: a miss needs the bucket's size
    // spectrum to hold no other qualifier within the probe's ratio
    // window AND the partner band-invisible — then recall is ~cap/bn
    // (the kept fraction), not 1.
    val (lText, lNsh) = growInvisible(hText, (4.2 * hNsh).toInt, "wk")
    println(s"[stride] L: $lNsh shingles (${
      f"${lNsh.toDouble / hNsh}%.2f"}x H), band keys == H's: ${
      sigOf(Seq(lText)).head._1 == hBks}")
    var midHits = 0
    (8 to 13).foreach { k =>
      val corpus = ((1L to k.toLong).map(i => (i, hText)) :+
        (999L, dText) :+ (1500L, lText)).toDF("doc_id", "text")
      val probe = Seq((5000L, pText)).toDF("doc_id", "text")
      val got = graft.pipeline.NearDup
        .matchesAgainst(corpus, probe, 0.5, bucketCap = cap)
        .collect().map(r => (r.getBoolean(1), r.getLong(2))).head
      graft.core.CacheRegistry.releaseAll()
      // D at rank K+1 of bn = K+2; stride keep or miss is the whole
      // story (L, rank K+2, is always kept but never verifies)
      val stride = math.ceil((k + 2).toDouble / cap).toLong
      val strideKeeps = k.toLong % stride == 0
      if (got._1) midHits += 1
      println(f"[stride] mid-gap K=$k%2d (bn=${k + 2}, " +
        f"stride=$stride): stride keeps D: $strideKeeps%-5s | " +
        f"matched: ${got._1}%-5s id=${got._2}")
      assert(got._1 == strideKeeps && (!got._1 || got._2 == 999L),
        s"mid-gap behavior diverged from the stride model at K=$k")
    }
    println(s"[stride] mid-gap recall: $midHits/6 phases — the " +
      "accepted residual: an interior lone qualifier in a fully " +
      "band-invisible over-cap bucket survives only on its stride " +
      "rank; requires no other size-window qualifier AND band " +
      "invisibility (see NearDup scaladoc)")
    spark.stop()
  }
}
