package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus-curation facade over the pipeline primitives —
  * the production funnel the p47 driver query runs, exposed so a
  * pipeline owner gets the composition without wiring the stages:
  * exact dedup (min-id election per content hash) -> near-dup
  * canonical election (MinHash-LSH pairs + connected components,
  * [[NearDup.canonicalIds]]) -> quality gate.
  *
  * Scale shape: stage 1 is one hash-keyed aggregate with the
  * min-struct election (no join back, no second text scan); stage 2
  * is the bucketed LSH chain (never all-pairs) + the checkpointed
  * CC loop ([[Clusters.connectedComponents]] — reliable checkpoints
  * when the session has a checkpoint dir, executor-local otherwise);
  * stage 3 is a scan
  * predicate. Intermediates persist through
  * [[graft.core.CacheRegistry]] — the caller releases them after
  * consuming the result.
  */
object Curation {

  /** Per-stage doc/token accounting plus the surviving rows.
    * `survivors` keeps the input schema (plus nothing); `accounting`
    * is one row per stage: (stage, n_docs, n_tokens).
    */
  final case class FunnelResult(survivors: DataFrame,
                                accounting: DataFrame)

  /** Run the funnel over `docs` (must have doc_id, text — plus a
    * lang column whenever `lang` is set, since stage 3's gate drops
    * rows whose lang differs; pass `lang = None` for frames without
    * one). Token counts use whitespace tokenization, matching the
    * library's other token accounting.
    */
  def curate(docs: DataFrame, threshold: Double = 0.5,
             minTokens: Long = 50,
             lang: Option[String] = Some("en")): FunnelResult = {
    // fail fast on the lang precondition too: stage 3 is the LAST
    // stage, and a missing lang column would otherwise surface as an
    // AnalysisException only after three stages computed and cached
    val required = Seq("doc_id", "text") ++
      (if (lang.isDefined) Seq("lang") else Nil)
    graft.core.Checks.requireColumns(docs, "curate", required: _*)
    val base0 = docs.withColumn("n_tok",
      size(PipelineOps.words(col("text"))).cast("long"))
    // doc_id leads the column order so the stage-1 min-struct
    // election elects the minimum id regardless of input layout
    val base = base0.select(col("doc_id") +:
      base0.columns.filterNot(_ == "doc_id").map(col): _*)
    // d0/s1/s2 persist WITHOUT eager cache-fill counts (the three
    // count() actions removed in round 8 were the exact extra-action
    // shape the p77 fix removed elsewhere). Why this is race-safe:
    // the first action in this call is lshPairs' signature
    // materialization (inside canonicalIds below, invoked eagerly
    // while s2 is CONSTRUCTED), whose plan scans s1 -> d0 exactly
    // once each — a straight chain, no same-job branch fan-out — so
    // that one job fills both caches. s2 alone can see a two-branch
    // first job (an accounting-first caller aggregates s2 and
    // filter(s2) in one union), but its subplan above the cached
    // s1/CC-label leaves is a cheap semi-join and the block
    // manager's per-partition getOrElseUpdate lock bounds the race
    // to transient duplication. Measured (sf0.1, 3 runs each,
    // DESIGN.md round 8): with counts p47 7.8-8.3 s, without
    // 8.0-9.4 s, p83 5.3-5.5 vs 5.6-6.7 — band-overlapping noise on
    // a box with documented ±40% drift, no structural regression,
    // three fewer action plans per call.
    val d0 = base.transform(graft.core.CacheRegistry.persist(_))
    // min-struct election: doc_id leads, so min() keeps the min-id
    // row per content hash in ONE shuffle
    val cols = d0.columns
    val s1 = d0.groupBy(md5(col("text")))
      .agg(min(struct(cols.map(col): _*)).as("r"))
      .select(cols.map(c => col(s"r.$c").as(c)): _*)
      .transform(graft.core.CacheRegistry.persist(_))
    val s2 = s1.join(
        NearDup.canonicalIds(s1.select("doc_id", "text"), threshold),
        Seq("doc_id"), "left_semi")
      .transform(graft.core.CacheRegistry.persist(_))
    val s3 = s2.filter(col("n_tok") >= minTokens &&
      lang.map(l => col("lang") === l).getOrElse(lit(true)))
    def stage(name: String, df: DataFrame) =
      df.agg(lit(name).as("stage"), count(lit(1)).as("n_docs"),
        coalesce(sum("n_tok"), lit(0L)).as("n_tokens"))
    val acct = stage("s0_raw", d0)
      .unionByName(stage("s1_exact", s1))
      .unionByName(stage("s2_neardup", s2))
      .unionByName(stage("s3_quality", s3))
    FunnelResult(s3.drop("n_tok"), acct)
  }
}
