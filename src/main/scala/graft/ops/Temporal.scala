package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in join strategies don't cover,
  * expressed as compositions that keep their scale posture explicit —
  * no custom physical operator needed.
  *
  * - [[asofJoin]]: union + running `last(..., ignoreNulls)` window.
  *   ONE shuffle on the keys, a linear single-pass window, no range
  *   predicate ever reaches a join — the classic sort-merge-free
  *   as-of shape that survives any key cardinality.
  * - [[rangeJoin]]: interval containment via coarse time-bin
  *   bucketing. Both sides equi-join on (keys, bin) — never an
  *   inequality-only nested loop — and the exact containment check
  *   runs post-join. Shuffle fanout is bounded by
  *   ceil(interval length / binWidth) + 1 bins per interval.
  */
object Temporal {

  /** As-of join: for each left row, the single right row with the
    * greatest `tsCol` <= the left row's `tsCol` within the same
    * `keys` group (ties on ts match the right row at the same
    * instant). Emits every left column plus `prefix`-renamed copies
    * of the right `tsCol` and `payload` columns (null when no prior
    * right row exists).
    *
    * The right side must be unique per (keys, tsCol) — deduplicate
    * upstream (e.g. keep the max id per instant) for deterministic
    * results.
    *
    * `tolerance` (pandas `merge_asof(tolerance=...)`): when set, a
    * prior right row more than `tolerance` units of `tsCol` behind
    * the left row is voided (all matched columns null) — a post-
    * window predicate on the same single-shuffle plan, never a join
    * condition.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String],
               prefix: String = "asof_",
               tolerance: Option[Long] = None): DataFrame = {
    graft.core.Checks.requireColumns(left, "asof_join",
      (keys :+ tsCol): _*)
    graft.core.Checks.requireColumns(right, "asof_join",
      ((keys :+ tsCol) ++ payload): _*)
    val lCols = left.columns.toSeq
    val rs = right
      // a null right timestamp would sort first and become the "prior"
      // match for every early left row — exclude it (no instant, no
      // as-of semantics)
      .filter(col(tsCol).isNotNull)
      .select((keys.map(col) :+ col(tsCol)) :+
        struct((tsCol +: payload).map(col): _*).as("__r"): _*)
      .withColumn("__is_l", lit(0))
    val ls = left.withColumn("__is_l", lit(1))
    // right rows sort BEFORE left rows at an equal timestamp, so the
    // running last() includes same-instant right rows (<= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = tolerance match {
      case Some(tol) =>
        when(col(tsCol) - col("__m").getField(tsCol) <= tol, col("__m"))
      case None => col("__m")
    }
    rs.unionByName(ls, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__m", matched)
      .filter(col("__is_l") === 1)
      .select(lCols.map(col) ++
        (tsCol +: payload).map(f =>
          col("__m").getField(f).as(prefix + f)): _*)
  }

  /** Range join: every (left row, interval) pair with the same `keys`
    * and `startCol` <= left.`tsCol` < `endCol`. Columns `tsCol`,
    * `startCol`, `endCol` must be numeric (e.g. epoch micros) and
    * named distinctly across the two sides; `binWidth` is in the same
    * unit. Each left row carries ONE bin, so containment pairs are
    * produced exactly once — no post-join dedup.
    */
  def rangeJoin(left: DataFrame, intervals: DataFrame,
                keys: Seq[String], tsCol: String, startCol: String,
                endCol: String, binWidth: Long): DataFrame = {
    graft.core.Checks.requireColumns(left, "range_join",
      (keys :+ tsCol): _*)
    graft.core.Checks.requireColumns(intervals, "range_join",
      (keys :+ startCol :+ endCol): _*)
    require(binWidth > 0, "range_join: binWidth must be positive")
    val lb = left.withColumn("__bin", expr(s"$tsCol div $binWidth"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div $binWidth"),
        expr(s"($endCol - 1) div $binWidth"))))
    lb.join(ib, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
