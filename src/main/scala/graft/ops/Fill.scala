package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value repair over keyed, ordered frames — the pandas
  * `ffill` / `interpolate` surface re-expressed as window passes.
  *
  * Scale shape (100 TB posture): both operators are ONE keyed shuffle
  * + sort; the interpolation's backward and forward frames run over
  * the same partitioning (Spark plans them as two Window nodes on one
  * exchange), so gap repair never self-joins and never re-shuffles.
  */
object Fill {

  private def ord(keys: Seq[String], order: Seq[String]) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(c => col(c).asc): _*)

  /** Forward fill (pandas `ffill` per group): `outCol` = the latest
    * non-null `valueCol` at-or-before each row in its `keys` group,
    * ordered by `order`. Leading nulls (no prior value) stay null.
    * `limit` (pandas `ffill(limit=n)`): a value only propagates
    * forward across at most n consecutive null rows — expressed as a
    * bounded frame (the current row plus the n rows before it), so
    * the plan is the same single keyed window either way.
    */
  def forwardFill(df: DataFrame, keys: Seq[String], order: Seq[String],
                  valueCol: String, outCol: String,
                  limit: Option[Int] = None): DataFrame = {
    graft.core.Checks.requireColumns(df, "forward_fill",
      (keys ++ order :+ valueCol): _*)
    limit.foreach(n => require(n > 0,
      s"forward_fill: limit must be positive, got $n"))
    val w = ord(keys, order).rowsBetween(
      limit.map(n => -n.toLong).getOrElse(Window.unboundedPreceding),
      Window.currentRow)
    df.withColumn(outCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Linear interpolation (pandas `interpolate(method='values')` per
    * group): null `valueCol` rows get
    * prev + (next - prev) * (ts - ts_prev) / (ts_next - ts_prev)
    * positioned on the numeric `tsCol`; a one-sided gap falls back to
    * the existing neighbor (ffill at the tail, bfill at the head);
    * rows in an all-null group stay null.
    */
  def interpolate(df: DataFrame, keys: Seq[String], tsCol: String,
                  order: Seq[String], valueCol: String,
                  outCol: String): DataFrame = {
    graft.core.Checks.requireColumns(df, "interpolate",
      (keys ++ order :+ tsCol :+ valueCol): _*)
    val base = ord(keys, order)
    val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val onTs = when(v.isNotNull, col(tsCol))
    val interp = (pv: Column, pt: Column, nv: Column, nt: Column) =>
      when(v.isNotNull, v)
        // nt == pt (anchors at the same position value) would divide
        // by zero and null the row; fall through to the prior anchor
        .when(pv.isNotNull && nv.isNotNull && nt =!= pt,
          pv + (nv - pv) * (col(tsCol) - pt).cast("double") /
            (nt - pt).cast("double"))
        .otherwise(coalesce(pv, nv))
    df.withColumn("__pv", last(v, ignoreNulls = true).over(back))
      .withColumn("__pt", last(onTs, ignoreNulls = true).over(back))
      .withColumn("__nv", first(v, ignoreNulls = true).over(fwd))
      .withColumn("__nt", first(onTs, ignoreNulls = true).over(fwd))
      .withColumn(outCol,
        interp(col("__pv"), col("__pt"), col("__nv"), col("__nt")))
      .drop("__pv", "__pt", "__nv", "__nt")
  }
}
