package graft.core

import org.apache.spark.sql.DataFrame

/** Operator input guardrails, mirroring the reference's per-operator
  * exception classes and column-presence checks
  * (/root/reference/fstpy/dataframe.py:31-37, dataframe_utils.py:17,
  * apply_mask.py:12, std_vgrid.py:70): fail fast with the operator
  * name and the missing columns instead of a deep AnalysisException.
  */
object Checks {

  final class MissingColumnsError(op: String, missing: Seq[String],
                                  present: Seq[String])
    extends IllegalArgumentException(
      s"$op: missing required column(s) ${missing.mkString(", ")} " +
        s"(present: ${present.sorted.mkString(", ")})")

  def requireColumns(df: DataFrame, op: String, cols: String*): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new MissingColumnsError(op, missing, df.columns.toSeq)
  }
}
