package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C17 `vectorize` memoizer analog
  * (/root/reference/fstpy/utils.py:254-286): the reference dedups the
  * input tuples of an expensive scalar function, evaluates once per
  * distinct tuple, and maps results back. The Spark-native analog is
  * distinct -> compute -> broadcast join: for an expensive
  * (non-codegen) function over low-cardinality keys, the function
  * runs |distinct| times instead of |rows| times and rejoins at
  * broadcast-hash cost.
  */
object Memoize {

  /** Evaluate `compute` (a function of the key columns) once per
    * distinct key combination and join the result back as `outName`.
    */
  def viaDistinctJoin(df: DataFrame, keyCols: Seq[String],
                      compute: Column, outName: String): DataFrame = {
    val distinctKeys = df.select(keyCols.map(col): _*).distinct()
      .withColumn(outName, compute)
    // null-safe join condition: a null in a key column must still
    // match its distinct() twin, or the memoizer would silently drop
    // rows instead of only adding a column
    val renamed = keyCols.foldLeft(distinctKeys)((d, k) =>
      d.withColumnRenamed(k, s"__memo_$k"))
    val cond = keyCols.map(k => col(k) <=> col(s"__memo_$k"))
      .reduce(_ && _)
    df.join(broadcast(renamed), cond)
      .drop(keyCols.map(k => s"__memo_$k"): _*)
  }
}
