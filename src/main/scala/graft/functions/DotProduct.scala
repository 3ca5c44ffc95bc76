package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Native dot product over two numeric arrays.
  *
  * Semantically IDENTICAL to the Column-HOF form in
  * [[graft.pipeline.PipelineOps.dot]] —
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)` — and to its DuckDB twin (`dotSql`): every element
  * cast to double, products accumulated LEFT-TO-RIGHT from 0.0, so
  * the result is bit-identical to both. Null handling matches
  * zip_with + aggregate: a null element (or a length mismatch, which
  * zip_with pads with nulls) nulls the whole result.
  *
  * Why native: `zip_with`/`aggregate` are higher-order functions —
  * they evaluate their lambdas interpreted (outside whole-stage
  * codegen) and materialize an intermediate array per row. This
  * expression is ONE codegen'd static call per pair: no intermediate
  * allocation, a primitive loop over the two ArrayData buffers. It is
  * the inner kernel of every similarity query (brute-force top-k, IVF
  * and LSH ANN, hyperplane signatures, centroid distances), where the
  * per-pair cost multiplies by the candidate count.
  */
object DotProduct {

  /** Null-aware kernel; `lf`/`rf` flag float (vs double) elements.
    * Returns null (boxed) when lengths differ or any element is null
    * — the exact zip_with/aggregate semantics.
    */
  def compute(a: ArrayData, b: ArrayData, lf: Boolean,
              rf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }
}

/** `graft_dot(a, b)` → double, for float/double arrays. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
      java.lang.Double ${ev.value}_r = graft.functions.DotProduct
        .compute($a, $b, ${isFloat(left)}, ${isFloat(right)});
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
