package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle/MinHash/band-key kernel for the LSH dedup pipelines.
  *
  * Semantically IDENTICAL to the Column-HOF chain in
  * [[graft.pipeline.PipelineOps]] —
  * `hashedShingles(shingles(words(text)))` and `bandKeys(...)` — and
  * to their DuckDB SQL twins (the oracle side is untouched):
  * space-trim + `\s+` split, distinct 3-word shingles in first-seen
  * order, one md5 per shingle with the 48-bit `h64` seed-0 prefix
  * parse, 16 mod-Mersenne-prime MinHashes (see
  * [[graft.pipeline.PipelineOps.minhash]] for why the mod is
  * load-bearing), 8 two-row band digests.
  *
  * Why native: the HOF chain is five higher-order functions per row —
  * each breaks whole-stage codegen and materializes an intermediate
  * GenericArrayData — while this expression is ONE codegen'd static
  * call per row producing both arrays in a single pass over the
  * words. The md5 work (the true cost) is unchanged; the wrapper
  * overhead and the 16 re-walks of the hash array (one per MinHash
  * function) collapse into one walk computing all 16 mins.
  */
object ShingleSig {

  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val N = 3 // shingle width (matches PipelineOps.shingles)
  private val MinHashFns = graft.pipeline.PipelineOps.MinHashFns
  private val LshBands = graft.pipeline.PipelineOps.LshBands

  private val HexDigits = "0123456789abcdef".toCharArray

  // one digest instance per thread, reset per use: getInstance does a
  // provider lookup + allocation, and this kernel calls it once per
  // shingle — exactly the per-row overhead the expression exists to cut
  private val Md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private def md5Hex(s: String): String = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** First 48 bits of md5("0|" + s) — `h64(s, 0)` exactly. */
  private def h48(s: String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(("0|" + s).getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) |
      ((d(2) & 0xFFL) << 24) | ((d(3) & 0xFFL) << 16) |
      ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
  }

  /** One row's (hashed shingle set, band keys). Trim strips SPACES
    * only — Spark's `trim` (and DuckDB's) does not touch tabs or
    * newlines, and the split must see exactly what the HOF chain saw.
    */
  def compute(text: UTF8String): InternalRow = {
    var s = text.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s = s.substring(lo, hi)
    val w = WS.split(s, -1)

    // distinct shingles, first-seen order, then distinct hashes
    val seen = new java.util.LinkedHashSet[String]()
    if (w.length >= N) {
      var i = 0
      while (i <= w.length - N) {
        seen.add(w(i) + " " + w(i + 1) + " " + w(i + 2))
        i += 1
      }
    }
    val hset = new java.util.LinkedHashSet[java.lang.Long]()
    val it = seen.iterator()
    while (it.hasNext) hset.add(h48(it.next()))

    val nh = hset.size
    val hs = new Array[Long](nh)
    var j = 0
    val hit = hset.iterator()
    while (hit.hasNext) { hs(j) = hit.next(); j += 1 }

    val bks: Array[AnyRef] =
      if (nh == 0) Array.empty
      else {
        val mins = new Array[Long](MinHashFns)
        var f = 0
        while (f < MinHashFns) {
          var m = Long.MaxValue
          var k = 0
          while (k < nh) {
            val v = (hs(k) * (2L * f + 1) + f * 99991L) %
              graft.pipeline.PipelineOps.MinHashP
            if (v < m) m = v
            k += 1
          }
          mins(f) = m
          f += 1
        }
        val out = new Array[AnyRef](LshBands)
        var b = 0
        while (b < LshBands) {
          out(b) = UTF8String.fromString(
            md5Hex(mins(2 * b).toString + "," + mins(2 * b + 1).toString))
          b += 1
        }
        out
      }

    InternalRow(new GenericArrayData(hs), new GenericArrayData(bks))
  }
}

object JaccardLong {
  /** Exact Jaccard over two DISTINCT-element long arrays — the same
    * value as `size(array_intersect(a, b)) / (size(a) + size(b) − ∩)`
    * ([[graft.pipeline.PipelineOps.jaccard]]) and of the DuckDB
    * `list_intersect` twin, without the per-pair boxed set those
    * build: one primitive hash probe per element of the smaller side.
    */
  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val (small, big, ns, nbg) =
      if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[java.lang.Long](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getLong(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nbg) {
      if (set.contains(big.getLong(i))) inter += 1
      i += 1
    }
    // two empty sets: |A|+|B|-∩ = 0. The HOF twin's double division
    // raises DIVIDE_BY_ZERO under ANSI; silently returning NaN would
    // instead PASS `>= threshold` filters (NaN sorts greatest), so
    // match the engine semantics and fail loudly.
    if (na + nb - inter == 0)
      throw new ArithmeticException(
        "graft_jaccard_long: Jaccard of two empty sets is undefined")
    inter.toDouble / (na + nb - inter).toDouble
  }
}

/** `graft_jaccard_long(a, b)` → double, for distinct long arrays. */
case class JaccardLongExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jaccard_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardLong.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaccardLong.compute($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLongExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_shingle_sig(text)` →
  * `struct<sh: array<bigint>, bks: array<string>>`.
  */
case class ShingleSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sh", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("bks", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_sig"

  override protected def nullSafeEval(t: Any): Any =
    ShingleSig.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.ShingleSig.compute($t)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleSigExpr = copy(child = newChild)
}
