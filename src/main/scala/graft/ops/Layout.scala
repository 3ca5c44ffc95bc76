package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional data skipping.
  *
  * Z-ordering interleaves the bits of two (bucketed) dimensions so
  * rows close in BOTH dimensions land close in the sort order; a
  * table written `sortWithinPartitions(zkey)` gets parquet row-group
  * min/max ranges that are tight in both columns at once, and scans
  * filtered on either dimension skip most row groups — the standard
  * layout trick for 100 TB fact tables queried along more than one
  * axis. (Single-dimension skipping needs only a plain sort; this is
  * for the two-axes case a single sort cannot serve.)
  *
  * The key is pure per-row bit arithmetic — a static expression tree
  * (no UDF, no HOF), identical in the DuckDB twin.
  */
object Layout {

  /** Interleave the low `bits` bits of `a` (even positions) and `b`
    * (odd positions) into a Z-curve key. Inputs must already be
    * bucketed into [0, 2^bits) longs — out-of-range bits are masked.
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31,
      s"z_order_key: bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      val ai = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)),
        2 * i)
      val bi = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)),
        2 * i + 1)
      ai.bitwiseOR(bi)
    }.reduce(_.bitwiseOR(_))
  }

  /** The DuckDB twin of [[zOrderKey]] (same masking, same positions). */
  def zOrderKeySql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
