package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M10 ApplyMask / M11 RecoverMask
  * (/root/reference/fstpy/apply_mask.py:16-93,
  * /root/reference/fstpy/recover_mask.py:16-100).
  *
  * Masked payloads are represented as null elements in `d` (the
  * reference uses numpy masked arrays, which retain the underlying
  * values; recovery here fills masked positions with 0 — a documented
  * representation difference). Pairing is an equi-join on the 17
  * identity columns (BASE minus typvar/datyp/nbits/datev/d), keyed
  * entirely on metadata — payload arrays are never shuffle keys.
  */
object Masks {

  /** Pair-identity columns (apply_mask.py:57). */
  val PairCols: Seq[String] = graft.core.Constants.BaseColumns
    .filterNot(Seq("typvar", "datyp", "nbits", "datev", "d").contains)

  /** M10: apply `@@` mask rows to their paired data rows; mask rows are
    * consumed. keepValue=1 keeps elements where the mask is nonzero.
    */
  def applyMask(df: DataFrame, maskTypvar: String = "@@",
                keepValue: Int = 1): DataFrame = {
    graft.core.Checks.requireColumns(df, "apply_mask", "nomvar",
      "typvar", "d")
    // persisted (CacheRegistry contract — the caller releases): the
    // meta/notMasked/applied output branches each re-execute this
    // subtree otherwise, and when operators chain (recover o apply,
    // f20's shape) the re-execution NESTS — the round-10 plan audit
    // counted 20 catalog scans in one f20 plan before these persists
    // and 2 after (DESIGN.md round 10; warm 3.3 -> 0.9 s).
    val g = (if (df.columns.contains("grid")) df
             else Decode.addGrid(df))
      .transform(graft.core.CacheRegistry.persist(_))
    val cols = g.columns
    val meta = g.filter(col("nomvar").isin(VCoord.VcMeta: _*))
    val noMeta = g.filter(!col("nomvar").isin(VCoord.VcMeta: _*))
    val masked = noMeta.filter(col("typvar").contains("@"))
    val notMasked = noMeta.filter(!col("typvar").contains("@"))

    // One window pass over the pair-identity groups (no join): each
    // group must hold exactly one mask row and one data row, like the
    // reference (apply_mask.py:63 raises on groups != 2 rows). Orphan
    // masks, missing masks, and duplicate-identity fan-outs all keep a
    // surviving output row whose projection raises lazily — nothing is
    // silently dropped or multiplied.
    val w = Window.partitionBy(PairCols.map(col): _*)
    val withAgg = masked
      .withColumn("pair_n", count(lit(1)).over(w))
      .withColumn("n_vars",
        count(when(col("typvar") =!= maskTypvar, 1)).over(w))
      .withColumn("mask_d", first(
        when(col("typvar") === maskTypvar, col("d")), true).over(w))
    val bad = col("pair_n") =!= 2 || col("n_vars") =!= 1
    val applied = withAgg
      .filter(col("typvar") =!= maskTypvar || bad)
      .withColumn("d", when(bad,
        raise_error(concat(
          lit("apply_mask: there should only be 2 rows (one mask, " +
            "one data) per group; nomvar="), col("nomvar"),
          lit(" rows="), col("pair_n"))))
        .otherwise(zip_with(col("d"), col("mask_d"), (v, m) =>
          when(if (keepValue == 1) m =!= 0f else m === 0f, v))))
      .select(cols.map(col): _*)

    meta.unionByName(notMasked).unionByName(applied)
  }

  /** M11: re-emit `@@` mask rows (datyp 2, nbits 1) from null-masked
    * data rows; masked positions in the data are filled with 0.
    * Groups that already carry both rows pass through.
    */
  def recoverMask(df: DataFrame, maskTypvar: String = "@@",
                  keepValue: Int = 1): DataFrame = {
    graft.core.Checks.requireColumns(df, "recover_mask", "nomvar",
      "typvar", "d")
    // persisted for the same branch fan-out reason as applyMask —
    // and doubly load-bearing here because recoverMask's input is
    // often applyMask's 3-way union (f20), which would otherwise
    // re-execute whole per output branch
    val g = (if (df.columns.contains("grid")) df
             else Decode.addGrid(df))
      .transform(graft.core.CacheRegistry.persist(_))
    val cols = g.columns
    val meta = g.filter(col("nomvar").isin(VCoord.VcMeta: _*))
    val noMeta = g.filter(!col("nomvar").isin(VCoord.VcMeta: _*))
    val masked = noMeta.filter(col("typvar").contains("@"))
    val notMasked = noMeta.filter(!col("typvar").contains("@"))

    val w = Window.partitionBy(PairCols.map(col): _*)
    val withN = masked.withColumn("pair_n", count(lit(1)).over(w))

    val one = lit(if (keepValue == 1) 1f else 0f)
    val zero = lit(if (keepValue == 1) 0f else 1f)
    // One pass over the windowed rows: complete pairs pass through as
    // themselves; singles expand to (filled data row, synthesized mask
    // row). Fusing the three consumers means the payload-bearing
    // window shuffle executes once, not three times.
    def mk(over: Map[String, org.apache.spark.sql.Column]) =
      struct(cols.map(c => over.getOrElse(c, col(c)).as(c)): _*)
    // pair_n == 2 passes; pair_n > 2 raises like recover_mask.py:65
    // ('There should only be 1 row per group!') instead of passing
    // duplicate-identity fan-outs through
    val pass = mk(Map("d" -> when(col("pair_n") > 2,
      raise_error(concat(
        lit("recover_mask: there should only be 1 row per group; " +
          "nomvar="), col("nomvar"), lit(" rows="), col("pair_n"))))
      .otherwise(col("d"))))
    val dataRow = mk(Map(
      "d" -> transform(col("d"), x => coalesce(x, lit(0f)))))
    val maskRow = mk(Map(
      "typvar" -> lit(maskTypvar).cast("string"),
      "datyp" -> lit(2), "nbits" -> lit(1),
      "d" -> transform(col("d"),
        x => when(x.isNotNull, one).otherwise(zero))))
    // pair_n >= 2: the identity group already carries its mask row(s);
    // pass every row through unchanged (the reference only synthesizes
    // a mask for true singles — duplicate-identity catalogs must not
    // multiply output, see recover_mask.py:52-65).
    val expanded = withN
      .select(explode(
        when(col("pair_n") >= 2, array(pass))
          .otherwise(array(dataRow, maskRow))).as("r"))
      .select(cols.map(c => col(s"r.$c").as(c)): _*)

    meta.unionByName(notMasked).unionByName(expanded)
  }
}
