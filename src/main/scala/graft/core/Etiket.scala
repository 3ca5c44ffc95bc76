package graft.core

/** Etiket (record label) parse/build.
  *
  * An etiket is run(2) + label(5 CMC | 6 SPOOKI) + implementation(1)
  * [+ ensemble member(3)]; anything that doesn't match stays an opaque
  * label (get_parsed_etiket, /root/reference/fstpy/std_dec.py:268-323;
  * create_encoded_etiket, /root/reference/fstpy/std_enc.py:10-33).
  * Golden value: "R1_V710_N" -> ("_V710_", "R1", "N", "").
  */
object Etiket {

  final case class Parsed(label: String, run: String,
                          implementation: String, ensembleMember: String)

  private val Run = "[RGPEAIMWNC_][0-9RLHMEA_]"
  private val W = "[A-Za-z0-9_]"
  private val Impl = "[NPX]"

  private val CmcNoEns = (Run + W + "{5}" + Impl + "$").r
  private val CmcEns = (Run + W + "{5}" + Impl + W + "{3}$").r
  private val SpookiNoEns = (Run + W + "{6}" + Impl + "$").r
  private val SpookiEns = (Run + W + "{6}" + Impl + W + "{3}$").r

  /** Nulls (absent pieces) are represented as empty strings. */
  def parse(raw: String): Parsed = {
    if (CmcNoEns.matches(raw))
      Parsed(raw.substring(2, 7), raw.substring(0, 2), raw.substring(7, 8), "")
    else if (CmcEns.matches(raw))
      Parsed(raw.substring(2, 7), raw.substring(0, 2), raw.substring(7, 8),
        raw.substring(8, 11))
    else if (SpookiNoEns.matches(raw))
      Parsed(raw.substring(2, 8), raw.substring(0, 2), raw.substring(8, 9), "")
    else if (SpookiEns.matches(raw))
      Parsed(raw.substring(2, 8), raw.substring(0, 2), raw.substring(8, 9),
        raw.substring(9, 12))
    else Parsed(raw, "", "", "")
  }

  /** Inverse: run + label + implementation + ensemble. The reference
    * (std_enc.py:25-31) keeps the label unconditionally — a literal
    * "None" label survives — and drops only run / implementation /
    * ensemble_member when they equal 'None'; nulls map to "".
    */
  def build(label: String, run: String, implementation: String,
            ensembleMember: String): String = {
    val nz = (s: String) => Option(s).filter(_ != "None").getOrElse("")
    nz(run) + Option(label).getOrElse("") +
      nz(implementation) + nz(ensembleMember)
  }
}
