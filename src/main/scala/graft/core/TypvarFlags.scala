package graft.core

/** Typvar second-character modifier flags.
  *
  * parse: /root/reference/fstpy/dataframe.py:104-141;
  * build (modifiers_to_typvar2): /root/reference/fstpy/std_enc.py:133-161.
  */
object TypvarFlags {

  final case class Flags(multipleModifications: Boolean, zapped: Boolean,
                         filtered: Boolean, interpolated: Boolean,
                         unitConverted: Boolean, bounded: Boolean,
                         missingData: Boolean, ensembleExtraInfo: Boolean)

  def parse(typvar: String): Flags = {
    val c = if (typvar != null && typvar.length == 2) typvar.charAt(1) else ' '
    Flags(
      multipleModifications = c == 'M',
      zapped = c == 'Z',
      filtered = c == 'F',
      interpolated = c == 'I',
      unitConverted = c == 'U',
      bounded = c == 'B',
      missingData = c == '?',
      ensembleExtraInfo = c == '!')
  }

  /** Flags -> second typvar char; more than one modification forces M. */
  def toTypvar2(zapped: Boolean, filtered: Boolean, interpolated: Boolean,
                unitConverted: Boolean, bounded: Boolean,
                ensembleExtraInfo: Boolean,
                multipleModifications: Boolean): String = {
    val set = Seq(
      zapped -> "Z", filtered -> "F", interpolated -> "I",
      unitConverted -> "U", bounded -> "B", ensembleExtraInfo -> "!",
      multipleModifications -> "M").filter(_._1)
    if (set.size > 1) "M" else set.headOption.map(_._2).getOrElse("")
  }
}
