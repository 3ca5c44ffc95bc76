package graft.core

/** CSV payload-cell codec: `"a,b;c,d"` <-> 2D float array.
  *
  * `;` separates rows, `,` separates columns
  * (/root/reference/fstpy/utils.py:301-373,
  * /root/reference/fstpy/csv_reader.py:96-111). The catalog stores the
  * payload flattened in Fortran (column-major) order with dims (ni,nj),
  * where ni = number of `;`-rows and nj = columns per row.
  */
object CsvArrayCodec {

  /** Parse "a,b;c,d" -> (fortranFlattened, ni, nj). An empty/blank
    * payload yields (empty, 0, 0) — String.split never returns an
    * empty array, so the blank case needs its own branch. (The record
    * writers never emit empty payload cells.)
    */
  def parse(s: String): (Array[Float], Int, Int) = {
    if (s.trim.isEmpty) return (Array.empty[Float], 0, 0)
    val rows = s.split(";").map(_.split(",").map(_.trim.toFloat))
    val ni = rows.length
    val nj = if (ni == 0) 0 else rows(0).length
    require(rows.forall(_.length == nj), s"ragged csv array: $s")
    // element (i,j) of the ni x nj field at Fortran index i + j*ni
    val flat = new Array[Float](ni * nj)
    var i = 0
    while (i < ni) {
      var j = 0
      while (j < nj) { flat(i + j * ni) = rows(i)(j); j += 1 }
      i += 1
    }
    (flat, ni, nj)
  }

  /** Inverse of [[parse]]. */
  def serialize(flat: Array[Float], ni: Int, nj: Int): String = {
    (0 until ni).map { i =>
      (0 until nj).map(j => fmt(flat(i + j * ni))).mkString(",")
    }.mkString(";")
  }

  private def fmt(f: Float): String =
    if (f == f.toLong.toFloat && math.abs(f) < 1e15f) f.toLong.toString
    else f.toString
}
