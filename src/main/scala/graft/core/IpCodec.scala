package graft.core

/** ip1/ip2/ip3 "convip" codec.
  *
  * The reference delegates to librmn's `convertIp`
  * (/root/reference/fstpy/std_io.py:841-851,
  * /root/reference/fstpy/std_enc.py:68-79); this is a reimplementation
  * of the publicly documented encoding:
  *
  * New style (ip > 32767): `ip = kind<<24 | exp<<20 | mantissa` with
  * `value = mantissa * 10^(4-exp)`, mantissa normalized to
  * [100000, 1000000) and exp clamped to [0, 15]. Verified against the
  * well-known encodings 500 mb (kind 2) -> 41394464 and hybrid 1.0
  * (kind 5) -> 93423264. Negative values are stored with a 4-digit
  * mantissa offset by 1000000 (decode: mantissa > 1000000 means
  * negative) — an approximation of librmn's negative handling, kept
  * self-consistent under encode∘decode.
  *
  * Old style (0 <= ip <= 32767), per the historical CONVIP table:
  * pressure in mb for [0,12000] except the sigma carve-out
  * [2000,3000] (sigma = (ip-2000)/1000), and height
  * `5*(ip-12001) - 20000` metres for (12000, 32000].
  */
object IpCodec {

  /** One decoded ip: value(s), kind, printable kind. v2 is set only by
    * interval recognition in [[decodeIp123]].
    */
  final case class DecodedIp(v1: Float, v2: Float, hasV2: Boolean,
                             kind: Int, kinds: String)

  private def dec(v1: Float, kind: Int): DecodedIp =
    DecodedIp(v1, 0f, hasV2 = false, kind, Constants.kindToString(kind))

  /** Decode a single ip -> (value, kind). */
  def decode(ip: Int): (Float, Int) = {
    if (ip < 0) (ip.toFloat, -1)
    else if (ip <= 32767) {
      // old style
      if (ip >= 2000 && ip <= 3000) (((ip - 2000) / 1000.0).toFloat, 1)
      else if (ip <= 12000) (ip.toFloat, 2)
      else if (ip <= 32000) ((5.0 * (ip - 12001) - 20000.0).toFloat, 0)
      else (ip.toFloat, 3)
    } else {
      val kind = (ip >> 24) & 31
      val exp = (ip >> 20) & 15
      val mantissa = ip & 0xFFFFF
      val v =
        if (mantissa > 1000000) -(mantissa - 1000000) * math.pow(10, 4 - exp)
        else mantissa * math.pow(10, 4 - exp)
      (v.toFloat, kind)
    }
  }

  /** Encode (value, kind) -> new-style ip. Returns -1 on overflow. */
  def encode(value: Float, kind: Int): Int = {
    val neg = value < 0
    var temp: Double = math.abs(value.toDouble)
    if (temp < 1e-17) temp = 0.0
    val (lo, hi) = if (neg) (1000.0, 10000.0) else (100000.0, 1000000.0)
    var iexp = 4
    while ((temp >= hi || temp < lo) &&
           (if (temp >= hi) iexp > 0 else iexp < 15)) {
      if (temp >= hi) { temp /= 10.0; iexp -= 1 }
      else { temp *= 10.0; iexp += 1 }
    }
    if (temp >= hi && iexp == 0) return -1 // overflow
    var mantissa = math.round(temp)
    if (mantissa == hi.toLong && iexp > 0) { mantissa = lo.toLong; iexp -= 1 }
    val field = if (neg) 1000000L + mantissa else mantissa
    (((kind & 31) << 24) | (iexp << 20) | field.toInt)
  }

  /** C5 printable-kind letters accepted by ip_from_value_and_kind
    * (/root/reference/fstpy/utils.py:79-108).
    */
  val PrintableKinds: Map[String, Int] = Map(
    "m" -> 0, "sg" -> 1, "mb" -> 2, "M" -> 4, "hy" -> 5, "th" -> 6,
    "H" -> 10, "mp" -> 21)

  /** C5: encode an ip from a value and a printable kind letter. */
  def ipFromValueAndKind(value: Float, pkind: String): Int =
    encode(value, PrintableKinds(pkind.trim))

  /** Full three-ip decode with the reference's special-casing
    * (decode_ip123, /root/reference/fstpy/std_io.py:814-872):
    *  - coordinate records (>>,^^,^>,!!): raw values, kind 100;
    *  - ip2 < 32768 is old-style forecast hours -> kind forced to 10;
    *  - ip3 < 32768 -> kind forced to 100 (arbitrary user code);
    *  - encoded ip3 with matching kind flags a time interval (swap into
    *    ip2.v1/v2) or a height interval (into ip1.v1/v2).
    */
  /** Static scalar twins of [[decode]] for codegen'd expressions
    * (one value per call; the tuple form can't cross a static-call
    * codegen boundary without boxing).
    */
  def decodeValue(ip: Int): Float = decode(ip)._1
  def decodeKind(ip: Int): Int = decode(ip)._2

  def decodeIp123(nomvar: String, ip1: Int, ip2: Int, ip3: Int)
      : (DecodedIp, DecodedIp, DecodedIp) = {
    val nv = nomvar.trim
    if (Constants.RawIpNomvars.contains(nv)) {
      (DecodedIp(ip1.toFloat, 0f, false, 100, ""),
       DecodedIp(ip2.toFloat, 0f, false, 100, ""),
       DecodedIp(ip3.toFloat, 0f, false, 100, ""))
    } else {
      val (v1, k1) = decode(ip1)
      var i1 = dec(v1, k1)

      val (v2, k2raw) = decode(ip2)
      val k2 = if (ip2 >= 32768) k2raw else 10
      var i2 = dec(v2, k2)

      val (v3, k3raw) = decode(ip3)
      val k3 = if (ip3 >= 32768) k3raw else 100
      val i3 = dec(v3, k3)

      if (!Constants.NoIntervalNomvars.contains(nv) && ip3 >= 32768) {
        if (i3.kind == i2.kind)
          i2 = i2.copy(v1 = i3.v1, v2 = i2.v1, hasV2 = true)
        else if (i3.kind == i1.kind)
          i1 = i1.copy(v2 = i3.v1, hasV2 = true)
      }
      (i1, i2, i3)
    }
  }

  /** Interval detection (get_interval,
    * /root/reference/fstpy/std_dec.py:44-69): returns
    * (ipName, low, high, kind) when ip3 is an encoded bound whose kind
    * matches ip1 or ip2.
    */
  def interval(ip1: Int, ip2: Int, ip3: Int,
               i1: DecodedIp, i2: DecodedIp, i3: DecodedIp)
      : Option[(String, Float, Float, Int)] = {
    if (ip3 >= 32768) {
      if (ip1 >= 32768 && i1.kind == i3.kind)
        Some(("ip1", i1.v1, i1.v2, i1.kind))
      else if (ip2 >= 32768 && i2.kind == i3.kind)
        Some(("ip2", i2.v1, i2.v2, i2.kind))
      else None
    } else None
  }

  /** Level sort order by kind (get_level_sort_order,
    * /root/reference/fstpy/std_dec.py:71-85): true = ascending.
    */
  def levelSortAscending(kind: Int): Boolean =
    Set(0, 3, 4, 21, 100).contains(kind)

  /** is_surface (/root/reference/fstpy/std_dec.py:191-212). */
  def isSurface(kind: Int, level: Float): Boolean = {
    val meterLevels = (0 to 20).map(_ * 0.5f).toSet
    if (kind == 5 && level == 1f) true
    else if (kind == 4 && meterLevels.contains(level)) true
    else if (kind == 1 && level == 1f) true
    else false
  }

  /** level_type_follows_topography
    * (/root/reference/fstpy/std_dec.py:215-233).
    */
  def followsTopography(kind: Int): Boolean = Set(1, 4, 5).contains(kind)
}
