package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime

/** Golden-value tests pinned by the reference docstrings
  * (/root/reference/fstpy/std_dec.py) and well-known public FST
  * encodings.
  */
class CodecSpec extends AnyFunSuite {

  test("RmnDate golden: 442998800 -> 2020-07-14T12:00") {
    assert(RmnDate.toLocalDateTime(442998800L)
      .contains(LocalDateTime.of(2020, 7, 14, 12, 0)))
  }

  test("RmnDate dummy stamps decode to None") {
    assert(RmnDate.toLocalDateTime(0L).isEmpty)
    assert(RmnDate.toLocalDateTime(10101011L).isEmpty)
  }

  test("RmnDate encode inverts decode") {
    assert(RmnDate.fromLocalDateTime(LocalDateTime.of(2020, 7, 14, 12, 0))
      == 442998800L)
  }

  test("RmnDate dateo reconstruction: deet*npas shift") {
    // 6 h = deet 300 * npas 72 = 21600 s = 4320 ticks
    val datev = 442998800L
    val dateo = RmnDate.dateoFromDatev(datev, 300, 72)
    val tv = RmnDate.toEpochSeconds(datev).get
    val to = RmnDate.toEpochSeconds(dateo).get
    assert(tv - to == 21600L)
  }

  test("IpCodec new-style known encodings: 500 mb and hybrid 1.0") {
    assert(IpCodec.encode(500f, 2) == 41394464)
    assert(IpCodec.decode(41394464) == ((500f, 2)))
    assert(IpCodec.encode(1.0f, 5) == 93423264)
    assert(IpCodec.decode(93423264) == ((1.0f, 5)))
  }

  test("IpCodec old-style decode rules") {
    assert(IpCodec.decode(500) == ((500f, 2)))    // pressure mb
    assert(IpCodec.decode(2500) == ((0.5f, 1)))   // sigma carve-out
    assert(IpCodec.decode(12001) == ((-20000f, 0))) // height base
    assert(IpCodec.decode(16001) == ((0f, 0)))      // sea level
  }

  test("decodeIp123 coordinate records are raw with kind 100") {
    val (i1, i2, i3) = IpCodec.decodeIp123(">>", 33792, 77761, 0)
    assert(i1.v1 == 33792f && i1.kind == 100 && i1.kinds == "")
    assert(i2.v1 == 77761f && i2.kind == 100)
    assert(i3.v1 == 0f && i3.kind == 100)
  }

  test("decodeIp123 ip2 old-style hours and ip3 user code") {
    val (i1, i2, i3) = IpCodec.decodeIp123("TT", IpCodec.encode(850f, 2), 6, 0)
    assert(i1.v1 == 850f && i1.kind == 2 && i1.kinds == "mb")
    assert(i2.v1 == 6f && i2.kind == 10 && i2.kinds == "H")
    assert(i3.kind == 100 && i3.kinds == "")
  }

  test("decodeIp123 time-interval swap (ip2/ip3 same kind)") {
    val ip2 = IpCodec.encode(6f, 10)
    val ip3 = IpCodec.encode(0f, 10)
    val (_, i2, _) = IpCodec.decodeIp123("PR", IpCodec.encode(0f, 0), ip2, ip3)
    assert(i2.hasV2 && i2.v1 == 0f && i2.v2 == 6f && i2.kind == 10)
  }

  test("surface/topography/sort-order rules") {
    assert(!IpCodec.isSurface(5, 0.36116f))
    assert(IpCodec.isSurface(5, 1f))
    assert(IpCodec.isSurface(4, 1.5f))
    assert(IpCodec.followsTopography(5))
    assert(!IpCodec.followsTopography(2))
    assert(IpCodec.levelSortAscending(0))
    assert(!IpCodec.levelSortAscending(2))
  }

  test("Etiket golden: R1_V710_N and empty") {
    assert(Etiket.parse("R1_V710_N") ==
      Etiket.Parsed("_V710_", "R1", "N", ""))
    assert(Etiket.parse("") == Etiket.Parsed("", "", "", ""))
    assert(Etiket.parse("G133K80P") == Etiket.Parsed("33K80", "G1", "P", ""))
    assert(Etiket.parse("G133K80P001") ==
      Etiket.Parsed("33K80", "G1", "P", "001"))
  }

  test("Etiket.build null-guards every piece") {
    assert(Etiket.build(null, "R1", "N", "") == "R1N")
    assert(Etiket.build("_V710_", "R1", "N", null) == "R1_V710_N")
    assert(Etiket.build(null, null, null, null) == "")
  }

  test("CsvArrayCodec.parse maps an empty payload to an empty field") {
    val (flat, ni, nj) = CsvArrayCodec.parse("")
    assert(flat.isEmpty && ni == 0 && nj == 0)
    assert(CsvArrayCodec.parse("  ")._1.isEmpty)
  }

  test("Typvar flags parse/build") {
    assert(TypvarFlags.parse("PU").unitConverted)
    assert(TypvarFlags.parse("PM").multipleModifications)
    assert(!TypvarFlags.parse("P").zapped)
    assert(TypvarFlags.toTypvar2(true, false, false, false, false, false,
      false) == "Z")
    assert(TypvarFlags.toTypvar2(true, true, false, false, false, false,
      false) == "M")
    assert(TypvarFlags.toTypvar2(false, false, false, false, false, false,
      false) == "")
  }

  test("CsvArrayCodec parse/serialize round-trip with Fortran layout") {
    val (flat, ni, nj) = CsvArrayCodec.parse("11.5,22;33,44.5;55,66")
    assert(ni == 3 && nj == 2)
    // element (i=1, j=1) = 44.5 lives at Fortran index 1 + 1*3 = 4
    assert(flat(4) == 44.5f)
    assert(CsvArrayCodec.serialize(flat, ni, nj) == "11.5,22;33,44.5;55,66")
  }

  test("Constants datyp aliases") {
    assert(Constants.DatypDict(5) == "E")
    assert(Constants.DatypInverse("f") == 134)
    assert(Constants.fieldDtype(5, 32) == "float32")
    assert(Constants.fieldDtype(1, 64) == "float64")
    assert(Constants.fieldDtype(2, 1) == "uint32")
  }
}
