package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.meta.Lookups

/** Bundled dictionary tables (full CMC CSVs, parsed from resources).
  * Pins sizes, spot values, key uniqueness, and the accessor
  * semantics (scalar fallback; constants indexed file-verbatim).
  */
class LookupsSpec extends AnyFunSuite {

  test("dictionary tables load complete from bundled resources") {
    assert(Lookups.StdVar.size == 928)
    assert(Lookups.Units.size == 158)
    assert(Lookups.LevelTypes.size == 10)
    assert(Lookups.ThermoConstants.size == 7)
    assert(Lookups.StationsFb.size == 170)
    // join keys are unique — a duplicate would fan out broadcasts
    assert(Lookups.StdVar.map(_._1).distinct.size ==
      Lookups.StdVar.size)
    assert(Lookups.Units.map(_._1).distinct.size ==
      Lookups.Units.size)
  }

  test("spot values match the reference dictionary") {
    assert(Lookups.StdVar.find(_._1 == "TT").map(_._2).contains("celsius"))
    assert(Lookups.StdVar.find(_._1 == "O3").map(_._2).contains("dobson"))
    val knot = Lookups.Units.find(_._1 == "knot").get
    assert(knot._4 == 0.0 && knot._5 == 0.514444444)
    assert(Lookups.UnitsDims("knot") == Seq(0, 1, -1, 0, 0, 0, 0))
    assert(Lookups.LevelTypes.find(_._2 == 5).map(_._1).contains("HYBRID"))
  }

  test("get_unit_by_name falls back to scalar; constants verbatim") {
    assert(Lookups.getUnitByName("no_such_unit")._1 == "scalar")
    assert(Lookups.getUnitByName("celsius")._4 == 273.15)
    // names keep the file's literal single quotes (__init__.py:330)
    assert(Lookups.getConstantByName("'AEw1'").contains(6.1094))
    assert(Lookups.getConstantByName("'epsilon'")
      .contains(0.6219800221014))
    assert(Lookups.getConstantByName("AEw1").isEmpty)
  }
}
