package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every declared query carries a DuckDB
  * oracle (no silent fallback to the weaker rows-only check), and no
  * oracle is orphaned.
  */
class ContractSpec extends AnyFunSuite {

  test("every declared query has an oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${o -- q}")
  }

  test("query names are driver-safe") {
    // parquet-directory + JSON-key safe, stable sort order
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), n)
    }
  }
}
