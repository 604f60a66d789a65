package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the aggregation in SparkEntry is a plain
  * map union, so a duplicated query name across packs would SILENTLY
  * drop one implementation (an ADVICE_r1-class hazard), and a query
  * without an oracle would silently downgrade to a rows-only check.
  * These invariants make both drifts a test failure instead.
  */
class EntryContractSpec extends AnyFunSuite {

  test("no query name is defined by two packs") {
    val all = SparkEntry.packs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicated across packs: ${dups.mkString(", ")}")
  }

  test("no oracle name is defined by two packs") {
    val all = SparkEntry.packs.flatMap(_.oracles.keys)
    val dups = all.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicated across packs: ${dups.mkString(", ")}")
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).mkString(", ")}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).mkString(", ")}")
  }

  test("query names follow the gate naming convention") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("q[0-9a-z][0-9a-z]_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }
}
