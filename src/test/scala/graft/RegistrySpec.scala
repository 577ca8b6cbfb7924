package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Contract guards over the driver surface: the registry, its oracles, and
  * the coverage documentation stay in sync. */
class RegistrySpec extends AnyFunSuite {

  test("every registered query is named in COVERAGE.md") {
    val cov = scala.io.Source.fromFile("COVERAGE.md", "UTF-8").mkString
    val missing = Registry.queries.keySet.filterNot(cov.contains)
    assert(missing.isEmpty,
      s"COVERAGE.md does not mention: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every query has a DuckDB oracle (0 rows-only checks)") {
    val missing = Registry.queries.keySet -- Registry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
