package graft

import graft.queries.Registry

/** Contract guards over the driver surface: the registry, its oracles, and
  * the coverage documentation stay in sync. */
class RegistrySpec extends SparkSpec {

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

  // Outputs that legitimately KEEP a wide decimal column, each with the
  // reason the driver's value hash still agrees: none today — every
  // unbounded-integer output (graph_hits scores, sample_pps cum_w, the
  // uint256 sums) projects the oracle-facing column as a decimal STRING,
  // because Spark DECIMAL(38,x) and DuckDB HUGEINT canonicalize
  // differently in some hash harnesses while the digit string is
  // representation-proof. Add a name here ONLY with a comment proving the
  // driver hash was observed green on the wide type.
  private val wideDecimalWhitelist: Set[String] = Set()

  test("no query output schema carries a driver-fragile wide decimal") {
    // The r8/r10 lesson, promoted to a compile-time-ish gate: a bare
    // DECIMAL(p>18) output column hash-mismatches in the driver harness
    // even when rows, schema, and DuckDB-typed values are all exact
    // (sample_pps went red the commit cum_w widened to DECIMAL(38,0)).
    // Building the DataFrame is enough — schemas resolve at plan time.
    val dir = "/root/testdata/sf0.001"
    val offenders = Registry.all
      .filterNot(q => wideDecimalWhitelist.contains(q.name))
      .flatMap { q =>
        val wide = q.fn(spark, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]
            && f.dataType.asInstanceOf[org.apache.spark.sql.types.DecimalType].precision > 18 =>
            s"${f.name}:${f.dataType.sql}"
        }
        if (wide.isEmpty) None else Some(s"${q.name}(${wide.mkString(", ")})")
      }
    assert(offenders.isEmpty,
      s"wide-decimal output columns (stringify them or whitelist with proof): ${offenders.mkString("; ")}")
  }
}
