package graft.queries

/** The engine's complete query inventory — the driver contract surface.
  * COVERAGE.md maps each SURVEY.md §2 operator ID to its query name here. */
object Registry {
  val all: Seq[Q] = RefQueries.all ++ RelationalQueries.all ++ LlmQueries.all

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
