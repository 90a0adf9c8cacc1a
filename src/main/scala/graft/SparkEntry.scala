package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EtlQueries, ExtendedQueries, PipelineQueries, Q, RelationalQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 (grading inventory)
  * and §7 (build plan). One `queries` entry per implemented operator;
  * `oracleSql` carries the DuckDB-equivalent SQL with identical column
  * names and ORDER BY.
  */
object SparkEntry {

  /** Every graded operator (SURVEY.md §2.1-§2.3). */
  val registry: Seq[Q] =
    EtlQueries.all ++ RelationalQueries.all ++ PipelineQueries.all ++
      ExtendedQueries.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way star join + aggregate (TPC-H Q5-flavored; SURVEY.md §2.2 #16).
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.starJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (catalog listing), which get the weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
