package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator: the Spark implementation plus (when the
  * semantics are SQL-expressible) the DuckDB oracle with IDENTICAL
  * column names and ORDER BY (SURVEY.md §5).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
