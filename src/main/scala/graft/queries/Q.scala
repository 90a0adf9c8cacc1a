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

/** Scratch dirs for the write-path queries — one shared, configurable
  * root per session via [[graft.ScratchSpace]] (`spark.graft.scratch
  * .dir` → checkpoint dir → per-JVM local temp removed at exit). All
  * paths are Hadoop-FS URIs; queries must write through Spark or the
  * Hadoop FS helpers, never `java.nio`, so a cluster deployment can
  * point scratch at shared storage and every query stays correct.
  */
private[queries] object Scratch {

  /** A fresh qualified subdirectory under the session's scratch root. */
  def dir(s: SparkSession, prefix: String): String =
    graft.ScratchSpace.dir(s, prefix)
}
