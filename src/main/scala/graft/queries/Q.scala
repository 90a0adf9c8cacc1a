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

/** One per-JVM scratch root for the write-path queries, removed on JVM
  * exit — repeated Bench/Verify invocations reuse it instead of leaking
  * a fresh temp dir per run.
  */
private[queries] object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  /** A fresh subdirectory under the shared root. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}
