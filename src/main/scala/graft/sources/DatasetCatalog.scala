package graft.sources

import java.util.regex.{Pattern, PatternSyntaxException}

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** How a pattern selects datasets — the reference's
  * `source_file_name_match_type` choice (download_file.py:14-19).
  */
sealed trait MatchMode
object MatchMode {
  case object Exact extends MatchMode
  case object Regex extends MatchMode
}

/** One catalog entry (an object/dataset under a prefix). */
final case class DatasetRef(
    path: String,
    name: String,
    sizeBytes: Long,
    isDirectory: Boolean)

/** Scalable dataset/object listing and selection.
  *
  * The Spark-native analog of the reference's paginated
  * `list_objects_v2` loop (`find_all_s3_file_names`,
  * download_file.py:167-216): `FileSystem.listStatusIterator` streams
  * pages of file statuses (on S3A each page is one LIST call), so a
  * prefix with millions of objects never materializes fully on the
  * driver — selection is applied lazily per page. This also does not
  * reproduce the reference's page-2 bug (download_file.py:210, where the
  * list is clobbered by `append`'s None return on pagination).
  *
  * Regex selection uses find-anywhere (`re.search`) semantics to match
  * the reference's `find_all_file_matches` (download_file.py:219-228).
  */
final class DatasetCatalog(spark: SparkSession) {

  private def fsFor(p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def toRef(st: FileStatus): DatasetRef =
    DatasetRef(
      path = st.getPath.toString,
      name = st.getPath.getName,
      sizeBytes = st.getLen,
      isDirectory = st.isDirectory)

  /** Stream the entries under `dir` (non-recursive), page by page. */
  def list(dir: String): Iterator[DatasetRef] = {
    val p = new Path(dir)
    val fs = fsFor(p)
    if (!fs.exists(p)) throw DatasetNotFoundException(dir, "<listing>")
    val it = fs.listStatusIterator(p)
    new Iterator[DatasetRef] {
      def hasNext: Boolean = it.hasNext
      def next(): DatasetRef = toRef(it.next())
    }
  }

  /** Compile a user pattern, mapping syntax errors to the typed
    * invalid-regex failure (exit 203).
    */
  def compilePattern(pattern: String): Pattern =
    try Pattern.compile(pattern)
    catch {
      case e: PatternSyntaxException => throw InvalidPatternException(pattern, e)
    }

  /** Select datasets under `dir` by exact name or regex (find-anywhere).
    * Throws the typed not-found failure (exit 201) when nothing matches,
    * like the reference's empty-match exit paths.
    * Results are name-sorted so multi-match enumeration is deterministic.
    */
  def select(dir: String, pattern: String, mode: MatchMode): Seq[DatasetRef] = {
    val matched = mode match {
      case MatchMode.Exact =>
        list(dir).filter(_.name == pattern).toSeq
      case MatchMode.Regex =>
        val re = compilePattern(pattern)
        list(dir).filter(r => re.matcher(r.name).find()).toSeq
    }
    if (matched.isEmpty) throw DatasetNotFoundException(dir, pattern)
    matched.sortBy(_.name)
  }
}
