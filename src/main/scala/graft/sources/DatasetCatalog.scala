package graft.sources

import java.util.regex.{Pattern, PatternSyntaxException}

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.sources.GraftException.translatingAuth

/** How a pattern selects datasets — the reference's
  * `source_file_name_match_type` choice (download_file.py:14-19), plus
  * shell-style globs for the upload blueprint's recursive tree walk
  * (upload_file.py:174-182).
  */
sealed trait MatchMode
object MatchMode {
  case object Exact extends MatchMode
  case object Regex extends MatchMode
  case object Glob extends MatchMode
}

/** One catalog entry (an object/dataset under a prefix). `name` is the
  * entry's dir-RELATIVE path for recursive listings (e.g. `sub/a.csv`),
  * the plain base name for flat ones.
  */
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
  * Auth failures from the underlying filesystem surface as the typed
  * exit-202 [[InvalidCredentialsException]].
  */
final class DatasetCatalog(spark: SparkSession) {

  private def fsFor(p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def toRef(st: FileStatus, name: String): DatasetRef =
    DatasetRef(
      path = st.getPath.toString,
      name = name,
      sizeBytes = st.getLen,
      isDirectory = st.isDirectory)

  /** Stream the entries under `dir` (non-recursive), page by page. */
  def list(dir: String): Iterator[DatasetRef] = {
    val p = new Path(dir)
    val fs = fsFor(p)
    translatingAuth(s"list $dir") {
      if (!fs.exists(p)) throw DatasetNotFoundException(dir, "<listing>")
    }
    val it = translatingAuth(s"list $dir")(fs.listStatusIterator(p))
    new Iterator[DatasetRef] {
      def hasNext: Boolean = translatingAuth(s"list $dir")(it.hasNext)
      def next(): DatasetRef = {
        val st = translatingAuth(s"list $dir")(it.next())
        toRef(st, st.getPath.getName)
      }
    }
  }

  /** Stream ALL files under `dir` recursively — the analog of the
    * reference upload's recursive two-star `{folder}` walk. Entry names are
    * dir-relative paths (`sub/inner/a.csv`); on S3A the recursive
    * variant is a single flat-prefix LIST stream, not a directory
    * walk, so deep trees with millions of objects page scalably.
    */
  def listRecursive(dir: String): Iterator[DatasetRef] = {
    val p = new Path(dir)
    val fs = fsFor(p)
    translatingAuth(s"list $dir") {
      if (!fs.exists(p)) throw DatasetNotFoundException(dir, "<listing>")
    }
    val rootUri = fs.makeQualified(p).toUri
    val it = translatingAuth(s"list $dir")(fs.listFiles(p, true))
    new Iterator[DatasetRef] {
      def hasNext: Boolean = translatingAuth(s"list $dir")(it.hasNext)
      def next(): DatasetRef = {
        val st = translatingAuth(s"list $dir")(it.next())
        val rel = rootUri.relativize(st.getPath.toUri).getPath
        toRef(st, rel)
      }
    }
  }

  /** Compile a user pattern, mapping syntax errors to the typed
    * invalid-regex failure (exit 203). Glob patterns are translated
    * to anchored regexes over '/'-separated relative paths first.
    */
  def compilePattern(pattern: String, mode: MatchMode = MatchMode.Regex): Pattern = {
    val regex = mode match {
      case MatchMode.Glob => PathUtil.globToRegex(pattern)
      case _ => pattern
    }
    try Pattern.compile(regex)
    catch {
      case e: PatternSyntaxException => throw InvalidPatternException(pattern, e)
    }
  }

  private def matcher(pattern: String, mode: MatchMode): String => Boolean =
    mode match {
      case MatchMode.Exact => _ == pattern
      case MatchMode.Regex =>
        val re = compilePattern(pattern, mode); s => re.matcher(s).find()
      case MatchMode.Glob =>
        val re = compilePattern(pattern, mode); s => re.matcher(s).matches()
    }

  /** Select datasets under `dir` by exact name, regex (find-anywhere)
    * or glob over entry names. Throws the typed not-found failure
    * (exit 201) when nothing matches, like the reference's empty-match
    * exit paths. Results are name-sorted so multi-match enumeration is
    * deterministic.
    */
  def select(dir: String, pattern: String, mode: MatchMode): Seq[DatasetRef] = {
    val m = matcher(pattern, mode)
    val matched = list(dir).filter(r => m(r.name)).toSeq
    if (matched.isEmpty) throw DatasetNotFoundException(dir, pattern)
    matched.sortBy(_.name)
  }

  /** Select recursively: patterns match the dir-RELATIVE path of every
    * file in the tree, so `**&#47;*.csv`-style globs (or regexes over
    * subdirectories) express the reference upload's recursive
    * selection. Exit-201/203 semantics as [[select]].
    */
  def selectRecursive(
      dir: String,
      pattern: String,
      mode: MatchMode): Seq[DatasetRef] = {
    val m = matcher(pattern, mode)
    val matched = listRecursive(dir).filter(r => m(r.name)).toSeq
    if (matched.isEmpty) throw DatasetNotFoundException(dir, pattern)
    matched.sortBy(_.name)
  }
}
