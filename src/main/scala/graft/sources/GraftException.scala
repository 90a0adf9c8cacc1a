package graft.sources

/** Typed error taxonomy mirroring the reference's exit codes
  * (reference: exit_codes.py:1-3 — 201 file-not-found, 202
  * invalid-credentials, 203 invalid-regex; mapped to failures at
  * move_file.py:143-151).
  *
  * Spark-native reading: these are thrown by the catalog/IO layer so a
  * driver program can map them back to the reference's process exit
  * codes if it wishes.
  */
sealed abstract class GraftException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause) {
  def exitCode: Int
}

object GraftException {
  val ExitFileNotFound = 201
  val ExitInvalidCredentials = 202
  val ExitInvalidRegex = 203

  /** Run a filesystem operation, translating the auth failures the
    * Hadoop clients raise (S3A surfaces HTTP 403 as
    * `java.nio.file.AccessDeniedException`; HDFS raises
    * `AccessControlException`) into the typed exit-202 failure — the
    * analog of the reference's credential-error mapping
    * (move_file.py:143-151).
    */
  private[sources] def translatingAuth[T](context: String)(body: => T): T =
    try body
    catch {
      case e: java.nio.file.AccessDeniedException =>
        throw InvalidCredentialsException(context, e)
      case e: org.apache.hadoop.security.AccessControlException =>
        throw InvalidCredentialsException(context, e)
    }
}

/** No object/dataset matched the requested name or pattern (exit 201). */
final case class DatasetNotFoundException(
    dir: String,
    pattern: String,
    cause: Throwable = null)
    extends GraftException(
      s"No dataset matching '$pattern' found under '$dir'",
      cause) {
  val exitCode: Int = GraftException.ExitFileNotFound
}

/** Credential / access failure against the filesystem (exit 202). */
final case class InvalidCredentialsException(
    detail: String,
    cause: Throwable = null)
    extends GraftException(s"Invalid credentials: $detail", cause) {
  val exitCode: Int = GraftException.ExitInvalidCredentials
}

/** The user-supplied regex failed to compile (exit 203). */
final case class InvalidPatternException(
    pattern: String,
    cause: Throwable = null)
    extends GraftException(s"Invalid regex pattern: '$pattern'", cause) {
  val exitCode: Int = GraftException.ExitInvalidRegex
}
