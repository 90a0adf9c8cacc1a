package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Raised when a lake table commit targets an object store whose
  * filesystem contract cannot make the create-exclusive commit rule
  * atomic (raw S3: check-then-create) and the deployment has not
  * acknowledged single-writer operation. Typed so drivers can map it
  * distinctly from data errors.
  */
final class UnsafeCommitStoreException(msg: String)
    extends IllegalStateException(msg)

/** Commit-safety statement for the lake writers ([[DeltaWrite]],
  * [[IcebergWrite]]) — the S3A story, stated in CODE instead of a
  * buried comment: both formats' commit rule is the atomic
  * CREATE-EXCLUSIVE of the next version file, which is atomic on
  * HDFS-class filesystems but CHECK-THEN-CREATE on raw S3 (no
  * conditional PUT through the Hadoop FS API), so two committers from
  * separate processes can both "win" one version and one commit's
  * actions silently vanish. Exactly the constraint delta-io documents
  * for S3 without a coordinating LogStore, and why Iceberg's
  * filesystem tables require a lock facility on S3.
  *
  * Policy: commits to `s3a://`/`s3://`/`s3n://` table roots REFUSE
  * with a typed [[UnsafeCommitStoreException]] unless the deployment
  * declares single-writer-per-table operation by setting
  * `spark.graft.lake.s3a.singleWriter=true` — the documented contract
  * under which the commit rule is safe (no second committer exists to
  * race). A conditional-PUT commit adapter would lift this; until
  * one exists, refusal beats silent lost commits.
  */
object LakeCommit {

  /** The deployment's single-writer acknowledgement. */
  val SingleWriterAckKey = "spark.graft.lake.s3a.singleWriter"

  private val NonAtomicSchemes = Set("s3a", "s3", "s3n")

  /** Refuse object-store commits without the single-writer
    * acknowledgement; no-op everywhere else.
    */
  def gate(spark: SparkSession, root: Path): Unit = {
    val scheme = Option(root.toUri.getScheme).getOrElse("file")
      .toLowerCase(java.util.Locale.ROOT)
    if (NonAtomicSchemes(scheme) &&
      !spark.conf.getOption(SingleWriterAckKey).contains("true"))
      throw new UnsafeCommitStoreException(
        s"lake commit to $root refused: $scheme has no atomic " +
          "create-exclusive, so concurrent committers from separate " +
          "processes can silently lose commits. Set " +
          s"$SingleWriterAckKey=true to declare single-writer-per-" +
          "table operation (the documented S3 deployment contract), " +
          "or commit through an HDFS-class filesystem")
  }
}
