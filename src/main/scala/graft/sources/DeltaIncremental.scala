package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming SOURCE over a Delta table's commit history — the
  * driver-polled, foreachBatch-composable wrap of
  * [[DeltaRead.readChanges]] that turns the batch version-range
  * consumption (q260) into a continuous lake→lake pipeline primitive.
  *
  * Exactly-once bookkeeping is Structured Streaming's own shape: one
  * marker file per PROCESSED version under `<checkpoint>/offsets/`,
  * written strictly AFTER `process` returns. A crash between the
  * sink's commit and the marker replays that version on the next
  * [[drain]] — which an idempotent sink (the
  * [[DeltaWrite.idempotentAppend]] pattern with appId = this
  * checkpoint's identity and txnVersion = the source version) no-ops,
  * closing the exactly-once loop end-to-end. Markers are
  * version-grain metadata (one tiny file per commit), never data.
  *
  * Each pending version feeds `process` separately (df carries
  * [[DeltaRead.readChanges]]'s `__commit_version` column), so sink
  * idempotence keys align 1:1 with source commits. Non-append
  * commits refuse exactly as readChanges does (pass `ignoreDeletes`
  * for retention-driven deletes); compaction commits
  * (dataChange=false) yield empty batches and still advance the
  * cursor — incremental consumers stay blind to OPTIMIZE, same rule
  * as q269. History cleaned below a checkpoint refuses loudly
  * (per-version attribution is gone), never silently skips.
  */
object DeltaIncremental {

  /** What one [[drain]] pass consumed. */
  final case class DrainReport(
      processedVersions: Seq[Long],
      alreadyDone: Long)

  /** Poll once: feed every table version NOT yet marked in
    * `checkpointDir` to `process` in ascending order, marking each
    * after it returns. Returns the versions processed this pass.
    * Call in a loop (or from a scheduler) for continuous consumption.
    */
  def drain(
      spark: SparkSession,
      tablePath: String,
      checkpointDir: String,
      process: (DataFrame, Long) => Unit,
      ignoreDeletes: Boolean = false): DrainReport = {
    val ckpt = new Path(checkpointDir)
    val fs = ckpt.getFileSystem(spark.sessionState.newHadoopConf())
    val offsets = new Path(fs.makeQualified(ckpt), "offsets")
    val re = "v(\\d{20})".r
    val done: Set[Long] =
      if (!fs.exists(offsets)) Set.empty
      else fs.listStatus(offsets).toSeq.map(_.getPath.getName)
        .collect { case re(n) => n.toLong }.toSet
    val pending = DeltaRead.versions(spark, tablePath)
      .filterNot(done).sorted
    pending.foreach { v =>
      val batch = DeltaRead.readChanges(spark, tablePath, v, Some(v),
        ignoreDeletes)
      process(batch, v)
      // the marker is the commit point of the source cursor: written
      // AFTER the sink saw the batch, so a crash replays (idempotent
      // sinks no-op), never skips
      graft.ScratchSpace.writeBytes(spark, checkpointDir,
        f"offsets/v$v%020d", Array.emptyByteArray)
    }
    DrainReport(pending, done.size.toLong)
  }
}
