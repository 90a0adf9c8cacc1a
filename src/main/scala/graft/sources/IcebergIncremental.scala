package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Streaming SOURCE over an Iceberg table's snapshot history — the
  * [[DeltaIncremental]] twin for the other format, wrapping
  * [[IcebergRead.readIncremental]] as a driver-polled,
  * foreachBatch-composable source with exactly-once snapshot
  * bookkeeping: one marker file per PROCESSED snapshot under
  * `<checkpoint>/offsets/`, written strictly AFTER `process` returns,
  * so a crash between sink commit and marker replays the snapshot —
  * which an idempotent sink no-ops.
  *
  * The FIRST snapshot of a table has no predecessor to diff against:
  * its batch is the full read AT that snapshot (tagged
  * `__snapshot_id` like every other batch). Later snapshots feed the
  * strict pure-append file-diff read — snapshots introducing deletes
  * or dropping files refuse loudly, exactly as readIncremental does.
  * A pending snapshot whose predecessor was EXPIRED refuses too
  * (attribution is gone): size snapshot retention to the consumer's
  * lag, the same contract real engines document.
  */
object IcebergIncremental {

  /** What one [[drain]] pass consumed. */
  final case class DrainReport(
      processedSnapshots: Seq[Long],
      alreadyDone: Long)

  /** Poll once: feed every snapshot NOT yet marked in
    * `checkpointDir` to `process` in table order, marking each after
    * it returns.
    */
  def drain(
      spark: SparkSession,
      tablePath: String,
      checkpointDir: String,
      process: (DataFrame, Long) => Unit): DrainReport = {
    val ckpt = new Path(checkpointDir)
    val fs = ckpt.getFileSystem(spark.sessionState.newHadoopConf())
    val offsets = new Path(fs.makeQualified(ckpt), "offsets")
    val re = "s(\\d{20})".r
    val done: Set[Long] =
      if (!fs.exists(offsets)) Set.empty
      else fs.listStatus(offsets).toSeq.map(_.getPath.getName)
        .collect { case re(n) => n.toLong }.toSet
    // COMMIT order, never id order (external snapshot ids are
    // arbitrary longs)
    val ids = IcebergRead.snapshotsInCommitOrder(spark, tablePath)
    val pending = ids.filterNot(done)
    pending.foreach { id =>
      val idx = ids.indexOf(id)
      val batch =
        if (idx == 0)
          IcebergRead.read(spark, tablePath, Some(id))
            .withColumn("__snapshot_id", lit(id))
        else
          IcebergRead.readIncremental(spark, tablePath,
            afterSnapshotId = ids(idx - 1), toSnapshotId = Some(id))
      process(batch.select(batch.columns.map(col): _*), id)
      graft.ScratchSpace.writeBytes(spark, checkpointDir,
        f"offsets/s$id%020d", Array.emptyByteArray)
    }
    DrainReport(pending, done.size.toLong)
  }
}
