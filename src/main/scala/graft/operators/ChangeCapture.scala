package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge-apply: fold a changelog (upserts + deletes) into a base
  * snapshot — the batch MERGE a warehouse runs per ingestion cycle.
  *
  * Scale shape: one window shuffle of the CHANGELOG by key (the
  * changelog is the small, recent side; the base is never windowed),
  * then one key-partitioned anti join against the base. Both stages
  * hash by the merge key, so AQE reuses the partitioning; the base
  * table streams through exactly once. Snapshot-vs-changelog is the
  * 100 TB shape where base ≫ changes per cycle.
  */
object ChangeCapture {

  /** Apply `changes` to `base`: per key, the LATEST change (by
    * `seqCols` descending) wins — a delete op removes the key, any
    * other op replaces the base row with the change's payload
    * (projected to base's columns). Keys untouched by the changelog
    * keep their base row.
    *
    * `seqCols` precondition: (key, seqCols) SHOULD be unique — a CDC
    * log's sequence number exists to totally order each key's changes.
    * If a changelog nevertheless carries duplicate (key, seq) rows, the
    * winner is still deterministic (never run-to-run random): ties
    * break on a stable hash of the full change row, appended below as
    * the last sort key. Callers who care which duplicate wins must fix
    * their sequence column, not rely on the hash order.
    */
  def mergeApply(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCols: Seq[String],
      opCol: String,
      deleteOp: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(seqCols.map(col(_).desc) :+
        xxhash64(changes.columns.map(col).toIndexedSeq: _*).desc: _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val untouched =
      base.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
    val upserts = latest
      .where(col(opCol) =!= deleteOp)
      .select(base.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(upserts)
  }

  /** Out-of-order-safe (versioned) MERGE: like [[mergeApply]], but the
    * base snapshot CARRIES its own `seqCols` and a change only wins
    * when it is strictly NEWER than the stored row — stale upserts AND
    * stale deletes are no-ops.
    *
    * Split-invariance (apply(b2) ∘ apply(b1) = apply(b1 ∪ b2) for ANY
    * batch split/order) needs the snapshot to REMEMBER deletions:
    * pass `tombstoneCol` (a boolean column the base carries) and a
    * winning delete KEEPS the key as a tombstoned row (resurrectable
    * only by a strictly newer upsert) — the Cassandra/Delta retention
    * model; readers filter `!tombstone`. Without it, a hard delete
    * erases the key's version and a LATER-ARRIVING stale upsert would
    * re-insert it — so the no-tombstone mode is split-invariant only
    * while deletes are each key's final change.
    *
    * Scale shape: one window shuffle of the changelog by key (small,
    * recent side), then ONE full-outer hash join with the base on the
    * merge key — the base streams through exactly once, no base-side
    * window. Output schema = base schema.
    */
  def mergeApplyVersioned(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCols: Seq[String],
      opCol: String,
      deleteOp: String,
      tombstoneCol: Option[String] = None): DataFrame = {
    tombstoneCol.foreach(tc => require(base.columns.contains(tc),
      s"base must carry the tombstone column '$tc'"))
    val payloadCols = base.columns
      .filter(c => c != keyCol && !tombstoneCol.contains(c))
    val w = Window.partitionBy(keyCol)
      .orderBy(seqCols.map(col(_).desc) :+
        xxhash64(changes.columns.map(col).toIndexedSeq: _*).desc: _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(
        (keyCol +: seqCols).map(c => col(c).as(s"__c_$c")) ++
          Seq(col(opCol).as("__c_op")) ++
          payloadCols.filterNot(seqCols.contains)
            .map(c => col(c).as(s"__p_$c")): _*)
    // change is newer <=> its seq tuple sorts strictly above the base's
    // (struct comparison = lexicographic on seqCols, null-safe via the
    // outer-join null checks below)
    val changeSeq = struct(seqCols.map(c => col(s"__c_$c")): _*)
    val baseSeq = struct(seqCols.map(col): _*)
    val joined = base.join(
      latest, col(keyCol) === col(s"__c_$keyCol"), "full_outer")
    val changeWins =
      col(s"__c_$keyCol").isNotNull &&
        (col(keyCol).isNull || changeSeq > baseSeq)
    val isDelete = col("__c_op") === deleteOp
    val merged = tombstoneCol match {
      case None =>
        joined
          .where(!(changeWins && isDelete)) // winning delete drops the key
          .where(col(keyCol).isNotNull || !isDelete) // insert-delete: no row
      case Some(_) => joined // every key keeps a row; deletes tombstone it
    }
    merged.select(base.columns.map { c =>
      val fromChange =
        if (c == keyCol) col(s"__c_$keyCol")
        else if (seqCols.contains(c)) col(s"__c_$c")
        else if (tombstoneCol.contains(c)) isDelete
        else col(s"__p_$c")
      when(changeWins, fromChange).otherwise(col(c)).as(c)
    }.toIndexedSeq: _*)
  }

  /** Keyed snapshot diff — the data-diff gate run before publishing a
    * regenerated table ("what actually changed vs the last snapshot?"):
    * per-key fingerprints of the compared columns, ONE full-outer join
    * on the key, and a 4-row status rollup
    * (added / removed / changed / unchanged).
    *
    * Fingerprints are md5 over '|'-joined column strings with nulls
    * encoded as a SOH (\\u0001) sentinel (DuckDB: chr(1)), so null vs
    * empty-string never collide and both engines derive the identical
    * digest. Callers compare
    * string/integer columns (floating-point columns would need a
    * canonical formatting contract first). Both snapshots reduce to
    * (key, 16-byte fingerprint) before the join — the 100 TB shape:
    * the join ships digests, never row payloads.
    * Output: (status, n).
    */
  /** SCD type-2 history build — turn an upsert changelog into the
    * warehouse dimension shape (one row per key-version with
    * `valid_from` / `valid_to` / `is_current`): consecutive changes
    * that don't alter the tracked attributes collapse into one
    * version, then validity intervals chain each version to the next.
    *
    * Determinism: versions order by (`tsCol`, `tieCol`) — the tie
    * column (a unique event/sequence id) makes same-timestamp changes
    * reproducible in any engine. No-change detection compares the
    * tracked attributes null-safely via the same SOH-sentinel
    * fingerprint as [[snapshotDiff]].
    *
    * Scale shape: ONE shuffle of the changelog by key; both windows
    * (the lag that marks changes, the lead that chains intervals)
    * share the (key, ts, tie) sort, so Spark plans a single Exchange +
    * Sort with two Window operators on top. Output is linear in the
    * number of genuine attribute changes, never in changelog volume.
    * `is_current` is an int (1/0), not boolean, for cross-engine
    * column compares. Output: (keyCol, attrCols…, valid_from,
    * valid_to NULLABLE, is_current).
    */
  def scd2(
      changelog: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val fp = md5(concat_ws("|", attrCols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0001"))): _*))
    val marked = graft.SparkUtil.ensureParallelism(changelog)
      .withColumn("__fp", fp)
      .withColumn("__changed",
        lag(col("__fp"), 1).over(w).isNull ||
          lag(col("__fp"), 1).over(w) =!= col("__fp"))
    marked.where(col("__changed"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(
        (col(keyCol) +: attrCols.map(col)) ++ Seq(
          col(tsCol).as("valid_from"),
          col("valid_to"),
          when(col("valid_to").isNull, 1).otherwise(0).as("is_current")
        ): _*)
  }

  def snapshotDiff(
      base: DataFrame,
      next: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one column to compare")
    def fp(df: DataFrame, out: String) =
      graft.SparkUtil.ensureParallelism(df).select(
        col(keyCol).as("__k"),
        md5(concat_ws("|", compareCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0001"))): _*)).as(out))
    fp(base, "__fb").join(fp(next, "__fn"), Seq("__k"), "full_outer")
      .select(
        when(col("__fb").isNull, "added")
          .when(col("__fn").isNull, "removed")
          .when(col("__fb") === col("__fn"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"))
  }
}
