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
}
