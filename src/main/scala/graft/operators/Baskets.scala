package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — which items appear together in
  * the same basket (order, session, document) more than their solo
  * popularity predicts.
  *
  * Support counts are exact integers; lift = n_co·N / (n_a·n_b) is one
  * final float division per surviving pair, so the readout hash-matches
  * across engines.
  *
  * Scale shape: baskets are first reduced to DISTINCT (basket, item)
  * rows (one partial-agg shuffle), then pairs come from a self-join on
  * the BASKET key — per-basket work is lines², and real basket sizes
  * are small constants (TPC-H orders average ~4 lines), so the pair
  * volume is a small multiple of the fact table, never n². Item
  * supports broadcast onto the pair aggregate. A degenerate giant
  * basket (one key with thousands of items) is the failure mode to
  * guard: `maxBasket` FAILS the job loudly (require) rather than
  * enumerating quadratic pairs — raise the cap deliberately or
  * pre-filter oversized baskets before calling.
  */
object Baskets {

  /** A co-occurrence run's result plus the handle that releases the
    * cached (basket, item) frame once the result is materialized —
    * the Funnel/Dedup convention; without it a long-lived session
    * accumulates one cached frame per call.
    */
  final class CooccurrenceRun private[operators] (
      val result: DataFrame,
      items: DataFrame) {
    def release(): Unit = { items.unpersist(): Unit }
  }

  /** NOTE: leaves the distinct (basket, item) frame cached (it backs
    * the guard action, supports, and the pair join). Sessions that
    * mine many basket sets should use [[cooccurrenceRun]] and
    * `release()` after materializing the result.
    */
  def cooccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      topK: Int,
      maxBasket: Int = 1000): DataFrame =
    cooccurrenceRun(df, basketCol, itemCol, topK, maxBasket).result

  /** [[cooccurrence]] with the cache-release handle. */
  def cooccurrenceRun(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      topK: Int,
      maxBasket: Int = 1000): CooccurrenceRun = {
    require(topK >= 1, "topK must be >= 1")
    val items = graft.SparkUtil.ensureParallelism(df)
      .select(col(basketCol).cast("long").as("basket"),
        col(itemCol).cast("long").as("item"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one pass over basket sizes answers both the guard and the
    // basket count — a single driver action, not two
    val stats = items.groupBy("basket").agg(count(lit(1)).as("bsz"))
      .agg(max(col("bsz")).as("mx"), count(lit(1)).as("nb")).head()
    require(stats.isNullAt(0) || stats.getLong(0) <= maxBasket,
      s"a basket exceeds maxBasket=$maxBasket items — its quadratic " +
        "pair expansion would dominate the join; raise the cap " +
        "deliberately or pre-filter the basket")
    val nBaskets = stats.getLong(1)
    val supports = items.groupBy("item").agg(count(lit(1)).as("supp"))
    val pairs = items.select(col("basket"), col("item").as("item_a"))
      .join(items.select(col("basket"), col("item").as("item_b")), "basket")
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_co"))
    val result = pairs
      .join(broadcast(supports.select(col("item").as("item_a"),
        col("supp").as("supp_a"))), "item_a")
      .join(broadcast(supports.select(col("item").as("item_b"),
        col("supp").as("supp_b"))), "item_b")
      .select(
        col("item_a"), col("item_b"), col("n_co"),
        col("supp_a"), col("supp_b"),
        graft.functions.Numerics.fix4(
          col("n_co").cast("double") * lit(nBaskets).cast("double") /
            (col("supp_a").cast("double") * col("supp_b").cast("double")))
          .as("lift"))
      .orderBy(col("n_co").desc, col("item_a"), col("item_b"))
      .limit(topK)
    new CooccurrenceRun(result, items)
  }
}
