package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Deterministic stratified sampling for training-data curation:
  * per-stratum rates applied via a content hash, so the sample is
  * reproducible across runs, engines and cluster sizes (unlike
  * `df.sample`, whose output depends on partitioning). Pure map-side —
  * no shuffle; the filter is a codegen'd hash comparison pushed to the
  * scan.
  */
object Sampling {

  /** Keep a row when md5-derived `hash60(seed|id) mod 1000` falls under
    * the stratum's permille rate. Unmatched strata default to
    * `defaultPermille`.
    */
  def stratifiedByHash(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      permilleByStratum: Map[String, Int],
      defaultPermille: Int,
      seed: Int = 0): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (s, p)) => when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.where(
      pmod(Hashes.hash60(col(idCol).cast("string"), seed), lit(1000)) < rate)
  }

  /** Importance (weighted) sampling — the data-mixing primitive: keep
    * each row with probability `weight` ∈ [0, 1] (floored to permille),
    * decided by the id's hash so the sample is reproducible across
    * runs, engines and cluster sizes. Pure map-side filter; the weight
    * may be any deterministic Column (source quality, mixture rate).
    */
  def weightedByHash(
      df: DataFrame,
      idCol: String,
      weight: Column,
      seed: Int = 0): DataFrame =
    df.where(
      pmod(Hashes.hash60(col(idCol).cast("string"), seed), lit(1000))
        < floor(weight * 1000.0))

  /** Deterministic training-order shuffle: global order by the
    * md5-derived hash of the id (tie-broken by id) — reproducible
    * across runs, engines and cluster sizes, unlike `orderBy(rand())`.
    * The sort is a range-partitioned distributed sort; downstream
    * sharded writes preserve the order per shard.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Int = 0): DataFrame =
    df.orderBy(Hashes.hash60(col(idCol).cast("string"), seed), col(idCol))

  /** Keep at most `k` rows per key, deterministically ordered by
    * (orderCol, tieCol) — the per-domain/per-user cap a web-scale
    * curation pipeline applies so no single source dominates training
    * data. One shuffle by key + one window pass (rows sort within their
    * key's partition; no global sort).
    */
  def capPerKey(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Concatenation-packing boundary map — the sequence bookkeeping of
    * LLM pretraining packing: documents are laid out in the
    * deterministic [[deterministicShuffle]] order and cut into fixed
    * `seqLen`-token training sequences, documents crossing sequence
    * boundaries (GPT-style concatenation). For each doc: its global
    * start offset in the token stream, the first and last sequence
    * index it touches, and how many sequences it spans. `tokensCol` is
    * any caller-supplied exact count (word tokens, chars, BPE counts).
    *
    * Scale shape — a DISTRIBUTED prefix sum, never a single-partition
    * window: rows range-partition by the order key, each partition
    * cumsums locally (one window keyed by the physical partition id),
    * and the per-partition totals — ONE row per partition — prefix-sum
    * on the driver-sized side and broadcast back. The output is
    * independent of where the sampled range bounds fall, so the
    * sequence map is reproducible across runs, engines and cluster
    * sizes. Output: (idCol, n_tokens, start_offset, first_seq,
    * last_seq, n_seqs).
    */
  /** [[packingMap]]'s result plus the handle releasing the cached
    * cumsum rows (see the persistence note there).
    */
  final class PackingMapRun private[operators] (
      val result: DataFrame,
      local: DataFrame) {
    def release(): Unit = { local.unpersist(): Unit }
  }

  /** Convenience form: materializes the packing map via a
    * scratch-parquet round-trip (executor-loss-safe, unlike
    * localCheckpoint) and releases the cached cumsum rows
    * immediately — repeated calls cannot accumulate executor cache.
    * Use [[packingMapRun]] + `release()` to keep the lineage instead.
    */
  def packingMap(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      seqLen: Long,
      seed: Int = 0): DataFrame = {
    val run = packingMapRun(df, idCol, tokensCol, seqLen, seed)
    val out = graft.ScratchSpace.materialize(run.result, "packing_map_")
    run.release()
    out
  }

  def packingMapRun(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      seqLen: Long,
      seed: Int = 0): PackingMapRun = {
    require(seqLen >= 1, "seqLen must be >= 1")
    // PERSISTED like Layout.skippingAuditRun (the round-12 rank trap):
    // repartitionByRange samples boundaries per execution and
    // spark_partition_id() blocks exchange reuse, so the un-persisted
    // prefix branch could see a DIFFERENT partitioning than the join
    // branch and the __pid equi-join would silently drop partitions.
    val local = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), col(tokensCol).cast("long").as("n_tokens"),
        Hashes.hash60(col(idCol).cast("string"), seed).as("__ord"))
      .where(col("n_tokens") > 0)
      .repartitionByRange(col("__ord"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__e", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__pid").orderBy(col("__ord"), col(idCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wPre = org.apache.spark.sql.expressions.Window
      .orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // one row per partition: the global window here is over ~#partitions
    // rows, not data
    val prefix = local.groupBy("__pid").agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__pre", coalesce(sum(col("__tot")).over(wPre), lit(0L)))
      .select(col("__pid"), col("__pre"))
    val result = local.join(broadcast(prefix), "__pid")
      .select(col(idCol), col("n_tokens"),
        (col("__e") + col("__pre") - col("n_tokens")).as("start_offset"),
        (col("__e") + col("__pre")).as("__end"))
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        expr(s"start_offset DIV ${seqLen}L").as("first_seq"),
        expr(s"(__end - 1) DIV ${seqLen}L").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
    new PackingMapRun(result, local)
  }

  /** Temperature-based mixture reweighting — the sampling-weight table
    * a multi-source training mix is built from: per-group counts c_g
    * flatten through w_g = c_g^α / Σ c^α (α < 1 upweights small
    * sources — the multilingual "temperature sampling" rule), and
    * `sampling_factor` = w_g·N/c_g is the per-group up/down-sampling
    * rate that realizes the mix. α = 0.5 computes via sqrt (correctly
    * rounded per IEEE 754, so cross-engine exact); other α use pow.
    * One count aggregate to |groups| rows; everything after is
    * group-table-sized. Output: (groupCol, n_docs, weight,
    * sampling_factor).
    */
  def mixtureWeights(
      df: DataFrame,
      groupCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = graft.SparkUtil.ensureParallelism(df)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val powed =
      if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
      else pow(col("n_docs").cast("double"), alpha)
    val t = counts.withColumn("__w", powed)
    val tot = t.agg(sum(col("__w")).as("__tw"), sum(col("n_docs")).as("__tn"))
    t.join(broadcast(tot))
      .select(col(groupCol), col("n_docs"),
        graft.functions.Numerics.fix4(col("__w") / col("__tw")).as("weight"),
        graft.functions.Numerics.fix4(
          col("__w") / col("__tw") * col("__tn") / col("n_docs"))
          .as("sampling_factor"))
  }

  /** Token-budget mixture plan — [[mixtureWeights]]' temperature rule
    * priced against a CONCRETE training-token budget (the
    * data-constrained-scaling planning step): per source, the
    * available tokens a_g, the temperature weight w_g = a_g^α / Σ a^α
    * (token-mass grain, not doc grain — the unit the budget is
    * spent in), the token quota round(w_g·B), and `epochs` =
    * quota/a_g — the how-many-passes-over-this-source number that
    * decides whether the mix repeats data past useful reuse.
    * `over_cap` flags sources whose quota exceeds `maxEpochs` passes
    * (the caller rebalances or accepts repetition decay). One token
    * aggregate to |sources| rows; everything after is
    * source-table-sized. Weights are sqrt-derived (the q114
    * float-sum-safe irrational class); epochs is ONE division of
    * exact integer-valued doubles.
    *
    * Output: (groupCol, avail_tokens, weight fix4, quota_tokens,
    * epochs fix4, over_cap).
    */
  def tokenBudgetPlan(
      df: DataFrame,
      groupCol: String,
      tokensCol: String,
      budget: Long,
      alpha: Double = 0.5,
      maxEpochs: Double = 4.0): DataFrame = {
    require(budget >= 1, "budget must be >= 1 token")
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val avail = graft.SparkUtil.ensureParallelism(df)
      .groupBy(col(groupCol))
      .agg(sum(col(tokensCol).cast("long")).as("avail_tokens"))
    val powed =
      if (alpha == 0.5) sqrt(col("avail_tokens").cast("double"))
      else pow(col("avail_tokens").cast("double"), alpha)
    val t = avail.withColumn("__w", powed)
    val tot = t.agg(sum(col("__w")).as("__tw"))
    t.join(broadcast(tot))
      .withColumn("quota_tokens",
        floor(col("__w") / col("__tw") * budget + 0.5).cast("long"))
      .select(col(groupCol), col("avail_tokens"),
        graft.functions.Numerics.fix4(col("__w") / col("__tw"))
          .as("weight"),
        col("quota_tokens"),
        graft.functions.Numerics.fix4(
          col("quota_tokens").cast("double") /
            col("avail_tokens").cast("double")).as("epochs"),
        (col("quota_tokens").cast("double") >
          lit(maxEpochs) * col("avail_tokens").cast("double"))
          .as("over_cap"))
  }

  /** Length-bucket padding audit — prices the padding waste of
    * fixed-shape batching (the inference-serving and non-packed-
    * training counterpart of [[packingMap]]'s zero-pad packing): each
    * document lands in the smallest cap in `caps` that holds it
    * (docs longer than the largest cap TRUNCATE to it — reported, not
    * hidden), and per bucket the audit reports real vs padded tokens.
    * A pad_frac near 0.5 says half the batch FLOPs are spent on pad
    * tokens — the number that justifies switching to packing or
    * adding a bucket. PURE INTEGER arithmetic except the single
    * pad_frac division (exact integer-valued doubles); the bucket
    * rule is a CASE ladder over the caller's caps, not a float log2,
    * so both engines bucket identically at exact boundaries.
    *
    * Output: (bucket_cap, n_docs, real_tokens, pad_tokens, pad_frac
    * fix4, truncated_tokens), one row per non-empty bucket.
    */
  def paddingAudit(
      df: DataFrame,
      tokensCol: String,
      caps: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096))
      : DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted && caps.distinct == caps,
      "caps must be a sorted list of distinct positive lengths")
    require(caps.head >= 1, "caps must be positive")
    val n = col(tokensCol).cast("long")
    val maxCap = caps.last.toLong
    val bucket = caps.init.reverse.foldLeft(lit(maxCap)) {
      case (acc, c) => when(n <= c, lit(c.toLong)).otherwise(acc)
    }
    val kept = least(n, lit(maxCap)) // tokens that fit the largest cap
    graft.SparkUtil.ensureParallelism(df)
      .select(bucket.as("bucket_cap"), n.as("__n"), kept.as("__kept"))
      .groupBy("bucket_cap")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__kept")).as("real_tokens"),
        (count(lit(1)) * col("bucket_cap") - sum(col("__kept")))
          .as("pad_tokens"),
        graft.functions.Numerics.fix4(
          (count(lit(1)) * col("bucket_cap") - sum(col("__kept")))
            .cast("double") /
            (count(lit(1)) * col("bucket_cap")).cast("double"))
          .as("pad_frac"),
        sum(col("__n") - col("__kept")).as("truncated_tokens"))
      .orderBy("bucket_cap")
  }

  /** Deterministic train/val/test assignment: the md5 permille of the
    * id decides the split, so membership is stable under reshuffling,
    * re-partitioning and incremental reruns — the property a training
    * pipeline needs so examples never migrate between splits. A pure
    * (map-side) column expression.
    */
  def splitColumn(
      id: Column,
      trainPermille: Int = 800,
      valPermille: Int = 100,
      seed: Int = 0): Column = {
    val h = pmod(Hashes.hash60(id.cast("string"), seed), lit(1000))
    when(h < trainPermille, lit("train"))
      .when(h < trainPermille + valPermille, lit("val"))
      .otherwise(lit("test"))
  }

  /** Leakage-safe (group-atomic) split: the split is decided by the
    * md5 permille of the GROUP id, so every member of a group — in the
    * flagship use, a near-dup cluster from
    * [[Dedup.clustersFromPairs]] — lands in the SAME split. Splitting
    * by doc id instead leaks: near-duplicates straddle train/test and
    * the eval set scores memorization, the classic contamination bug a
    * per-doc hash split cannot prevent. Map-side column expression
    * over an already-clustered frame; same determinism guarantees as
    * [[splitColumn]].
    */
  def splitByGroup(
      df: DataFrame,
      groupCol: String,
      trainPermille: Int = 800,
      valPermille: Int = 100,
      seed: Int = 0): DataFrame =
    df.withColumn("split",
      splitColumn(col(groupCol), trainPermille, valPermille, seed))

  /** The audit twin of [[splitByGroup]]: per group, the number of
    * distinct splits its members landed in — every row with
    * n_splits > 1 is an eval-leakage bug. One group-grain aggregate;
    * by construction [[splitByGroup]] output always audits clean, so
    * this is the instrument for EXTERNALLY-assigned splits.
    */
  def splitLeakageAudit(
      df: DataFrame,
      groupCol: String,
      splitCol: String): DataFrame =
    graft.SparkUtil.ensureParallelism(df)
      .groupBy(groupCol)
      .agg(
        countDistinct(col(splitCol)).as("n_splits"),
        count(lit(1)).as("n_members"))
  /** Deterministic EXACT-k sample per stratum — the complement of the
    * permille samplers ([[stratifiedSample]]'s expected rate, this
    * one's exact count): per stratum, the k rows with the smallest
    * (md5 hash of id, id) survive. Membership is a pure function of
    * (id, seed, k), so it is stable under repartitioning and reruns,
    * and growing k from 3 to 5 KEEPS the first 3 (nested samples —
    * the property audit/debug workflows want).
    *
    * Scale shape: rank ≤ k over a per-stratum hash order — Spark 4
    * plans the filtered row_number as WindowGroupLimit, so each map
    * task keeps only its local top-k before the single per-stratum
    * shuffle; no stratum ever materializes fully on one node beyond
    * its k survivors.
    */
  def exactKPerStratum(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      k: Int,
      seed: Int = 0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Hashes.hexHash(col(idCol).cast("string"), seed), col(idCol))
    graft.SparkUtil.ensureParallelism(df)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
  }

  /** Realize a sampling-factor mixture DETERMINISTICALLY — the step
    * that turns [[mixtureWeights]]' per-group `sampling_factor` into
    * an actual resampled dataset: each row emits `floor(f)` copies
    * plus one more iff its id-hash permille (base 10000) falls under
    * the fractional part — so downsampling (f < 1) is a stable
    * hash-subset and upsampling (f > 1) replicates with a stable
    * fractional remainder, reproducible across runs, partitionings
    * and engines (no `rand()`, the [[splitColumn]] discipline).
    * Output: the input columns plus `copy` (0-based replica index).
    *
    * Exactness: `factorCol` is expected fix4-rounded (as
    * [[mixtureWeights]] emits); one `round(f·10000)` recovers the
    * exact integer f10k and every decision is integer arithmetic
    * (whole = f10k DIV 10000, threshold = f10k MOD 10000).
    * Scale shape: the factor table is group-grain (AQE broadcasts it
    * when small); the explode emits exactly the output rows.
    */
  def realizeMixture(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      factors: DataFrame,
      factorCol: String = "sampling_factor",
      seed: Int = 0): DataFrame = {
    val f = factors.select(col(groupCol),
      round(col(factorCol).cast("double") * 10000).cast("long")
        .as("__f10k"))
    val h = pmod(Hashes.hash60(col(idCol).cast("string"), seed),
      lit(10000L))
    val copies = (floor(col("__f10k") / 10000.0).cast("long") +
      when(h < col("__f10k") % 10000, 1L).otherwise(0L))
    graft.SparkUtil.ensureParallelism(df)
      .join(f, groupCol)
      .withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .withColumn("copy", col("copy").cast("int"))
      .drop("__f10k", "__copies")
  }

  /** Per-group RELATIVE quality gate — the curation quota that keeps
    * the best `frac` of each group (per-domain/per-source quotas, so
    * one verbose domain can't crowd out the rest): percent_rank
    * within `groupCol` ordered by (`score` desc, `tie` asc), keep
    * pr ≤ frac. percent_rank = (rank−1)/(n−1) is a ratio of exact
    * integers, so the cut is engine-identical; pass an exact integer
    * score (token count, byte length) and a unique tie for
    * deterministic ranks. Singleton groups rank pr = 0 and are kept.
    *
    * Scale shape: ONE shuffle by group + per-group sort (the window);
    * groups are domains/sources — bounded cardinality, heavy groups
    * sort within their partitions. For exact-COUNT quotas use
    * [[exactKPerStratum]]; this is the exact-FRACTION twin.
    */
  def topFracByGroup(
      df: DataFrame,
      groupCol: String,
      score: Column,
      tie: Column,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(score.desc, tie.asc)
    graft.SparkUtil.ensureParallelism(df)
      .withColumn("__pr", percent_rank().over(w))
      .where(col("__pr") <= frac)
      .drop("__pr")
  }
}
