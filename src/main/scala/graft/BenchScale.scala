package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale tier for the bench (guide §1: measure at a scale where
  * data, not scheduler latency, dominates). At sf0.1 the full suite
  * measures per-job fixed overhead — 82 of the 89 ≥1 s queries ran no
  * faster at 32 cores than at 8 in round 19 — so plan-quality wins and
  * core-count scaling were close to unobservable. This tier replicates
  * the document/embedding tables by `factor` with shifted ids (the
  * `tools/make_scale.py` recipe for those two tables: exact-copy
  * replicas, key shift = next power of 10 above the max key) and
  * re-times the compute-bound doc/embedding query family against them
  * inside the same bench invocation, under the same methodology.
  *
  * The scaled inputs are REGENERATED from the scale-factor parquet on
  * every bench invocation — deterministic input preparation into
  * per-JVM scratch (removed at exit), never a cached result.
  */
object BenchScale {

  /** The compute-bound tier: every member reads only the documents /
    * embeddings tables, so only those two need scaling. Deliberately
    * excluded: q120_prefix_jaccard_join — its maxCandidatePairs guard
    * REFUSES exact-replica corpora by design (replicas make prefix
    * buckets cluster-sized; Σ bucket² detonates), which is correct
    * behavior, not a measurable run; the streaming parities — their
    * cost is the drain-protocol state-store floor, not data-parallel
    * compute; and the by-design exhaustive baselines (q25/q197).
    */
  val tier: Seq[String] = Seq(
    "q21_dedup_minhash",
    "q41_dup_clusters",
    "q49_dedup_incremental",
    "q68_edit_distance_dedup",
    "q84_simhash_radius",
    "q99_bigram_logloss",
    "q112_duplicated_spans",
    "q115_pagerank",
    "q116_pmi_collocations",
    "q125_kcore",
    "q141_embedding_dup_clusters",
    "q154_sparse_cosine",
    "q176_label_propagation",
    "q177_community_modularity")

  /** Replicate documents + embeddings by `factor` into a fresh scratch
    * dir laid out like a testdata sf dir; returns the dir. Key shifts
    * and column order/types match tools/make_scale.py exactly.
    */
  def generate(spark: SparkSession, srcDir: String, factor: Int): String = {
    require(factor >= 2, s"scale factor must be >= 2, got $factor")
    val dst = ScratchSpace.dir(spark, s"scale${factor}x_")
    def stride(m: Long): Long = { var s = 1L; while (s <= m) s *= 10; s }
    val reps = spark.range(factor).select(col("id").as("rep_i"))
    def replicate(table: String, key: String): Unit = {
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      val k = stride(
        src.agg(max(col(key).cast("long"))).head().getLong(0))
      src.crossJoin(reps)
        .withColumn(key,
          (col(key).cast("long") + col("rep_i") * lit(k))
            .cast(src.schema(key).dataType))
        .drop("rep_i")
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }
    replicate("documents", "doc_id")
    replicate("embeddings", "vec_id")
    dst
  }
}
