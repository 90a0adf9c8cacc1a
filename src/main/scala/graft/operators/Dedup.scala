package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, Numerics, Texts}

/** Deduplication operators for large text corpora.
  *
  * Scale design (SURVEY.md §4): exact dedup is one shuffle by digest;
  * near-dup is MinHash-LSH — shingle → per-seed min-hash → band keys →
  * ONE shuffle by (band, key) → pairs only within buckets → exact
  * Jaccard verify. Work is proportional to Σ bucket², never n². No
  * cross join, no driver-side collect anywhere.
  */
object Dedup {

  /** Content digest used for exact dedup: md5 of normalized text.
    * DuckDB: `md5(lower(trim(text)))`.
    */
  def contentDigest(text: Column): Column = md5(Texts.normText(text))

  /** Exact dedup: one row per distinct digest, keeping the smallest id
    * (keep-first). A single hash-partitioned aggregation with map-side
    * partials — the canonical 100 TB exact-dedup shape.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(contentDigest(col(textCol)).as("digest"), col(idCol))
      .groupBy("digest")
      .agg(
        min(col(idCol)).cast("long").as(s"kept_$idCol"),
        count(lit(1)).as("n_copies"))

  /** Per-seed MinHash values computed WITHOUT any shuffle: an array fold
    * over the shingle set per row (`array_min` over md5 prefixes; fixed
    * width hex ⇒ lexicographic min == numeric min).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { seed =>
      array_min(transform(shingles, x => Hashes.hexHash(x, seed)))
        .as(s"mh_$seed")
    }

  /** LSH candidate pairs: band the signature (`bands` bands of
    * `rowsPerBand` hashes), explode to (band, key), self-join within
    * (band, key) buckets only. `maxBucket` (optional) drops degenerate
    * buckets — the production skew guard for adversarial corpora; off by
    * default so results stay exactly reproducible.
    *
    * Input must carry columns `id` and `shingles`.
    */
  def lshCandidates(
      docs: DataFrame,
      bands: Int,
      rowsPerBand: Int,
      maxBucket: Option[Int] = None): DataFrame = {
    // Shingle-less docs (shorter than the shingle width) have no
    // signature; without this filter they'd all collide in one
    // null-key bucket.
    val withSig = docs
      .where(size(col("shingles")) > 0)
      .select(
        col("id") +: minhashSignature(col("shingles"), bands * rowsPerBand): _*)
    val bandKeys = (0 until bands).map { b =>
      concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*)
    }
    val banded0 = withSig
      .select(col("id"), posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
    val banded = maxBucket match {
      case Some(cap) =>
        // One extra aggregation to measure buckets; giant buckets are
        // degenerate (boilerplate shingles) and would blow up pair count.
        val sizes = banded0.groupBy("band", "key").count()
          .where(col("count") <= cap).drop("count")
        banded0.join(sizes, Seq("band", "key"))
      case None => banded0
    }
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"))
    a.join(b, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline over (id, text): returns
    * verified pairs (id_a, id_b, jaccard_sim) with exact shingle-set
    * Jaccard >= threshold. The verify join touches only candidate pairs.
    */
  def minhashNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 3,
      threshold: Double = 0.6,
      maxBucket: Option[Int] = None): DataFrame = {
    val docs = df.select(
      col(idCol).as("id"),
      Texts.wordShingles(Texts.words(col(textCol)), shingleWidth)
        .as("shingles"))
    val candidates = lshCandidates(docs, bands, rowsPerBand, maxBucket)
    val shA = docs.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = docs.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates
      .join(shA, "id_a")
      .join(shB, "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        Texts.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .select(
        col("id_a"),
        col("id_b"),
        Numerics.fix4(col("jaccard")).as("jaccard_sim"))
  }

  /** SimHash: 16-bit signature from per-shingle md5 bits, aggregated by
    * sign. Near-identical docs collapse to the same (or 1-2 bit distant)
    * signature; computed entirely as per-row array folds — zero shuffle.
    * Bit k of the signature is set when Σ_shingles (2·bit_k(md5) − 1) > 0.
    */
  def simhash16(shingles: Column): Column = {
    val bitSums = (0 until 16).map { k =>
      val hexPos = 1 + k / 4 // 1-based hex digit index in md5
      val bit = k % 4
      aggregate(
        shingles,
        lit(0),
        (acc, x) => acc + (Hashes.md5NibbleBit(x, hexPos, bit) * 2 - 1))
    }
    bitSums.zipWithIndex
      .map { case (s, k) => when(s > 0, lit(1 << k)).otherwise(lit(0)) }
      .reduce(_ + _)
  }

  /** SimHash dedup view over (id, text): per-doc signature, ready to be
    * grouped/banded by signature for candidate generation.
    */
  def simhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      simhash16(
        Texts.wordShingles(Texts.words(col(textCol)), shingleWidth))
        .as("simhash"))
}
