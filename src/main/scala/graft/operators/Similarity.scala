package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftFunctions
import graft.functions.{Numerics, Vectors}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design (SURVEY.md §4): brute-force is only the kernel —
  * queries are broadcast against a streamed corpus (never a shuffled
  * cross product), and the scale path is random-hyperplane LSH: each
  * vector lands in per-band sign buckets, candidates come from a
  * bucket-keyed equi-join, and the exact cosine is computed only within
  * buckets. Hyperplanes are derived deterministically from md5 so any
  * engine (including the DuckDB oracle) draws identical planes.
  */
object Similarity {

  /** Deterministic hyperplane component d of plane p, in [-1, 1):
    * the 60-bit md5 prefix of "hp-p-d" scaled by 2^59 — computed once on
    * the driver (it is a constant, not data) and shipped as an array
    * literal, so executors never hash. The DuckDB oracle re-derives the
    * identical values in SQL:
    * `('0x'||substr(md5('hp-'||p||'-'||d),1,15))::BIGINT
    *   / 576460752303423488.0 - 1.0`.
    */
  def hyperplaneValues(p: Int, dim: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { d =>
      val hex = digest.digest(s"hp-$p-$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      BigInt(hex, 16).toDouble / 5.76460752303423488e17 - 1.0
    }
  }

  def hyperplane(p: Int, dim: Int): Column =
    typedLit(hyperplaneValues(p, dim))

  /** Sign bit of v · H_p (1 when positive, else 0), via the native
    * [[graft.functions.expressions.VecDot]] expression: one codegen'd
    * loop per plane, so all `bands × bitsPerBand` dots stay inside
    * whole-stage codegen without the method-size blowup that unrolled
    * per-element products hit (Janino's 64 KB ceiling).
    */
  def planeBit(v: Column, p: Int, dim: Int): Column =
    when(GraftFunctions.vecDot(v, hyperplane(p, dim)) > 0, lit(1))
      .otherwise(lit(0))

  /** Add per-band LSH buckets: `bands` bands of `bitsPerBand` sign bits
    * each, packed to an int. Input needs `id` and `v` (array<double>);
    * output is (id, v, band, bucket) — one row per band, ready for a
    * bucket-keyed join. Entirely shuffle-free until the join.
    */
  def withBuckets(
      vecs: DataFrame,
      dim: Int,
      bands: Int,
      bitsPerBand: Int): DataFrame = {
    val buckets = (0 until bands).map { b =>
      (0 until bitsPerBand)
        .map(i => planeBit(col("v"), b * bitsPerBand + i, dim) * lit(1 << i))
        .reduce(_ + _)
    }
    vecs.select(
      col("id"), col("v"), col("nrm"),
      posexplode(array(buckets: _*)).as(Seq("band", "bucket")))
  }

  /** Scan-side projection: double vector + its norm, computed exactly
    * once per vector (the norm is reused across every candidate pair).
    * Zero-norm (empty or all-zero) vectors are excluded — cosine is
    * undefined for them, and under ANSI mode the division would throw
    * at runtime instead of yielding a quiet NaN.
    */
  private def prepVecs(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    graft.SparkUtil.ensureParallelism(df).select(
      col(idCol).cast("long").as("id"),
      Vectors.asDouble(col(vecCol)).as("v"))
      .withColumn("nrm",
        sqrt(GraftFunctions.vecDot(col("v"), col("v"))))
      .where(col("nrm") > 0)
  }

  /** cos(a,b) from a precomputed-norm pair — the same
    * dot/(|a|·|b|) arithmetic as [[Vectors.cosine]], with the norms
    * computed once at the scan instead of once per pair.
    */
  private def cosWithNorms(
      va: Column, vb: Column, na: Column, nb: Column): Column =
    GraftFunctions.vecDot(va, vb) / (na * nb)

  /** Embedding near-dup pairs: same (band, bucket) in at least one band
    * AND exact cosine >= threshold. Output: (id_a, id_b, cos_sim).
    *
    * Scale note: within-bucket pair count grows as n²/2^bitsPerBand, so
    * bitsPerBand must grow with log2(n) to hold per-bucket work constant
    * (measured: 20k vectors at 4 bits = 84 s, at 8 bits = 12 s).
    * `maxBucket` is the skew guard for degenerate corpora (e.g. a
    * constant embedding): buckets past the cap are dropped rather than
    * enumerated; off by default so results stay exactly reproducible.
    */
  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      bands: Int = 2,
      bitsPerBand: Int = 4,
      threshold: Double = 0.35,
      maxBucket: Option[Int] = None): DataFrame = {
    val vecs = prepVecs(df, idCol, vecCol)
    val banded0 = withBuckets(vecs, dim, bands, bitsPerBand)
    val banded = maxBucket match {
      case Some(cap) =>
        val sizes = banded0.groupBy("band", "bucket").count()
          .where(col("count") <= cap).drop("count")
        banded0.join(sizes, Seq("band", "bucket"))
      case None => banded0
    }
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    // The threshold is applied AFTER the per-pair aggregate, not on the
    // projected cos: a filter there gets pushed into the join condition,
    // duplicating the 64-term dot into the same generated method as the
    // projection — past Janino's 64 KB limit, collapsing the stage to
    // interpreted mode. cos is band-independent, so max(cos) = cos and
    // the post-agg filter is exactly equivalent (and not pushable).
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosWithNorms(col("v_a"), col("v_b"), col("nrm_a"), col("nrm_b"))
          .as("cos"))
      .groupBy("id_a", "id_b") // a pair can collide in several bands
      .agg(max(col("cos")).as("max_cos"))
      .where(col("max_cos") >= threshold)
      .select(col("id_a"), col("id_b"),
        Numerics.fix4(col("max_cos")).as("cos_sim"))
  }

  /** Brute-force exact top-k: the small query set is broadcast against
    * the streamed corpus (one pass, no shuffle of the corpus), then
    * ranked per query. This is the correctness baseline and the
    * per-bucket kernel of the LSH path.
    * Output: (query_id, neighbor_id, rank, cos_sim).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(prepVecs(queries, idCol, vecCol).select(
      col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn")))
    val c = prepVecs(corpus, idCol, vecCol).select(
      col("id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosWithNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("cos"))
    topK(scored, k)
  }

  /** LSH top-k: queries and corpus are bucketed with the same
    * deterministic hyperplanes; candidates come only from shared
    * (band, bucket) pairs — a plain equi-join shuffle, no cross
    * product — then exact cosine ranks the candidates.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      bands: Int = 2,
      bitsPerBand: Int = 4): DataFrame =
    topK(lshScored(queries, corpus, idCol, vecCol, dim, bands, bitsPerBand), k)

  /** Shared LSH candidate scoring: exact cosine for every distinct
    * (query, neighbor) pair that shares at least one (band, bucket).
    */
  private def lshScored(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      bands: Int,
      bitsPerBand: Int): DataFrame = {
    val qb = withBuckets(prepVecs(queries, idCol, vecCol), dim, bands, bitsPerBand)
      .select(col("band"), col("bucket"),
        col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cb = withBuckets(prepVecs(corpus, idCol, vecCol), dim, bands, bitsPerBand)
      .select(col("band"), col("bucket"),
        col("id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    qb.join(cb, Seq("band", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosWithNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("cos"))
      .groupBy("query_id", "neighbor_id")
      .agg(max(col("cos")).as("cos"))
  }

  /** Sparse-vector cosine similarity join via an inverted index — the
    * posting-list formulation every text search engine uses, here as a
    * batch pair join: docs become integer term-frequency vectors, the
    * postings table joins to ITSELF on the term, and per-pair dot
    * products accumulate as exact int64 sums (order-independent, so
    * the score hash-matches across engines; a float-weighted variant
    * would be shuffle-order-dependent). cos = dot / (‖a‖·‖b‖) with one
    * final float op per pair.
    *
    * Scale shape: candidate work is Σ_term df², so the df cap IS the
    * scale control — terms appearing in more than `dfCap` docs are
    * stop-terms that would quadratically dominate postings and add
    * mostly noise to cosine; dropping them (and df=1 terms, which
    * cannot pair) bounds the join exactly the way search engines
    * prune their longest posting lists. Norms are computed over the
    * KEPT term space so cosine stays in [0, 1] by construction.
    */
  def sparseCosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      dfCap: Int,
      threshold: Double): DataFrame = {
    require(dfCap >= 2, "dfCap must be >= 2")
    require(shingleN >= 1, "shingleN must be >= 1")
    // terms are n-word shingles WITH multiplicity: on small-vocabulary
    // corpora single words are all stop-terms (every posting list is
    // the whole corpus) while shingle frequency decays combinatorially
    // — the same reason q21/q23 shingle before hashing
    val tf = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol).cast("long").as("doc"),
        explode(graft.functions.Texts.shingleBagOf(
          col(textCol), shingleN)).as("term"))
      .groupBy("doc", "term")
      .agg(count(lit(1)).as("tf"))
    val kept = tf.groupBy("term")
      .agg(countDistinct(col("doc")).as("df"))
      .where(col("df") >= 2 && col("df") <= dfCap)
      .select("term")
    // no broadcast hint: dfCap bounds df PER term, not the number of
    // mid-df terms, so `kept` is corpus-vocabulary-sized in the worst
    // case — let AQE pick broadcast vs shuffle from its measured size
    val postings = tf.join(kept, "term")
    val norms = postings.groupBy("doc")
      .agg(sum(col("tf") * col("tf")).as("nsq"))
    val dots = postings.select(col("term"), col("doc").as("doc_a"), col("tf").as("tf_a"))
      .join(
        postings.select(col("term"), col("doc").as("doc_b"), col("tf").as("tf_b")),
        Seq("term"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
    dots
      .join(norms.select(col("doc").as("doc_a"), col("nsq").as("nsq_a")), "doc_a")
      .join(norms.select(col("doc").as("doc_b"), col("nsq").as("nsq_b")), "doc_b")
      .withColumn("cos",
        col("dot").cast("double") /
          (sqrt(col("nsq_a").cast("double")) * sqrt(col("nsq_b").cast("double"))))
      .where(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        Numerics.fix4(col("cos")).as("cos_sim"))
  }

  /** Hard-negative mining for contrastive training: per query, the
    * top-k most-similar corpus vectors whose exact cosine lies in
    * [lo, hi) — similar enough to be informative negatives, strictly
    * below the near-duplicate band (>= hi) that would poison the
    * batch with false negatives, and above the floor (< lo) where
    * negatives are trivial and teach nothing.
    *
    * Scale shape: identical to [[lshTopK]] — candidates only from
    * shared LSH (band, bucket) pairs, an equi-join shuffle, never
    * n². The cosine band is applied to the exact score before
    * ranking, so excluded near-dups never occupy top-k slots. The
    * LSH bias toward similar pairs is exactly the bias this mining
    * wants: the hard negatives ARE the bucket-mates.
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      lo: Double,
      hi: Double,
      bands: Int = 2,
      bitsPerBand: Int = 4): DataFrame = {
    require(lo < hi, "lo must be < hi")
    val scored = lshScored(queries, corpus, idCol, vecCol, dim, bands, bitsPerBand)
    topK(scored.where(col("cos") >= lo && col("cos") < hi), k)
  }

  /** Deterministic IVF centroid c, same md5 derivation as the
    * hyperplanes but under an "ivf-" key, so the DuckDB oracle
    * re-derives identical centroids in SQL. Deliberately NOT
    * normalized: cell assignment is argmax of the raw dot, computed as
    * the same sequential fold in both engines — bit-identical, so both
    * engines agree on every assignment (a driver-side norm would
    * introduce engine-specific arithmetic).
    */
  def ivfCentroidValues(c: Int, dim: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { d =>
      val hex = digest.digest(s"ivf-$c-$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      BigInt(hex, 16).toDouble / 5.76460752303423488e17 - 1.0
    }
  }

  /** Deterministic PQ codebook centroid (subspace m, code c) — the
    * "pq-" key keeps every subspace's codebook distinct while staying
    * SQL-re-derivable like [[ivfCentroidValues]].
    */
  def pqCentroidValues(m: Int, c: Int, dim: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { d =>
      val hex = digest.digest(s"pq-$m-$c-$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      BigInt(hex, 16).toDouble / 5.76460752303423488e17 - 1.0
    }
  }

  /** Product-quantization codebook audit — the vector-COMPRESSION
    * honesty instrument (q126 audits retrieval recall, this audits the
    * storage side): each vector splits into `m` subvectors, each
    * subvector quantizes to its NEAREST-BY-L2 of `nCodes` codebook
    * centroids — scored as argmax(2·⟨s,c⟩ − ‖c‖²), which equals
    * argmin ‖s−c‖² without touching the row-constant ‖s‖²; ties to
    * the lowest code, identically in both engines — and the audit
    * reports per (subspace, code) how many vectors landed there and
    * the mean squared reconstruction error — the measured distortion
    * that justifies an (m, nCodes) compression choice (64 doubles →
    * m bytes per vector at nCodes ≤ 256).
    *
    * Exactness: per-row err² = ‖s‖² − score(code) evaluates in the
    * identical op order in both engines (the centroid norms embed as
    * shortest-roundtrip double literals), then errors are fix4-scaled
    * to exact longs BEFORE the per-cell sum, so the mean is
    * order-independent — never a float sum across rows.
    *
    * Scale shape: ONE corpus scan; each row emits its m (subspace,
    * code, err) entries through one Generate, then a (subspace, code)
    * hash aggregate of m·nCodes cells — map-side combined, no join
    * anywhere. Output: m·nCodes-row table, data-size-independent.
    */
  def pqAudit(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      m: Int,
      nCodes: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m")
    val sub = dim / m
    GraftFunctions.register(df.sparkSession)
    val v = Vectors.asDouble(col(vecCol))
    // Codegen shape (round 12): the original form packed all
    // m·nCodes centroid scorings — with the scores array referenced
    // three times (argmax, max, lookup) — into ONE Generate consume
    // method, which blew Janino's 64 KB per-method limit and silently
    // fell back to interpreted eval. Now the Generate emits only tiny
    // (mi, subvector) structs, and scoring happens AFTER the explode
    // in LAYERED projections: `scores` / `code` are materialized
    // columns referenced by name downstream, and CollapseProject
    // leaves non-cheap multiply-referenced producers in their own
    // Project, so each vecDot codegens exactly once per row.
    val exploded = graft.SparkUtil.ensureParallelism(df)
      .select(explode(array((0 until m).map { mi =>
        struct(lit(mi).as("mi"), slice(v, mi * sub + 1, sub).as("sv"))
      }: _*)).as("e"))
      .select(col("e.mi").as("mi"), col("e.sv").as("sv"))
    val scoresFor = (0 until m).map { mi =>
      val cents = (0 until nCodes).map(c => pqCentroidValues(mi, c, sub))
      array(cents.map { c =>
        val cnorm = c.map(x => x * x).sum
        lit(2.0) * GraftFunctions.vecDot(col("sv"), typedLit(c)) - lit(cnorm)
      }: _*)
    }
    val scoreCase = (0 until m).foldRight(lit(null).cast("array<double>")) {
      (mi, acc) => when(col("mi") === mi, scoresFor(mi)).otherwise(acc)
    }
    exploded
      .withColumn("scores", scoreCase)
      .withColumn("code",
        array_position(col("scores"), array_max(col("scores"))).cast("int"))
      .select(col("mi").as("subspace"), col("code"),
        floor((GraftFunctions.vecDot(col("sv"), col("sv")) -
          element_at(col("scores"), col("code"))) * 10000 + 0.5)
          .cast("long").as("errq"))
      .groupBy("subspace", "code")
      .agg(count(lit(1)).as("n_vecs"), sum(col("errq")).as("errsum"))
      .select(col("subspace"), col("code"), col("n_vecs"),
        graft.functions.Numerics.fix4(col("errsum").cast("double") /
          (col("n_vecs") * 10000.0)).as("mean_err2"))
  }

  /** PQ-ADC top-k search — q136's compression actually SEARCHED: the
    * corpus encodes ONCE to `m` one-byte codes per vector (the same
    * argmax(2⟨s,c⟩−‖c‖²) rule as [[pqAudit]], layered projections so
    * every vecDot codegens once), and each query scores candidates by
    * asymmetric distance computation — per subspace a LOOKUP TABLE of
    * the query-subvector's dot with every centroid, so scoring a
    * corpus vector costs m `element_at` lookups + (m−1) adds, never a
    * dim-length dot. This is the memory-bound billion-vector layout:
    * the scan side carries m bytes per vector instead of dim floats
    * (16× at dim=64, m=4), and the LUT table (queries × m × nCodes
    * doubles) broadcasts. Scores are approximate by construction —
    * the reconstruction error pqAudit prices — but DETERMINISTIC:
    * fixed-order 4-term sums of engine-exact dots, fix4'd, so the
    * oracle hash-matches, not just overlaps.
    *
    * Output: (query_id, rank, corpus_id, adc_score), top-k per query
    * by ADC score desc with corpus-id tiebreak.
    *
    * COST LAW: flat ADC is linear in |queries| × |corpus| — every
    * query's LUT row visits every corpus code row (that IS the
    * kernel; the cell-bounded scale path is [[ivfPqTopK]]). The LUT
    * broadcast is |queries| × m × nCodes doubles. Both are priced by
    * `maxQueries` (default 8192): the operator counts the query side
    * (a LIMIT-bounded job) and REFUSES loudly above the ceiling
    * rather than silently launching a 10⁹-query × 10⁹-code scan.
    * Raise it deliberately when |corpus| is small.
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      nCodes: Int,
      k: Int,
      maxQueries: Int = 8192): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m")
    require(nCodes >= 2 && nCodes <= 256, "nCodes in [2, 256]")
    require(maxQueries >= 1, "maxQueries must be positive")
    val nq = queries.limit(maxQueries + 1).count()
    require(nq <= maxQueries,
      s"pqTopK is a FLAT ADC scan, linear in |queries|*|corpus|: got " +
        s"more than maxQueries=$maxQueries query rows. Use ivfPqTopK " +
        s"(cell-bounded) for large query sets, or raise maxQueries " +
        s"deliberately if the corpus is small.")
    val sub = dim / m
    GraftFunctions.register(corpus.sparkSession)
    val v = Vectors.asDouble(col(vecCol))
    var enc = graft.SparkUtil.ensureParallelism(corpus)
      .select(col(idCol).as("cid"), v.as("__v"))
    (0 until m).foreach { mi =>
      val cents = (0 until nCodes).map(c => pqCentroidValues(mi, c, sub))
      val scores = array(cents.map { c =>
        val cnorm = c.map(x => x * x).sum
        lit(2.0) * GraftFunctions.vecDot(
          slice(col("__v"), mi * sub + 1, sub), typedLit(c)) - lit(cnorm)
      }: _*)
      enc = enc.withColumn(s"__sc$mi", scores)
        .withColumn(s"code$mi",
          array_position(col(s"__sc$mi"), array_max(col(s"__sc$mi")))
            .cast("int"))
    }
    val codes = enc.select(
      col("cid") +: (0 until m).map(mi => col(s"code$mi")): _*)
    var qs = queries.select(col(idCol).as("qid"), v.as("__q"))
    (0 until m).foreach { mi =>
      val cents = (0 until nCodes).map(c => pqCentroidValues(mi, c, sub))
      qs = qs.withColumn(s"lut$mi", array(cents.map(c =>
        GraftFunctions.vecDot(
          slice(col("__q"), mi * sub + 1, sub), typedLit(c))): _*))
    }
    val luts = qs.select(
      col("qid") +: (0 until m).map(mi => col(s"lut$mi")): _*)
    val adc = (0 until m)
      .map(mi => element_at(col(s"lut$mi"), col(s"code$mi")))
      .reduce(_ + _)
    val w = Window.partitionBy("qid")
      .orderBy(col("__adc").desc, col("cid").asc)
    codes.crossJoin(broadcast(luts))
      .withColumn("__adc", adc)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("corpus_id"),
        Numerics.fix4(col("__adc")).as("adc_score"))
  }

  /** IVF + PQ-ADC combined top-k — the full billion-vector ANN layout
    * (the FAISS IVFPQ shape): the coarse quantizer ([[ivfTopK]]'s
    * cells) bounds WHICH vectors a query touches (~nProbe/nCells of
    * the corpus via one equi-join), and product quantization
    * ([[pqTopK]]'s codes + lookup tables) bounds WHAT each touch
    * costs (m byte-codes + m lookups, never a dim-length dot). The
    * corpus side carries (cell, m codes) only — one scan builds it,
    * raw vectors never reach the join. Deterministic end to end:
    * the same (argmax, mask) probe chain, code rule and fixed-order
    * ADC sums as the component operators, so the oracle re-derives
    * the full ranking.
    *
    * `excludeSelf` (default true, the self-search contract where
    * queries ⊆ corpus) drops candidates whose corpus id EQUALS the
    * query id. Callers searching a DISTINCT corpus whose id space
    * overlaps the queries' must pass `excludeSelf = false` or
    * legitimate matches are silently dropped ([[pqTopK]] has no such
    * filter — flat ADC is usually a foreign-corpus scan).
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nCells: Int,
      nProbe: Int,
      m: Int,
      nCodes: Int,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m")
    require(nProbe >= 1 && nProbe <= nCells,
      s"nProbe must be in [1, nCells=$nCells]")
    val sub = dim / m
    GraftFunctions.register(corpus.sparkSession)
    val v = Vectors.asDouble(col(vecCol))
    var enc = graft.SparkUtil.ensureParallelism(corpus)
      .select(col(idCol).as("cid"), v.as("__v"))
      .withColumn("__dots", ivfDots(col("__v"), nCells, dim))
      .withColumn("cell", cellOf(col("__dots")))
    (0 until m).foreach { mi =>
      val cents = (0 until nCodes).map(c => pqCentroidValues(mi, c, sub))
      val scores = array(cents.map { c =>
        val cnorm = c.map(x => x * x).sum
        lit(2.0) * GraftFunctions.vecDot(
          slice(col("__v"), mi * sub + 1, sub), typedLit(c)) - lit(cnorm)
      }: _*)
      enc = enc.withColumn(s"__sc$mi", scores)
        .withColumn(s"code$mi",
          array_position(col(s"__sc$mi"), array_max(col(s"__sc$mi")))
            .cast("int"))
    }
    val codes = enc.select(
      col("cell") +: col("cid") +:
        (0 until m).map(mi => col(s"code$mi")): _*)
    var qd = queries.select(col(idCol).as("qid"), v.as("__q"))
      .withColumn("m0", ivfDots(col("__q"), nCells, dim))
    (1 to nProbe).foreach { i =>
      qd = qd.withColumn(s"p$i", cellOf(col(s"m${i - 1}")))
      if (i < nProbe)
        qd = qd.withColumn(s"m$i",
          transform(sequence(lit(1), lit(nCells)),
            j => when(j === col(s"p$i"), lit(-9e99))
              .otherwise(element_at(col(s"m${i - 1}"), j))))
    }
    (0 until m).foreach { mi =>
      val cents = (0 until nCodes).map(c => pqCentroidValues(mi, c, sub))
      qd = qd.withColumn(s"lut$mi", array(cents.map(c =>
        GraftFunctions.vecDot(
          slice(col("__q"), mi * sub + 1, sub), typedLit(c))): _*))
    }
    val qb = qd.select(
      (col("qid") +: (0 until m).map(mi => col(s"lut$mi"))) :+
        explode(array((1 to nProbe).map(i => col(s"p$i")): _*)).as("cell"): _*)
    val adc = (0 until m)
      .map(mi => element_at(col(s"lut$mi"), col(s"code$mi")))
      .reduce(_ + _)
    val w = Window.partitionBy("qid")
      .orderBy(col("__adc").desc, col("cid").asc)
    val cands = qb.join(codes, Seq("cell")) // equi-join scale path — no BNLJ
    val scoped =
      if (excludeSelf) cands.where(col("qid") =!= col("cid")) else cands
    scoped
      .withColumn("__adc", adc)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("corpus_id"),
        Numerics.fix4(col("__adc")).as("adc_score"))
  }

  /** Array of the vector's dot product with each centroid (HOF folds —
    * per-ROW work, see [[planeBit]] for why not unrolled).
    */
  private def ivfDots(v: Column, nCells: Int, dim: Int): Column =
    array((0 until nCells).map(c =>
      GraftFunctions.vecDot(v, typedLit(ivfCentroidValues(c, dim)))): _*)

  /** 1-based cell id: position of the max dot (ties -> lowest cell,
    * identically in DuckDB's list_position).
    */
  private def cellOf(dots: Column): Column =
    array_position(dots, array_max(dots))

  /** IVF (inverted-file) ANN top-k — the coarse-quantizer scale path:
    * every corpus vector is assigned to its nearest of `nCells`
    * deterministic centroids (one cell each); each query probes its
    * `nProbe` best cells; candidates come from an equi-join on the cell
    * id — the canonical billions-of-vectors layout where a query scans
    * only ~nProbe/nCells of the corpus. Exact cosine ranks candidates.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nCells: Int = 8,
      nProbe: Int = 2): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells,
      s"nProbe must be in [1, nCells=$nCells], got $nProbe")
    val cb = prepVecs(corpus, idCol, vecCol)
      .withColumn("cell", cellOf(ivfDots(col("v"), nCells, dim)))
      .select(col("cell"), col("id").as("neighbor_id"),
        col("v").as("cv"), col("nrm").as("cn"))
    // i-th best cell: mask the previous winner at -inf and take argmax
    // again — nProbe successive (argmax, mask) steps, each a pure
    // per-row Column expression (no shuffle, no sort), with the same
    // ties-to-lowest-cell rule at every step as the oracle's
    // list_position. m0 is the raw dots array; p_i = argmax(m_{i-1}).
    val qd0 = prepVecs(queries, idCol, vecCol)
      .withColumn("m0", ivfDots(col("v"), nCells, dim))
    val qd = (1 to nProbe).foldLeft(qd0) { (df, i) =>
      val withP = df.withColumn(s"p$i", cellOf(col(s"m${i - 1}")))
      if (i == nProbe) withP // last probe needs no further masking
      else withP.withColumn(s"m$i",
        transform(sequence(lit(1), lit(nCells)),
          j => when(j === col(s"p$i"), lit(-9e99))
            .otherwise(element_at(col(s"m${i - 1}"), j))))
    }
    val qb = qd
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(array((1 to nProbe).map(i => col(s"p$i")): _*)).as("cell"))
    val scored = qb.join(cb, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosWithNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("cos"))
      .groupBy("query_id", "neighbor_id") // probe cells are distinct, but stay safe
      .agg(max(col("cos")).as("cos"))
    topK(scored, k)
  }

  /** One full k-means Lloyd iteration, distributed: ASSIGN every
    * vector to its best of `nCells` deterministic seed centroids (max
    * dot — the same coarse quantizer as [[ivfTopK]], bit-identical in
    * any engine), then UPDATE each cell's centroid via
    * [[labelCentroids]]. This overload is the FIRST iteration (seed
    * centroids); keep iterating via the centroids overload below.
    * Output: (cell, pos, c, n).
    */
  def kmeansStep(
      df: DataFrame,
      vecCol: String,
      nCells: Int,
      dim: Int): DataFrame =
    kmeansStep(df, vecCol, (0 until nCells).map(ivfCentroidValues(_, dim)), dim)

  /** One Lloyd iteration against CALLER-SUPPLIED centroids — the form
    * that actually iterates: re-assemble the previous step's exploded
    * (cell, pos, c) output into per-cell arrays and pass them here as
    * the next round's `centroids`. Cell ids are 1-based positions into
    * `centroids`, ties to the lowest cell — identical assignment rule
    * to the seeded overload. One scan, one (cell, pos) aggregate
    * shuffle of dim·k partial sums; centroids ship as broadcast
    * literals, never a join. Output: (cell, pos, c, n).
    */
  def kmeansStep(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[Seq[Double]],
      dim: Int): DataFrame = {
    require(centroids.nonEmpty && centroids.forall(_.size == dim),
      s"every centroid must have dim=$dim components")
    GraftFunctions.register(df.sparkSession)
    val v = Vectors.asDouble(col(vecCol))
    val dots = array(centroids.map(c =>
      GraftFunctions.vecDot(v, typedLit(c))): _*)
    val assigned = graft.SparkUtil.ensureParallelism(df)
      .select(cellOf(dots).as("cell"), col(vecCol).as("vec"))
    labelCentroids(assigned, "cell", "vec")
      .withColumnRenamed("label", "cell")
  }

  /** Re-assemble a [[kmeansStep]] output into the next iteration's
    * centroid arrays — the driver side of the Lloyd loop. The input is
    * the ALREADY-AGGREGATED (cell, pos, c) table — k·dim rows, a few KB
    * at ANY corpus scale — and the next assignment pass needs those
    * values as broadcast literals, so materializing them on the driver
    * is the canonical iterative-ML shape, not a data-sized collect.
    * Cells that lost every vector keep `fallback(cell)` (0-based) — the
    * standard empty-cluster rule (e.g. pass the previous round's
    * centroids).
    */
  def assembleCentroids(
      stepOut: DataFrame,
      nCells: Int,
      dim: Int,
      fallback: Int => Seq[Double]): Seq[Seq[Double]] = {
    val got = stepOut.select(
        col("cell").cast("int"), col("pos").cast("int"), col("c"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    got.valuesIterator.foreach(v => require(v.size == dim,
      s"centroid has ${v.size} components, expected $dim"))
    (1 to nCells).map(c => got.getOrElse(c, fallback(c - 1)))
  }

  /** Per-label centroid components — the k-means/IVF "update" step as
    * one distributed aggregate. Shape: posexplode the vectors into
    * (label, pos, x) and hash-aggregate avg(x) by (label, pos) — one
    * shuffle of dim·|labels| partial sums (map-side combine), never a
    * driver-side collect of vectors. Output stays EXPLODED (label, pos,
    * c, n) rather than re-assembled arrays: downstream consumers
    * (assignment joins) want the component rows, and at 100 TB the
    * result is dim·k rows either way.
    */
  def labelCentroids(
      df: DataFrame,
      labelCol: String,
      vecCol: String): DataFrame =
    graft.SparkUtil.ensureParallelism(df)
      .select(col(labelCol).cast("int").as("label"),
        posexplode(Vectors.asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(Numerics.fix4(avg(col("x"))).as("c"),
        count(lit(1)).as("n"))

  /** Scalar (per-dimension min-max) int8 quantization error — the
    * audit an embedding-compression rollout runs before switching a
    * 100 TB vector store to 8-bit codes: quantize every component to
    * its dimension's 256-step grid, dequantize, and report each
    * vector's max/avg absolute reconstruction error.
    *
    * Scale shape: the per-dimension bounds reduce to `dim` rows and
    * BROADCAST back onto the posexploded component stream; one
    * vector-keyed aggregate ends the job. All quantization arithmetic
    * is exact-double ((x−mn)·255/(mx−mn), floor(·+0.5)) so any engine
    * derives identical integer codes; only the error AVERAGE needs the
    * fix4 rounding (float sum order). Output: (idCol, max_abs_err,
    * avg_abs_err, n_dims).
    */
  def quantizationError(
      df: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val ex = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol).cast("long").as(idCol),
        posexplode(Vectors.asDouble(col(vecCol))).as(Seq("pos", "x")))
    val bounds = ex.groupBy("pos")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val code = when(col("mx") > col("mn"),
      floor((col("x") - col("mn")) / (col("mx") - col("mn")) * 255 + 0.5))
      .otherwise(lit(0.0)) // constant dimension: code 0, dequant = mn
    ex.join(broadcast(bounds), "pos")
      .select(col(idCol),
        abs(col("x") -
          (col("mn") + code * (col("mx") - col("mn")) / 255)).as("err"))
      .groupBy(idCol)
      .agg(
        Numerics.fix4(max(col("err"))).as("max_abs_err"),
        Numerics.fix4(avg(col("err"))).as("avg_abs_err"),
        count(lit(1)).as("n_dims"))
  }

  /** Rank (cos desc, neighbor asc) per query and keep the top k. */
  /** Matryoshka truncation audit — prices the storage/recall trade of
    * serving PREFIX-truncated embeddings (the matryoshka-representation
    * deployment pattern: one stored vector, many effective dims): for
    * each prefix length in `dims`, run exact top-1 cosine on the
    * sliced vectors and report whether it still agrees with the
    * full-dim top-1, plus the truncated-space cosine. A dim that
    * keeps top-1 agreement at 4× less storage halves the ANN scan
    * bytes twice over — this audit is the evidence before flipping
    * that switch (the PQ audit q136 prices codebook compression the
    * same way).
    *
    * Cost: |dims|+1 brute-force top-1 passes over broadcast queries —
    * run on a SAMPLED query set like [[annRecall]], never the full
    * corpus as queries.
    *
    * Output: (trunc_dim, query_id, top1_id, matches_full, cos_trunc
    * fix4), one row per (dim, query).
    */
  def matryoshkaAudit(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Seq[Int],
      fullDim: Int): DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d >= 1 && d <= fullDim),
      s"dims must be in [1, fullDim=$fullDim]")
    val full = bruteForceTopK(queries, corpus, idCol, vecCol, k = 1)
      .select(col("query_id"), col("neighbor_id").as("__full_top1"))
    dims.map { d =>
      val qs = queries.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      val cs = corpus.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      bruteForceTopK(qs, cs, idCol, vecCol, k = 1)
        .select(lit(d).as("trunc_dim"), col("query_id"),
          col("neighbor_id").as("top1_id"),
          col("cos_sim").as("cos_trunc"))
    }.reduceLeft(_.unionAll(_))
      .join(full, "query_id")
      .select(col("trunc_dim"), col("query_id"), col("top1_id"),
        (col("top1_id") === col("__full_top1")).as("matches_full"),
        col("cos_trunc"))
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("nn_rank", row_number().over(w))
      .where(col("nn_rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("nn_rank"),
        Numerics.fix4(col("cos")).as("cos_sim"))
  }

  /** Recall@k audit — the approximation-quality readout every ANN
    * index needs before it replaces brute force in production: per
    * query, how much of the EXACT top-k (`truth`, e.g.
    * [[bruteForceTopK]]) the approximate result (`approx`, e.g.
    * [[lshTopK]] or [[ivfTopK]]) recovered. Run on a sampled query
    * set, this is the operator that tunes bands/bits/nProbe
    * empirically instead of by folklore.
    *
    * Scale shape: one equi-join on (query, neighbor) — both inputs
    * are already top-k-bounded (|queries|·k rows), so the audit costs
    * nothing next to the searches it measures. Output: (query_id,
    * n_true, n_hit, recall), recall = n_hit / n_true.
    */
  def recallAtK(
      truth: DataFrame,
      approx: DataFrame,
      queryCol: String,
      neighborCol: String): DataFrame = {
    val t = truth.select(col(queryCol).as("query_id"),
      col(neighborCol).as("neighbor_id"))
    val a = approx.select(col(queryCol).as("query_id"),
      col(neighborCol).as("neighbor_id"))
      .withColumn("__hit", lit(1))
    t.join(a, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_true"), count(col("__hit")).as("n_hit"))
      .select(col("query_id"), col("n_true"), col("n_hit"),
        Numerics.fix4(col("n_hit").cast("double") / col("n_true"))
          .as("recall"))
  }

  /** Blocked fuzzy self-join — entity resolution WITHOUT the n² scan
    * (the record-linkage "blocking" standard): candidate pairs come
    * only from names sharing a block key; each candidate verifies
    * through the native [[graft.functions.expressions.JaroWinkler]]
    * kernel; `blockKeys` is a SET of key functions (first token, last
    * token, prefix, phonetic code, …) unioned for recall — the same
    * multi-band recall knob as MinHash LSH, with Σ block² as the cost
    * law (size keys so blocks stay bounded as the corpus grows).
    *
    * Scale discipline: everything runs at DISTINCT-NAME grain — the
    * name table collapses the corpus first (the sig-level q84
    * lesson), so work is independent of row counts; per-name row
    * counts ride along for review-queue prioritization. A pair found
    * by several keys verifies ONCE (distinct before the kernel).
    * Output: (name_a, name_b, jw_sim, n_a, n_b), name_a < name_b,
    * jw_sim ≥ threshold, fix4-rounded.
    */
  def blockedFuzzyPairs(
      df: DataFrame,
      nameCol: String,
      blockKeys: Seq[Column => Column],
      threshold: Double): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    require(threshold >= 0.0 && threshold <= 1.0, "threshold in [0,1]")
    GraftFunctions.register(df.sparkSession)
    val names = graft.SparkUtil.ensureParallelism(df)
      .where(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val blocked = names.select(col("name"), col("n_rows"),
      explode(array(blockKeys.zipWithIndex.map { case (f, i) =>
        struct(lit(i).as("bk"), f(col("name")).as("bv"))
      }: _*)).as("b"))
      .select(col("name"), col("n_rows"),
        col("b.bk").as("bk"), col("b.bv").as("bv"))
    val left = blocked.select(col("bk"), col("bv"),
      col("name").as("name_a"), col("n_rows").as("n_a"))
    val right = blocked.select(col("bk"), col("bv"),
      col("name").as("name_b"), col("n_rows").as("n_b"))
    left.join(right, Seq("bk", "bv"))
      .where(col("name_a") < col("name_b"))
      .select("name_a", "name_b", "n_a", "n_b")
      .distinct() // multi-key hits verify once
      .select(col("name_a"), col("name_b"),
        Numerics.fix4(GraftFunctions.jaroWinkler(
          col("name_a"), col("name_b"))).as("jw_sim"),
        col("n_a"), col("n_b"))
      .where(col("jw_sim") >= threshold)
  }
}
