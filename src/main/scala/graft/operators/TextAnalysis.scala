package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, Numerics, Texts}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting, n-gram stats.
  * All per-row array folds over codegen'd built-ins — zero shuffle
  * except the (intended) aggregation in n-gram stats.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language heuristic. */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"))

  /** The English profile, looked up BY KEY: quality scoring and the
    * filter cascade (and their DuckDB oracles) hardcode the English
    * stopword list, so resolving it positionally (`head`) would let a
    * StopwordProfiles reorder silently diverge the two engines.
    */
  val EnglishStopwords: Seq[String] = StopwordProfiles.toMap.apply("en")

  /** Language ID: per-language stopword hit counts over the token
    * stream; prediction is the argmax with fixed precedence
    * en > de > fr > es on ties (including the all-zero case).
    *
    * Shape note (round 11): the original per-row form ran FOUR
    * interpreted `filter()` lambdas over the token array per document
    * (the HOF codegen landmine) — 79 s for 500k docs at the 100× noop
    * sweep. This form explodes the token expression once and counts
    * all four vocabularies in ONE codegen'd partial-agg (`isin` over
    * literal lists compiles to branch-free comparisons; the shuffle
    * carries one 5-counter row per doc per task) — the token-grain
    * rewrite q54/q30 got in round 10, and the right 100 TB shape: no
    * per-row array materialization, map-side combine does the work.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val profs = StopwordProfiles.toMap
    // explode_outer + count(w): a null-text doc explodes to ONE
    // null-token row instead of vanishing (total-over-input — the
    // plain explode dropped those ids entirely), and every aggregate
    // below ignores the null token, so such docs land with all-zero
    // counts → the all-zero tie predicts "en" by precedence, ratio
    // null. Same single partial-agg shape, no extra join. Grain
    // contract: one row per DISTINCT id — duplicate ids merge into
    // one token pool.
    val tok = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), explode_outer(Texts.words(col(textCol))).as("w"))
    def hits(vocab: Seq[String]) =
      sum(when(col("w").isin(vocab: _*), 1L).otherwise(0L))
    val agg = tok.groupBy(idCol)
      .agg(
        count(col("w")).as("n"),
        hits(profs("en")).as("en"),
        hits(profs("de")).as("de"),
        hits(profs("fr")).as("fr"),
        hits(profs("es")).as("es"))
    val Seq(en, de, fr, es) = Seq("en", "de", "fr", "es").map(col)
    val pred = when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
    agg.select(
      col(idCol),
      pred.as("pred_lang"),
      when(col("n") > 0,
        Numerics.fix4(en.cast("double") / col("n"))).as("en_stop_ratio"))
  }

  /** Quality metrics + composite score. All components are exact
    * integer ratios so any engine reproduces them bit-for-bit:
    * score = 0.4·min(tokens/100, 1) + 0.3·(1 − stop_ratio)
    *       + 0.3·min(avg_token_len/10, 1).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Token-grain shape (round 11, same rewrite as langId): the
    // per-row interpreted aggregate()/filter() lambdas cost 33 s at
    // the 100× noop sweep; one explode + one codegen'd partial-agg
    // yields the identical exact integers (count, Σlen, stop hits).
    // explode_outer + count(w), the langId total-over-input contract:
    // null-text docs survive as n_tokens = 0 with null ratios/score
    // (0-token quality is undefined, not 0.0); one row per DISTINCT
    // id, duplicate ids merge into one token pool.
    val tok = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), explode_outer(Texts.words(col(textCol))).as("w"))
    val agg = tok.groupBy(idCol)
      .agg(
        count(col("w")).as("n"),
        sum(length(col("w")).cast("long")).as("sum_len"),
        sum(when(col("w").isin(EnglishStopwords: _*), 1L).otherwise(0L))
          .as("stop"))
    val nTok = col("n").cast("double")
    val sumLen = col("sum_len").cast("double")
    val stopHits = col("stop").cast("double")
    val avgLen = sumLen / nTok
    val score = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - stopHits / nTok) +
      lit(0.3) * least(avgLen / 10.0, lit(1.0))
    val nonEmpty = col("n") > 0
    agg.select(
      col(idCol),
      col("n").as("n_tokens"),
      when(nonEmpty, Numerics.fix4(avgLen)).as("avg_token_len"),
      when(nonEmpty, Numerics.fix4(stopHits / nTok)).as("stop_ratio"),
      when(nonEmpty, Numerics.fix4(score)).as("quality_score"))
  }

  /** The [[qualityScore]] formula as a single fix4-rounded column —
    * same operation order, for consumers that RANK by quality (e.g.
    * survivor selection) without materializing the full profile.
    */
  def qualityScoreCol(textCol: Column): Column = {
    val ws = Texts.words(textCol)
    val nTok = size(ws).cast("double")
    val sumLen = aggregate(ws, lit(0), (acc, w) => acc + length(w))
      .cast("double")
    val stopHits = Texts.vocabHits(ws, EnglishStopwords).cast("double")
    val score = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - stopHits / nTok) +
      lit(0.3) * least(sumLen / nTok / 10.0, lit(1.0))
    Numerics.fix4(score)
  }

  /** Vocabulary coverage curve — the tokenizer-budget readout: what
    * fraction of total token MASS the top-k most frequent terms cover,
    * for each k in `ks`. A 50k-entry vocabulary that covers 98% of
    * mass and a 5k one that covers 97% are very different engineering
    * decisions; this is the exact curve that decides.
    *
    * Scale shape: one term-frequency partial-agg shuffle (billions of
    * tokens collapse to vocabulary grain), then a DISTRIBUTED global
    * rank + cumulative sum over the vocabulary — range-partition by
    * the rank order, local row_number + running sum per partition,
    * broadcast per-partition prefix counts/sums (the
    * `Encodings.equiDepthHistogram` shape): a 10^8-term multilingual
    * vocabulary never funnels through one executor's window sort.
    * Ranking ties break by term so both engines agree at every k
    * boundary. The ranked rows are persisted to pin ONE set of range
    * boundaries across the prefix and rank branches
    * (repartitionByRange re-samples per execution — see the
    * round-12 distributed-rank trap) and released before return.
    */
  def vocabCoverage(
      df: DataFrame,
      textCol: String,
      ks: Seq[Int]): DataFrame = {
    val run = vocabCoverageRun(df, textCol, ks)
    val res = graft.ScratchSpace.materialize(run.result, "vocabcov_")
    run.release()
    res
  }

  /** [[vocabCoverage]]'s result plus the handle releasing the cached
    * ranked vocabulary (the persist pins ONE set of range boundaries
    * across the prefix and rank branches — the round-12
    * distributed-rank trap).
    */
  final class VocabCoverageRun private[operators] (
      val result: DataFrame,
      ranked: DataFrame) {
    def release(): Unit = { ranked.unpersist(): Unit }
  }

  private[operators] def vocabCoverageRun(
      df: DataFrame,
      textCol: String,
      ks: Seq[Int]): VocabCoverageRun = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")
    import org.apache.spark.sql.expressions.Window
    val tf = graft.SparkUtil.ensureParallelism(df)
      .select(explode(Texts.words(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
    val wOrd = Window.partitionBy("__pid")
      .orderBy(col("cnt").desc, col("term"))
    val local = tf
      .repartitionByRange(col("cnt").desc, col("term"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__lcum", sum(col("cnt")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition prefix counts/sums: partition-id grain (tiny), so
    // its unpartitioned windows are safe at any corpus size
    val wPre = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val prefix = local.groupBy("__pid")
      .agg(count(lit(1)).as("__c"), sum(col("cnt")).as("__s"))
      .select(col("__pid"),
        coalesce(sum(col("__c")).over(wPre), lit(0L)).as("__pre_n"),
        coalesce(sum(col("__s")).over(wPre), lit(0L)).as("__pre_s"),
        sum(col("__c")).over(wAll).as("nvocab"),
        sum(col("__s")).over(wAll).as("tot"))
    val curve = local.join(broadcast(prefix), "__pid")
      .select(
        (col("__pre_n") + col("__rn")).as("rk"),
        (col("__pre_s") + col("__lcum")).as("cum"),
        col("tot"), col("nvocab"))
    val kDf = df.sparkSession
      .createDataFrame(ks.map(Tuple1(_))).toDF("k")
    // per k: coverage at rank min(k, vocab size) — |ks| rows against
    // the rank stream; the BNLJ side is the literal k list
    val out = kDf.join(curve, col("rk") === least(col("k"), col("nvocab")))
      .select(
        col("k"), col("nvocab").as("vocab_size"), col("tot").as("total_tokens"),
        col("cum").as("covered_tokens"),
        Numerics.fix4(
          col("cum").cast("double") / col("tot").cast("double"))
          .as("coverage"))
    new VocabCoverageRun(out, local)
  }

  /** Sequence-length histogram — the context-window budget readout:
    * doc token counts bucketed by `bucket`, with the cumulative share
    * of DOCS and of TOKEN MASS per bucket. "What max length keeps 99%
    * of documents (or 95% of tokens)" is read directly off the two
    * cumulative columns — the packing/truncation decision every
    * training run makes.
    *
    * Scale shape: token counting is scan-local; the histogram grain is
    * tiny; cumulative windows run over buckets only. GRAIN BOUND for
    * the unpartitioned cumulative window: the bucket count is
    * max(doc tokens)/bucket — a property of the LONGEST document, not
    * of corpus size (a 10M-token outlier doc at bucket=128 is ~80k
    * rows), so the single-partition sort is safe at any corpus scale;
    * it is corpus-INdependent by construction, unlike the vocabulary
    * grain [[vocabCoverage]] distributes.
    */
  def seqLenHistogram(
      df: DataFrame,
      textCol: String,
      bucket: Int): DataFrame = {
    require(bucket >= 1, "bucket must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val perDoc = graft.SparkUtil.ensureParallelism(df)
      .select(size(Texts.words(col(textCol))).cast("long").as("n_tokens"))
    val h = perDoc
      .select(expr(s"n_tokens DIV $bucket").as("b"), col("n_tokens"))
      .groupBy("b")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
    val byB = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.partitionBy()
    h.select(
      (col("b") * bucket).as("len_lo"),
      col("n_docs"), col("tokens"),
      Numerics.fix4(
        sum(col("n_docs")).over(byB).cast("double") /
          sum(col("n_docs")).over(total).cast("double")).as("cum_docs"),
      Numerics.fix4(
        sum(col("tokens")).over(byB).cast("double") /
          sum(col("tokens")).over(total).cast("double")).as("cum_tokens"))
  }

  /** N-gram novelty score — the anti-memorization / anti-template
    * audit: per doc, the fraction of its DISTINCT n-word shingles
    * whose FIRST corpus occurrence (minimum doc id) is this doc.
    * Exact replicas of an earlier doc score 0; boilerplate-heavy
    * corpora surface as low corpus-wide novelty mass.
    *
    * Scale shape: one shingle explode → min-aggregate at term grain
    * (partial-agg friendly), one equi-join back — Σ df work, linear
    * in postings, never df². Docs with fewer than n words have no
    * shingles and are absent from the output (novelty undefined).
    */
  def noveltyScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val sh = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(Texts.shinglesOf(col(textCol), n))
          .as("term"))
    val first = sh.groupBy("term").agg(min(col("doc_id")).as("first_id"))
    sh.join(first, "term")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(
        col("doc_id"), col("n_shingles"), col("n_novel"),
        Numerics.fix4(
          col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty"))
  }

  /** Curation filter cascade (Gopher-style rule stack) as ONE
    * aggregate: per-doc rule booleans are computed inline from
    * codegen'd array folds, and every cumulative stage count is a
    * conditional sum in the SAME single-pass aggregation — one scan,
    * one 1-row reduce, regardless of rule count. The report row per
    * stage is exploded from that single row. All rule inputs are exact
    * integer ratios (token counts, char counts), so the booleans are
    * bit-identical in any engine — threshold ties are not a float
    * hazard.
    *
    * Output: (stage, rule, n_pass) with stage 0 = unfiltered input and
    * stage k = docs surviving rules 1..k.
    */
  def filterCascade(df: DataFrame, textCol: String): DataFrame = {
    val ws = Texts.words(col(textCol))
    val nTok = size(ws).cast("double")
    val avgLen = aggregate(ws, lit(0), (acc, w) => acc + length(w))
      .cast("double") / nTok
    val distinctRatio = size(array_distinct(ws)).cast("double") / nTok
    val stopRatio =
      Texts.vocabHits(ws, EnglishStopwords).cast("double") / nTok
    val rules: Seq[(String, Column)] = Seq(
      "min_tokens" -> (size(ws) >= 30),
      "mean_word_len" -> (avgLen >= 3.0 && avgLen <= 12.0),
      "distinct_ratio" -> (distinctRatio >= 0.3),
      "stopword_presence" -> (stopRatio >= 0.01))
    val cumulative = rules
      .scanLeft(lit(true): Column) { case (acc, (_, r)) => acc && r }
      .drop(1)
    val stageSums = cumulative.zipWithIndex.map { case (c, i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"s$i")
    }
    val one = graft.SparkUtil.ensureParallelism(df)
      .agg(count(lit(1)).as("n_docs"), stageSums: _*)
    val stageRows =
      struct(lit(0).as("stage"), lit("input").as("rule"),
        col("n_docs").as("n_pass")) +:
        rules.zipWithIndex.map { case ((name, _), i) =>
          struct(lit(i + 1).as("stage"), lit(name).as("rule"),
            col(s"s$i").as("n_pass"))
        }
    one
      .select(explode(array(stageRows: _*)).as("st"))
      .select(col("st.stage").as("stage"), col("st.rule").as("rule"),
        col("st.n_pass").as("n_pass"))
      .orderBy("stage")
  }

  /** Whitespace token count + a BPE-ish regex token count
    * (letter runs | digit runs | single punctuation).
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(Texts.words(col(textCol))).cast("long").as("ws_tokens"),
      regexp_count(Texts.normText(col(textCol)), lit(BpeishPattern))
        .cast("long").as("bpeish_tokens"))

  /** Document fingerprints: full-content md5 of normalized text plus a
    * winnowing-style char-5-gram min/max hash pair (robust to small
    * edits at the ends; fixed-width hex so min/max are numeric).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Shape note (round 10): the original per-row form materialized
    // every char-5-gram in an array and md5'd each through an
    // interpreted transform() lambda (10 s at sf0.1 once the noop
    // action exposed it). This form explodes gram START POSITIONS
    // (sequence guarded against the <5-char descending-range trap),
    // slices + hashes with codegen'd substring/md5, and min/max
    // reduces map-side — the shuffle carries one (id, min, max)
    // partial per task.
    val t = Texts.normText(col(textCol))
    val positions = when(length(t) >= 5, sequence(lit(1), length(t) - 4))
      .otherwise(array())
    val hashes = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), t.as("t"), explode(positions).as("i"))
      .select(col(idCol),
        Hashes.hexHash(col("t").substr(col("i"), lit(5)), 0).as("h"))
      .groupBy(col(idCol))
      .agg(min(col("h")).as("gram_min_hash"), max(col("h")).as("gram_max_hash"))
    df.select(col(idCol), md5(t).as("content_md5"))
      .join(hashes, Seq(idCol), "left")
      .select(col(idCol), col("content_md5"),
        col("gram_min_hash"), col("gram_max_hash"))
  }

  /** Benchmark decontamination: flag corpus docs sharing word n-grams
    * with a (small) probe set — the pre-training hygiene pass that
    * keeps eval benchmarks out of the training set. The probe set's
    * distinct n-grams are broadcast; the corpus streams through one
    * explode + broadcast-hash semi-structure + per-doc count. Work is
    * O(corpus n-grams), never corpus × probe.
    *
    * Output: (idCol, n_shared_grams) for docs with at least one hit.
    */
  def contamination(
      corpus: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val grams = Texts.shinglesOf(col(textCol), n)
    val probeGrams = probe
      .select(explode(grams).as("gram"))
      .distinct()
    val corpusGrams = graft.SparkUtil.ensureParallelism(corpus)
      .select(col(idCol), explode(grams).as("gram"))
    corpusGrams
      .join(broadcast(probeGrams), "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_grams")) // corpus grams are distinct per doc
  }

  /** BM25 retrieval top-k — the lexical selection primitive a
    * quality-targeted data pipeline runs ("find the k corpus docs most
    * relevant to each probe query"): Lucene-smoothed
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)), per-term contribution
    * idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)), summed over the
    * query's distinct terms.
    *
    * Scale shape: the corpus reduces ONCE to (doc, term, tf) + (doc,
    * dl) aggregates (map-side partials; dl = Σ tf needs no second text
    * pass); the query term list and the 1-row (N, avgdl) scalar
    * BROADCAST onto it; df is a count window over the PROBE-FILTERED
    * postings (never a whole-vocabulary aggregate), the per-doc length
    * join is bloom-pruned to candidate docs at scale, and the final
    * per-(query, doc) sum and top-k window shuffle only matching
    * postings. Ranking compares the fix4-ROUNDED score (doc id breaks
    * ties) so last-ulp ln() differences across engines can't reorder.
    * Output: (query_id, idCol, bm25_rank, score).
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame, // (query_id, query_text)
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.SparkUtil.ensureParallelism(df)
    val tf = base
      .select(col(idCol), explode(Texts.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(idCol).agg(sum(col("tf")).as("dl"))
    val qterms = queries.select(
      col("query_id"),
      explode(array_distinct(Texts.words(col("query_text")))).as("term"))
    // No whole-vocabulary stat ever shuffles: postings are
    // probe-filtered FIRST (broadcast of the distinct query terms),
    // and df comes from a count WINDOW over that filtered stream —
    // identical values for every surviving term, one term-keyed
    // shuffle, and crucially no second aggregate subtree (a separate
    // dfreq aggregate + join re-executed the postings pipeline per
    // consumer — measured 2.3× the whole query). The per-doc length
    // join input is dictionary-of-docs-sized; Spark 4's runtime bloom
    // filter prunes its shuffle to candidate docs at scale. The 1-row
    // (N, avgdl) scalar still reads the full dl aggregate (it IS a
    // global statistic) through a reused exchange.
    val qset = qterms.select("term").distinct()
    val postings = tf.join(broadcast(qset), "term")
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    val scalars = dl.agg(
      count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    postings.join(broadcast(qterms), "term")
      .join(dl, idCol)
      .join(broadcast(scalars))
      .groupBy(col("query_id"), col(idCol))
      .agg(Numerics.fix4(sum(contrib)).as("score"))
      .withColumn("bm25_rank", row_number().over(w).cast("int"))
      .where(col("bm25_rank") <= k)
      .select(col("query_id"), col(idCol), col("bm25_rank"), col("score"))
  }

  /** Fuzzy benchmark decontamination — the per-example decision
    * [[contamination]]'s absolute count can't make: for each
    * (corpus doc, probe doc) pair, the FRACTION of the probe's n-gram
    * set present in the corpus doc; pairs at or above `minOverlap` are
    * contamination hits ("this train doc leaks that benchmark item").
    * The fraction is compared on its fix4-rounded value so the
    * threshold never flips on cross-engine float noise.
    *
    * Scale shape: benchmark suites are MBs while the corpus is the
    * 100 TB side, so the probe gram set (with its per-probe sizes)
    * BROADCASTS; the corpus streams through one explode + equi-join +
    * (doc, probe)-keyed aggregate — no corpus shuffle at all before
    * the tiny hit aggregate. Output: (idCol, probe_id, overlap_frac).
    */
  def fuzzyContamination(
      corpus: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minOverlap: Double): DataFrame = {
    val grams = Texts.shinglesOf(col(textCol), n)
    val probeGrams = probe
      .select(col(idCol).cast("long").as("probe_id"), explode(grams).as("gram"))
    val probeSizes = probeGrams.groupBy("probe_id")
      .agg(count(lit(1)).as("n_probe_grams")) // grams are distinct per doc
    val corpusGrams = graft.SparkUtil.ensureParallelism(corpus)
      .select(col(idCol), explode(grams).as("gram"))
    corpusGrams
      .join(broadcast(probeGrams), "gram")
      .groupBy(col(idCol), col("probe_id"))
      .agg(count(lit(1)).as("shared")) // distinct grams both sides → |∩|
      .join(broadcast(probeSizes), "probe_id")
      .select(col(idCol), col("probe_id"),
        Numerics.fix4(col("shared").cast("double") / col("n_probe_grams"))
          .as("overlap_frac"))
      .where(col("overlap_frac") >= minOverlap)
  }

  /** Bigram language-model negative log-likelihood per document — the
    * perplexity-proxy quality score (CCNet-style LM filtering without
    * a neural LM): score(doc) = avg over its bigram OCCURRENCES of
    * −ln p(w2|w1), with p estimated from the corpus itself as
    * count(w1 w2) / count(w1 ·). High scores = improbable word
    * sequences = low-quality or out-of-domain text.
    *
    * Scale shape: the bigram stream is one Generate over the token
    * arrays (the expression is exploded directly — never a named
    * column, see [[Dedup.minhashSignatures]]); the count tables reduce
    * to the vocabulary² and vocabulary sizes and BROADCAST back onto
    * the same stream; one final doc-keyed aggregate. The LM table is
    * exactly what a production scorer would broadcast.
    * Output: (idCol, n_bigrams, avg_nll).
    */
  /** Top-k PMI collocations — the phrase-mining pass that surfaces
    * multiword expressions ("new york", "machine learning") worth
    * treating as units: pointwise mutual information
    * PMI(a,b) = ln(c_ab·N / (c_a·c_b)) over adjacent-word bigrams,
    * with positional marginals (c_a = bigrams starting with a, c_b =
    * bigrams ending with b) and a `minCount` noise floor. All counts
    * are exact longs, so both engines derive the identical double
    * before the fix4 ranking value; ties break on the bigram text.
    *
    * Scale shape: one bigram Generate feeding three hash aggregates
    * (map-side partials); the marginal joins are keyed by the terms
    * themselves, N is a 1-row broadcast, and only the bounded top-k
    * ever sorts (TakeOrderedAndProject). Output: (w1, w2, c_ab, pmi).
    */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    // Adjacent-word bigrams ARE the n=2 shingle bag: one native
    // WordShingles call per doc (guide §4 — the old
    // transform(sequence(...), struct(element_at × 2)) tree evaluated
    // its lambda INTERPRETED per bigram), split back into words by the
    // single joining space (whitespace tokens cannot contain one).
    // Sub-2-word docs yield the empty array — exactly the rows the old
    // size(ws) >= 2 guard kept out.
    val b = graft.SparkUtil.ensureParallelism(df)
      .select(explode(Texts.shingleBagOf(col(textCol), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val c2 = b.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val l = b.groupBy("w1").agg(count(lit(1)).as("c_a"))
    val r = b.groupBy("w2").agg(count(lit(1)).as("c_b"))
    val n = b.agg(count(lit(1)).as("n_bigrams"))
    c2.join(l, "w1").join(r, "w2").join(broadcast(n))
      .select(col("w1"), col("w2"), col("c_ab"),
        Numerics.fix4(log(
          col("c_ab").cast("double") * col("n_bigrams") /
            (col("c_a").cast("double") * col("c_b")))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  def bigramLogLoss(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Same native bigram stream as [[pmiCollocations]]: n=2 shingle
    // bag from ONE WordShingles call per doc, split on the joining
    // space (guide §4; the transform/element_at tree ran interpreted
    // per bigram). Sub-2-word docs explode to nothing, replacing the
    // old size(ws) >= 2 guard.
    def stream(src: DataFrame): DataFrame = src
      .select(col(idCol), explode(Texts.shingleBagOf(col(textCol), 2)).as("bg"))
      .select(col(idCol),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val b = stream(graft.SparkUtil.ensureParallelism(df))
    val c2 = b.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = b.groupBy("w1").agg(count(lit(1)).as("c1"))
    // No broadcast hints: c1/c2 are BIGRAM-VOCABULARY-grain, which on
    // a web-scale corpus is not driver-friendly — AQE broadcasts them
    // when they measure small and falls back to shuffle joins when
    // they don't. The constant-memory alternative at any scale is the
    // CMS sketch scorer (cmsTermFrequency, q146).
    b.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        Numerics.fix4(
          avg(log(col("c1").cast("double")) - log(col("c2").cast("double"))))
          .as("avg_nll"))
  }

  /** TF-IDF top-k terms per document. Distributed shape: one explode →
    * (doc, term) count aggregate (map-side partials) → document
    * frequency from a second aggregate over the SAME (doc, term) rows
    * (no second pass over text) → equi-join by term (fact-fact shuffle;
    * the term dictionary is far smaller than the corpus) → 1-row doc
    * count broadcast → per-doc top-k window. Deterministic: ties break
    * by term ascending; idf = ln((N+1)/(df+1)) + 1 (smoothed).
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.SparkUtil.ensureParallelism(df)
    val tf = base
      .select(col(idCol).as("id"), explode(Texts.words(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    // rank on the fix4-ROUNDED score: a raw-double order could flip on
    // last-ulp ln() differences across engines/libms; rounded ties
    // break by term, deterministic everywhere
    val w = Window.partitionBy("id")
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(docFreq, "term")
      .join(broadcast(nDocs)) // 1-row broadcast, like the scalar subquery
      .withColumn("tfidf", Numerics.fix4(
        col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0)))
      .withColumn("term_rank", row_number().over(w).cast("int"))
      .where(col("term_rank") <= k)
      .select(col("id").as(idCol), col("term"), col("term_rank"),
        col("tf"), col("df"),
        Numerics.fix4(col("tfidf")).as("tfidf_score"))
  }

  /** Within-document n-gram repetition: share of duplicate n-grams —
    * the boilerplate/spam signal production quality filters cut on.
    * Exact integer counts; the ratio is one integer division.
    */
  def repetitionRatio(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Shape note (round 10): the original per-row form built the
    // shingle ARRAY with transform/element_at HOFs + array_distinct —
    // all interpreted, and the top cost of the whole bench once the
    // noop action stopped count() from pruning it (31 s at sf0.1).
    // This form explodes tokens once (codegen), assembles each n-gram
    // from window leads, and counts distinct per doc in a partial-agg
    // — 10x faster and the shuffle is token-grain, which is also the
    // 100 TB shape (no giant per-row arrays in memory).
    val toks = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol),
        posexplode(Texts.words(col(textCol))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(idCol).orderBy(col("pos"))
    val parts = (0 until n).map(k =>
      if (k == 0) col("w") else lead(col("w"), k).over(byDoc))
    val grams = toks
      .select(col(idCol), concat_ws(" ", parts: _*).as("g"),
        parts.last.isNotNull.as("ok"))
      .where(col("ok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("ng"),
        countDistinct(col("g")).as("nd"))
    df.select(col(idCol))
      .join(grams, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("ng"), lit(0L)).as("n_grams"),
        coalesce(col("nd"), lit(0L)).as("n_distinct_grams"),
        Numerics.fix4(
          when(coalesce(col("ng"), lit(0L)) > 0,
            lit(1.0) - coalesce(col("nd"), lit(0L)).cast("double") /
              col("ng").cast("double"))
            .otherwise(lit(0.0))).as("repetition_ratio"))
  }

  /** Email pattern shared with the oracle (RE2-safe: no backrefs or
    * lookaround, so Java and DuckDB agree on every match).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs (ids, phone-ish numbers) — unambiguous greedy
    * match, identical across engines.
    */
  val LongNumberPattern = "[0-9]{9,}"

  /** PII scrubbing: replace emails / long digit runs with typed
    * placeholders, reporting per-doc match counts. Map-side only, no
    * shuffle; the redaction text AND both counts come from ONE
    * compiled-regex pass (the native
    * [[graft.functions.expressions.PiiScrub]] expression) — the
    * composable 4-regex-pass form measured 57 s at the 100× noop sweep
    * with all the time in java.util.regex, so the pass count IS the
    * cost at 100 TB.
    */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
        graft.GraftFunctions.piiScrub(col(textCol)).as("p"))
      .select(
        col(idCol),
        col("p.n_emails").as("n_emails"),
        col("p.n_long_numbers").as("n_long_numbers"),
        col("p.scrubbed").as("text_scrubbed"))
  }

  /** Split each document into fixed-size token windows with overlap —
    * the chunking pass that turns long documents into training-sized
    * examples. One transform + explode (no shuffle): chunk i covers
    * tokens [i·stride, i·stride + chunkTokens); the final chunk may be
    * short but is never empty; stride = chunkTokens − overlap.
    * Output: (idCol, chunk_seq, chunk_text, chunk_tokens).
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val ws = Texts.words(col(textCol))
    // number of chunks = ceil(max(n - overlap, 1) / stride)
    val n = size(ws)
    val nChunks = ceil((greatest(n - overlap, lit(1))).cast("double") / stride)
      .cast("int")
    val chunks = transform(
      sequence(lit(0), nChunks - 1),
      i => struct(
        (i + 1).cast("long").as("chunk_seq"),
        concat_ws(" ", slice(ws, i * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(n - i * stride, lit(chunkTokens)).cast("long")
          .as("chunk_tokens")))
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_seq"), col("c.chunk_text"),
        col("c.chunk_tokens"))
  }

  /** Corpus-level top n-gram statistics (duplicates counted): one
    * explode + one hash aggregation with map-side partials.
    */
  def topNgrams(
      df: DataFrame,
      textCol: String,
      n: Int,
      topK: Int): DataFrame = {
    val ws = Texts.words(col(textCol))
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))
    val all = when(size(ws) >= n, grams).otherwise(array())
    graft.SparkUtil.ensureParallelism(df)
      .select(explode(all).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("gram").asc)
      .limit(topK)
  }

  /** Bounded-memory frequent-candidate counter: the Misra-Gries
    * "frequent" algorithm (Misra & Gries 1982; the space-saving family).
    * At most `capacity` counters; a full table absorbs an unseen token
    * by decrementing every counter (amortized O(1) — each decrement
    * cancels one earlier increment). Guarantee: any token whose true
    * frequency exceeds N/(capacity+1) of the N offered tokens is still
    * in the table at the end.
    */
  private final class MisraGries(capacity: Int) {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    def offer(t: String): Unit = counts.get(t) match {
      case Some(c) => counts(t) = c + 1
      case None if counts.size < capacity => counts(t) = 1L
      case None =>
        for (k <- counts.keys.toArray) {
          val v = counts(k)
          if (v == 1L) counts.remove(k) else counts(k) = v - 1
        }
    }
  }

  /** Grouped approximate top-k terms: per-partition Misra-Gries
    * candidate sketches, then an EXACT recount of the candidate union.
    *
    * The scale shape is what matters: a naive grouped top-k shuffles
    * the full distinct (group, term) space — at corpus scale that is
    * the vocabulary times the group count. Phase 1 instead keeps at
    * most `capacity` counters per group per input partition and emits
    * only the surviving candidate terms, so the shuffle carries
    * O(groups x capacity x partitions) rows regardless of vocabulary
    * size. Phase 2 recounts ONLY the candidates (broadcast join on the
    * tiny candidate set, aggregate over few distinct keys) — output
    * counts are exact, and the output top-k equals the true top-k
    * whenever every true top-k term survives some partition's sketch,
    * which Misra-Gries guarantees for terms with partition frequency
    * above N_p/(capacity+1). Ties break deterministically: freq desc,
    * term asc.
    *
    * Memory bound: the per-partition sketch map is
    * O(distinct groups in the partition x capacity) — group
    * cardinality is data-dependent, so a `maxGroupsPerPartition` guard
    * FAILS LOUDLY (the q120/q155 discipline) instead of silently
    * OOMing an executor when a partition carries too many groups;
    * repartition by the group column (bounding distinct groups per
    * partition) or raise the cap.
    */
  def approxTopTerms(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int,
      capacity: Int = 2048,
      maxGroupsPerPartition: Int = 100000): DataFrame = {
    val ss = df.sparkSession
    import ss.implicits._
    val tokens = graft.SparkUtil.ensureParallelism(df)
      .select(
        col(groupCol).cast("string").as("g"),
        explode(Texts.words(col(textCol))).as("term"))
      .where(col("term") =!= "")
    val candidates = tokens.as[(String, String)]
      .mapPartitions { it =>
        val perGroup = scala.collection.mutable.HashMap.empty[String, MisraGries]
        it.foreach { case (g, t) =>
          val mg = perGroup.getOrElse(g, {
            if (perGroup.size >= maxGroupsPerPartition)
              throw new IllegalStateException(
                s"approxTopTerms: over $maxGroupsPerPartition distinct " +
                  "groups in one input partition (sketch memory is " +
                  "groups x capacity) - repartition by the group column " +
                  "or raise maxGroupsPerPartition")
            val fresh = new MisraGries(capacity)
            perGroup.update(g, fresh)
            fresh
          })
          mg.offer(t)
        }
        perGroup.iterator.flatMap { case (g, mg) =>
          mg.counts.keysIterator.map(t => (g, t))
        }
      }
      .toDF("g", "term")
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("freq").desc, col("term").asc)
    tokens
      .join(broadcast(candidates), Seq("g", "term")) // candidate filter
      .groupBy("g", "term")
      .agg(count(lit(1)).as("freq"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("g").as(groupCol), col("term"), col("freq"), col("rk"))
  }

  /** Per-group category-distribution entropy — the corpus-diversity
    * diagnostic ("how language-diverse is each source?"): for each
    * group, Shannon entropy −Σ p·ln p over the category proportions,
    * plus the category count and row count. Two hash aggregates: the
    * (group, category) counts reduce first (map-side partials), then
    * the per-group totals broadcast back onto that tiny table for the
    * entropy sum — the big table is scanned exactly once.
    * Output: (groupCol, n_rows, n_categories, entropy).
    */
  def categoryEntropy(
      df: DataFrame,
      groupCol: String,
      categoryCol: String): DataFrame = {
    val counts = graft.SparkUtil.ensureParallelism(df)
      .groupBy(col(groupCol), col(categoryCol))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(groupCol)
      .agg(sum(col("c")).as("n"))
    counts.join(broadcast(totals), groupCol)
      .select(col(groupCol), col("c"), col("n"),
        (col("c").cast("double") / col("n")).as("p"))
      .groupBy(groupCol)
      .agg(
        first(col("n")).as("n_rows"),
        count(lit(1)).as("n_categories"),
        Numerics.fix4(-sum(col("p") * log(col("p")))).as("entropy"))
  }

  /** Document-frequency histogram — the vocabulary-pruning diagnostic:
    * for each df value, how many distinct terms appear in exactly df
    * documents (hapax legomena live at df = 1). Two hash aggregates
    * over the exploded distinct-(term, doc) stream, both with map-side
    * partials; output is at most |distinct df values| rows, so the
    * second shuffle is tiny at any corpus size.
    */
  def dfHistogram(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.SparkUtil.ensureParallelism(df)
      .select(
        col(idCol),
        explode(array_distinct(Texts.words(col(textCol)))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("df"))
      .groupBy("df")
      .agg(count(lit(1)).as("n_terms"))
      .orderBy("df")

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (lexical BM25 + a second signal, or any N rankers): each source
    * contributes 1/(rrfK + rank) and documents re-rank on the summed
    * score. Rank-based, so incomparable raw scores fuse without
    * calibration.
    *
    * Cross-engine determinism: the fused ranking orders on the
    * fix4-ROUNDED score with an id tiebreak, so float-sum noise can
    * never flip a rank; with ≤ 2 sources the raw sum itself is
    * order-exact anyway (IEEE addition is commutative), and each term
    * 1/(rrfK + r) is one correctly-rounded division in both engines.
    *
    * Scale shape: each input is already top-k-bounded per query, so
    * the union + one (query, doc) hash aggregate + one per-query
    * window over ≤ N·k rows cost nothing next to the searches
    * themselves. Output: (query_id, doc_id, rrf_rank, rrf_score),
    * `topK` rows per query.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      queryCol: String,
      docCol: String,
      rankCol: String,
      topK: Int,
      rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rankings.nonEmpty, "need at least one ranking")
    val unioned = rankings
      .map(r => r.select(col(queryCol).as("query_id"),
        col(docCol).as("doc_id"), col(rankCol).cast("long").as("rank")))
      .reduceLeft(_.unionAll(_))
    unioned
      .groupBy("query_id", "doc_id")
      .agg(sum(lit(1.0) / (lit(rrfK) + col("rank"))).as("score"))
      .select(col("query_id"), col("doc_id"),
        Numerics.fix4(col("score")).as("rrf_score"))
      .withColumn("rrf_rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("doc_id").asc)))
      .where(col("rrf_rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rrf_rank"),
        col("rrf_score"))
  }

  /** BPE merge induction — the first `iters` merge decisions of a
    * byte-pair-encoding tokenizer trainer, with each iteration's top-k
    * pair table as the audit trail. This is the distributed half of
    * tokenizer training: everything corpus-sized happens in one scan +
    * hash aggregate (word frequencies), and every subsequent iteration
    * runs on the VOCABULARY-sized word-frequency table — the classic
    * trainer compression that makes BPE tractable at 100 TB (corpus
    * scans don't repeat per merge; a vocabulary is millions of rows,
    * not trillions).
    *
    * Representation: symbols are single chars; iteration i's winning
    * pair is replaced by the placeholder char chr(i) (left-to-right
    * non-overlapping, exactly Java's/DuckDB's `replace`), so adjacent-
    * pair enumeration stays `substring(word, i, 2)` every round —
    * codegen-friendly and line-for-line oracle-transcribable.
    * Placeholders expand back to readable symbol strings in the
    * output. Control chars chr(1..iters) must be absent from the
    * corpus (they are stripped by normalization in any sane pipeline;
    * the operator asserts iters < 32 keeps placeholders in the C0
    * range).
    *
    * Determinism: exact long pair counts; the winner (and the top-k
    * ordering) tie-breaks on the pair string, so both engines pick
    * identical merges. The per-iteration winner is collected to the
    * driver — a BPE merge TABLE is driver-state by nature (it is the
    * tokenizer artifact being built), and it is `iters` rows, not data.
    *
    * Output: (iter, symbol_a, symbol_b, pair_count) — top-k pairs per
    * iteration, ordered (iter, pair_count DESC, symbol_a, symbol_b).
    */
  /** The md5-derived integer weight for hashed-feature bucket `j` —
    * pseudo-random in [-500, 500], derived identically on the driver
    * (here) and in DuckDB
    * (`('0x'||substr(md5('qw|'||j),1,15))::BIGINT % 1001 - 500`), so a
    * classifier score is engine-replayable without shipping a model
    * artifact to the oracle.
    */
  private def bucketWeight(j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"qw|$j".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 1001L - 500L
  }

  /** Quality-classifier INFERENCE — the learned complement of the
    * rule cascade (q76): a hashed-unigram linear model scored in one
    * pass. Each token hashes into one of `dim` feature buckets
    * ([[Hashes.hash60]] mod dim); the bucket's integer weight comes
    * from a driver-built weight array embedded in the plan as a
    * `typedLit` array literal (the broadcast — a weight vector is
    * KBs), looked up by one codegen'd `element_at` per token; the
    * per-doc score is the mean weight. Integer weights keep the dot
    * product shuffle-order-exact (the round-10 float-sum rule); the
    * single division is fix4'd.
    *
    * Shape at 100 TB: explode + map-side weight lookup + one partial
    * aggregate keyed by doc — the same token-grain partial-agg shape
    * as every text operator here; no join, no broadcast table, no
    * driver data motion beyond the dim-sized weight literal.
    *
    * Output: (idCol, n_tokens, score_sum, quality_score), one row per
    * doc with at least one token.
    */
  def qualityClassifierScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 256,
      seed: Int = 7): DataFrame = {
    require(dim >= 2 && dim <= 65536, "dim must be in [2, 65536]")
    val weights = Array.tabulate(dim)(bucketWeight)
    val bucket = (Hashes.hash60(col("token"), seed) % dim).cast("int")
    val w = element_at(typedLit(weights.toSeq), bucket + 1)
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), explode(Texts.words(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .select(col(idCol), w.as("__w"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("__w")).as("score_sum"))
      .select(col(idCol), col("n_tokens"), col("score_sum"),
        Numerics.fix4(
          col("score_sum").cast("double") / col("n_tokens"))
          .as("quality_score"))
  }

  /** Word-frequency table the BPE trainer iterates on (vocabulary-
    * grain; 1-char words carry no pairs and are excluded).
    */
  private def bpeWordFreq(df: DataFrame, textCol: String): DataFrame = df
    .select(explode(Texts.words(col(textCol))).as("word"))
    .where(length(col("word")) >= 2)
    .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent-pair counts over a (word, freq) table. */
  private def bpePairCounts(wf: DataFrame): DataFrame = wf
    .where(length(col("word")) >= 2)
    .select(
      explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"),
      col("freq"))
    .groupBy("pair").agg(sum(col("freq")).as("pair_count"))

  def bpeMergeSteps(
      df: DataFrame,
      textCol: String,
      iters: Int = 2,
      topK: Int = 10): DataFrame = {
    require(iters >= 1 && iters < 32, "iters must be in [1, 32)")
    val spark = df.sparkSession
    val wf0 = bpeWordFreq(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairCounts(wf: DataFrame): DataFrame = bpePairCounts(wf)
    var expansions = Map.empty[Char, String]
    def expand(sym: String): String =
      sym.flatMap(ch => expansions.getOrElse(ch, ch.toString))
    var wf = wf0
    val rows = Seq.newBuilder[(Int, String, String, Long)]
    (1 to iters).foreach { it =>
      val top = pairCounts(wf)
        .orderBy(col("pair_count").desc, col("pair"))
        .limit(topK).collect()
      rows ++= top.map { r =>
        val p = r.getString(0)
        (it, expand(p.substring(0, 1)), expand(p.substring(1, 2)),
          r.getLong(1))
      }
      if (it < iters && top.nonEmpty) {
        val best = top.head.getString(0)
        expansions += (it.toChar -> expand(best))
        wf = wf.withColumn("word",
          call_function("replace",
            col("word"), lit(best), lit(it.toChar.toString)))
      }
    }
    wf0.unpersist()
    import spark.implicits._
    rows.result()
      .toDF("iter", "symbol_a", "symbol_b", "pair_count")
      .orderBy(col("iter"), col("pair_count").desc,
        col("symbol_a"), col("symbol_b"))
  }

  /** The trainer half of BPE tokenization as an ARTIFACT: the ordered
    * merge table [[bpeMergeSteps]] audits, returned as data. Entry i
    * is (pair, symbol): `pair` is the 2-char placeholder-representation
    * string merged at step i+1 (its merged token becomes the
    * placeholder char chr(i+1) in subsequent steps), `symbol` the
    * fully-expanded readable form. Same decision rule as
    * [[bpeMergeSteps]] — exact long counts, (count DESC, pair) tie-
    * break — so both are engine-replayable. Each iteration collects
    * exactly ONE row (the winning pair): the merge table is the
    * tokenizer being built, driver-state by nature; corpus-sized work
    * stays in the one scan behind the word-frequency aggregate.
    */
  def bpeTrainMerges(
      df: DataFrame,
      textCol: String,
      iters: Int): Seq[(String, String)] = {
    require(iters >= 1 && iters < 32, "iters must be in [1, 32)")
    val wf0 = bpeWordFreq(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var expansions = Map.empty[Char, String]
    def expand(sym: String): String =
      sym.flatMap(ch => expansions.getOrElse(ch, ch.toString))
    var wf = wf0
    val out = Seq.newBuilder[(String, String)]
    var it = 1
    var dry = false
    while (it <= iters && !dry) {
      val top = bpePairCounts(wf)
        .orderBy(col("pair_count").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val best = top.head.getString(0)
        out += ((best, expand(best)))
        expansions += (it.toChar -> expand(best))
        wf = wf.withColumn("word",
          call_function("replace",
            col("word"), lit(best), lit(it.toChar.toString)))
      }
      it += 1
    }
    wf0.unpersist()
    out.result()
  }

  /** BPE apply/encode — tokenize a corpus with a learned merge table
    * (the missing twin of [[bpeTrainMerges]]; together they make token
    * counting tokenizer-true instead of whitespace/regex-grade).
    *
    * `merges` is [[bpeTrainMerges]]' pair column: rank-i's 2-char
    * placeholder-representation pair rewrites to chr(i+1), applied in
    * rank order as left-to-right non-overlapping `replace` — exactly
    * the trainer's rewrite, so train-then-encode round-trips. The
    * merge list rides the plan as `iters` chained codegen'd `replace`
    * literals (a merge table is tokenizer-artifact-sized — KBs — so
    * literal-chaining IS the broadcast); the corpus scan stays one
    * WholeStageCodegen pass, no shuffle until the caller aggregates.
    *
    * Output is token-grain: (idCol, word_idx, char_idx, token,
    * token_id) where (word_idx, char_idx) orders tokens within the
    * doc, `token` is the readable (expanded) symbol and `token_id` is
    * deterministic across engines: merged symbols (placeholders
    * chr(1..31)) get 255 + rank, base characters their code point —
    * the byte-fallback id scheme real BPE vocabularies use.
    * Concatenating a word's tokens reproduces the word (round-trip
    * spec-asserted). Corpus text must not contain C0 control chars
    * (any sane normalization strips them; the trainer's placeholder
    * alphabet lives there).
    */
  def bpeEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[String]): DataFrame = {
    require(merges.size < 32, "at most 31 merges (C0 placeholder range)")
    require(merges.forall(_.length == 2),
      "each merge is a 2-char placeholder-representation pair")
    var expansions = Map.empty[Char, String]
    def expand(sym: String): String =
      sym.flatMap(ch => expansions.getOrElse(ch, ch.toString))
    merges.zipWithIndex.foreach { case (p, i) =>
      expansions += ((i + 1).toChar -> expand(p))
    }
    var enc: Column = col("__word")
    merges.zipWithIndex.foreach { case (p, i) =>
      enc = call_function("replace", enc, lit(p), lit((i + 1).toChar.toString))
    }
    val expanded = expansions.foldLeft(col("token")) { case (c, (ph, ex)) =>
      call_function("replace", c, lit(ph.toString), lit(ex))
    }
    val a = ascii(col("token"))
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), posexplode(Texts.words(col(textCol))))
      .withColumnRenamed("pos", "word_idx")
      .withColumnRenamed("col", "__word")
      .where(col("__word") =!= "")
      .select(col(idCol), col("word_idx"), enc.as("__enc"))
      .select(col(idCol), col("word_idx"),
        posexplode(expr(
          "transform(sequence(1, length(__enc)), i -> substring(__enc, i, 1))")))
      .withColumnRenamed("pos", "char_idx")
      .withColumnRenamed("col", "token")
      .select(col(idCol), col("word_idx"), col("char_idx"),
        expanded.as("token"),
        when(a <= 31, a + 255).otherwise(a).cast("int").as("token_id"))
  }

  /** WordPiece apply/encode — tokenize a corpus with a planted
    * greedy-longest-match vocabulary (the SECOND tokenizer family
    * next to [[bpeEncode]], so fertility audits can price a tokenizer
    * swap instead of BPE against itself). The per-word kernel is the
    * codegen'd `graft_wordpiece` expression
    * (functions/expressions/WordPieceEncode.scala): `##`-prefixed
    * vocab pieces are continuations (match only at word position >
    * 0), the longest matching piece wins at every position, and a
    * word with any unmatched position encodes to the single `[UNK]`
    * token. The vocabulary rides the plan as a foldable array literal
    * — tokenizer artifacts are KBs, the literal IS the broadcast —
    * and the corpus scan stays one WholeStageCodegen pass, no shuffle
    * until the caller aggregates.
    *
    * Output is token-grain: (idCol, word_idx, piece_idx, token),
    * (word_idx, piece_idx) ordering tokens within the doc.
    * Concatenating a non-UNK word's pieces (continuations stripped of
    * `##`) reproduces the word (spec-asserted).
    */
  def wordPieceEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[String]): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), posexplode(Texts.words(col(textCol))))
      .withColumnRenamed("pos", "word_idx")
      .where(col("col") =!= "")
      .select(col(idCol), col("word_idx"),
        posexplode(graft.GraftFunctions.wordPiece(col("col"), vocab)))
      .withColumnRenamed("pos", "piece_idx")
      .withColumnRenamed("col", "token")
  }

  /** WordPiece merge induction — the trainer half of the SECOND
    * tokenizer family ([[wordPieceEncode]] applies a vocab; this
    * induces one), completing the train+encode symmetry BPE has
    * (q128/q188). Same iterative rewrite machinery as
    * [[bpeTrainMerges]] (C0 placeholders, left-to-right
    * non-overlapping `replace`), but the WordPiece DECISION RULE:
    * merge the adjacent pair maximizing the unigram-likelihood score
    *   score(ab) = count(ab) / (count(a) · count(b))
    * — the published WordPiece objective — instead of BPE's raw
    * count. Counts are exact longs over the multi-char word-frequency
    * table (pairs count overlapping occurrences, like the BPE
    * trainer; units are single symbols weighted by word freq).
    *
    * Cross-engine determinism is the hard part: the score is a
    * RATIONAL whose float image ties unpredictably, so the argmax
    * compares exactly in integers — score(p) > score(q) ⟺
    * pc_p·ca_q·cb_q > pc_q·ca_p·cb_p (BigInt here, HUGEINT products
    * in the DuckDB oracle's NOT-EXISTS argmax) — score ties break by
    * pair ascending. Training is POSITIONLESS (no initial-vs-`##`
    * distinction while counting — the documented trade; emit trained
    * pieces in both forms when building an encode vocab). Per
    * iteration the driver collects only vocabulary-grain count tables
    * (|alphabet|² pairs, |alphabet| units — KBs); corpus-sized work
    * stays in the one word-frequency aggregate.
    *
    * Output (one row per merge step): (iter, piece, pair_count,
    * left_count, right_count) with `piece` the fully-expanded merged
    * symbol.
    */
  def wordPieceTrainSteps(
      df: DataFrame,
      textCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters < 32, "iters must be in [1, 32)")
    val spark = df.sparkSession
    val wf0 = bpeWordFreq(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var expansions = Map.empty[Char, String]
    def expand(sym: String): String =
      sym.flatMap(ch => expansions.getOrElse(ch, ch.toString))
    var wf = wf0
    val rows = Seq.newBuilder[(Int, String, Long, Long, Long)]
    var it = 1
    var dry = false
    while (it <= iters && !dry) {
      val pairs = bpePairCounts(wf).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val units = wf
        .select(
          explode(expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
            .as("u"),
          col("freq"))
        .groupBy("u").agg(sum(col("freq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val cand = pairs.flatMap { case (p, pc) =>
        for {
          ca <- units.get(p.substring(0, 1))
          cb <- units.get(p.substring(1, 2))
        } yield (p, pc, ca, cb)
      }
      if (cand.isEmpty) dry = true
      else {
        val best = cand.reduce[(String, Long, Long, Long)] { (x, y) =>
          val l = BigInt(x._2) * (BigInt(y._3) * y._4)
          val r = BigInt(y._2) * (BigInt(x._3) * x._4)
          if (l > r) x
          else if (r > l) y
          else if (x._1 <= y._1) x
          else y
        }
        rows += ((it, expand(best._1), best._2, best._3, best._4))
        expansions += (it.toChar -> expand(best._1))
        wf = wf.withColumn("word",
          call_function("replace",
            col("word"), lit(best._1), lit(it.toChar.toString)))
      }
      it += 1
    }
    wf0.unpersist()
    import spark.implicits._
    rows.result()
      .toDF("iter", "piece", "pair_count", "left_count", "right_count")
      .orderBy("iter")
  }

  /** Bloom-prefiltered exact decontamination — remove every corpus doc
    * whose normalized-text digest appears in the probe/benchmark set,
    * EXACTLY, while keeping the bulk of the corpus out of the anti-join
    * entirely. A Bloom filter over the probe digests (driver-built —
    * the probe is an eval set, small by nature) broadcast to the scan
    * splits the corpus: bloom-NEGATIVE rows are definitely clean (no
    * false negatives) and ship straight to the output with zero
    * shuffle; only the ~fpp·corpus + true-hit rows proceed to the
    * exact anti-join confirm. At 100 TB this is the difference between
    * shuffling everything and shuffling ~1%: the join only ever sees
    * bloom survivors, and the result is bit-identical to the exact
    * anti-join (the bloom can only over-approximate the contaminated
    * set, and the join removes the false positives).
    *
    * The membership probe is the codegen'd `graft_bloom_contains`
    * expression (`functions/expressions/BloomContains.scala`): the
    * driver-serialized sketch rides the plan as a foldable binary
    * literal — the same shape Spark's runtime-filter rewrite emits for
    * `BloomFilterMightContain` — so the corpus scan stays inside one
    * WholeStageCodegen span (asserted by PlanHygieneSpec).
    */
  def bloomDecontaminate(
      corpus: DataFrame,
      probe: DataFrame,
      textCol: String,
      fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    graft.GraftFunctions.register(spark)
    val digest = md5(Texts.normText(col(textCol)))
    val probeDigests = probe.select(digest.as("digest")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = math.max(probeDigests.count(), 1L)
    val bloom = probeDigests.stat.bloomFilter("digest", n, fpp)
    val bloomBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = coalesce(
      graft.GraftFunctions.bloomContains(lit(bloomBytes), col("__digest")),
      lit(false))
    val tagged = corpus.withColumn("__digest", digest)
    val clean = tagged.where(!mightContain)
    val confirmed = tagged.where(mightContain)
      .join(probeDigests.withColumnRenamed("digest", "__digest"),
        Seq("__digest"), "left_anti")
    val out = clean.unionByName(confirmed).drop("__digest")
    probeDigests.unpersist()
    out
  }

  /** Count-min sketch term-frequency estimation with an exact error
    * audit. The sketch is `depth` rows of `width` counters; every token
    * occurrence increments cell (r, hash_r(term) % width) for each row
    * r, and a term's estimate is the MIN over its `depth` cells —
    * always ≥ the true count (collisions only add). At 100 TB this is
    * THE frequency structure: the shuffle is keyed by depth·width
    * cells (constant, with map-side combine), never by the unbounded
    * vocabulary — complementing Misra-Gries top-k (q72), which keeps
    * heavy hitters but no queryable estimate for arbitrary terms.
    *
    * Hashing is the md5-derived [[Hashes.hash60]] both engines compute
    * bit-identically, so the ESTIMATES are deterministic and
    * oracle-checkable, not just bounded. The audit joins the top
    * `topN` exact terms (deterministic ties: count desc, term asc)
    * against their sketch estimates and reports the overestimate.
    */
  def cmsTermFrequency(
      corpus: DataFrame,
      textCol: String,
      width: Int,
      depth: Int = 4,
      topN: Int = 20): DataFrame = {
    require(width >= 2 && depth >= 1 && topN >= 1,
      "cms needs width >= 2, depth >= 1, topN >= 1")
    val terms = corpus
      .select(explode(Texts.words(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def cellOf(r: Int) = Hashes.hash60(col("term"), r) % width
    // the sketch proper: built straight off the token stream — the
    // aggregate is keyed by (row, cell), depth·width counters total
    val sketch = (0 until depth)
      .map(r => terms.select(
        lit(r).as("r"), cellOf(r).as("cell")))
      .reduce(_ unionAll _)
      .groupBy(col("r"), col("cell"))
      .agg(count(lit(1)).as("cell_cnt"))
    // audit side: exact counts exist at this scale; keep the topN via
    // sort+limit (TakeOrderedAndProject — per-partition top-N then a
    // driver merge of topN rows, never a single-partition window sort
    // of the vocabulary)
    val audited = terms.groupBy("term")
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term"))
      .limit(topN)
    val probes = (0 until depth)
      .map(r => audited.select(
        col("term"), col("exact_cnt"), lit(r).as("r"), cellOf(r).as("cell")))
      .reduce(_ unionAll _)
    val out = probes
      .join(sketch, Seq("r", "cell"))
      .groupBy(col("term"))
      .agg(
        max(col("exact_cnt")).as("exact_cnt"),
        min(col("cell_cnt")).as("est_cnt"))
      .withColumn("over_est", col("est_cnt") - col("exact_cnt"))
    terms.unpersist()
    out
  }
  /** Content-defined chunking (the FastCDC/rsync boundary idea on the
    * pure mask rule): a chunk boundary falls after every position
    * whose trailing `gram`-char window hashes to 0 mod `mask` — so
    * boundaries are decided by LOCAL content, and an insertion near
    * the start of a document shifts only the chunks up to the next
    * surviving boundary while every later chunk keeps its digest
    * (fixed-width chunking q57 re-digests EVERYTHING after an edit;
    * the spec proves the contrast). Expected chunk length ≈ `mask`
    * chars. This is the dedup-stable chunker a crawl pipeline pairs
    * with chunk-level exact dedup (q93).
    *
    * Scale shape: q30's position-grain form — explode gram START
    * positions, slice + hash with codegen'd substring/md5 (no per-row
    * gram arrays, no interpreted HOFs); boundary rows are ~len/mask
    * per doc, chunk assembly is a per-doc window over BOUNDARY rows
    * only (never position rows), and the chunk text digest slices the
    * original text once per chunk. Docs shorter than `gram` (but
    * non-empty) yield one whole-doc chunk; empty docs yield none.
    *
    * Output: (idCol, chunk_idx, start, chunk_len, chunk_digest) —
    * 1-based char offsets, md5 digests.
    */
  def contentDefinedChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      gram: Int = 8,
      mask: Int = 64,
      seed: Int = 5): DataFrame = {
    require(gram >= 1 && mask >= 2, "need gram >= 1 and mask >= 2")
    import org.apache.spark.sql.expressions.Window
    val base = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), col(textCol).as("t"),
        length(col(textCol)).as("len"))
    // gram END positions p in [gram, len]; guarded sequence() for the
    // descending-range trap on short docs
    val pos = base.select(col(idCol), col("t"),
      explode(when(col("len") >= gram,
        sequence(lit(gram), col("len"))).otherwise(array())).as("p"))
    val bnd = pos
      .where(pmod(Hashes.hash60(
        expr(s"substring(t, p - ${gram - 1}, $gram)"), seed),
        lit(mask)) === 0)
      .select(col(idCol), col("p").as("b"))
    // chunk ENDS = boundaries plus the doc end (dedup'd when the end
    // itself is a boundary)
    val ends = bnd
      .unionByName(base.where(col("len") > 0)
        .select(col(idCol), col("len").as("b")))
      .distinct()
    val w = Window.partitionBy(idCol).orderBy("b")
    graft.SparkUtil.ensureParallelism(ends)
      .select(col(idCol),
        (coalesce(lag(col("b"), 1).over(w), lit(0)) + 1).as("start"),
        col("b").as("end"),
        row_number().over(w).as("chunk_idx"))
      .join(base.select(col(idCol), col("t")), idCol)
      .select(
        col(idCol), col("chunk_idx"), col("start"),
        (col("end") - col("start") + 1).as("chunk_len"),
        md5(expr("substring(t, start, end - start + 1)"))
          .as("chunk_digest"))
  }

  /** Sentence segmentation + per-document sentence statistics — the
    * grain sentence-level curation filters (too-short sentences,
    * one-sentence spam pages, mean-length quality gates) and
    * sentence-dedup pipelines run at. The splitter is a DETERMINISTIC
    * regex — terminal punctuation run followed by spaces — chosen
    * over an abbreviation-aware model because both engines must split
    * IDENTICALLY (the rule is the contract, the oracle replays it);
    * the final sentence keeps its terminal punctuation (no trailing
    * delimiter), empty pieces are dropped.
    *
    * One explode + one hash aggregate — no window, no join; the
    * first-sentence digest uses min_by on the piece ordinal, so it is
    * shuffle-order-exact.
    *
    * Output: (idCol, n_sentences, mean_sent_chars fix4,
    * max_sent_chars, first_sentence_md5).
    */
  def sentenceStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol),
        posexplode(split(col(textCol), "[.!?]+[ ]+")).as(Seq("pos", "s")))
      .where(col("s") =!= "")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_sentences"),
        Numerics.fix4(sum(length(col("s"))).cast("double") /
          count(lit(1))).as("mean_sent_chars"),
        max(length(col("s"))).cast("long").as("max_sent_chars"),
        md5(min_by(col("s"), col("pos"))).as("first_sentence_md5"))

  /** Unicode script histogram + dominant-script label — the
    * multilingual-curation complement of [[langId]] (stopword lists
    * only see languages they know; SCRIPT counts see every writing
    * system): per document, how many characters belong to the Latin,
    * Cyrillic, Han and Arabic scripts, how many are ASCII digits, and
    * the dominant script by count (fixed precedence latin > cyrillic
    * > han > arabic on ties — the argmax rule IS the contract). The
    * pass routing Cyrillic docs to a Russian pipeline, flagging
    * mixed-script spam, or measuring script composition of a crawl.
    *
    * Pure codegen'd regexp_count per class — Unicode script classes
    * are standard-defined, so Java (`\p{IsLatin}`) and RE2
    * (`\p{Latin}`) count identically on every assigned codepoint;
    * the oracle uses RE2 spellings of the SAME classes.
    *
    * Output: (idCol, n_latin, n_cyrillic, n_han, n_arabic, n_digit,
    * dominant_script).
    */
  def scriptHistogram(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String) =
      regexp_count(t, lit(cls)).cast("long")
    val latin = col("n_latin"); val cyr = col("n_cyrillic")
    val han = col("n_han"); val ar = col("n_arabic")
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol),
        cnt("\\p{IsLatin}").as("n_latin"),
        cnt("\\p{IsCyrillic}").as("n_cyrillic"),
        cnt("\\p{IsHan}").as("n_han"),
        cnt("\\p{IsArabic}").as("n_arabic"),
        cnt("[0-9]").as("n_digit"))
      .withColumn("dominant_script",
        when(latin >= cyr && latin >= han && latin >= ar, lit("latin"))
          .when(cyr >= han && cyr >= ar, lit("cyrillic"))
          .when(han >= ar, lit("han"))
          .otherwise(lit("arabic")))
  }

  /** HTML → text extraction — the step a web-crawl pretraining
    * pipeline runs on every page before any text analysis: drop
    * script/style/comment payloads, turn block-level tags into line
    * breaks, strip every remaining tag, decode the core entities
    * (amp LAST, the standard order), collapse whitespace. Plus the
    * boilerplate signals curation filters on: the title, the anchor
    * count, and link density (anchor-TEXT chars / extracted chars —
    * nav/footer boilerplate is link-dense, body prose is not).
    *
    * Deliberately a CHAIN OF CODEGEN'D BUILT-INS (regexp_replace /
    * regexp_extract / regexp_count / replace), not a hand parser:
    * every step has an exact DuckDB twin, so the whole extraction is
    * hash-gated cross-engine; the patterns avoid backreferences
    * (RE2-safe) and \x0B-class edge chars. A conformant-DOM parser
    * would differ only on malformed nesting, which a crawl pipeline
    * treats as best-effort anyway.
    *
    * Output: (idCol, title, text, n_links, link_density) with
    * link_density fix4'd, 0.0 for empty extractions.
    */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    def decodeEntities(c: Column): Column = {
      // fixed decode order, amp last — identical replace() chain in SQL
      val steps = Seq(
        "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      steps.foldLeft(c) { case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
      }
    }
    def stripToText(c: Column): Column = {
      val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
      val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
      val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
      val blocks = regexp_replace(noComment,
        "(?i)</?(p|div|br|h[1-6]|li|tr|table|ul|ol)[^>]*>", "\n")
      val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
      trim(regexp_replace(decodeEntities(noTags), "[ \\t\\n\\r]+", " "))
    }
    // anchor text: the contents of <a ...>...</a> spans, extracted
    // then flattened — its length over the total text length is the
    // link-density boilerplate signal.
    val anchorInner = regexp_replace(
      array_join(regexp_extract_all(h,
        lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), " "),
      "(?s)<[^>]*>", " ")
    // LAYERED projections (the q136 discipline): the expensive strip
    // chain materializes into a named column ONCE and downstream
    // expressions reference the column — inlining it 3x into one
    // projection triples the regex passes (CollapseProject keeps
    // non-cheap multiply-referenced producers separate, each kernel
    // codegens once).
    graft.SparkUtil.ensureParallelism(df)
      .select(
        col(idCol),
        h.as("__h"),
        stripToText(h).as("text"),
        length(trim(regexp_replace(decodeEntities(anchorInner),
          "[ \\t\\n\\r]+", " "))).cast("double").as("__anchor_len"))
      .select(
        col(idCol),
        regexp_extract(col("__h"), "(?is)<title[^>]*>(.*?)</title>", 1)
          .as("title"),
        col("text"),
        regexp_count(col("__h"), lit("(?i)<a[\\s>]")).cast("long")
          .as("n_links"),
        Numerics.fix4(
          when(length(col("text")) > 0,
            col("__anchor_len") / length(col("text")))
            .otherwise(lit(0.0))).as("link_density"))
  }

  /** Packing constant for the unigram dp: dp = K·total_cost + tokens,
    * making (cost, token count) ONE integer minimization — path ties
    * cannot change the value, so no tie-break rule needs cross-engine
    * agreement.
    */
  private val UnigramK = 1000000L

  /** Unigram-LM Viterbi-EM TRAINER — closes tokenizer family #3's
    * train+encode symmetry (BPE q128/q188 and WordPiece q226/q228
    * both have it; [[unigramEncode]] was encode-only until now).
    *
    * Hard-EM (Viterbi-EM) on the fix-grid integer costs
    * [[unigramEncode]] consumes — every step cross-engine exact:
    *
    *  1. SEED: all single characters plus the top `seedSize`
    *     substrings of length 2..`maxTokenLen` by corpus-weighted
    *     occurrence count (ties by token ascending). Seed costs come
    *     from the count distribution via
    *     cost = clamp(1, 100000, floor(−ln(count/total)·10⁴ + 0.5)) —
    *     the fix4 grid; integer count ratios make exact half-boundary
    *     hits impossible (ln of a rational is irrational except at 1).
    *  2. E-step: Viterbi-segment every DISTINCT word with the current
    *     costs (single-char fallback at `unkCost`), then BACKTRACK
    *     deterministically: at position i take the SMALLEST token
    *     length l whose dp equality dp(i−l) + K·cost + 1 = dp(i)
    *     holds (vocab beats fallback at equal value). Token usage is
    *     weighted by word frequency.
    *  3. M-step: single chars keep max(count, 1) (never dropped —
    *     byte-fallback semantics need them priced); multi-char tokens
    *     with zero uses drop; costs recompute from the new counts.
    *  4. Repeat `emRounds` times; the final (token → cost) map feeds
    *     [[unigramEncode]] directly.
    *
    * Scale shape: corpus work is ONE word-frequency aggregate; every
    * EM pass runs at distinct-WORD grain (mapPartitions with the
    * vocab in the task closure — vocabulary-grain, dim-sized) and
    * reduces to a (token, count) aggregate. Driver state is the
    * vocab artifact only, exactly like the BPE/WordPiece trainers.
    */
  def unigramTrain(
      df: DataFrame,
      textCol: String,
      seedSize: Int = 20,
      maxTokenLen: Int = 4,
      emRounds: Int = 2,
      unkCost: Long = 100000L): Seq[(String, Long)] = {
    require(seedSize >= 1 && maxTokenLen >= 2 && emRounds >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val wf = df
      .select(explode(Texts.words(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def costsOf(counts: Seq[(String, Long)]): Map[String, Long] = {
      val total = counts.map(_._2).sum.toDouble
      counts.map { case (t, c) =>
        t -> math.min(100000L, math.max(1L,
          math.floor(-math.log(c / total) * 10000 + 0.5).toLong))
      }.toMap
    }
    // seed counts: chars + top multi-char substrings
    val charCounts = wf.toDF("word", "freq")
      .select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .as("tok"), col("freq"))
      .groupBy("tok").agg(sum(col("freq")).as("cnt"))
      .as[(String, Long)].collect().toSeq
    // distributed top-k (TakeOrderedAndProject): the distinct
    // (substring, count) table is corpus-scale — only seedSize rows
    // may reach the driver; tie rule (-count, token) preserved
    val topMulti = (2 to maxTokenLen).map { l =>
      wf.toDF("word", "freq").where(length(col("word")) >= l)
        .select(explode(expr(
          s"transform(sequence(1, length(word) - ${l - 1}), " +
            s"i -> substring(word, i, $l))")).as("tok"), col("freq"))
    }.reduce(_ unionByName _)
      .groupBy("tok").agg(sum(col("freq")).as("cnt"))
      .orderBy(desc("cnt"), asc("tok"))
      .limit(seedSize)
      .as[(String, Long)].collect().toSeq
    val charSet = charCounts.map(_._1).toSet
    var costs = costsOf(charCounts ++ topMulti)
    (1 to emRounds).foreach { _ =>
      val vocab = costs
      val counts = wf.mapPartitions { it =>
        it.flatMap { case (word, freq) =>
          segmentUses(word, vocab, maxTokenLen, unkCost)
            .map { case (t, u) => (t, u * freq) }
        }
      }.toDF("tok", "cnt")
        .groupBy("tok").agg(sum(col("cnt")).as("cnt"))
        .as[(String, Long)].collect().toMap
      val next =
        charCounts.map { case (t, _) =>
          t -> math.max(1L, counts.getOrElse(t, 0L))
        } ++
          counts.toSeq.filter { case (t, c) => t.length >= 2 && c > 0 }
      costs = costsOf(next)
    }
    wf.unpersist()
    // single chars always survive; sorted artifact for determinism
    costs.toSeq.sortBy(_._1).filter { case (t, _) =>
      t.length >= 2 || charSet.contains(t)
    }
  }

  /** One word's Viterbi segmentation token uses under `vocab` — the
    * E-step kernel. Backtrack rule (cross-engine pinned): at position
    * i the chosen step is the SMALLEST l whose dp equality
    * dp(i−l) + K·cost(sub) + 1 == dp(i) holds; no vocab l ⇒ the
    * fallback char (uncounted).
    */
  private def segmentUses(
      word: String,
      vocab: Map[String, Long],
      maxTokenLen: Int,
      unkCost: Long): Seq[(String, Long)] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var best = dp(i - 1) + UnigramK * unkCost + 1
      var l = 1
      val lMax = math.min(maxTokenLen, i)
      while (l <= lMax) {
        vocab.get(word.substring(i - l, i)) match {
          case Some(c) =>
            val v = dp(i - l) + UnigramK * c + 1
            if (v < best) best = v
          case None => ()
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    val uses = scala.collection.mutable.Map.empty[String, Long]
    var pos = n
    while (pos > 0) {
      var chosen = -1
      var l = 1
      val lMax = math.min(maxTokenLen, pos)
      while (l <= lMax && chosen < 0) {
        val sub = word.substring(pos - l, pos)
        vocab.get(sub) match {
          case Some(c) if dp(pos - l) + UnigramK * c + 1 == dp(pos) =>
            chosen = l
          case _ => ()
        }
        l += 1
      }
      if (chosen > 0) {
        val sub = word.substring(pos - chosen, pos)
        uses(sub) = uses.getOrElse(sub, 0L) + 1
        pos -= chosen
      } else pos -= 1 // fallback char, uncounted
    }
    uses.toSeq
  }

  /** Unigram-LM tokenization (the SentencePiece default) — the THIRD
    * tokenizer family after BPE (q128/q188) and WordPiece greedy
    * longest-match (q220/q226): Viterbi MINIMUM-COST segmentation
    * over a (token → integer cost) vocabulary, costs being scaled
    * negative log-probs on a fixed integer grid (the fix-grid
    * convention — float Viterbi would be a cross-engine landmine),
    * with a single-character fallback at `unkCost` so every string
    * segments (byte-fallback semantics). Greedy longest-match can be
    * globally suboptimal; Viterbi is the optimum by construction —
    * dp[i] = min over candidate tokens t ending at i of
    * dp[i−|t|] + K·cost(t) + 1. Emits (id, n_chars, total_cost,
    * n_tokens) per row, normalized via [[Texts.normText]].
    *
    * Scale: one typed pass, O(len·maxTokenLen) per row; the vocab
    * ships in the task closure (a real 100k-entry unigram vocab is
    * MB-scale — dim-sized, like the broadcast side of any dim join).
    */
  def unigramEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Map[String, Long],
      unkCost: Long): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    require(vocab.keys.forall(_.nonEmpty), "empty token in vocabulary")
    require(vocab.values.forall(c => c >= 1 && c <= 100000) &&
      unkCost >= 1 && unkCost <= 100000,
      "costs must sit in [1, 100000] (scaled log-prob grid)")
    val maxLen = vocab.keys.map(_.length).max
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), Texts.normText(col(textCol)))
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, s) =>
          val n = s.length
          // the packed dp reserves UnigramK token-count slots; a doc
          // of >= UnigramK chars could emit >= UnigramK tokens and
          // overflow the count into the cost digits — refuse loudly
          // rather than return silently-wrong numbers (dp magnitude
          // itself stays < 1e17 under this bound: cost<=1e5 · K=1e6
          // per token · <1e6 tokens)
          if (n >= UnigramK)
            throw new IllegalArgumentException(
              s"unigramEncode: doc $id has $n chars >= $UnigramK — " +
                "exceeds the packed-dp token-count radix; chunk the " +
                "document first")
          val dp = new Array[Long](n + 1)
          var i = 1
          while (i <= n) {
            // single-char fallback first, vocab candidates beat it
            var best = dp(i - 1) + UnigramK * unkCost + 1
            var l = 1
            val lMax = math.min(maxLen, i)
            while (l <= lMax) {
              vocab.get(s.substring(i - l, i)) match {
                case Some(c) =>
                  val v = dp(i - l) + UnigramK * c + 1
                  if (v < best) best = v
                case None => ()
              }
              l += 1
            }
            dp(i) = best
            i += 1
          }
          (id, n.toLong, dp(n) / UnigramK, dp(n) % UnigramK)
        }
      }
      .toDF(idCol, "n_chars", "total_cost", "n_tokens")
  }
}
