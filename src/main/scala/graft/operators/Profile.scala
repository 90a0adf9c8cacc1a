package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE-style data-quality pass an
  * ingestion pipeline runs on every new drop: per-column null count,
  * exact distinct count, and min/max, in ONE aggregation job.
  *
  * Scale shape: the multi-column exact count-distincts plan through
  * one Expand (k replicas of the scan, one per distinct column) into a
  * single aggregate — k× shuffle volume but one job and one scan pass;
  * for wide tables at 100 TB swap countDistinct for
  * approx_count_distinct and the Expand collapses away. min/max cast
  * to string AFTER aggregating on the native type, so ordering is the
  * column's, not lexicographic.
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = graft.SparkUtil.ensureParallelism(df)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Winsorized (clipped) robust stats per group — outlier-tolerant
    * aggregate profiling: per-group exact `lo`/`hi` percentile bounds,
    * then the mean of values clipped into [lo_v, hi_v]. Two passes by
    * construction (a percentile needs the full distribution before any
    * value can clip): pass 1 reduces to one tiny row per group, which
    * BROADCASTS back onto the scan for pass 2 — the big table streams
    * twice, shuffles only aggregate partials, and nothing ever sorts
    * globally. Output: (groupCol, lo_v, hi_v, winsorized_mean, n).
    */
  def winsorizedStats(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, "need 0 <= lo < hi <= 1")
    // one shared percentile buffer for both bounds — two separate
    // percentile() aggs each materialize the full per-group buffer
    val bounds = graft.SparkUtil.ensureParallelism(df)
      .groupBy(groupCol)
      .agg(expr(s"percentile($valCol, array(${lo}D, ${hi}D))").as("ps"))
      .select(col(groupCol),
        element_at(col("ps"), 1).as("lo_v"),
        element_at(col("ps"), 2).as("hi_v"))
    df.join(broadcast(bounds), groupCol)
      .groupBy(groupCol)
      .agg(
        graft.functions.Numerics.fix4(first(col("lo_v"))).as("lo_v"),
        graft.functions.Numerics.fix4(first(col("hi_v"))).as("hi_v"),
        graft.functions.Numerics.fix4(
          avg(least(greatest(col(valCol), col("lo_v")), col("hi_v"))))
          .as("winsorized_mean"),
        count(lit(1)).as("n"))
  }

  /** MAD (median absolute deviation) outlier counts per group — the
    * robust cousin of z-score flagging: med = median(x), mad =
    * median(|x − med|), outlier when |x − med| > k·1.4826·mad (1.4826
    * scales MAD to σ under normality). Three streaming passes by
    * construction (each median needs the previous one); every pass
    * reduces to one row per group that BROADCASTS onto the next scan —
    * no global sort, no shuffle of the fact table.
    * Output: (groupCol, med, mad, n_outliers, n).
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      k: Double = 3.0): DataFrame = {
    val base = graft.SparkUtil.ensureParallelism(df)
    // med and mad are fix4-ROUNDED before the outlier comparison: the
    // two engines' quantile interpolation arithmetic can differ in the
    // last ulp, and a raw-double threshold would flip borderline rows
    val med = base.groupBy(groupCol)
      .agg(graft.functions.Numerics.fix4(
        expr(s"percentile($valCol, 0.5)")).as("med"))
    val withMed = base.join(broadcast(med), groupCol)
    val mad = withMed
      .groupBy(groupCol)
      .agg(graft.functions.Numerics.fix4(
        expr(s"percentile(abs($valCol - med), 0.5)")).as("mad"))
    withMed.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(abs(col(valCol) - col("med")) >
          lit(k) * lit(1.4826) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
  }

  /** PSI (population stability index) drift between two snapshots of
    * the same column — the ML-ops gate for "did this feature's
    * distribution move": bucket `b` by EQUI-WIDTH bins over snapshot
    * A's [min, max] (exact data values — deliberately not quantile
    * bounds, whose interpolation arithmetic differs across engines at
    * the last ulp and could flip a bucket), Laplace-smooth the
    * proportions, contribution = (pB − pA)·ln(pB/pA); PSI = Σ.
    * Out-of-range B values clamp into the edge buckets. Both inputs
    * reduce map-side to `buckets` rows; only those tiny aggregates
    * shuffle. Output: (bucket, n_a, n_b, psi_contrib) — PSI is the
    * contrib sum.
    */
  def psiDrift(
      a: DataFrame,
      b: DataFrame,
      valCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val bounds = graft.SparkUtil.ensureParallelism(a)
      .agg(min(col(valCol)).as("mn"), max(col(valCol)).as("mx"))
    def bucketed(df: DataFrame, tag: String): DataFrame =
      df.join(broadcast(bounds))
        .select(
          when(col("mx") > col("mn"),
            least(
              greatest(
                floor((col(valCol) - col("mn")) * buckets /
                  (col("mx") - col("mn"))).cast("int"),
                lit(0)),
              lit(buckets - 1)))
            .otherwise(lit(0)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(s"n_$tag"))
    val allBuckets = a.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
    val counts = allBuckets
      .join(bucketed(a, "a"), Seq("bucket"), "left")
      .join(bucketed(b, "b"), Seq("bucket"), "left")
      .select(
        col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // Laplace smoothing keeps empty buckets finite AND deterministic;
    // totals ride a 1-row broadcast (the scalar-subquery shape), never
    // a global window
    val totals = counts.agg(
      sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    counts.join(broadcast(totals))
      .withColumn("pa",
        (col("n_a") + 1).cast("double") / (col("ta") + buckets))
      .withColumn("pb",
        (col("n_b") + 1).cast("double") / (col("tb") + buckets))
      .select(
        col("bucket"), col("n_a"), col("n_b"),
        graft.functions.Numerics.fix4(
          (col("pb") - col("pa")) * log(col("pb") / col("pa")))
          .as("psi_contrib"))
  }

  /** Referential-integrity audit — the FK gate an ingestion pipeline
    * runs before publishing a snapshot: for each declared (child,
    * childKey, parent, parentKey) relation, how many child rows exist
    * and how many are ORPHANS (no matching parent key). Null child
    * keys count as orphans, the strict reading.
    *
    * Scale shape — one scan per DISTINCT child table: relations are
    * grouped by semantically-equal child plans, the group's key
    * columns unpivot through ONE posexplode (R rows per child row for
    * R same-child relations), and every parent's distinct key set —
    * the cheap side at 100 TB — joins that single stream tagged by
    * relation index (left join; a null hit is the anti-join "orphan").
    * Auditing R relations over one giant child costs one pass of the
    * child, not R. Keys compare as canonical strings so heterogeneous
    * key columns can share the unpivot array — lossless for the
    * integer/string keys FKs are made of.
    * Output: (fk_name, n_child_rows, n_orphans).
    */
  def fkAudit(
      relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty, "need at least one relation to audit")
    // group by semantically-equal child plans, preserving declaration
    // order (the same table declared twice = one scan)
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.Buffer[
        (String, DataFrame, String, DataFrame, String)]]
    relations.zipWithIndex.foreach { case (rel, i) =>
      val key = groups.keys.find(j => relations(j)._2.sameSemantics(rel._2))
        .getOrElse(i)
      groups.getOrElseUpdate(
        key, scala.collection.mutable.Buffer.empty) += rel
    }
    groups.values.map { rels =>
      val ex = graft.SparkUtil.ensureParallelism(rels.head._2)
        .select(posexplode(
          array(rels.map(r => col(r._3).cast("string")).toSeq: _*))
          .as(Seq("__idx", "__ck")))
      val pks = rels.zipWithIndex.map { case ((_, _, _, parent, pkCol), j) =>
        parent.select(lit(j).as("__idx"),
          col(pkCol).cast("string").as("__ck")).distinct()
      }.reduceLeft(_.unionByName(_))
        .withColumn("__hit", lit(1))
      val names = array(rels.map(r => lit(r._1)).toSeq: _*)
      ex.join(pks, Seq("__idx", "__ck"), "left_outer")
        .groupBy("__idx")
        .agg(count(lit(1)).as("n_child_rows"),
          count(when(col("__hit").isNull, 1)).as("n_orphans"))
        .select(element_at(names, col("__idx") + 1).as("fk_name"),
          col("n_child_rows"), col("n_orphans"))
    }.reduceLeft(_.unionByName(_))
  }

  /** Join-key discovery — the joinability profile run over a lake of
    * unlabeled tables to find FK-like relationships: for each declared
    * candidate (child column → parent column) pair, the distinct-value
    * CONTAINMENT |child ∩ parent| / |child| (the asymmetric Jaccard
    * that ranks key candidates in data-discovery systems). A
    * containment near 1 with a plausible cardinality ratio is a join
    * edge; a low containment kills the candidate.
    *
    * Scale shape — same single-scan grouping as [[fkAudit]]: candidates
    * sharing a child plan unpivot through ONE posexplode, reduce to
    * DISTINCT (candidate, value) pairs immediately (the 100 TB move:
    * distinct-of-keys is orders smaller than the table), then ONE
    * full-outer join against the union of parent distinct-key sets —
    * child cardinality, parent cardinality, and the intersection all
    * fall out of a single aggregate over the joined stream, so no
    * second count-attach join exists to degenerate. Values compare
    * as canonical strings so heterogeneous key columns share one
    * stream. NULL child keys count in the denominator but never
    * intersect; NULL parent keys are dropped (count(DISTINCT)
    * semantics). Output: (pair_name, n_child_distinct,
    * n_parent_distinct, n_inter, containment), ranked
    * containment-first.
    */
  def joinKeyDiscovery(
      candidates: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate pair")
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.Buffer[
        (String, DataFrame, String, DataFrame, String)]]
    candidates.zipWithIndex.foreach { case (cand, i) =>
      val key = groups.keys
        .find(j => candidates(j)._2.sameSemantics(cand._2))
        .getOrElse(i)
      groups.getOrElseUpdate(
        key, scala.collection.mutable.Buffer.empty) += cand
    }
    groups.values.map { cands =>
      val childDistinct = graft.SparkUtil.ensureParallelism(cands.head._2)
        .select(posexplode(
          array(cands.map(c => col(c._3).cast("string")).toSeq: _*))
          .as(Seq("__idx", "__v")))
        .distinct()
        .withColumn("__c", lit(1))
      val parents = cands.zipWithIndex.map {
        case ((_, _, _, parent, pCol), j) =>
          parent.where(col(pCol).isNotNull)
            .select(lit(j).as("__idx"),
              col(pCol).cast("string").as("__v")).distinct()
      }.reduceLeft(_.unionByName(_))
        .withColumn("__p", lit(1))
      val names = array(cands.map(c => lit(c._1)).toSeq: _*)
      childDistinct.join(parents, Seq("__idx", "__v"), "full_outer")
        .groupBy("__idx")
        .agg(count(col("__c")).as("n_child_distinct"),
          count(col("__p")).as("n_parent_distinct"),
          count(when(col("__c").isNotNull && col("__p").isNotNull, 1))
            .as("n_inter"))
        .select(element_at(names, col("__idx") + 1).as("pair_name"),
          col("n_child_distinct"), col("n_parent_distinct"),
          col("n_inter"),
          graft.functions.Numerics.fix4(col("n_inter").cast("double") /
            col("n_child_distinct")).as("containment"))
    }.reduceLeft(_.unionByName(_))
  }

  /** Join-key skew profiler — the diagnostic that decides whether a
    * key needs salting before a 100 TB join: per-key counts, then the
    * `topN` heaviest keys with their share of all rows. One
    * hash-partitioned count aggregate (map-side partials) followed by
    * a bounded TakeOrderedAndProject over the key-count table — the
    * fact table never sorts; the rank window runs over the topN
    * surviving rows only. Output: (rank, key, n_rows, share).
    */
  def keySkew(
      df: DataFrame,
      keyCol: String,
      topN: Int = 5): DataFrame = {
    val counts = graft.SparkUtil.ensureParallelism(df)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("total"))
    counts.join(broadcast(total))
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(topN)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_rows").desc, col("key").asc)).as("rank"),
        col("key"), col("n_rows"),
        graft.functions.Numerics.fix4(
          col("n_rows").cast("double") / col("total")).as("share"))
  }

  /** Skew-salting plan — turns [[keySkew]]'s diagnosis into the
    * actionable repartitioning table: per join/aggregation key, how
    * many salt buckets it needs so no single task exceeds
    * `targetRowsPerTask` rows. PURE INTEGER arithmetic
    * (ceil(n/target) as (n + target − 1) DIV target), so the plan is
    * engine-exact and idempotent. Only keys needing a split
    * (factor > 1) are emitted — the output is hot-key-bounded, the
    * broadcastable side of the salted join q46 realizes: replicate
    * the dim side by factor, scatter the fact side by
    * pmod(hash(row), factor).
    *
    * Output: (key, n_rows, salt_factor), hottest first.
    */
  def saltPlan(
      df: DataFrame,
      keyCol: String,
      targetRowsPerTask: Long): DataFrame = {
    require(targetRowsPerTask >= 1, "targetRowsPerTask must be >= 1")
    graft.SparkUtil.ensureParallelism(df)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("key"), col("n_rows"),
        expr(s"(n_rows + ${targetRowsPerTask}L - 1) DIV " +
          s"${targetRowsPerTask}L").cast("int").as("salt_factor"))
      .where(col("salt_factor") > 1)
      .orderBy(col("n_rows").desc, col("key").asc)
  }

  /** JSON key/type profile — schema discovery for a semi-structured
    * column BEFORE anyone writes an extraction schema: per key, how
    * many records carry it and how its values distribute over
    * {int, float, bool, string}. The pass that turns "what's in
    * props?" into a typed contract (and catches the one producer
    * writing `"42"` where everyone else writes `42`).
    *
    * One `from_json` to map<string,string> + one explode + one hash
    * aggregate to |distinct keys| rows. The map conversion stringifies
    * scalars, so classification is lexical (int `-?\d+`, float
    * `-?\d+\.\d+` with optional exponent, bool `true|false`, else
    * string) — a JSON STRING "true" classifies as bool; profiling
    * reads intent, not quoting (documented trade for the single
    * codegen'd pass; a Variant-typed walk would keep quoting at ~3×
    * the cost). Malformed JSON rows drop (from_json yields null).
    *
    * Output: (key, n_present, n_int, n_float, n_bool, n_string).
    */
  def jsonKeyProfile(
      df: DataFrame,
      jsonCol: String): DataFrame = {
    val kv = graft.SparkUtil.ensureParallelism(df)
      .select(explode(from_json(col(jsonCol),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
        .as(Seq("key", "value")))
    val v = col("value")
    kv.groupBy("key")
      .agg(
        count(lit(1)).as("n_present"),
        count(when(v.rlike("^-?\\d+$"), 1)).as("n_int"),
        count(when(v.rlike("^-?\\d+\\.\\d+([eE][+-]?\\d+)?$"), 1))
          .as("n_float"),
        count(when(v === "true" || v === "false", 1)).as("n_bool"),
        count(when(!v.rlike("^-?\\d+$") &&
          !v.rlike("^-?\\d+\\.\\d+([eE][+-]?\\d+)?$") &&
          v =!= "true" && v =!= "false", 1)).as("n_string"))
      .orderBy("key")
  }

  /** Nested-path JSON profile — [[jsonKeyProfile]] extended to
    * depth-capped DOTTED PATHS (the round-14 verdict's nested ask):
    * real semi-structured columns nest, and the discovery pass that
    * feeds contract authoring must see `meta.geo` even when nobody
    * has written an extraction schema yet.
    *
    * Path grammar: paths are the dot-join of object keys from the
    * root (`meta.lang`), depth = number of keys on the path; keys
    * containing `.` are reported verbatim (ambiguous by construction
    * — rename at the producer). Arrays are LEAVES (classified
    * `n_array`, never descended — element profiling is an explode the
    * caller owns); objects at `maxDepth` are counted `n_object` but
    * not descended (the cap). JSON `null` values count in `n_present`
    * only.
    *
    * One `from_json`-to-map pass PER LEVEL over a shrinking set (only
    * object-valued entries descend; Spark stringifies nested values
    * as their raw JSON text, so each level re-parses only the nested
    * payloads), then ONE hash aggregate to |distinct paths| rows.
    * Value classification is lexical on the stringified scalars, as
    * in [[jsonKeyProfile]] (quoting reads as intent — documented
    * trade); `n_object` demands a successful nested parse so a
    * `{`-leading malformed payload classifies string, matching what
    * the descent actually did. Malformed root rows drop.
    *
    * Output: (path, depth, n_present, n_int, n_float, n_bool,
    * n_object, n_array, n_string), ordered by path.
    */
  def jsonPathProfile(
      df: DataFrame,
      jsonCol: String,
      maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 8, "maxDepth must be in [1, 8]")
    val mapT = org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)
    val root = graft.SparkUtil.ensureParallelism(df)
      .select(explode(from_json(col(jsonCol), mapT))
        .as(Seq("path", "value")))
      .select(col("path"), lit(1).as("depth"), col("value"))
    val levels = Iterator.iterate(root) { prev =>
      prev
        .where(col("value").startsWith("{"))
        .select(col("path"), col("depth"),
          explode(from_json(col("value"), mapT)).as(Seq("k", "v")))
        .select(concat(col("path"), lit("."), col("k")).as("path"),
          (col("depth") + 1).as("depth"), col("v").as("value"))
    }.take(maxDepth).toSeq
    val v = col("value")
    val isInt = v.rlike("^-?\\d+$")
    val isFloat = v.rlike("^-?\\d+\\.\\d+([eE][+-]?\\d+)?$")
    val isBool = v === "true" || v === "false"
    // object only if the nested parse would have succeeded — keeps
    // n_object consistent with the rows the descent actually expanded
    val isObj = v.startsWith("{") && from_json(v, mapT).isNotNull
    val isArr = v.startsWith("[")
    levels.reduce(_ unionByName _)
      // layered select: classify once, aggregate over booleans — the
      // from_json in isObj must not inline into five agg conjuncts
      .select(col("path"), col("depth"), v.isNotNull.as("present"),
        isInt.as("is_int"), isFloat.as("is_float"), isBool.as("is_bool"),
        isObj.as("is_obj"), isArr.as("is_arr"))
      .groupBy("path")
      .agg(
        max(col("depth")).as("depth"),
        count(lit(1)).as("n_present"),
        count(when(col("is_int"), 1)).as("n_int"),
        count(when(col("is_float"), 1)).as("n_float"),
        count(when(col("is_bool"), 1)).as("n_bool"),
        count(when(col("is_obj"), 1)).as("n_object"),
        count(when(col("is_arr"), 1)).as("n_array"),
        count(when(col("present") && !col("is_int") && !col("is_float") &&
          !col("is_bool") && !col("is_obj") && !col("is_arr"), 1))
          .as("n_string"))
      .orderBy("path")
  }

  /** Exact weighted median per group — the LOWER weighted median:
    * smallest value v such that the cumulative weight of rows ≤ v
    * reaches half the group's total weight (2·cumw ≥ totw in
    * integers, so no float ever enters the comparison). The
    * length-vs-importance question an unweighted percentile (q38)
    * cannot answer: a corpus median where each doc counts by its
    * token mass, a latency median weighted by request volume.
    *
    * One window shuffle by group (cumulative weight over the ordered
    * values, ties broken by `idCol` for cross-engine determinism), one
    * filter, one min-aggregate. No join; per-group state is the window
    * sort only.
    */
  def weightedMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col("v"), col(idCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    df.select(
        col(groupCol), col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("wt"), col(idCol))
      .withColumn("cumw", sum(col("wt")).over(w))
      .withColumn("totw", sum(col("wt")).over(tot))
      .where(col("cumw") * 2 >= col("totw"))
      .groupBy(col(groupCol))
      .agg(
        min(col("v")).as("wmedian"),
        max(col("totw")).as("total_weight"))
  }

  /** KMV (k-minimum-values) sketch overlap between groups — the
    * scale path for "how much do these sources' DISTINCT contents
    * overlap" when the exact intersection (q133) is too wide to
    * shuffle. Each group keeps only its k lexicographically smallest
    * md5 digests (the classic KMV sketch: fixed-width hex compares
    * like its numeric value, Hashes.scala); for every group pair the
    * union's k smallest digests are scanned for two-sided membership,
    * giving the standard unbiased Jaccard estimate t/k. Deterministic
    * by construction — same hash both engines — so the ESTIMATE
    * itself is oracle-checkable, not just bounded.
    *
    * Cost: one digest pass over the data, one window per group
    * (sketch build, k rows kept per group), then pair expansion over
    * sketches only — p·k rows, independent of data size. Group count
    * is assumed dashboard-sized (pairs enumerate); the sketch build
    * dominates and is one shuffle.
    */
  def kmvOverlap(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val perGroup = Window.partitionBy("g").orderBy(col("digest"))
    // the sketch: k smallest distinct digests per group
    val sketch = df
      .select(
        col(groupCol).as("g"),
        md5(graft.functions.Texts.normText(col(textCol))).as("digest"))
      .distinct()
      .withColumn("rn", row_number().over(perGroup))
      .where(col("rn") <= k)
      .select(col("g"), col("digest"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = sketch.select(col("g").as("g_a")).distinct()
      .join(sketch.select(col("g").as("g_b")).distinct(),
        col("g_a") < col("g_b"))
    // pair × sketch expansion: digests of either side, then the k
    // smallest of the union with a two-sided presence count
    val expanded = pairs.join(sketch, col("g") === col("g_a"))
      .select(col("g_a"), col("g_b"), col("digest"))
      .unionAll(pairs.join(sketch, col("g") === col("g_b"))
        .select(col("g_a"), col("g_b"), col("digest")))
    val perPair = Window.partitionBy("g_a", "g_b").orderBy(col("digest"))
    expanded
      .groupBy(col("g_a"), col("g_b"), col("digest"))
      .agg(count(lit(1)).as("present_in"))
      .withColumn("rn", row_number().over(perPair))
      .where(col("rn") <= k)
      .groupBy(col("g_a"), col("g_b"))
      .agg(
        count(lit(1)).as("union_k"),
        sum(when(col("present_in") === 2, 1L).otherwise(0L)).as("t"))
      .select(
        col("g_a"), col("g_b"), col("t"),
        graft.functions.Numerics.fix4(
          col("t").cast("double") / col("union_k").cast("double"))
          .as("jaccard_est"))
  }

  /** Join-size estimation from key-degree sampling — the pre-flight
    * check that predicts |A ⋈ B| BEFORE paying for the join.
    *
    * |A ⋈_k B| = Σ_k a_k·b_k. A deterministic hash sample of the KEY
    * DOMAIN (md5 prefix below `hexLt`, probability = hexLt/256)
    * estimates the sum from sampled keys alone: Σ_sampled a_k·b_k ·
    * (256/hexLt). Because the sample is keyed by a content hash, both
    * engines (and repeated runs) select the same keys, so the estimate
    * itself is exactly reproducible — the audit can hash-match, not
    * just bound.
    *
    * Scale shape: two partial-agg degree counts (one per side), a join
    * on the SAMPLED key set only (|keys|·p rows), and a scalar sum —
    * no row-level join is ever executed. The `actual` column is the
    * full degree-join sum, still key-grained (cheap next to the row
    * join it predicts); at 100 TB run the estimate alone and skip it.
    * This is how a pipeline decides a self-join on a skewed key would
    * explode before it launches it.
    */
  def joinSizeEstimate(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      hexLt: Int = 32): DataFrame = {
    require(hexLt >= 1 && hexLt <= 255, "hexLt must be in [1, 255]")
    // integral inverse-probability scale keeps est_rows an exact int64
    require(256 % hexLt == 0, "hexLt must divide 256")
    val hexLit = f"$hexLt%02x"
    def degrees(df: DataFrame, key: String): DataFrame =
      graft.SparkUtil.ensureParallelism(df)
        .select(col(key).cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("deg"))
    val la = degrees(left, leftKey)
    val rb = degrees(right, rightKey).withColumnRenamed("deg", "degb")
    val joined = la.join(rb, "k")
      .withColumn("prod", col("deg") * col("degb"))
      .withColumn(
        "sampled",
        substring(md5(col("k").cast("string")), 1, 2) < lit(hexLit))
    joined.agg(
      count(lit(1)).as("n_join_keys"),
      sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
      (coalesce(sum(when(col("sampled"), col("prod"))), lit(0L)) *
        lit(256L / hexLt)).as("est_rows"),
      sum(col("prod")).as("actual_rows"))
      .select(
        col("n_join_keys"), col("n_sampled"), col("est_rows"),
        col("actual_rows"),
        graft.functions.Numerics.fix4(
          abs(col("est_rows") - col("actual_rows")).cast("double") /
            col("actual_rows").cast("double")).as("rel_err"))
  }

  /** Source-concentration audit: per group, the Gini coefficient and
    * top-unit share of an integer weight (token mass, bytes, rows)
    * across units (sources, domains, shards).
    *
    * A training mix that looks diverse by source COUNT can still be
    * one domain by token MASS — this is the one-pass readout that
    * catches it. Gini over ascending-ranked integer weights:
    * G = (2·Σ i·w_i − (n+1)·Σw) / (n·Σw), all-integer numerator, one
    * final fixed-point division. Ties rank deterministically by
    * (weight, unit) so both engines agree.
    *
    * Scale shape: one partial-agg shuffle to (group, unit) grain —
    * billions of rows collapse to the unit cardinality — then a
    * window over units-per-group (dashboard-sized) and a final
    * per-group aggregate.
    */
  def giniConcentration(
      df: DataFrame,
      groupCol: String,
      unitCol: String,
      weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUnit = graft.SparkUtil.ensureParallelism(df)
      .withColumn("__w", weight)
      .groupBy(col(groupCol).as("g"), col(unitCol).as("u"))
      .agg(sum(col("__w")).as("w"))
    val rank = Window.partitionBy("g").orderBy(col("w"), col("u"))
    perUnit
      .withColumn("i", row_number().over(rank).cast("long"))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n_units"),
        sum(col("w")).as("total_w"),
        sum(col("i") * col("w")).as("iw"),
        max(col("w")).as("max_w"))
      .select(
        col("g").as(groupCol),
        col("n_units"),
        col("total_w"),
        graft.functions.Numerics.fix4(
          (lit(2.0) * col("iw").cast("double") -
            (col("n_units") + 1).cast("double") * col("total_w").cast("double")) /
            (col("n_units").cast("double") * col("total_w").cast("double")))
          .as("gini"),
        graft.functions.Numerics.fix4(
          col("max_w").cast("double") / col("total_w").cast("double"))
          .as("top_share"))
  }

  /** Functional-dependency audit — does column A determine column B?
    * The schema-inference pass that discovers which "code" columns are
    * genuinely derivable (and which only look derivable): for each
    * candidate pair, count LHS groups, groups whose RHS is not unique
    * (the violations), and the violated fraction.
    *
    * Scale shape: one countDistinct aggregate per pair at LHS-group
    * grain — billions of rows collapse map-side to the LHS
    * cardinality; pair results union into one small frame. Candidate
    * pairs are assumed schema-sized (a profiler proposes dozens, not
    * millions).
    */
  /** Data-contract validation — the publish gate: a declarative suite
    * of row-level constraints (not-null, range, enum membership, …)
    * plus an optional key-uniqueness check, evaluated in ONE aggregate
    * pass over the table. Each check contributes a violation counter
    * to the same partial-agg shuffle, so a 50-check contract costs one
    * scan regardless of suite size; uniqueness rides the same pass as
    * count vs countDistinct.
    *
    * `checks` maps a check name to a VIOLATION predicate (true = this
    * row breaks the contract). Output: (check_name, n_violations,
    * passed 0/1), one row per check, plus `unique:<col>` when
    * `uniqueKey` is given.
    */
  def contractChecks(
      df: DataFrame,
      checks: Seq[(String, Column)],
      uniqueKey: Option[String] = None): DataFrame = {
    require(checks.nonEmpty || uniqueKey.nonEmpty, "empty contract")
    val aggs =
      checks.map { case (name, bad) =>
        // coalesce: sum over ZERO rows is null, and an empty (vacuously
        // conforming) table must report 0 violations / passed = 1, not
        // a null-failing publish-gate verdict
        coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"v__$name")
      } ++
        uniqueKey.toSeq.flatMap { k =>
          Seq(count(col(k)).as("u__n"),
            countDistinct(col(k)).as("u__d"))
        }
    val one = graft.SparkUtil.ensureParallelism(df)
      .agg(aggs.head, aggs.tail: _*)
    val rows =
      checks.map { case (name, _) =>
        struct(lit(name).as("check_name"),
          col(s"v__$name").as("n_violations"))
      } ++
        uniqueKey.toSeq.map { k =>
          struct(lit(s"unique:$k").as("check_name"),
            (col("u__n") - col("u__d")).as("n_violations"))
        }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.n_violations"),
        when(col("r.n_violations") === 0L, 1).otherwise(0).as("passed"))
  }

  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate pair")
    val base = graft.SparkUtil.ensureParallelism(df)
    pairs.map { case (lhs, rhs) =>
      base.groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("nd"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violated"))
        .select(
          lit(lhs).as("lhs_col"),
          lit(rhs).as("rhs_col"),
          col("n_groups"),
          col("n_violated"),
          graft.functions.Numerics.fix4(
            col("n_violated").cast("double") /
              col("n_groups").cast("double")).as("violation_pct"),
          when(col("n_violated") === 0L, 1).otherwise(0).as("fd_holds"))
    }.reduce(_ unionByName _)
  }
}
