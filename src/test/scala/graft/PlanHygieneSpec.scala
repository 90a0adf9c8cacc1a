package graft

/** Plan-audit gate (SURVEY.md §6): every declared query is planned at
  * sf0.001 and its physical plan checked for scale-killers.
  *  - No CartesianProduct anywhere.
  *  - BroadcastNestedLoopJoin only where a broadcast-against-stream
  *    kernel is the intended design (brute-force ANN, 1-row scalar).
  *  - Pushdown visible on the filtered scan; broadcast/shuffle-hash
  *    joins where the query demands them.
  */
class PlanHygieneSpec extends SparkTestBase {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.queryExecution.executedPlan.toString
  }

  // Queries whose *kernel* is broadcast-nested-loop by design:
  // q15/q53 broadcast a 1-row scalar aggregate; q25 broadcasts the
  // small query set against the streamed corpus; q102/q103 broadcast
  // 1-row min-max bounds / total-count scalars (and q102's other BNLJ
  // input is the `buckets`-row bucket table).
  private val bnljByDesign =
    Set("q15_scalar_subquery", "q25_ann_bruteforce", "q53_tfidf_topterms",
      "q102_psi_drift", "q103_key_skew", "q104_bm25_topk",
      "q106_triangle_census", "q109_fk_audit",
      // group-table-sized × 1-row broadcast scalar attach
      "q114_mixture_weights", "q116_pmi_collocations",
      "q119_mann_whitney", "q122_zorder_layout",
      // compose whitelisted kernels: q126 runs the q25 brute-force
      // truth search; q127 runs the q104 BM25 scorer (1-row corpus
      // stats broadcast against the postings stream)
      "q126_ann_recall", "q127_rrf_fusion",
      // group-list × group-list pair enumeration (dashboard-sized;
      // the data-sized work is the sketch build, which joins by key)
      "q143_kmv_overlap",
      // |ks|-row broadcast against the VOCABULARY-grain curve (the
      // least(k, nvocab) condition references both sides, so no hash
      // key exists); the data-sized work is the TF aggregate upstream
      "q165_vocab_coverage",
      // the q25 kernel shape: a handful of probe names broadcast
      // against the streamed corpus, scored by the native
      // JaroWinkler expression per row
      "q184_fuzzy_match",
      // compose q114's whitelisted kernel (group-table-sized × 1-row
      // broadcast scalar attach inside mixtureWeights /
      // tokenBudgetPlan's Σ-weight total)
      "q187_mixture_realize", "q192_domain_mixture", "q212_token_budget",
      // the q25 kernel shape on COMPRESSED codes: a handful of query
      // LUT rows broadcast against the streamed code table
      "q197_pq_adc_search",
      // composes the q25 brute-force kernel 4x (full-dim truth + one
      // pass per truncation dim): 5 broadcast query rows against the
      // streamed corpus each time — the audit is sampled-query by
      // contract (Similarity.matryoshkaAudit scaladoc)
      "q211_matryoshka_audit")

  test("no CartesianProduct in any declared query") {
    SparkEntry.queries.keys.foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian join")
    }
  }

  test("BroadcastNestedLoopJoin only where it IS the kernel") {
    SparkEntry.queries.keys.filterNot(bnljByDesign).foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("BroadcastNestedLoop"),
        s"$name has an unintended nested-loop join")
    }
  }

  test("q04 pushes filters into the parquet scan") {
    val plan = planOf("q04_filter_pushdown")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(!plan.contains("PushedFilters: []"),
      "no filters reached the scan")
  }

  test("q04 prunes columns at the scan (no full-width read)") {
    val plan = planOf("q04_filter_pushdown")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_partkey"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("q06 uses broadcast hash joins for the dims") {
    assert(planOf("q06_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q07 honors the shuffle-hash fact-fact join") {
    assert(planOf("q07_join_shuffle").contains("ShuffledHashJoin"))
  }

  test("q08 star join broadcasts dims") {
    assert(planOf("q08_star_join").contains("BroadcastHashJoin"))
  }

  test("LSH near-dup and ANN plans join by bucket keys (hash joins only)") {
    for (name <- Seq("q21_dedup_minhash", "q24_embed_neardup", "q26_ann_lsh")) {
      val plan = planOf(name)
      assert(plan.contains("Join"), s"$name should contain joins")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"), s"$name joins must be keyed")
    }
  }

  test("as-of join plan is a single window pass — no join operator") {
    val plan = planOf("q33_asof_join")
    assert(plan.contains("Window"), "asof should be a window")
    assert(!plan.contains("Join"), s"asof must not join: ${plan.take(500)}")
  }

  test("event scans push the event_type filter into parquet") {
    val plan = planOf("q33_asof_join")
    assert(plan.contains("PushedFilters: [IsNotNull(event_type)") ||
      plan.contains("EqualTo(event_type"),
      "event_type filter did not reach the scan")
  }

  test("salted join spreads without changing join type to nested-loop") {
    val plan = planOf("q46_salted_join")
    assert(plan.contains("Join"))
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"))
  }

  test("q48 prunes partitions at the scan") {
    val plan = planOf("q48_partition_pruning")
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("o_orderstatus"),
      s"no partition filter in scan: $scanLine")
  }

  test("q83 bucketed join: no shuffle below the join (buckets co-locate)") {
    val plan = planOf("q83_bucketed_join")
    assert(plan.contains("SortMergeJoin"),
      s"bucketed join should sort-merge: ${plan.take(800)}")
    // an unbucketed plan needs 4 Exchanges (both join inputs + the
    // aggregate + the output sort); the bucketed layout eliminates the
    // two join-input shuffles
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"expected only agg+sort Exchanges, found $exchanges:\n${plan.take(1500)}")
  }

  test("q86 CDC merge windows only the changelog, never the base") {
    val plan = planOf("q86_cdc_merge")
    // the changelog's latest-per-key window appears once per consumer
    // (anti-join key list + upserts) — never a third time for the base
    val windows = "Window \\[".r.findAllIn(plan).size
    assert(windows <= 2,
      s"expected ≤2 Window nodes (changelog lineage only), found $windows")
    // and the rank-limit pushdown prunes to 1 row/key BEFORE each
    // shuffle, so the duplicated lineage moves ≤|keys| rows, not |changes|
    assert(plan.contains("WindowGroupLimit"),
      "rank-limit pushdown (WindowGroupLimit) missing from the plan")
  }

  test("q129 bloom probe is a codegen'd expression, not a Scala UDF") {
    val plan = planOf("q129_bloom_decontaminate")
    assert(!plan.contains("UDF("),
      "bloom probe fell back to a Scala UDF (breaks whole-stage codegen)")
    assert(plan.contains("graft_bloom_contains"),
      s"expected the native bloom probe in the plan: ${plan.take(800)}")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
