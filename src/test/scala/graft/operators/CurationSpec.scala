package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CurationSpec extends SparkTestBase {

  private def docsDF(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("dupClusters: chain of near-dups collapses to one cluster") {
    // 1~2 differ in the last word, 2~3 in the first: each pair's
    // shingle-Jaccard is ~0.73 (>= 0.7), while 1~3 differ in both ends
    // (~0.53 < 0.7) — so only transitive closure links 1 and 3.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi"
    val docs = docsDF(
      (1L, s"$base omicron"),
      (2L, s"$base pi"),
      (3L, s"rho ${base.stripPrefix("alpha ")} pi"),
      (4L, "completely different words about spark shuffles and joins here"),
      (5L, "another unrelated document mentioning windows and aggregates today"))
    val out = Dedup.dupClusters(docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(4L) == 4L && out(5L) == 5L) // singletons keep their id
    // transitivity: 3 joins the cluster through 2 even though (1,3) is
    // below threshold
    assert(out(3L) == 1L)
  }

  test("dupClusters: every input id appears exactly once") {
    val docs = docsDF((1L to 20L).map(i =>
      (i, if (i % 2 == 0) "even doc words repeated here all same body"
          else s"odd doc $i unique content number ${i * 7} differs")): _*)
    val out = Dedup.dupClusters(docs, "doc_id", "text")
    assert(out.count() == 20)
    assert(out.select("doc_id").distinct().count() == 20)
    // all even docs identical -> one cluster rooted at 2
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (2L to 20L by 2).foreach(i => assert(m(i) == 2L))
  }

  test("clustersFromPairs resolves components from a stored pair table") {
    val ss = spark
    import ss.implicits._
    val ids = spark.range(1, 8).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clustersFromPairs(ids, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("clustersFromPairs throws instead of silently returning " +
      "non-converged clusters") {
    val ss = spark
    import ss.implicits._
    val ids = spark.range(1, 201).toDF("doc_id")
    // a 200-node chain: diameter 199; each round is one edge hop plus
    // a pointer jump, so reach grows ~2^round — 3 rounds cover ~2^3
    // hops, far short of the chain, and the guard must throw. Force
    // the DISTRIBUTED loop: a 199-edge graph would otherwise take the
    // adaptive local union-find path, which has no round bound.
    val chain = (1L to 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    spark.conf.set("spark.graft.cc.localEdgeMax", "0")
    try {
      val e = intercept[IllegalStateException] {
        Dedup.clustersFromPairs(ids, "doc_id", chain, maxIter = 3).collect()
      }
      assert(e.getMessage.contains("converge"))
      // with doubling reach, 20 rounds (2^20 >> 199) fully collapse it
      val ok = Dedup.clustersFromPairs(ids, "doc_id", chain, maxIter = 20)
        .collect().map(r => r.getLong(1)).toSet
      assert(ok == Set(1L))
    } finally spark.conf.unset("spark.graft.cc.localEdgeMax")
  }

  test("mergeClusters == full recompute: merges, new clusters, singletons") {
    val ss = spark
    import ss.implicits._
    // old world: pairs (1,2),(2,3) and (4,5); 6 a singleton
    val oldIds = spark.range(1, 7).toDF("doc_id")
    val oldPairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val labels0 = Dedup.clustersFromPairs(oldIds, "doc_id", oldPairs)
    // new batch: ids 7,8; pairs (3,4) MERGES two old clusters, (7,8)
    // forms a new one; 6 must stay a singleton
    val newIds = Seq(7L, 8L).toDF("doc_id")
    val newPairs = Seq((3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val merged = Dedup.mergeClusters(labels0, "doc_id", "cluster_id",
        newIds, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.clustersFromPairs(
        spark.range(1, 9).toDF("doc_id"), "doc_id",
        oldPairs.unionAll(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == full)
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 6L, 7L -> 7L, 8L -> 7L))
  }

  test("clustersFromPairs local and distributed paths agree") {
    val ss = spark
    import ss.implicits._
    val ids = spark.range(1, 41).toDF("doc_id")
    // two chains, one triangle, singletons
    val pairs = ((1L to 9L).map(i => (i, i + 1)) ++
      (20L to 24L).map(i => (i, i + 1)) ++
      Seq((30L, 31L), (31L, 32L), (30L, 32L))).toDF("id_a", "id_b")
    val local = Dedup.clustersFromPairs(ids, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.cc.localEdgeMax", "0")
    val dist =
      try Dedup.clustersFromPairs(ids, "doc_id", pairs, maxIter = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.cc.localEdgeMax")
    assert(local == dist)
    assert(local(10L) == 1L && local(25L) == 20L && local(32L) == 30L
      && local(15L) == 15L)
  }

  test("splitColumn is deterministic, complete and respects rates") {
    val df = spark.range(0, 5000).toDF("id")
      .select(col("id"), Sampling.splitColumn(col("id"), 800, 100).as("split"))
    val counts = df.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000)
    assert(counts("train") > 3800 && counts("train") < 4200)
    assert(counts("val") > 350 && counts("val") < 650)
    assert(counts("test") > 350 && counts("test") < 650)
    // stability: same assignment on re-evaluation over different partitioning
    val again = spark.range(0, 5000).toDF("id").repartition(7)
      .select(col("id"), Sampling.splitColumn(col("id"), 800, 100).as("split"))
    assert(df.except(again).count() == 0)
  }

  test("splitByGroup is cluster-atomic; audit flags an external leaky split") {
    val ss = spark
    import ss.implicits._
    // three clusters of sizes 3/2/1
    val clustered = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L),
      (20L, 20L)).toDF("doc_id", "cluster_id")
    val out = Sampling.splitByGroup(clustered, "cluster_id")
    // every member of a cluster lands in the SAME split
    val perCluster = out.groupBy("cluster_id")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("ns"))
      .collect().map(_.getLong(1))
    assert(perCluster.forall(_ == 1L))
    // and the audit is clean on it
    assert(Sampling.splitLeakageAudit(out, "cluster_id", "split")
      .where(col("n_splits") > 1).isEmpty)
    // an externally-assigned per-DOC split leaks and the audit says so
    val leaky = clustered.withColumn("split",
      Sampling.splitColumn(col("doc_id")))
    val flagged = Sampling.splitLeakageAudit(leaky, "cluster_id", "split")
      .where(col("n_splits") > 1)
    // doc-hash splits scatter at least one multi-member cluster here
    assert(flagged.count() >= 1)
  }

  test("clusterSurvivors: highest score wins, lowest id on ties") {
    val ss = spark
    import ss.implicits._
    val clustered = Seq(
      (1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 30L), // tie at 30: id 2 wins
      (10L, 10L, 5L), // singleton keeps itself
      (20L, 20L, 7L), (21L, 20L, 3L)).toDF("doc_id", "cluster_id", "score")
    val out = Dedup.clusterSurvivors(clustered, "cluster_id", "doc_id",
        col("score"))
      .orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 30L, 3L), (10L, 10L, 5L, 1L), (20L, 20L, 7L, 2L)))
  }

  test("capPerKey keeps the first k rows per key deterministically") {
    val ss = spark
    import ss.implicits._
    val rows = for (u <- 1L to 3L; i <- 1L to 10L)
      yield (u, 1000L + i, u * 100 + i)
    val df = rows.toDF("user_id", "ms", "event_id").repartition(7)
    val out = Sampling.capPerKey(df, "user_id", "ms", "event_id", k = 4)
    assert(out.count() == 12)
    val kept = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // exactly the 4 earliest events of each user survive
    assert(kept == (for (u <- 1L to 3L; i <- 1L to 4L)
      yield (u, u * 100 + i)).toSet)
  }

  test("contamination counts shared distinct n-grams per corpus doc") {
    val probe = docsDF((1L, "the quick brown fox jumps over the lazy dog"))
    val corpus = docsDF(
      (10L, "the quick brown fox jumps over a sleeping cat today"), // shares 3-grams
      (11L, "nothing in common with that sentence at all here"))
    val out = TextAnalysis.contamination(corpus, probe, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "the quick brown", "quick brown fox", "brown fox jumps",
    // "fox jumps over" = 4 shared trigrams
    assert(out(10L) == 4L)
    assert(!out.contains(11L))
  }

  test("approx_count_distinct stays within the configured error bound") {
    val df = spark.range(0, 100000)
      .select((col("id") % 9973).as("user_id")) // 9973 distinct
    val approx = df.agg(
      approx_count_distinct(col("user_id"), rsd = 0.02)).head.getLong(0)
    assert(math.abs(approx - 9973.0) / 9973.0 < 0.05,
      s"approx=$approx vs exact=9973")
  }

  test("contamination plan broadcasts the probe side") {
    val probe = docsDF((1L, "a b c d e"))
    val corpus = docsDF((2L, "a b c x y"))
    val plan = TextAnalysis.contamination(corpus, probe, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("weightedByHash: 0 keeps nothing, 1 keeps all, rate ≈ weight") {
    val df = spark.range(0, 4000).toDF("id")
    assert(Sampling.weightedByHash(df, "id", lit(0.0)).count() == 0)
    assert(Sampling.weightedByHash(df, "id", lit(1.0)).count() == 4000)
    val half = Sampling.weightedByHash(df, "id", lit(0.5)).count()
    assert(half > 1800 && half < 2200, s"~half expected, got $half")
    // membership is monotone in the weight: a row kept at 0.3 is kept at 0.7
    val low = Sampling.weightedByHash(df, "id", lit(0.3))
    val high = Sampling.weightedByHash(df, "id", lit(0.7))
    assert(low.except(high).count() == 0)
    // and the sample itself is map-side only — no shuffle in the plan
    val plan = Sampling.weightedByHash(df, "id", lit(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling shuffled:\n${plan.take(600)}")
  }

  test("packingMap: contiguous offsets, correct spans, partition-independent") {
    val ss = spark
    import ss.implicits._
    val docsIn = (1L to 40L).map(i => (i, 100L + i * 37 % 900))
      .toDF("doc_id", "n_tok")
    val out = Sampling.packingMap(docsIn, "doc_id", "n_tok", seqLen = 512)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == 40)
    // offsets tile the stream with no gaps or overlaps in layout order
    val byOff = out.sortBy(_._3)
    byOff.sliding(2).foreach { case Array(p, n) =>
      assert(p._3 + p._2 == n._3, s"gap between $p and $n")
    }
    assert(byOff.head._3 == 0L)
    // spans recompute from the offsets
    out.foreach { case (_, n, start, first, last, nSeqs) =>
      assert(first == start / 512)
      assert(last == (start + n - 1) / 512)
      assert(nSeqs == last - first + 1)
    }
    // the distributed prefix sum is partition-count independent
    val re = Sampling.packingMap(docsIn.repartition(7), "doc_id", "n_tok",
        seqLen = 512)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.map(t => t._1 -> t._3).toMap == re)
  }

  test("mixtureWeights: sqrt temperature upweights small sources") {
    val ss = spark
    import ss.implicits._
    // counts 100 / 400: sqrt -> 10/20 -> weights 1/3, 2/3;
    // factors (1/3)*500/100 = 1.6667 and (2/3)*500/400 = 0.8333
    val df = ((1 to 100).map(i => (i, "small")) ++
      (1 to 400).map(i => (i + 100, "big"))).toDF("id", "src")
    val out = Sampling.mixtureWeights(df, "src", alpha = 0.5)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out("small") == ((100L, 0.3333, 1.6667)))
    assert(out("big") == ((400L, 0.6667, 0.8333)))
  }

  test("pagerank: star + ring match a reference recompute; isolates take the floor") {
    val ss = spark
    import ss.implicits._
    // star (hub 1 - leaves 2,3,4) + ring (5-6-7-5), node 9 isolated;
    // one reversed duplicate to exercise orientation normalization
    val ids = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L),
      (5L, 6L), (6L, 7L), (7L, 5L)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val run = graft.operators.Graphs.pagerankRun(
      ids, "doc_id", pairs, "id_a", "id_b", iters = 3)
    val out = run.result.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
    // reference recompute with the same fixed-point integer
    // recurrence (ranks at 1e4 scale; contributions floored at 1e8)
    val adj = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L), 3L -> Seq(1L),
      4L -> Seq(1L), 5L -> Seq(6L, 7L), 6L -> Seq(5L, 7L), 7L -> Seq(6L, 5L))
    var r = adj.keys.map(_ -> 10000L).toMap
    (1 to 3).foreach { _ =>
      r = adj.keys.map { v =>
        val inflow = adj.collect {
          case (u, outs) if outs.contains(v) => r(u) * 10000L / outs.size
        }.sum
        v -> (1500L + (85L * inflow + 500000L) / 1000000L)
      }.toMap
    }
    adj.keys.foreach(v =>
      assert(out(v) == r(v).toDouble / 10000.0, s"node $v"))
    assert(out(9L) == 0.15) // isolated: teleport-only fixed point
    assert(out(1L) > out(2L)) // the hub outranks its leaves
    run.release()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("realizeMixture: floor copies + hash fraction, deterministic") {
    val ss = spark
    import ss.implicits._
    val df = (1L to 100L).map(i =>
      (if (i <= 50) "big" else "small", i)).toDF("g", "id")
    val factors = Seq(("big", 0.5), ("small", 2.3))
      .toDF("g", "sampling_factor")
    def run(d: org.apache.spark.sql.DataFrame) = graft.operators.Sampling
      .realizeMixture(d, "g", "id", factors)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val out = run(df)
    val big = out.filter(_._1 == "big")
    val small = out.filter(_._1 == "small")
    // downsample: every kept big row exactly once, roughly half kept
    assert(big.forall(_._3 == 0))
    assert(big.length > 10 && big.length < 40,
      s"hash-half kept ${big.length} of 50")
    // upsample 2.3x: every small id at least twice, some thrice; copy
    // indexes tile 0..copies-1
    val byId = small.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    assert(byId.size == 50) // f >= 1 keeps every row
    assert(byId.values.forall(cs => cs.toSeq == (0 until cs.length)))
    assert(byId.values.forall(cs => cs.length == 2 || cs.length == 3))
    val triples = byId.values.count(_.length == 3)
    assert(triples > 5 && triples < 25, s"~30% should triple, got $triples")
    // reproducible under repartitioning — the no-rand() contract
    assert(run(df.repartition(13)).sorted.toSeq == out.sorted.toSeq)
  }

  test("topFracByGroup: percent-rank cut, singletons kept, deterministic") {
    val ss = spark
    import ss.implicits._
    // group a: scores 10..1 over ids 1..10 -> pr = (rank-1)/9; frac
    // 0.2 keeps ranks 1..2 (pr 0, 1/9) — NOT rank 3 (2/9 > 0.2).
    // group b: a singleton ranks pr = 0 and is kept.
    val df = ((1 to 10).map(i => ("a", i.toLong, 11L - i)) :+
      (("b", 99L, 1L))).toDF("g", "id", "score")
    val kept = graft.operators.Sampling
      .topFracByGroup(df, "g", col("score"), col("id"), 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set(("a", 1L), ("a", 2L), ("b", 99L)))
    // tie determinism: equal scores cut by the id tiebreak, and a
    // repartitioned input yields the identical kept set
    val ties = (1 to 10).map(i => ("t", i.toLong, 5L)).toDF("g", "id", "score")
    val k1 = graft.operators.Sampling
      .topFracByGroup(ties, "g", col("score"), col("id"), 0.5)
      .collect().map(_.getLong(1)).toSet
    val k2 = graft.operators.Sampling
      .topFracByGroup(ties.repartition(7), "g", col("score"), col("id"), 0.5)
      .collect().map(_.getLong(1)).toSet
    // all scores tie: ranks follow ids, pr <= 0.5 keeps ids 1..5 + the
    // boundary row (pr exactly (5-1)/9 < 0.5 ... ranks 1..5 have
    // pr 0..4/9; rank 6 has 5/9 > 0.5)
    assert(k1 == (1L to 5L).toSet && k2 == k1)
  }

  test("tokenBudgetPlan: temperature quotas, epochs, over_cap flag") {
    val ss = spark
    import ss.implicits._
    // sources with 100 and 400 tokens; sqrt weights 1/3 and 2/3
    val df = Seq(("a", 60L), ("a", 40L), ("b", 400L))
      .toDF("source", "n_tokens")
    val out = graft.operators.Sampling.tokenBudgetPlan(
        df, "source", "n_tokens", budget = 1000L, maxEpochs = 3.0)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    assert(out(0) == (("a", 100L, 0.3333, 333L, 3.33, true)), out(0))
    assert(out(1) == (("b", 400L, 0.6667, 667L, 1.6675, false)), out(1))
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.tokenBudgetPlan(df, "source", "n_tokens",
        budget = 0L)
    }
  }

  test("paddingAudit: exact buckets, boundary docs, overflow truncation") {
    val ss = spark
    import ss.implicits._
    // lengths: 10, 16 (AT boundary -> 16-bucket), 17, 100 (overflow)
    val df = Seq(10L, 16L, 17L, 100L).toDF("n_tokens")
    val out = graft.operators.Sampling.paddingAudit(
        df, "n_tokens", caps = Seq(16, 32, 64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      // cap 16: docs 10+16 -> real 26, pad 32-26=6, frac 0.1875
      (16L, 2L, 26L, 6L, 0.1875, 0L),
      // cap 32: doc 17 -> pad 15
      (32L, 1L, 17L, 15L, math.floor(15.0 / 32 * 10000 + 0.5) / 10000, 0L),
      // overflow: doc 100 truncates to 64, pad 0, truncated 36
      (64L, 1L, 64L, 0L, 0.0, 36L)), out.toSeq)
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.paddingAudit(df, "n_tokens", caps = Seq(32, 16))
    }
  }
}
