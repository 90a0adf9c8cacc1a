package graft.operators

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  private def docsDF(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  private def corpus = docsDF(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "completely different words about spark shuffles and partitions here"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (5L, "another unrelated document mentioning joins aggregates and windows today"))

  test("exact dedup groups identical normalized text, keeps min id") {
    val out = Dedup.exact(corpus, "doc_id", "text")
      .orderBy("kept_doc_id").collect()
    assert(out.length == 4) // 1 & 4 merge
    val merged = out.find(_.getLong(1) == 1L).get
    assert(merged.getLong(2) == 2L) // n_copies
  }

  test("exact dedup normalizes case and edge whitespace") {
    val df = docsDF((1L, "Hello World"), (2L, "  hello world  "))
    assert(Dedup.exact(df, "doc_id", "text").count() == 1)
  }

  test("minhash near-dup finds the planted pairs and nothing else") {
    val pairs = Dedup.minhashNearDup(corpus, "doc_id", "text",
      shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.5)
      .collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 4L))) // exact dup: J = 1.0
    assert(keys.contains((1L, 2L)) && keys.contains((2L, 4L))) // near-dups
    assert(!keys.exists { case (a, b) => a == 3L || b == 3L })
    assert(!keys.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("simhash: identical docs identical signature; distinct docs differ") {
    val sigs = Dedup.simhashSignatures(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs(1L) != sigs(3L))
    val ham = Integer.bitCount(sigs(1L) ^ sigs(2L))
    assert(ham <= 4, s"near-dup hamming distance $ham")
  }

  test("maxBucket skew guard drops degenerate buckets") {
    // 30 identical docs: every band bucket holds all 30 -> capped away
    val degenerate = docsDF((1L to 30L).map(i =>
      (i, "same words repeated here for every single document body")): _*)
    val capped = Dedup.minhashNearDup(degenerate, "doc_id", "text",
      maxBucket = Some(10))
    assert(capped.count() == 0)
    val uncapped = Dedup.minhashNearDup(degenerate, "doc_id", "text")
    assert(uncapped.count() == 30L * 29 / 2)
  }

  test("incremental near-dedup reports only pairs touching the fresh batch") {
    // 1≈4 (base×base dup), 2≈6 (fresh×base), 6≈7 (fresh×fresh)
    val base = docsDF(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "a completely different set of words describing spark joins in detail"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank"))
    val fresh = docsDF(
      (6L, "a completely different set of words describing spark joins in detail"),
      (7L, "a completely different set of words describing spark joins in depth"))
    val pairs = Dedup.incrementalNearDup(base, fresh, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 6L))) // fresh vs base
    assert(pairs.contains((6L, 7L))) // fresh vs fresh
    assert(!pairs.contains((1L, 4L)), "base-only pair must not be probed")
  }

  test("precomputed-signature incremental path: same pairs, and the base " +
      "text never reaches a signature aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val tmp = java.nio.file.Files.createTempDirectory("graft_inc_").toString
    docsDF(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "a completely different set of words describing spark joins in detail"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .write.parquet(s"file:$tmp/base_docs")
    docsDF(
      (6L, "a completely different set of words describing spark joins in detail"),
      (7L, "a completely different set of words describing spark joins in depth"))
      .write.parquet(s"file:$tmp/fresh_docs")
    val baseDocs = spark.read.parquet(s"file:$tmp/base_docs")
    val fresh = spark.read.parquet(s"file:$tmp/fresh_docs")
    // the persisted state a steady-state pipeline would store between
    // batches: base band signatures written once, read back per batch
    Dedup.bandSignaturesFor(baseDocs, "doc_id", "text")
      .write.parquet(s"file:$tmp/base_sigs")
    val baseSigs = spark.read.parquet(s"file:$tmp/base_sigs")

    val res = Dedup.incrementalNearDupFromSignatures(
      baseSigs, baseDocs, fresh, "doc_id", "text", threshold = 0.5)
    val got = res.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 6L), (2L, 7L), (6L, 7L)))
    // fresh signatures are appendable state: same shape as the store
    assert(res.freshSignatures.columns.toSeq == Seq("id", "band", "key"))
    assert(res.freshSignatures.select("id").distinct().count() == 2)

    // plan assert: every minhash-signature aggregate reads ONLY the
    // fresh scan — the base text is never re-signatured. The operator
    // persists its intermediates, so aggregates can sit arbitrarily
    // deep inside cached plans: expand recursively through
    // InMemoryTableScan/AQE wrappers.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    def expand(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: AdaptiveSparkPlanExec => expand(a.inputPlan)
        case t: InMemoryTableScanExec => t +: expand(t.relation.cachedPlan)
        case n => Seq(n)
      }
    val lp = res.pairs.queryExecution.optimizedPlan
    val logicalAggScans = lp.collect {
      case a: Aggregate
          if a.aggregateExpressions.exists(_.name.startsWith("mh_")) =>
        a.collect { case l: LogicalRelation =>
          l.relation.asInstanceOf[HadoopFsRelation]
            .location.rootPaths.map(_.toString)
        }.flatten
    }
    val cachedAggScans = lp.collect { case i: InMemoryRelation => i }
      .flatMap(i => expand(i.cachedPlan))
      .collect {
        case a: HashAggregateExec
            if a.output.exists(_.name.startsWith("mh_")) =>
          expand(a).collect { case s: FileSourceScanExec =>
            s.relation.location.rootPaths.map(_.toString)
          }.flatten
      }
    val allAggScans = logicalAggScans ++ cachedAggScans
    assert(allAggScans.nonEmpty, "expected a signature aggregate in the plan")
    allAggScans.foreach { roots =>
      assert(roots.nonEmpty && roots.forall(_.contains("fresh_docs")),
        s"signature aggregate reads non-fresh inputs: $roots")
    }

    // release() frees the operator's persisted intermediates
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    res.release()
    assert(spark.sparkContext.getPersistentRDDs.size < cachedBefore
      || cachedBefore == 0, "release() must unpersist cached intermediates")
  }

  test("documents shorter than the shingle width produce no candidates") {
    val tiny = docsDF((1L, "one two"), (2L, "one two"), (3L, "x"))
    assert(Dedup.minhashNearDup(tiny, "doc_id", "text").count() == 0)
  }

  test("simhash radius search equals the brute-force all-pairs scan") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sf001/documents.parquet")
    for (r <- Seq(0, 3)) { // both ends of the pigeonhole guarantee
      val banded = Dedup.simhashNearDup(df, "doc_id", "text", maxHamming = r)
        .orderBy("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
      val sigs = Dedup.simhashSignatures(df, "doc_id", "text")
      val a = sigs.select(col("id").as("id_a"), col("simhash").as("sa"))
      val b = sigs.select(col("id").as("id_b"), col("simhash").as("sb"))
      val brute = a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).as("h"))
        .where(col("h") <= r)
        .orderBy("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
      assert(banded.sameElements(brute),
        s"radius $r: banded ${banded.length} pairs vs brute ${brute.length}")
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(df, "doc_id", "text", maxHamming = 4)
    }
  }

  test("chunkExact keeps the lexicographic-min (id, seq) per digest") {
    val ss = spark
    import ss.implicits._
    val chunks = Seq(
      (2L, 1L, "shared boilerplate"),
      (1L, 3L, "shared boilerplate"), // same digest, smaller doc wins
      (1L, 1L, "unique one"),
      (3L, 2L, "shared boilerplate"),
      (3L, 1L, "another unique")
    ).toDF("doc_id", "chunk_seq", "chunk_text")
    val out = Dedup.chunkExact(chunks, "doc_id", "chunk_seq", "chunk_text")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(
      (1L, 3L, 3L), // boilerplate: kept (1,3), 3 copies
      (1L, 1L, 1L),
      (3L, 1L, 1L)))
  }

  test("duplicatedSpans finds maximal cross-doc and in-doc repeated spans") {
    val ss = spark
    import ss.implicits._
    val k = 20
    val shared = "the quick brown fox jumps over the lazy dog again and then " +
      "the license text follows" // 84 chars, embedded at different offsets
    val inner = "0123456789abcdefghij0123456789ABCDEFGHIJ" // 40 chars
    val docsIn = Seq(
      (1L, "alpha beta gamma delta " + shared + " epsilon zeta"),
      (2L, "one two three " + shared + " four five six seven eight"),
      (3L, "completely unrelated content with no repeats whatsoever here"),
      // the same 40-char block twice INSIDE one doc
      (4L, "<<" + inner + " unrelated middle padding " + inner + ">>"))
    val out = Dedup.duplicatedSpans(docsIn.toDF("doc_id", "text"),
        "doc_id", "text", k = k, minSpan = 40)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force recompute: corpus-wide gram counts -> duplicated
    // positions -> islands -> maximal spans
    val gramCount = docsIn.flatMap { case (_, t) =>
      (0 to t.length - k).map(i => t.substring(i, i + k))
    }.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val expected = docsIn.flatMap { case (id, t) =>
      val dupPos = (0 to t.length - k)
        .filter(i => gramCount(t.substring(i, i + k)) >= 2)
      val islands = dupPos.foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }
      islands.reverse.map(run =>
        (id, run.min + 1L, (run.max - run.min + k).toLong))
        .filter(_._3 >= 40)
    }.sortBy(s => (s._1, s._2))
    assert(out.toSeq == expected)
    // sanity on the scenario itself: docs 1+2 carry exactly the shared
    // span, doc 3 nothing, doc 4 its two internal repeats
    assert(expected.count(_._1 == 3L) == 0)
    assert(expected.count(_._1 == 4L) == 2)
    // both contexts surround `shared` with a space, so the maximal span
    // extends past the planted text by those matching chars
    assert(expected.filter(_._1 <= 2L).forall(_._3 >= shared.length.toLong))
  }

  test("prefixFilterJaccard equals the brute-force all-pairs scan") {
    val ss = spark
    import ss.implicits._
    // word sets with controlled overlap, including a pair exactly at
    // the threshold (3 shared of 6 union = 0.5) and a hub word ("the")
    // present everywhere that must never by itself create output
    val docsIn = Seq(
      (1L, "the red fox jumps high"),
      (2L, "the red fox jumps far"),   // j(1,2) = 4/6 = 0.6667
      (3L, "the red fox sleeps"),      // j(1,3) = 3/6 = 0.5 boundary
      (4L, "the blue whale swims deep"),
      (5L, "the blue whale swims deep"), // exact dup of 4: j = 1
      (6L, "a completely different document entirely")
    ).toDF("doc_id", "text")
    val out = Dedup
      .prefixFilterJaccard(docsIn, "doc_id", "text",
        shingleWidth = 1, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val sets = docsIn.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet).toMap
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a) | sets(b)).size if j >= 0.5
    } yield (a, b, math.floor(j * 10000 + 0.5) / 10000)).toSet
    assert(out == expected)
    assert(expected.contains((1L, 3L, 0.5)))    // boundary pair kept
    assert(expected.contains((4L, 5L, 1.0)))
    assert(!expected.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("prefixFilterJaccard guard refuses template-degenerate corpora") {
    val ss = spark
    import ss.implicits._
    // a boilerplate farm: every doc is the same template with one
    // varying word, so every prefix token is shared corpus-wide and
    // the candidate volume is all-pairs (40*39/2 = 780)
    val template = (1 to 40)
      .map(i => (i.toLong, s"shared legal boilerplate header text v$i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.prefixFilterJaccard(template, "doc_id", "text",
        shingleWidth = 1, threshold = 0.5,
        maxCandidatePairs = Some(100L)).count()
    }
    assert(e.getMessage.contains("maxCandidatePairs"))
    assert(e.getMessage.contains("minhashNearDup"))
    // below the cap the SAME corpus still computes, and exactly: recall
    // is preserved — the guard refuses or runs, it never drops pairs
    val out = Dedup.prefixFilterJaccard(template, "doc_id", "text",
        shingleWidth = 1, threshold = 0.5,
        maxCandidatePairs = Some(5000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val sets = template.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet).toMap
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a) | sets(b)).size if j >= 0.5
    } yield (a, b, math.floor(j * 10000 + 0.5) / 10000)).toSet
    assert(out == expected)
    assert(expected.size == 40 * 39 / 2) // every pair shares 5 of 7
  }

  test("minhashCalibration: exact dups estimate 1.0; err is |exact-est|") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "alpha beta gamma delta zeta"),    // j(1,3) = 4/6 = 0.6667
      (4L, "totally unrelated words here now"))
      .toDF("doc_id", "text")
    val rows = Dedup.minhashCalibration(df, "doc_id", "text",
        shingleWidth = 1, threshold = 0.5, numHashes = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val byPair = rows.map(t => (t._1, t._2) -> t).toMap
    // identical shingle sets agree on EVERY seed's min: est 1, err 0
    assert(byPair((1L, 2L)) == ((1L, 2L, 1.0, 1.0, 0.0)))
    // every estimate is a multiple of 1/16 in [0,1], and abs_err is
    // exactly the fix4'd |exact - est| of the output columns
    rows.foreach { case (_, _, exact, est, err) =>
      val sixteenths = est * 16
      assert(sixteenths == math.floor(sixteenths) && est >= 0 && est <= 1)
      assert(err == math.floor(math.abs(exact - est) * 10000 + 0.5) / 10000)
    }
    assert(byPair.contains((1L, 3L)) && byPair.contains((2L, 3L)))
    assert(!rows.exists(t => t._1 == 4L || t._2 == 4L))
  }

  test("survivorByScore keeps the highest-scored replica per digest group") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "alpha beta"), // dup group A
      (2L, "alpha beta"),
      (3L, "  ALPHA BETA "), // same after normalization
      (4L, "unique text here")
    ).toDF("doc_id", "text")
    // score doc 3 highest, doc 1 next: survivor must be 3
    val score = org.apache.spark.sql.functions
      .when(org.apache.spark.sql.functions.col("doc_id") === 3L, 0.9)
      .when(org.apache.spark.sql.functions.col("doc_id") === 1L, 0.8)
      .otherwise(0.5)
    val out = Dedup.survivorByScore(df, "doc_id", "text", score)
      .orderBy("digest").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(out == Set(
      (3L, 0.9, 3L), // group A: 3 docs, best 0.9, survivor id 3
      (1L, 0.5, 4L))) // singleton keeps itself
  }

  test("dupClusters keeps null-text docs, collapsing them with empty text") {
    // ADVICE r11 (medium): md5(null) used to null out of the final
    // digest equi-join and silently DROP null-text ids. Contract now:
    // every input id gets a cluster row; null text digests as the
    // empty document, so null-text and empty-text docs form one
    // replica group labeled by their min id.
    val df = docsDF(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, null),
      (3L, ""),
      (4L, null))
    val out = Dedup.dupClusters(df, "doc_id", "text",
        shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("survivorByScore breaks score ties by the smaller id") {
    val ss = spark
    import ss.implicits._
    val df = Seq((7L, "same"), (5L, "same")).toDF("doc_id", "text")
    val out = Dedup.survivorByScore(df, "doc_id", "text",
        org.apache.spark.sql.functions.lit(0.5))
      .collect().head
    assert(out.getAs[Long]("survivor_doc_id") == 5L)
  }

  test("hammingPairs64: exact recall vs brute force (fuzz incl. sign bit)") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(17)
    def flip(h: Long, n: Int): Long = {
      // flip n distinct random bits
      var v = h
      rnd.shuffle((0 until 64).toList).take(n).foreach(b => v ^= 1L << b)
      v
    }
    for (trial <- 0 until 5) {
      val k = Seq(0, 3, 8, 16)(trial % 4)
      // random hashes + planted neighbors at, inside, and just
      // OUTSIDE the radius; include sign-bit-heavy values
      val base = Seq.tabulate(12)(i =>
        (i.toLong, if (i % 3 == 0) rnd.nextLong() | (1L << 63)
        else rnd.nextLong()))
      val planted = base.flatMap { case (id, h) =>
        Seq((id + 100, flip(h, k)), (id + 200, flip(h, k + 1)))
      }
      val all = base ++ planted
      val df = all.toDF("id", "h")
      val got = Dedup.hammingPairs64(df, "id", "h", maxHamming = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val want = (for {
        (a, ha) <- all; (b, hb) <- all if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= k
      } yield (a, b, d)).toSet
      assert(got == want, s"trial $trial k=$k: got ${got.size} want ${want.size}")
      // the k-flip neighbor is found, the (k+1)-flip one is not
      // (unless random collisions — covered by the exact set compare)
    }
    // null hashes drop
    val withNull = Seq((1L, Some(5L)), (2L, Some(5L)),
      (3L, Option.empty[Long])).toDF("id", "h")
    assert(Dedup.hammingPairs64(withNull, "id", "h", 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
    intercept[IllegalArgumentException] {
      Dedup.hammingPairs64(withNull, "id", "h", 17)
    }
  }
}
