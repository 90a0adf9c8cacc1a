package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {

  private def docsDF(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("langId picks the profile with most stopword hits") {
    val df = docsDF(
      (1L, "the cat of the house and the dog"), // en
      (2L, "der hund und die katze ist ein tier"), // de
      (3L, "le chat et la maison est un lieu"), // fr
      (4L, "xyzzy plugh")) // nothing -> en by tie precedence
    val out = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "fr")
    assert(out(4L) == "en")
  }

  test("langId/qualityScore keep null-text docs (total-over-input)") {
    // ADVICE r11: explode() dropped ids whose text is null; the
    // explode_outer form must emit one row per distinct id with zero
    // counts and null ratios.
    val df = docsDF(
      (1L, "the cat of the house and the dog"),
      (2L, null),
      (2L, null), // duplicate id: merges into ONE output row
      (3L, null))
    val lang = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(lang.keySet == Set(1L, 2L, 3L))
    assert(lang(2L).getString(1) == "en") // all-zero tie -> precedence
    assert(lang(2L).isNullAt(2)) // 0/0 ratio is null, not NaN
    val q = TextAnalysis.qualityScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(q.keySet == Set(1L, 2L, 3L))
    assert(q(3L).getLong(1) == 0L) // n_tokens
    assert(q(3L).isNullAt(2) && q(3L).isNullAt(3) && q(3L).isNullAt(4))
    assert(q(1L).getLong(1) == 8L) // non-null rows unchanged
  }

  test("qualityScore components are exact ratios") {
    val df = docsDF((1L, "the aa bbb cccc")) // 4 tokens, lens 3,2,3,4
    val r = TextAnalysis.qualityScore(df, "doc_id", "text").head
    assert(r.getLong(1) == 4) // n_tokens
    assert(r.getDouble(2) == 3.0) // avg len (3+2+3+4)/4
    assert(r.getDouble(3) == 0.25) // 'the' is 1 of 4
    val expected = 0.4 * (4.0 / 100) + 0.3 * 0.75 + 0.3 * (3.0 / 10)
    assert(math.abs(r.getDouble(4) - expected) < 1e-4)
  }

  test("tokenCounts: whitespace vs BPE-ish regex") {
    val df = docsDF((1L, "hello, world! it's 42"))
    val r = TextAnalysis.tokenCounts(df, "doc_id", "text").head
    assert(r.getLong(1) == 4) // ws tokens
    // bpe-ish: hello , world ! it ' s 42 -> 8
    assert(r.getLong(2) == 8)
  }

  test("fingerprint is edit-sensitive in md5 but stable in min-hash for shared grams") {
    val df = docsDF(
      (1L, "abcdefghijklmnop"),
      (2L, "abcdefghijklmnoq")) // tail edit
    val rows = TextAnalysis.fingerprint(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getString(1) != rows(1).getString(1)) // md5 differs
    // the min over shared 5-gram hashes usually survives a 1-char tail edit
    assert(rows(0).getString(2).length == 15)
  }

  test("tfidfTopTerms ranks rare terms above ubiquitous ones") {
    val df = docsDF(
      (1L, "common common common rare"),
      (2L, "common words here today"),
      (3L, "common words again now"))
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getString(1)).toMap
    // doc 1: "rare" (df=1) outranks "common" (df=3) despite tf 1 vs 3?
    // tf=3 * idf(df=3) vs tf=1 * idf(df=1): 3*(ln(4/4)+1)=3 vs
    // 1*(ln(4/2)+1)=1.69 -> common first, rare second
    assert(out((1L, 1)) == "common")
    assert(out((1L, 2)) == "rare")
    // docs 2,3: all terms tf=1; df=1 terms (unique words) outrank
    // "common"/"words" (higher df); ties break alphabetically
    assert(out((2L, 1)) == "here")
    assert(out((2L, 2)) == "today")
  }

  test("repetitionRatio flags boilerplate, zero for short docs") {
    val df = docsDF(
      (1L, "spam spam spam spam spam spam"), // 4 trigrams, 1 distinct
      (2L, "all words here are different today"), // 4 trigrams, all distinct
      (3L, "too short")) // no trigram
    val out = TextAnalysis.repetitionRatio(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 1L, 0.75)))
    assert(out(2L) == ((4L, 4L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  test("scrubPii redacts emails and long digit runs, counts matches") {
    val df = docsDF(
      (1L, "mail me at jane.doe+x@corp.example.org or 123456789012"),
      (2L, "no pii here, just 1234 and a short text"))
    val out = TextAnalysis.scrubPii(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L)
    assert(out(1L)._3 == "mail me at [EMAIL] or [NUM]")
    assert(out(2L) == ((0L, 0L, "no pii here, just 1234 and a short text")))
  }

  test("chunkDocuments windows tokens with overlap, covers every token") {
    // 10 tokens, chunk 4, overlap 1 -> stride 3 -> starts 1,4,7:
    // ceil((10-1)/3) = 3 chunks cover every token with no redundant tail
    val df = docsDF((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, "solo"))
    val out = TextAnalysis.chunkDocuments(df, "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(out.keys.count(_._1 == 1L) == 3)
    assert(out((1L, 1L)) == (("t1 t2 t3 t4", 4L)))
    assert(out((1L, 2L)) == (("t4 t5 t6 t7", 4L)))
    assert(out((1L, 3L)) == (("t7 t8 t9 t10", 4L)))
    assert(out((2L, 1L)) == (("solo", 1L)))
    // consecutive chunks share exactly `overlap` tokens
    assert(out((1L, 1L))._1.split(" ").last == out((1L, 2L))._1.split(" ").head)
  }

  test("scrubPii is map-side only: no shuffle in the plan") {
    val df = spark.read.parquet(s"$sf001/documents.parquet")
    val plan = TextAnalysis.scrubPii(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redaction must not shuffle: $plan")
  }

  test("topNgrams counts duplicate occurrences and breaks ties alphabetically") {
    val df = docsDF(
      (1L, "a b c a b c"), // "a b c" x2ish
      (2L, "a b c d"))
    val out = TextAnalysis.topNgrams(df, "text", n = 3, topK = 3).collect()
    assert(out.head.getString(0) == "a b c")
    assert(out.head.getLong(1) == 3) // twice in doc1? "a b c","b c a","c a b","a b c" + doc2 "a b c"
  }

  test("approxTopTerms: heavy hitters survive a tiny sketch, counts exact") {
    val ss = spark
    import ss.implicits._
    // two groups, skewed: the true top terms dwarf the noise, so they
    // must survive even a capacity-2 Misra-Gries sketch; the noise
    // terms (singletons) may or may not — the exact recount decides
    val rows =
      Seq.fill(50)(("en", "apple")) ++ Seq.fill(30)(("en", "banana")) ++
        (1 to 20).map(i => ("en", s"noise$i")) ++
        Seq.fill(40)(("de", "zug")) ++ Seq.fill(25)(("de", "berg")) ++
        (1 to 15).map(i => ("de", s"rausch$i"))
    val df = rows.map { case (g, t) => (g, t) }
      .toDF("lang", "text")
      .repartition(4) // force multiple independent partition sketches
    val out = TextAnalysis
      .approxTopTerms(df, "lang", "text", k = 2, capacity = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(3)) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out(("en", 1)) == (("apple", 50L))) // exact counts, not estimates
    assert(out(("en", 2)) == (("banana", 30L)))
    assert(out(("de", 1)) == (("zug", 40L)))
    assert(out(("de", 2)) == (("berg", 25L)))
    assert(out.size == 4)
  }

  test("approxTopTerms: group-cardinality guard fails loudly, not OOM") {
    val ss = spark
    import ss.implicits._
    val df = (1 to 50).map(i => (s"group$i", "some words here"))
      .toDF("lang", "text").coalesce(1) // all groups in ONE partition
    val e = intercept[org.apache.spark.SparkException] {
      TextAnalysis.approxTopTerms(df, "lang", "text", k = 1,
        capacity = 4, maxGroupsPerPartition = 10).collect()
    }
    assert(e.getMessage.contains("maxGroupsPerPartition") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("maxGroupsPerPartition")))
    // a cap sized to the actual per-partition group load passes
    val ok = TextAnalysis.approxTopTerms(
      df.repartition(8, col("lang")), "lang", "text", k = 1,
      capacity = 4, maxGroupsPerPartition = 50).collect()
    assert(ok.length == 50)
  }

  test("approxTopTerms equals the exact grouped top-k at default capacity") {
    val df = spark.read.parquet(s"$sf001/documents.parquet")
    val approx = TextAnalysis.approxTopTerms(df, "lang", "text", k = 3)
      .orderBy("lang", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // exact reference computed the brute-force way
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(col("freq").desc, col("term").asc)
    val exact = df
      .select(col("lang"),
        explode(graft.functions.Texts.words(col("text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy("lang", "term").agg(count(lit(1)).as("freq"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .orderBy("lang", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(approx.sameElements(exact))
  }

  test("filterCascade drops each crafted failure at its own stage") {
    val ss = spark
    import ss.implicits._
    val good = (1 to 30).map(i => s"word$i").mkString(" ") +
      " the the the the the" // 35 tokens, stopwords present, diverse
    val tooShort = "the cat" // fails min_tokens
    val longWords = (1 to 35).map(i => "x" * 20 + i).mkString(" ") // fails mean_word_len
    val repetitive = Seq.fill(40)("the").mkString(" ") // fails distinct_ratio
    val noStopwords = (1 to 35).map(i => s"token$i").mkString(" ") // fails stopword_presence
    val df = Seq(good, tooShort, longWords, repetitive, noStopwords)
      .toDF("text")
    val out = TextAnalysis.filterCascade(df, "text")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0, "input", 5L),
      (1, "min_tokens", 4L),
      (2, "mean_word_len", 3L),
      (3, "distinct_ratio", 2L),
      (4, "stopword_presence", 1L)))
  }

  test("dfHistogram counts terms by document frequency") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "alpha beta beta gamma"), // within-doc repeats count once
      (2L, "alpha beta"),
      (3L, "alpha")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dfHistogram(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // df=1: gamma; df=2: beta; df=3: alpha
    assert(out === Array(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("fuzzyContamination reports the per-pair probe-gram fraction") {
    val ss = spark
    import ss.implicits._
    // probe 1: tokens a..f -> 3-grams {abc,bcd,cde,def} (4 grams)
    val probe = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a b c d x x"), // shares abc,bcd -> 2/4 = 0.5
      (11L, "a b c x x x"), // shares abc -> 1/4 = 0.25
      (12L, "z z z z z z")  // shares nothing
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .fuzzyContamination(corpus, probe, "doc_id", "text",
        n = 3, minOverlap = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out === Array((10L, 1L, 0.5))) // 0.25 fails the threshold
  }

  test("bigramLogLoss count joins: no hint, AQE broadcasts when small") {
    // VERDICT r11 item 3: c1/c2 are bigram-vocabulary-grain, so the
    // operator must not force broadcast(); AQE picks it at runtime
    // when the tables measure small (CMS q146 is the constant-memory
    // path at web scale).
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val out = TextAnalysis.bigramLogLoss(docs, "doc_id", "text")
    assert(!out.queryExecution.optimizedPlan.toString
      .contains("ResolvedHint"), "broadcast hints should be gone")
    out.collect(): Unit
    val executed = out.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin"),
      s"AQE did not broadcast the small count tables:\n${executed.take(1500)}")
  }

  test("bigramLogLoss scores improbable sequences higher") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogLoss(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // c(a,*)=3; p(b|a)=2/3 -> nll=ln(3/2)=0.4055; p(c|a)=1/3 -> ln(3)=1.0986
    assert(out(1L) == (1L, 0.4055))
    assert(out(2L) == (1L, 0.4055))
    assert(out(3L) == (1L, 1.0986))
  }

  test("bm25TopK: hand-checked scores, rank ties break by doc id") {
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val queries = Seq((10L, "x"), (20L, "z")).toDF("query_id", "query_text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))
    // query x: df=2, N=2, avgdl=2 -> idf=ln(1.2); tf=1, dl=2 ->
    // contribution idf*2.2/2.2 = ln(1.2) = 0.18232 -> 0.1823; equal
    // scores rank by doc id. query z: df=1 -> idf=ln(2) -> 0.6931.
    assert(out === Array(
      (10L, 1L, 1, 0.1823), (10L, 2L, 2, 0.1823),
      (20L, 2L, 1, 0.6931)))
  }

  test("bm25TopK: df derives from probe-filtered postings, not the vocabulary") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => WinNode}
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val queries = Seq((10L, "x")).toDF("query_id", "query_text")
    val plan = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, k = 5)
      .queryExecution.optimizedPlan
    // every window producing `df` must sit ABOVE a join (the broadcast
    // probe filter) — a whole-vocabulary df aggregate would read the
    // corpus tf aggregate with no join beneath it
    val dfWins = plan.collect {
      case wn: WinNode if wn.windowExpressions.exists(_.name == "df") => wn
    }
    assert(dfWins.nonEmpty, "expected df to come from a window over postings")
    dfWins.foreach { wn =>
      assert(wn.collect { case j: Join => j }.nonEmpty,
        "df window input is not probe-filtered")
    }
  }

  test("pmiCollocations: hand-checked PMI, min-count floor, deterministic ties") {
    val ss = spark
    import ss.implicits._
    // bigrams: (x,y)x3, (x,z)x1, (w,z)x1; N=5; c_a: x=4,w=1; c_b: y=3,z=2
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "x z"),
      (5L, "w z")).toDF("doc_id", "text")
    val all = TextAnalysis.pmiCollocations(docs, "text", minCount = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // ln(1*5/(1*2))=0.9163 > ln(3*5/(4*3))=0.2231 > ln(1*5/(4*2))=-0.47
    assert(all.toSeq == Seq(
      ("w", "z", 1L, 0.9163),
      ("x", "y", 3L, 0.2231),
      ("x", "z", 1L, -0.47)))
    // the count floor prunes singleton bigrams
    val floored = TextAnalysis.pmiCollocations(docs, "text", minCount = 2,
      k = 10).collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "y")))
  }

  test("categoryEntropy: uniform maxes, constant zeroes") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      ("s1", "en"), ("s1", "de"), ("s1", "fr"), ("s1", "es"), // uniform 4
      ("s2", "en"), ("s2", "en"), ("s2", "en"),               // constant
      ("s3", "en"), ("s3", "en"), ("s3", "de"), ("s3", "de")  // uniform 2
    ).toDF("source", "lang")
    val out = TextAnalysis.categoryEntropy(df, "source", "lang")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out("s1") == ((4L, 4L, 1.3863))) // ln 4
    assert(out("s2") == ((3L, 1L, 0.0)))    // -1*ln(1) = 0 (fix4 of -0.0)
    assert(out("s3") == ((4L, 2L, 0.6931))) // ln 2
  }

  test("rrfFuse: doc in both rankings outranks either single-source doc") {
    val ss = spark
    import ss.implicits._
    val a = Seq((1L, 101L, 1), (1L, 102L, 2)).toDF("q", "d", "r")
    val b = Seq((1L, 102L, 1), (1L, 103L, 2)).toDF("q", "d", "r")
    // d102: 1/62 + 1/61 = .0325; d101: 1/61 = .0164; d103: 1/62 = .0161
    val out = TextAnalysis.rrfFuse(Seq(a, b), "q", "d", "r", topK = 3)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(out == Set((102L, 1, 0.0325), (101L, 2, 0.0164),
      (103L, 3, 0.0161)))
  }

  test("bpeMergeSteps: hand-checked merges, placeholder expands back") {
    // words: aa (freq 2), ab (1), aab (1)
    // iter 1 pairs: aa -> 2+1=3, ab -> 1+1=2; winner "aa"
    // after merge: <1> (len 1, dropped), ab, <1>b
    // iter 2 pairs: ab -> 1, <1>b -> 1
    val df = docsDF((1L, "aa ab"), (2L, "aab aa"))
    val out = TextAnalysis.bpeMergeSteps(df, "text", iters = 2, topK = 10)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      (1, "a", "a", 3L),
      (1, "a", "b", 2L),
      (2, "a", "b", 1L),
      (2, "aa", "b", 1L)), s"got $out")
  }

  test("bpeMergeSteps: merge is left-to-right non-overlapping") {
    // "aaa" (freq 1): pairs aa counted at i=1 and i=2 -> count 2; the
    // merge rewrites to <1>a (NOT a<1>), so iter 2 sees pair <1>a
    val df = docsDF((1L, "aaa"))
    val out = TextAnalysis.bpeMergeSteps(df, "text", iters = 2, topK = 10)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      (1, "a", "a", 2L),
      (2, "aa", "a", 1L)), s"got $out")
  }

  test("wordPieceTrainSteps: likelihood argmax differs from count argmax") {
    // words: "ab" x5, "xy" x2 (each word also contributes unit counts)
    // counts: ab=5, xy=2; a=5, b=5, x=2, y=2
    // scores: ab = 5/(5*5) = 0.2, xy = 2/(2*2) = 0.5
    // BPE (raw count) would merge ab; WordPiece must merge xy
    val df = docsDF(
      (1L, "ab ab ab ab ab xy"), (2L, "xy"))
    val out = TextAnalysis.wordPieceTrainSteps(df, "text", iters = 1)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq((1, "xy", 2L, 2L, 2L)), s"got $out")
    val bpe = TextAnalysis.bpeMergeSteps(df, "text", iters = 1, topK = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(bpe == Seq(("a", "b")), s"bpe got $bpe")
  }

  test("wordPieceTrainSteps: exact rational ties break by pair asc") {
    // "ab" x2 and "cd" x2 with all unit counts equal -> identical
    // scores; the argmax must pick "ab" (pair ascending), exactly,
    // not by float luck
    val df = docsDF((1L, "ab ab cd cd"))
    val out = TextAnalysis.wordPieceTrainSteps(df, "text", iters = 1)
      .collect().map(r => r.getString(1)).toSeq
    assert(out == Seq("ab"), s"got $out")
  }

  test("wordPieceTrainSteps: placeholders expand; merged unit recounts") {
    // iter 1 on "xy xy xyz": pairs xy=3, yz=1; units x=3 y=3 z=1.
    // scores: xy 3/9 = 1/3, yz 1/(3*1) = 1/3 — EXACTLY equal (the
    // rational compare, not float luck) -> tie-break pair asc = "xy".
    // After merging xy -> <1>: words <1> (freq 2), <1>z (freq 1);
    // iter 2 pair <1>z count 1, units <1>=3, z=1 -> piece "xyz"
    val df = docsDF((1L, "xy xy xyz"))
    val out = TextAnalysis.wordPieceTrainSteps(df, "text", iters = 2)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      (1, "xy", 3L, 3L, 3L),
      (2, "xyz", 1L, 3L, 1L)), s"got $out")
  }

  test("bpeTrainMerges + bpeEncode round-trip on planted text") {
    // words: aa x3, ab x2, aab x1
    // iter 1 pairs: aa -> 3+1=4, ab -> 2+1=3; merge 1 = "aa"
    // after:  <1> x3, ab x2, <1>b x1
    // iter 2 pairs: ab -> 2, <1>b -> 1; merge 2 = "ab"
    val df = docsDF((1L, "aa ab aab"), (2L, "aa aa ab"))
    val merges = TextAnalysis.bpeTrainMerges(df, "text", iters = 2)
    assert(merges.map(_._2) == Seq("aa", "ab"))
    assert(merges.map(_._1) == Seq("aa", "ab"))
    val toks = TextAnalysis.bpeEncode(df, "doc_id", "text", merges.map(_._1))
      .orderBy("doc_id", "word_idx", "char_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3), r.getInt(4)))
      .toSeq
    // doc 1: aa -> [aa]; ab -> [ab]; aab -> [aa, b]
    // doc 2: aa -> [aa]; aa -> [aa]; ab -> [ab]
    assert(toks == Seq(
      (1L, 0, "aa", 256), (1L, 1, "ab", 257),
      (1L, 2, "aa", 256), (1L, 2, "b", 'b'.toInt),
      (2L, 0, "aa", 256), (2L, 1, "aa", 256), (2L, 2, "ab", 257)),
      s"got $toks")
    // round-trip: per-word token concatenation reproduces the word
    val ss = spark
    import ss.implicits._
    val joined = TextAnalysis
      .bpeEncode(df, "doc_id", "text", merges.map(_._1))
      .groupBy("doc_id", "word_idx")
      .agg(concat_ws("",
        sort_array(collect_list(struct(col("char_idx"), col("token"))))
          .getField("token")).as("rebuilt"))
    val words = df
      .select(col("doc_id"), posexplode(graft.functions.Texts.words(col("text"))))
      .withColumnRenamed("pos", "word_idx")
      .withColumnRenamed("col", "word")
    val mismatches = joined.join(words, Seq("doc_id", "word_idx"))
      .where(col("rebuilt") =!= col("word")).count()
    assert(mismatches == 0)
  }

  test("bpeEncode: chained merges expand placeholder-containing pairs") {
    // "aaa": merge 1 = aa (count 2, L-to-R), word becomes <1>a;
    // merge 2 = <1>a -> expands to "aaa"
    val df = docsDF((1L, "aaa aaa"))
    val merges = TextAnalysis.bpeTrainMerges(df, "text", iters = 2)
    assert(merges.map(_._2) == Seq("aa", "aaa"))
    val toks = TextAnalysis.bpeEncode(df, "doc_id", "text", merges.map(_._1))
      .orderBy("word_idx", "char_idx")
      .collect().map(r => (r.getString(3), r.getInt(4))).toSeq
    assert(toks == Seq(("aaa", 257), ("aaa", 257)), s"got $toks")
  }

  test("qualityClassifierScore: JVM-recomputed hand score matches") {
    // independent recomputation: JVM MessageDigest md5 for BOTH the
    // token->bucket hash and the bucket weight (the operator computes
    // the former with Spark's md5+conv expressions)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def h60(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)
    def weight(j: Long): Long =
      h60(s"qw|$j") % 1001L - 500L
    val text = "alpha beta alpha gamma"
    val toks = Seq("alpha", "beta", "alpha", "gamma")
    val expectSum = toks.map(t => weight(h60(s"7|$t") % 256)).sum
    val expectScore =
      math.floor(expectSum.toDouble / 4 * 10000 + 0.5) / 10000
    val df = docsDF((1L, text))
    val row = TextAnalysis
      .qualityClassifierScore(df, "doc_id", "text", dim = 256, seed = 7)
      .collect().head
    assert(row.getLong(1) == 4L)
    assert(row.getLong(2) == expectSum, s"sum ${row.getLong(2)} != $expectSum")
    assert(row.getDouble(3) == expectScore)
  }

  test("qualityClassifierScore is partitioning-invariant (integer sums)") {
    val docs = docsDF((1L to 40L).map(i =>
      (i, s"word$i common tokens appear here plus word${i % 5}")): _*)
    val a = TextAnalysis.qualityClassifierScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis
      .qualityClassifierScore(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("bloomDecontaminate equals the exact anti-join, even at high fpp") {
    val ss = spark
    import ss.implicits._
    val corpus = docsDF(
      (20L, "alpha beta"), (21L, "gamma delta"), (22L, "ALPHA BETA  "),
      (23L, "unique text one"), (24L, "unique text two"))
    val probe = docsDF((1L, "alpha beta"), (2L, "epsilon zeta"))
    def ids(fpp: Double): Seq[Long] =
      TextAnalysis.bloomDecontaminate(corpus, probe, "text", fpp)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 20 and 22 normalize to the probe's "alpha beta" digest -> removed
    val expected = Seq(21L, 23L, 24L)
    assert(ids(0.01) == expected)
    // a near-saturated bloom routes (almost) everything through the
    // exact confirm — the RESULT must not change: the bloom only
    // routes rows, never decides
    assert(ids(0.5) == expected)
  }

  test("cmsTermFrequency: estimates never undercount; wide sketch exact") {
    val docs = spark.createDataFrame(Seq(
      (1L, "alpha alpha alpha beta"),
      (2L, "beta gamma alpha"),
      (3L, "delta delta gamma alpha")
    )).toDF("doc_id", "text")
    val wide = TextAnalysis
      .cmsTermFrequency(docs, "text", width = 4096, depth = 4, topN = 10)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 5 distinct terms in 4096 cells: no collisions, estimate == exact
    assert(wide("alpha") == ((5L, 5L, 0L)))
    assert(wide("beta") == ((2L, 2L, 0L)))
    assert(wide("delta") == ((2L, 2L, 0L)))
    // a cramped sketch may overestimate but must NEVER undercount
    val cramped = TextAnalysis
      .cmsTermFrequency(docs, "text", width = 2, depth = 1, topN = 10)
      .collect()
    cramped.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)} undercounted: $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // 2 cells for 10 term occurrences: the two cells must sum to 10,
    // so some term is overestimated
    assert(cramped.exists(_.getLong(3) > 0))
  }

  test("cmsTermFrequency topN keeps the most frequent terms, ties by term") {
    val docs = spark.createDataFrame(Seq(
      (1L, "x x x y y z w")
    )).toDF("doc_id", "text")
    val out = TextAnalysis
      .cmsTermFrequency(docs, "text", width = 1024, depth = 2, topN = 2)
      .orderBy(org.apache.spark.sql.functions.col("exact_cnt").desc,
        org.apache.spark.sql.functions.col("term"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("x", "y"))
  }

  test("noveltyScore: first occurrence owns the shingle, replicas score zero") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "a b c d"), // shingles: abc, bcd — all first here
      (2L, "a b c d"), // exact replica: zero novelty
      (3L, "a b c x y z") // abc seen; bcx, cxy, xyz new -> 3/4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(df, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1.0),
      (2L, 2L, 0L, 0.0),
      (3L, 4L, 3L, 0.75)))
  }

  test("noveltyScore omits docs shorter than the shingle width") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, "just two"), (2L, "one two three")).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(df, "doc_id", "text", n = 3).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("vocabCoverage: exact cumulative mass at each k, capped at vocab size") {
    val ss = spark
    import ss.implicits._
    // counts: a=4, b=2, c=1 -> total 7
    val df = Seq((1L, "a a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(df, "text", ks = Seq(1, 2, 99))
      .orderBy("k").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1, 3L, 7L, 4L, 0.5714), // top-1 = a
      (2, 3L, 7L, 6L, 0.8571), // a + b
      (99, 3L, 7L, 7L, 1.0))) // k past vocab covers everything
  }

  test("vocabCoverage: distributed rank exact over a multi-partition vocab") {
    val ss = spark
    import ss.implicits._
    // 500 distinct terms with distinct counts (term_i appears i+1
    // times) -> the range shuffle really spreads the vocabulary
    val docs = (0 until 500).flatMap(i => Seq.fill(i + 1)(f"t$i%03d"))
    val df = docs.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val run = TextAnalysis.vocabCoverageRun(df, "text", ks = Seq(1, 10, 250, 999))
    try {
      // every rank window in the plan must be __pid-partitioned — the
      // vocabulary-grain sort is never a single-partition window
      val plan = run.result.queryExecution.executedPlan.toString
      val rnLines = plan.linesIterator
        .filter(_.contains("row_number")).toSeq
      assert(rnLines.nonEmpty && rnLines.forall(_.contains("__pid")),
        s"unpartitioned vocabulary rank:\n${rnLines.mkString("\n")}")
      val out = run.result.orderBy("k").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // local truth: counts sorted desc, ties impossible (all distinct)
      val cnts = (0 until 500).map(i => (i + 1).toLong).sortBy(-_)
      val tot = cnts.sum
      def cov(k: Int) = cnts.take(k).sum
      assert(out.toSeq == Seq(
        (1, 500L, tot, cov(1)),
        (10, 500L, tot, cov(10)),
        (250, 500L, tot, cov(250)),
        (999, 500L, tot, tot)))
    } finally run.release()
  }

  test("seqLenHistogram: doc and token cumulative shares per bucket") {
    val ss = spark
    import ss.implicits._
    // token counts: 2, 3, 5 -> buckets (width 4): 0, 0, 1
    val df = Seq((1L, "x y"), (2L, "x y z"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.seqLenHistogram(df, "text", bucket = 4)
      .orderBy("len_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 5L, 0.6667, 0.5), // two short docs, 5 of 10 tokens
      (4L, 1L, 5L, 1.0, 1.0)))
  }

  test("htmlExtract: scripts/styles/comments dropped, entities decoded") {
    val ss = spark
    import ss.implicits._
    val html =
      "<html><head><title>My Page</title>" +
        "<script>var x = 1 < 2; // <p>not text</p></script>" +
        "<style>body { color: red; }</style></head>" +
        "<body><!-- hidden --><h1>Hello</h1>" +
        "<p>A &amp; B &lt;ok&gt;</p>" +
        "<div><a href=\"/x\">go here</a> plain <A HREF=\"/y\">two</A></div>" +
        "</body></html>"
    val out = TextAnalysis.htmlExtract(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect()(0)
    assert(out.getString(1) == "My Page")
    assert(out.getString(2) == "My Page Hello A & B <ok> go here plain two")
    assert(out.getLong(3) == 2L, s"n_links ${out.getLong(3)}")
    // anchor text "go here two" = 11 chars over 42 total
    assert(out.getDouble(4) == math.floor(11.0 / 42 * 10000 + 0.5) / 10000)
  }

  test("htmlExtract: empty body and tagless text are safe") {
    val ss = spark
    import ss.implicits._
    val out = TextAnalysis.htmlExtract(
      Seq(
        (1L, "<html><body><script>x</script></body></html>"),
        (2L, "no tags at all"),
        (3L, "<p>&nbsp;</p>")).toDF("doc_id", "html"),
      "doc_id", "html")
      .orderBy("doc_id").collect()
    assert(out(0).getString(2) == "" && out(0).getDouble(4) == 0.0)
    assert(out(1).getString(2) == "no tags at all")
    assert(out(2).getString(2) == "")
    assert(out.forall(_.getLong(3) == 0L))
  }

  test("sentenceStats: deterministic splitter, exact stats") {
    val ss = spark
    import ss.implicits._
    val out = TextAnalysis.sentenceStats(
      Seq(
        (1L, "One two. Three four! Five? Six"),
        (2L, "End."),
        (3L, "Hi!? Ok.  Sure"),
        (4L, "no terminal punctuation at all")).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // doc 1: "One two"(7) "Three four"(10) "Five"(4) "Six"(3)
    assert(out(0) == ((1L, 4L, 6.0, 10L)))
    // doc 2: the final sentence keeps its terminal punctuation
    assert(out(1) == ((2L, 1L, 4.0, 4L)))
    // doc 3: "!?" is one delimiter run; double space collapses
    assert(out(2) == ((3L, 3L, math.floor(8.0 / 3 * 10000 + 0.5) / 10000, 4L)))
    // doc 4: one sentence = the whole text
    assert(out(3)._2 == 1L && out(3)._4 == 30L)
    // first-sentence digest is position-exact
    val first = TextAnalysis.sentenceStats(
      Seq((1L, "Alpha beta. Gamma.")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0).getString(4)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("Alpha beta".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(first == expectMd5)
  }

  test("scriptHistogram: per-script counts and dominant routing") {
    val ss = spark
    import ss.implicits._
    val out = TextAnalysis.scriptHistogram(
      Seq(
        (1L, "hello world 42"),
        (2L, "Привет мир hi"),
        (3L, "你好世界"),
        (4L, "مرحبا"),
        (5L, "")).toDF("doc_id", "t"), "doc_id", "t")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(out(0) == ((1L, 10L, 0L, 0L, 0L, 2L, "latin")))
    assert(out(1) == ((2L, 2L, 9L, 0L, 0L, 0L, "cyrillic")))
    assert(out(2) == ((3L, 0L, 0L, 4L, 0L, 0L, "han")))
    assert(out(3) == ((4L, 0L, 0L, 0L, 5L, 0L, "arabic")))
    // all-zero ties route by the fixed precedence (latin)
    assert(out(4) == ((5L, 0L, 0L, 0L, 0L, 0L, "latin")))
  }
}
