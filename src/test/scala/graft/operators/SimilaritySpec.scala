package graft.operators

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  // Hand-built 4-dim vectors with known geometry.
  private def vecs = spark.createDataFrame(Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0.999f, 0.04f, 0f, 0f)), // ~same direction as 0
    (2L, Seq(0f, 1f, 0f, 0f)), // orthogonal to 0
    (3L, Seq(-1f, 0f, 0f, 0f)), // opposite of 0
    (4L, Seq(0.7f, 0.7f, 0f, 0f)) // 45 degrees
  )).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by exact cosine") {
    val out = Similarity.bruteForceTopK(
      vecs.where("vec_id = 0"), vecs, "vec_id", "embedding", k = 4)
      .orderBy("nn_rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(out.head.getDouble(3) > 0.999) // cos(0,1)
    assert(math.abs(out(1).getDouble(3) - math.sqrt(0.5)) < 1e-3) // cos 45°
    assert(out(2).getDouble(3) == 0.0) // orthogonal
    assert(out(3).getDouble(3) == -1.0) // opposite
  }

  test("identical-direction vectors land in the same LSH bucket") {
    val topk = Similarity.lshTopK(
      vecs.where("vec_id = 0"), vecs, "vec_id", "embedding",
      dim = 4, k = 2, bands = 2, bitsPerBand = 4)
      .collect()
    // vec 1 is ~colinear with vec 0: all hyperplane signs agree, so it
    // MUST be retrieved as the nearest neighbor.
    assert(topk.nonEmpty)
    assert(topk.head.getLong(1) == 1L)
    assert(topk.head.getInt(2) == 1)
  }

  test("embeddingNearDup returns only above-threshold bucket pairs") {
    val pairs = Similarity.embeddingNearDup(
      vecs, "vec_id", "embedding", dim = 4, threshold = 0.9)
      .collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 1L))) // colinear pair always shares buckets
    // opposite vectors can never pass cos >= 0.9
    assert(!keys.contains((0L, 3L)))
  }

  test("IVF: colinear vectors share a cell, so the neighbor is found") {
    val topk = Similarity.ivfTopK(
      vecs.where("vec_id = 0"), vecs, "vec_id", "embedding",
      dim = 4, k = 2, nCells = 4, nProbe = 2)
      .collect()
    // vec 1 is ~colinear with vec 0: identical centroid dots up to ulp,
    // so it lands in the same cell and must rank first.
    assert(topk.nonEmpty)
    assert(topk.head.getLong(1) == 1L)
    assert(topk.head.getInt(2) == 1)
  }

  test("zero-norm vectors are excluded instead of crashing ANSI division") {
    val withZero = spark.createDataFrame(Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 0f, 0f, 0f)), // zero vector: cosine undefined
      (3L, Seq.empty[Float]), // empty vector
      (4L, Seq(0.9f, 0.1f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val topk = Similarity.ivfTopK(
      withZero.where("vec_id = 1"), withZero, "vec_id", "embedding",
      dim = 4, k = 3, nCells = 4, nProbe = 2).collect()
    assert(topk.map(_.getLong(1)).toSet == Set(4L)) // 2 and 3 excluded
    assert(Similarity.embeddingNearDup(
      withZero, "vec_id", "embedding", dim = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 4L)))
  }

  test("IVF nProbe is general: recall grows monotonically to brute force") {
    val e = graft.Tables(spark, sf001, "embeddings")
    val q = e.where("vec_id < 10")
    def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = resultSet(
      Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 3))
    def recall(nProbe: Int): Double = {
      val ivf = resultSet(Similarity.ivfTopK(
        q, e, "vec_id", "embedding", dim = 64, k = 3,
        nCells = 8, nProbe = nProbe))
      ivf.intersect(exact).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r2 = recall(2)
    val r3 = recall(3)
    // more probed cells can only ADD candidates: recall is monotone,
    // and probing every cell IS the exhaustive scan
    assert(r1 <= r2 && r2 <= r3, s"recall not monotone: $r1, $r2, $r3")
    assert(r3 > 0.5, s"nProbe=3 recall unreasonably low: $r3")
    assert(recall(8) == 1.0, "probing all cells must equal brute force")
  }

  test("IVF rejects nProbe outside [1, nCells]") {
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(vecs, vecs, "vec_id", "embedding",
        dim = 4, k = 2, nCells = 4, nProbe = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(vecs, vecs, "vec_id", "embedding",
        dim = 4, k = 2, nCells = 4, nProbe = 5)
    }
  }

  test("matryoshkaAudit: truncation flips top-1 where it should") {
    val ss = spark
    import ss.implicits._
    // q's full-dim top-1 is c2 (dims 3-4 dominate), but the 2-dim
    // prefix of c1 aligns better: truncation MUST flip the answer
    val queries = Seq((0L, Seq(1.0f, 0.2f, 0.9f, 0.9f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(1.0f, 0.2f, 0.0f, 0.0f)),   // c1: perfect 2-dim prefix
      (11L, Seq(0.5f, 0.1f, 0.9f, 0.9f)))   // c2: full-dim winner
      .toDF("vec_id", "embedding")
    val got = Similarity.matryoshkaAudit(queries, corpus, "vec_id",
      "embedding", dims = Seq(2, 4), fullDim = 4)
      .orderBy("trunc_dim")
      .collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((2, 10L, false), (4, 11L, true)), got.toSeq)
    // JVM-recompute the truncated cosine for the d=2 row
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expect2 = math.floor(
      cos(Seq(1.0f, 0.2f).map(_.toDouble), Seq(1.0f, 0.2f).map(_.toDouble))
        * 10000 + 0.5) / 10000
    val row2 = Similarity.matryoshkaAudit(queries, corpus, "vec_id",
      "embedding", dims = Seq(2), fullDim = 4).collect()(0)
    assert(row2.getDouble(4) == expect2)
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaAudit(queries, corpus, "vec_id", "embedding",
        dims = Seq(0), fullDim = 4)
    }
  }

  test("pqTopK refuses query sets above maxQueries (flat-ADC cost law)") {
    val ss = spark
    import ss.implicits._
    val many = (0L to 9L).map(i => (i, Seq(0.1f, 0.2f, 0.3f, 0.4f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqTopK(many, many, "vec_id", "embedding",
        dim = 4, m = 2, nCodes = 4, k = 2, maxQueries = 5)
    }
    assert(ex.getMessage.contains("maxQueries=5"), ex.getMessage)
    assert(ex.getMessage.contains("ivfPqTopK"), ex.getMessage)
    // at exactly the ceiling it runs
    val ok = Similarity.pqTopK(many.limit(5), many, "vec_id", "embedding",
      dim = 4, m = 2, nCodes = 4, k = 2, maxQueries = 5)
    assert(ok.count() == 10L)
  }

  test("ivfPqTopK excludeSelf=false keeps same-id cross-corpus matches") {
    val ss = spark
    import ss.implicits._
    // disjoint tables whose id spaces overlap: id 0 exists in BOTH
    val corpus = (0L to 7L).map(i =>
      (i, Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        0.1f, -0.2f))).toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(1.0f, 0.0f, 0.1f, -0.2f)))
      .toDF("vec_id", "embedding")
    val withSelf = Similarity.ivfPqTopK(queries, corpus, "vec_id",
      "embedding", dim = 4, nCells = 2, nProbe = 2, m = 2, nCodes = 4,
      k = 8, excludeSelf = false)
      .collect().map(_.getLong(2)).toSet
    val without = Similarity.ivfPqTopK(queries, corpus, "vec_id",
      "embedding", dim = 4, nCells = 2, nProbe = 2, m = 2, nCodes = 4,
      k = 8)
      .collect().map(_.getLong(2)).toSet
    assert(withSelf.contains(0L), s"corpus id 0 dropped: $withSelf")
    assert(!without.contains(0L), "default must exclude self-id")
    assert(withSelf - 0L == without, s"$withSelf vs $without")
  }

  test("pqTopK: scores and ranking equal the JVM-recomputed ADC truth") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(53)
    val corpusVecs = (10L to 29L)
      .map(i => i -> Array.fill(4)(rnd.nextFloat() * 2 - 1))
    val queryVecs = Seq(
      0L -> Array(0.98f, 0.01f, -0.3f, 0.2f),
      1L -> Array(0.01f, -0.9f, 0.97f, 0.1f))
    val corpus = corpusVecs.map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val queries = queryVecs.map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    // independent JVM recomputation of codes, LUTs and ADC scores
    val m = 2; val nCodes = 4; val sub = 2
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def codesOf(v: Array[Float]): Seq[Int] = (0 until m).map { mi =>
      val sv = v.slice(mi * sub, (mi + 1) * sub).map(_.toDouble).toSeq
      val scores = (0 until nCodes).map { c =>
        val cent = Similarity.pqCentroidValues(mi, c, sub)
        2.0 * dot(sv, cent) - cent.map(x => x * x).sum
      }
      scores.indexOf(scores.max) // 0-based code
    }
    def adcOf(q: Array[Float], codes: Seq[Int]): Double =
      (0 until m).map { mi =>
        val qv = q.slice(mi * sub, (mi + 1) * sub).map(_.toDouble).toSeq
        dot(qv, Similarity.pqCentroidValues(mi, codes(mi), sub))
      }.sum
    def fix4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val expected = queryVecs.flatMap { case (qid, q) =>
      corpusVecs
        .map { case (cid, v) => (cid, adcOf(q, codesOf(v))) }
        .sortBy { case (cid, adc) => (-adc, cid) }
        .take(3).zipWithIndex
        .map { case ((cid, adc), i) => (qid, i + 1, cid, fix4(adc)) }
    }.toSet
    val got = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
      dim = 4, m = m, nCodes = nCodes, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("ivfPqTopK agrees with pqTopK when every cell is probed") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(67)
    val corpus = (0L to 19L)
      .map(i => (100L + i, Seq.fill(4)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(0.5f, -0.2f, 0.8f, 0.1f)))
      .toDF("vec_id", "embedding")
    val full = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
      dim = 4, m = 2, nCodes = 4, k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    // nProbe == nCells: the cell filter admits everything, so IVFPQ
    // must return exactly the plain ADC ranking
    val ivfpq = Similarity.ivfPqTopK(queries, corpus, "vec_id",
      "embedding", dim = 4, nCells = 4, nProbe = 4, m = 2, nCodes = 4,
      k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(ivfpq == full, s"ivfpq $ivfpq != full $full")
  }

  test("hyperplanes are deterministic across calls") {
    assert(Similarity.hyperplaneValues(3, 8) == Similarity.hyperplaneValues(3, 8))
    val v = Similarity.hyperplaneValues(0, 64)
    assert(v.forall(x => x >= -1.0 && x < 1.0))
    // pseudo-uniform: mean near 0
    assert(math.abs(v.sum / v.size) < 0.2)
  }

  test("kmeansStep assigns to the max-dot centroid and averages per cell") {
    val out = Similarity.kmeansStep(vecs, "embedding", nCells = 2, dim = 4)
      .orderBy("cell", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    // expected assignment recomputed independently from the public
    // centroid derivation
    val cents = (0 until 2).map(c => Similarity.ivfCentroidValues(c, 4))
    val data = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0.999f, 0.04f, 0f, 0f),
      Seq(0f, 1f, 0f, 0f), Seq(-1f, 0f, 0f, 0f), Seq(0.7f, 0.7f, 0f, 0f))
    def cellOf(v: Seq[Float]): Int = {
      val dots = cents.map(c => v.zip(c).map { case (x, y) => x.toDouble * y }.sum)
      dots.indexOf(dots.max) + 1
    }
    val byCell = data.groupBy(cellOf)
    // counts per cell match the independent assignment
    val nByCell = out.groupBy(_._1).map { case (c, rs) => c -> rs.head._4 }
    assert(nByCell == byCell.map { case (c, vs) => c -> vs.size.toLong })
    // one centroid component spot-checked exactly
    val c0 = byCell(out.head._1)
    val exp0 = math.floor(
      c0.map(_.head.toDouble).sum / c0.size * 10000 + 0.5) / 10000
    assert(out.head._2 == 0 && math.abs(out.head._3 - exp0) < 1e-12)
  }

  test("assembleCentroids rebuilds arrays and falls back on empty cells") {
    // step output covering cell 2 only (cell 1 lost all vectors)
    val step = spark.createDataFrame(Seq(
      (2, 1, 0.5, 3L), (2, 0, -0.25, 3L) // pos out of order on purpose
    )).toDF("cell", "pos", "c", "n")
    val cents = Similarity.assembleCentroids(step, nCells = 2, dim = 2,
      fallback = c => Seq(c.toDouble, c.toDouble))
    assert(cents == Seq(Seq(0.0, 0.0), Seq(-0.25, 0.5)))
  }

  test("a second Lloyd iteration against updated centroids converges assignment") {
    // iteration 1 from seeds, re-assemble, iteration 2 from the update:
    // the chain the q111 oracle re-derives in SQL
    val s1 = Similarity.kmeansStep(vecs, "embedding", nCells = 2, dim = 4)
    val cents = Similarity.assembleCentroids(s1, nCells = 2, dim = 4,
      fallback = Similarity.ivfCentroidValues(_, 4))
    val s2 = Similarity.kmeansStep(vecs, "embedding", cents, dim = 4)
      .orderBy("cell", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    // every occupied cell carries 4 component rows; counts cover all 5
    assert(s2.groupBy(_._1).forall { case (_, rs) => rs.length == 4 })
    assert(s2.filter(_._2 == 0).map(_._4).sum == 5L)
    // independent recompute: assign each vector to max-dot updated centroid
    val data = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0.999f, 0.04f, 0f, 0f),
      Seq(0f, 1f, 0f, 0f), Seq(-1f, 0f, 0f, 0f), Seq(0.7f, 0.7f, 0f, 0f))
    def cellOf(v: Seq[Float]): Int = {
      val dots = cents.map(c => v.zip(c).map { case (x, y) => x.toDouble * y }.sum)
      dots.indexOf(dots.max) + 1
    }
    val nByCell = data.groupBy(cellOf).map { case (c, vs) => c -> vs.size.toLong }
    assert(s2.groupBy(_._1).map { case (c, rs) => c -> rs.head._4 } == nByCell)
  }

  test("labelCentroids averages componentwise per label") {
    val labeled = spark.createDataFrame(Seq(
      (0, Seq(1f, 0f, 2f, 0f)),
      (0, Seq(3f, 0f, 0f, 0f)),
      (1, Seq(0f, -1f, 0f, 1f))
    )).toDF("label", "embedding")
    val out = Similarity.labelCentroids(labeled, "label", "embedding")
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0, 0, 2.0, 2L), (0, 1, 0.0, 2L), (0, 2, 1.0, 2L), (0, 3, 0.0, 2L),
      (1, 0, 0.0, 1L), (1, 1, -1.0, 1L), (1, 2, 0.0, 1L), (1, 3, 1.0, 1L)))
  }

  test("quantizationError: exact codes, zero error at grid points") {
    val ss = spark
    import ss.implicits._
    // dim 0 spans [0,1]; dim 1 is constant (degenerate -> zero error)
    val vecs = Seq(
      (1L, Seq(0.0, 7.0)), (2L, Seq(1.0, 7.0)), (3L, Seq(0.3, 7.0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizationError(vecs, "vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((0.0, 0.0, 2L))) // min of the range: exact
    assert(out(2L) == ((0.0, 0.0, 2L))) // max of the range: exact
    // 0.3*255 = 76.5 -> code 77 -> dequant 77/255 = 0.30196..: err .00196,
    // fix4 0.002; avg over (0.002, 0) halves it -> 0.001
    assert(out(3L) == ((0.002, 0.001, 2L)))
  }

  test("recallAtK: per-query hit ratio, zero-recall query kept") {
    val ss = spark
    import ss.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("query_id", "neighbor_id")
    // query 1 recovers 2 of 3; query 2's approx found only wrong ids —
    // it must still appear, with recall 0, not vanish from the audit
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 98L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(truth, approx, "query_id", "neighbor_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 2L, 0.6667)))
    assert(out(2L) == ((1L, 0L, 0.0)))
  }

  test("pqAudit: a vector sitting ON a codebook centroid has zero error") {
    val ss = spark
    import ss.implicits._
    // embedding = [centroid(subspace 0, code 3) ++ centroid(1, code 1)]
    val vec = (Similarity.pqCentroidValues(0, 2, 4) ++
      Similarity.pqCentroidValues(1, 0, 4)).map(_.toFloat)
    val df = Seq((1L, vec)).toDF("vec_id", "embedding")
    // float storage rounds the centroid components, so the error is
    // ~float-epsilon²-sized, which fix4 flattens to exactly 0
    val out = Similarity.pqAudit(df, "embedding", dim = 8, m = 2, nCodes = 4)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set((0, 3, 1L, 0.0), (1, 1, 1L, 0.0)), s"got $out")
  }

  test("pqAudit assignment is argmin-L2; cell means match brute force") {
    val ss = spark
    import ss.implicits._
    val dim = 8; val m = 2; val sub = 4; val nCodes = 4
    val rows = (0 until 40).map { i =>
      (i.toLong, (0 until dim).map(j => (((i * 31 + j * 7) % 17) - 8) / 8.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    // Scala brute-force mirror: true argmin-L2 per subspace (ties low)
    val cents = (0 until m).map(mi =>
      (0 until nCodes).map(c => Similarity.pqCentroidValues(mi, c, sub)))
    val expected = rows.flatMap { case (_, v) =>
      (0 until m).map { mi =>
        val s = v.slice(mi * sub, (mi + 1) * sub).map(_.toDouble)
        val (err, code) = cents(mi).zipWithIndex.map { case (c, ci) =>
          (s.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, ci + 1)
        }.minBy { case (e, ci) => (e, ci) }
        ((mi, code), err)
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2).sum / vs.size)
    }
    val got = Similarity.pqAudit(df, "embedding", dim, m, nCodes)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet, s"cells: ${got.keySet}")
    expected.foreach { case (cell, (n, meanErr)) =>
      val (gn, gm) = got(cell)
      assert(gn == n, s"cell $cell count $gn != $n")
      assert(math.abs(gm - meanErr) < 1.1e-4, s"cell $cell mean $gm vs $meanErr")
    }
  }

  test("hardNegatives drops the near-dup band and re-ranks contiguously") {
    val q = vecs.where("vec_id = 0")
    val all = Similarity.lshTopK(
      q, vecs, "vec_id", "embedding", dim = 4, k = 4,
      bands = 2, bitsPerBand = 4).orderBy("nn_rank").collect()
    val hn = Similarity.hardNegatives(
      q, vecs, "vec_id", "embedding", dim = 4, k = 4,
      lo = -2.0, hi = 0.99, bands = 2, bitsPerBand = 4)
      .orderBy("nn_rank").collect()
    // vec 1 (cos > 0.999) is in the near-dup band: excluded
    assert(!hn.map(_.getLong(1)).contains(1L))
    assert(hn.map(_.getLong(1)).toSeq ==
      all.map(_.getLong(1)).filterNot(_ == 1L).toSeq)
    assert(hn.map(_.getInt(2)).toSeq == (1 to hn.length).toSeq)
    // the full band reproduces lshTopK exactly
    val full = Similarity.hardNegatives(
      q, vecs, "vec_id", "embedding", dim = 4, k = 4,
      lo = -2.0, hi = 2.0, bands = 2, bitsPerBand = 4)
      .orderBy("nn_rank").collect()
    assert(full.map(r => (r.getLong(1), r.getInt(2))).toSeq ==
      all.map(r => (r.getLong(1), r.getInt(2))).toSeq)
  }

  test("sparseCosinePairs: exact integer dots over the df-kept shingle space") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "w x y w x y"),
      (2L, "w x y w x y"), // exact dup of 1
      (3L, "w x y z z z"), // shares the wxy shingle
      (4L, "z z z z") // shares only zzz with 3
    ).toDF("doc_id", "text")
    val out = Similarity.sparseCosinePairs(
        docs, "doc_id", "text", shingleN = 3, dfCap = 50, threshold = 0.55)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // kept terms (df >= 2): "w x y"(3), "x y w"(2), "y w x"(2), "z z z"(2)
    // d1 = d2 = (2,1,1,0) nsq 6; d3 = (1,0,0,1) nsq 2; d4 = (0,0,0,2) nsq 4
    assert(out.toSeq == Seq(
      (1L, 2L, 1.0), // identical vectors
      (1L, 3L, 0.5774), // 2 / sqrt(12)
      (2L, 3L, 0.5774),
      (3L, 4L, 0.7071))) // 2 / sqrt(8)
    // d1-d4 share no kept term: the pair never materializes at all
    assert(!out.exists(p => p._1 == 1L && p._2 == 4L))
  }

  test("blockedFuzzyPairs: block recall, single verify, name grain") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions.{col, element_at, split}
    // "acme corp" twice (collapses to one name, n_rows=2);
    // "acme corps" shares BOTH tokens' blocks with it (w1 and, via
    // near-match, not w2 — "corps" != "corp" so only the w1 block);
    // "zeta corp" shares only w2; "other thing" shares neither token
    // with acme and must NEVER verify against it
    val df = Seq("acme corp", "acme corp", "acme corps", "zeta corp",
      "other thing").toDF("name")
    val keys = Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      n => element_at(split(n, " "), 1),
      n => element_at(split(n, " "), 2))
    val out = Similarity.blockedFuzzyPairs(df, "name", keys, 0.0)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    // candidates: (acme corp, acme corps) via w1; (acme corp, zeta
    // corp) via w2 — each ONCE even though dup rows exist
    assert(out.keySet == Set(
      ("acme corp", "acme corps"), ("acme corp", "zeta corp")))
    // the collapsed name carries its row count
    assert(out(("acme corp", "acme corps"))._2 == 2L)
    assert(out(("acme corp", "acme corps"))._3 == 1L)
    // threshold filters verified pairs
    val strict = Similarity.blockedFuzzyPairs(df, "name", keys, 0.99)
      .collect()
    assert(strict.isEmpty)
  }
}
