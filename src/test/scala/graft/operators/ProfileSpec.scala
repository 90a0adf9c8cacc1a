package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {

  test("profile reports nulls, exact distincts, and native-order min/max") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (Some(10L), Some("b")),
      (Some(2L), None),
      (Some(10L), Some("a")),
      (None, Some("a"))
    ).toDF("num", "str")
    val out = Profile.table(df, Seq("num", "str"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    // numeric min/max must use numeric order: min 2, max 10 (a
    // lexicographic profile would report min "10", max "2")
    assert(out.toSeq == Seq(
      ("num", 4L, 1L, 2L, "2", "10"),
      ("str", 4L, 1L, 2L, "a", "b")))
  }

  test("winsorizedStats clips into the exact percentile bounds") {
    val ss = spark
    import ss.implicits._
    // group g: values 0..10 plus a 1000 outlier; lo=0, hi=0.5 makes the
    // expected clip window [0, median] easy to hand-check
    val df = ((0 to 10).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "v")
    val out = Profile.winsorizedStats(df, "grp", "v", lo = 0.0, hi = 0.5)
      .collect().head
    // p0 = 0; p50 of 12 sorted values interpolates 5.5; clipped mean =
    // (0+1+2+3+4+5+5.5+5.5+5.5+5.5+5.5+5.5) / 12 = 48/12 = 4
    assert(out.getAs[Double]("lo_v") == 0.0)
    assert(out.getAs[Double]("hi_v") == 5.5)
    assert(out.getAs[Double]("winsorized_mean") == 4.0)
    assert(out.getAs[Long]("n") == 12L)
  }

  test("madOutliers flags only deviations beyond k*1.4826*mad") {
    val ss = spark
    import ss.implicits._
    // med=4, deviations sorted 0,1,1,2,2,3,96 -> mad=2, threshold 8.8956
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 100.0)
      .map(v => ("g", v)).toDF("grp", "v")
    val out = Profile.madOutliers(df, "grp", "v", k = 3.0).collect().head
    assert(out.getAs[Double]("med") == 4.0)
    assert(out.getAs[Double]("mad") == 2.0)
    assert(out.getAs[Long]("n_outliers") == 1L) // only the 100
    assert(out.getAs[Long]("n") == 7L)
  }

  test("psiDrift: zero for identical snapshots, positive for a shift") {
    val ss = spark
    import ss.implicits._
    val a = (0 to 9).map(v => Tuple1(v.toDouble)).toDF("v")
    val same = Profile.psiDrift(a, a, "v", buckets = 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(same.keySet == (0 to 9).toSet)
    assert(same.values.forall(_ == 0.0))
    val shifted = Seq.fill(10)(Tuple1(9.0)).toDF("v")
    val drift = Profile.psiDrift(a, shifted, "v", buckets = 10)
      .collect().map(_.getDouble(3)).sum
    assert(drift > 0.5, s"expected strong drift, got $drift")
  }

  test("keySkew ranks heavy keys with deterministic tie-break") {
    val ss = spark
    import ss.implicits._
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .map(Tuple1(_)).toDF("k")
    val out = Profile.keySkew(df, "k", topN = 3)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out === Array(
      (1, "a", 4L, 0.5), (2, "b", 2L, 0.25), (3, "c", 1L, 0.125)))
  }

  test("fkAudit counts orphans per declared relation, nulls strict") {
    val ss = spark
    import ss.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("fk") // 9 is orphaned; null counts as orphan (strict)
    val out = Profile.fkAudit(Seq(("c->p", child, "fk", parent, "pk")))
      .collect().head
    assert((out.getString(0), out.getLong(1), out.getLong(2))
      == (("c->p", 4L, 2L)))
  }

  test("fkAudit shares one child scan across same-child relations") {
    val ss = spark
    import ss.implicits._
    val p1 = Seq(10L, 20L).toDF("pk1")
    val p2 = Seq("x", "y").toDF("pk2")
    val child = Seq((10L, "x"), (10L, "z"), (99L, "y"))
      .toDF("k1", "k2") // one orphan per relation
    val audit = Profile.fkAudit(Seq(
      ("c->p1", child, "k1", p1, "pk1"),
      ("c->p2", child, "k2", p2, "pk2")))
    val got = audit.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("c->p1" -> ((3L, 1L)), "c->p2" -> ((3L, 1L))))
    // the child appears ONCE in the physical plan: both relations ride
    // the same unpivoted scan (3 LocalTableScans total: child, p1, p2).
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // scans in the final plan only.
    val plan = audit.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(_.contains("LocalTableScan"))
    assert(scans == 3, s"expected 3 scans (child shared), got $scans")
  }

  test("joinKeyDiscovery ranks candidates by distinct-value containment") {
    val ss = spark
    import ss.implicits._
    // child distincts {1,2,3,null}; full FK to p1, partial to p2 —
    // dup child rows must not inflate the distinct counts, and the
    // null child value counts in the denominator but never intersects
    val child = Seq(1L, 2L, 2L, 3L).map(Option(_))
      .appended(None).toDF("k")
    val p1 = Seq(1L, 2L, 3L, 9L).toDF("pk")
    val p2 = Seq(2L, 3L).toDF("pk")
    val out = Profile.joinKeyDiscovery(Seq(
        ("c->p1", child, "k", p1, "pk"),
        ("c->p2", child, "k", p2, "pk")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toSet
    assert(out == Set(
      ("c->p1", 4L, 4L, 3L, 0.75),
      ("c->p2", 4L, 2L, 2L, 0.5)))
  }

  test("weightedMedian: lower median by cumulative weight, not row count") {
    // group a: values 1(w=1), 2(w=1), 10(w=10): total 12, half 6 →
    // first v with 2*cumw >= 12 is 10 (cum 1,2,12) — the row-count
    // median (2) is wrong here
    // group b: uniform weights reduce to the ordinary lower median
    val df = spark.createDataFrame(Seq(
      ("a", 1L, 1L, 100L), ("a", 2L, 1L, 101L), ("a", 10L, 10L, 102L),
      ("b", 5L, 1L, 200L), ("b", 6L, 1L, 201L), ("b", 7L, 1L, 202L),
      ("b", 8L, 1L, 203L)
    )).toDF("g", "v", "wt", "id")
    val out = Profile.weightedMedian(df, "g", "v", "wt", "id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("a") == ((10L, 12L)))
    // even count, uniform weights: 2*cumw(6)=4 >= 4 → lower median 6
    assert(out("b") == ((6L, 4L)))
  }

  test("kmvOverlap: identical groups estimate 1.0, disjoint 0.0") {
    val texts = (1 to 200).map(i => s"doc body number $i")
    val rows =
      texts.map(t => ("s1", t)) ++ texts.map(t => ("s2", t)) ++
        (1 to 200).map(i => ("s3", s"other content $i"))
    val df = spark.createDataFrame(rows).toDF("source", "text")
    val out = Profile.kmvOverlap(df, "source", "text", k = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("s1", "s2")) == ((64L, 1.0)))
    assert(out(("s1", "s3")) == ((0L, 0.0)))
    assert(out(("s2", "s3")) == ((0L, 0.0)))
  }

  test("kmvOverlap estimate tracks true Jaccard on a half-overlap") {
    // s1 = 1..300, s2 = 151..450 → true Jaccard 150/450 = 0.333
    val df = spark.createDataFrame(
      (1 to 300).map(i => ("s1", s"shared text unit $i")) ++
        (151 to 450).map(i => ("s2", s"shared text unit $i")))
      .toDF("source", "text")
    val est = Profile.kmvOverlap(df, "source", "text", k = 128)
      .collect()(0).getDouble(3)
    assert(est > 0.2 && est < 0.47, s"estimate $est too far from 0.333")
  }

  test("joinSizeEstimate: exact actual rows and deterministic sampling") {
    val ss = spark
    import ss.implicits._
    val left = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k") // deg 1->3, 2->1, 3->2
    val right = Seq(1L, 2L, 2L, 3L).toDF("k2") // deg 1->1, 2->2, 3->1
    val r = Profile.joinSizeEstimate(left, right, "k", "k2", hexLt = 128)
      .collect().head
    assert(r.getAs[Long]("n_join_keys") == 3L)
    assert(r.getAs[Long]("actual_rows") == 7L) // 3*1 + 1*2 + 2*1
    // recompute the md5-prefix sample membership independently
    def inSample(k: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      (d(0) & 0xff) < 0x80
    }
    val prods = Map(1L -> 3L, 2L -> 2L, 3L -> 2L)
    val est = 2L * prods.collect { case (k, p) if inSample(k) => p }.sum
    assert(r.getAs[Long]("est_rows") == est)
    assert(r.getAs[Long]("n_sampled") == prods.keys.count(inSample).toLong)
  }

  test("giniConcentration: zero for equal shares, 0.72 for a 97% monopoly") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      ("g", "s1", 25L), ("g", "s2", 25L), ("g", "s3", 25L), ("g", "s4", 25L),
      ("h", "t1", 1L), ("h", "t2", 1L), ("h", "t3", 1L), ("h", "t4", 97L)
    ).toDF("grp", "unit", "w")
    val out = Profile.giniConcentration(df, "grp", "unit", col("w"))
      .orderBy("grp").collect()
    assert(out(0).getAs[Double]("gini") == 0.0)
    assert(out(0).getAs[Double]("top_share") == 0.25)
    // h ranks (1,1),(2,1),(3,1),(4,97): iw = 394, G = (788-500)/400
    assert(out(1).getAs[Double]("gini") == 0.72)
    assert(out(1).getAs[Double]("top_share") == 0.97)
  }

  test("fdAudit separates holding from violated dependencies exactly") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"), (4L, "b", "z")
    ).toDF("id", "g", "v")
    val out = Profile.fdAudit(df, Seq(("id", "g"), ("g", "v")))
      .orderBy("lhs_col").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    assert(out.toSeq == Seq(
      ("g", "v", 2L, 1L, 0.5, 0), // group b maps to two values
      ("id", "g", 4L, 0L, 0.0, 1))) // ids are unique: FD holds
  }

  test("contractChecks: one pass, exact violation counts, uniqueness rides along") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (Some(1L), 10.0, "O"),
      (Some(1L), -5.0, "O"), // duplicate key AND negative price
      (Some(2L), 3.0, "X"), // bad enum
      (None, 1.0, "F") // null key
    ).toDF("k", "price", "st")
    val out = Profile.contractChecks(df,
        Seq(
          ("k_not_null", col("k").isNull),
          ("price_nonneg", col("price") < 0),
          ("st_enum", !col("st").isin("O", "F"))),
        uniqueKey = Some("k"))
      .orderBy("check_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      ("k_not_null", 1L, 0),
      ("price_nonneg", 1L, 0),
      ("st_enum", 1L, 0),
      ("unique:k", 1L, 0))) // 3 non-null keys, 2 distinct
  }

  test("contractChecks: an empty table vacuously passes every check") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, 1.0)).toDF("k", "price").where(lit(false))
    val out = Profile.contractChecks(df,
        Seq(("price_nonneg", col("price") < 0)), uniqueKey = Some("k"))
      .orderBy("check_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // sum over zero rows must coalesce to 0, not null-fail the gate
    assert(out.toSeq == Seq(("price_nonneg", 0L, 1), ("unique:k", 0L, 1)))
  }

  test("saltPlan: integer ceil factors, hot keys only") {
    val ss = spark
    import ss.implicits._
    val df = (Seq.fill(10)("cold") ++ Seq.fill(399)("warm") ++
      Seq.fill(400)("edge") ++ Seq.fill(401)("hot") ++
      Seq.fill(801)("hottest")).toDF("k")
    val out = Profile.saltPlan(df, "k", targetRowsPerTask = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // exactly-at-target keys need no split; factors are exact ceils
    assert(out.toSeq == Seq(("hottest", 801L, 3), ("hot", 401L, 2)), out.toSeq)
    intercept[IllegalArgumentException] {
      Profile.saltPlan(df, "k", targetRowsPerTask = 0L)
    }
  }

  test("jsonKeyProfile: key presence + lexical type classification") {
    val ss = spark
    import ss.implicits._
    val out = graft.operators.Profile.jsonKeyProfile(
      Seq(
        """{"a": 1, "b": "x", "c": true}""",
        """{"a": -2.5, "b": "7", "d": false}""",
        "not json at all",
        """{"a": 3}""").toDF("props"), "props")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // malformed row drops entirely; "7" is lexically an int (the
    // documented quoting trade); -2.5 is a float
    assert(out.toSeq == Seq(
      ("a", 3L, 2L, 1L, 0L, 0L),
      ("b", 2L, 1L, 0L, 0L, 1L),
      ("c", 1L, 0L, 0L, 1L, 0L),
      ("d", 1L, 0L, 0L, 1L, 0L)), out.toSeq)
  }

  test("jsonPathProfile: dotted paths, depth cap, arrays as leaves") {
    val ss = spark
    import ss.implicits._
    def run(maxDepth: Int) = graft.operators.Profile.jsonPathProfile(
      Seq(
        """{"a": {"b": 1, "c": {"d": "x"}}, "e": [1, 2], "f": null}""",
        """{"a": {"b": "y"}, "e": "flat", "g": "{not json"}""",
        "malformed drops",
        """{"a": 7}""").toDF("props"), "props", maxDepth)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    // (path, depth, present, int, float, bool, obj, arr, string)
    assert(run(3).toSeq == Seq(
      // "a" is twice an object, once an int
      ("a", 1, 3L, 1L, 0L, 0L, 2L, 0L, 0L),
      ("a.b", 2, 2L, 1L, 0L, 0L, 0L, 0L, 1L),
      ("a.c", 2, 1L, 0L, 0L, 0L, 1L, 0L, 0L),
      ("a.c.d", 3, 1L, 0L, 0L, 0L, 0L, 0L, 1L),
      // arrays are leaves: [1,2] never yields e.0/e.1 paths
      ("e", 1, 2L, 0L, 0L, 0L, 0L, 1L, 1L),
      // JSON null counts in n_present only
      ("f", 1, 1L, 0L, 0L, 0L, 0L, 0L, 0L),
      // "{not json" starts like an object but fails the nested
      // parse -> classifies string, and descends nowhere
      ("g", 1, 1L, 0L, 0L, 0L, 0L, 0L, 1L)), run(3).toSeq)
    // depth cap: at maxDepth=2 the a.c object is counted but a.c.d
    // is not discovered
    val d2 = run(2).toSeq
    assert(d2.exists(r => r._1 == "a.c" && r._7 == 1L))
    assert(!d2.exists(_._1 == "a.c.d"))
    // maxDepth=1 equals the top-level key set of jsonKeyProfile
    assert(run(1).map(_._1).toSeq == Seq("a", "e", "f", "g"))
    intercept[IllegalArgumentException] {
      graft.operators.Profile.jsonPathProfile(
        Seq("{}").toDF("p"), "p", maxDepth = 0)
    }
  }
}
