package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over a pair/edge list — the structural companion to
  * [[Dedup.clustersFromPairs]]: connected components say WHICH docs
  * group together; triangle density says how CLIQUE-LIKE the groups
  * are (true duplicate clusters are near-cliques, chains of borderline
  * matches are not).
  */
object Graphs {

  /** A triangle census plus the handle releasing the internally cached
    * edge list (see [[Funnel.FunnelRun]] for the same pattern).
    */
  final class TriangleRun private[operators] (
      val result: DataFrame,
      edges: DataFrame) {
    /** Unpersist the cached edge list (call after materializing). */
    def release(): Unit = { edges.unpersist(): Unit }
  }

  /** [[pagerank]] plus the handle releasing the internally cached
    * degree-annotated edge list.
    */
  final class PagerankRun private[operators] (
      val result: DataFrame,
      edges: DataFrame) {
    /** Unpersist the cached edge list (call after materializing). */
    def release(): Unit = { edges.unpersist(): Unit }
  }

  /** PageRank over an undirected simple graph given as (a, b) pairs —
    * the centrality readout of the near-dup graph (a high-rank doc is
    * the "canonical" member of a big duplicate neighborhood). Fixed
    * `iters` power iterations, damping 0.85.
    *
    * Exactness discipline (tightened round 12 after an sf0.1 boundary
    * flip): the whole recurrence is FIXED-POINT INTEGER arithmetic —
    * ranks live at 1e4 scale (BIGINT), each in-edge contributes
    * `(r·10⁴) DIV outdeg` (scale 1e8), and the damped update is
    * `(100−d)·100 + (d·Σcontrib + 5·10⁵) DIV 10⁶` with the damping as
    * an integer percent. Integer sums are ORDER-INDEPENDENT, so the
    * result is bit-identical across engines, partitionings and scale —
    * the earlier fix4-per-iteration float form still summed doubles
    * inside each iteration, and at sf0.1 one node in 5000 landed on a
    * rounding half-boundary and flipped by 1e-4 between engines. The
    * floor in the contribution costs < 1e-8 per edge — far below the
    * 1e-4 output grain, and identical everywhere. In the SYMMETRIZED
    * graph every edge-set node has degree ≥ 1, so there is no dangling
    * mass anywhere; nodes absent from the edge set take the
    * teleport-only fixed point (1 − damping).
    *
    * Scale shape: degree-annotated edges persist once (released via the
    * run handle); each iteration is ONE hash join (edges ⋈ ranks on
    * src) + one dst-keyed sum — the ranks table is referenced exactly
    * once per iteration, so the logical plan grows linearly in `iters`
    * (see [[graft.operators.Dedup.clustersFromPairs]] for why that
    * matters). Output: (idCol, rank) for EVERY id in `allIds`.
    */
  def pagerank(
      allIds: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val run = pagerankRun(allIds, idCol, pairs, aCol, bCol, iters, damping)
    run.result
  }

  /** [[pagerank]] with the cache-release handle. */
  def pagerankRun(
      allIds: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iters: Int = 3,
      damping: Double = 0.85): PagerankRun = {
    require(iters >= 1, "iters must be >= 1")
    val d100 = math.round(damping * 100).toInt
    require(d100 >= 1 && d100 <= 99,
      s"damping must round to an integer percent in [0.01, 0.99], got $damping")
    val base10k = ((100 - d100) * 100).toLong // (1 - d) at 1e4 scale
    val e = graft.SparkUtil.ensureParallelism(pairs)
      .select(col(aCol).cast("long").as("a0"), col(bCol).cast("long").as("b0"))
      .select(least(col("a0"), col("b0")).as("a"),
        greatest(col("a0"), col("b0")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edges = sym.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ADAPTIVE small-graph path (clustersFromPairs/kcore/LPA rule,
    // same conf key): iters × (join + agg) of fixed job latency
    // dominates on a pair-graph of a few thousand edges. The
    // recurrence is FIXED-POINT INTEGER arithmetic throughout —
    // order-independent sums, floor divisions — so a driver replay is
    // bit-identical to the distributed loop by construction.
    // DRIVER-MEMORY NOTE (ADVICE r19): the local path streams up to
    // localEdgeMax symmetric edge rows into per-node adjacency
    // buffers — at the 2M default that is O(100 MB) of driver heap,
    // sized for the default 8g driver. Deployments with small drivers
    // should lower `spark.graft.cc.localEdgeMax`; the edges.count()
    // that gates the branch also materializes the persisted edge list
    // the distributed loop re-references every round, so it is not
    // wasted work on the distributed path.
    val sparkS = pairs.sparkSession
    val localMax = sparkS.conf.getOption("spark.graft.cc.localEdgeMax")
      .map(_.toLong).getOrElse(2000000L)
    val edgeCount = edges.count()
    if (edgeCount <= localMax) {
      val idx = new java.util.HashMap[Long, Integer](
        math.min(edgeCount * 2 + 16L, Int.MaxValue.toLong).toInt)
      val nodeIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      val adj = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[Int]]
      def node(id: Long): Int = {
        val got = idx.get(id)
        if (got != null) got.intValue()
        else {
          val n = nodeIds.length
          idx.put(id, Integer.valueOf(n))
          nodeIds += id
          adj += scala.collection.mutable.ArrayBuffer.empty[Int]
          n
        }
      }
      // collect(), not toLocalIterator(): the iterator fetches ONE
      // partition per sequential Spark job — measured 5-6.6 s to drain
      // a 3.9k-row cached edge list across 32 partitions vs 0.3 s for
      // the single collect job. Memory stays bounded by the
      // localEdgeMax gate above (~2M rows transient at the cap).
      val rows = edges.select(col("src"), col("dst")).collect()
      var ri = 0
      while (ri < rows.length) {
        val r = rows(ri); ri += 1
        adj(node(r.getLong(0))) += node(r.getLong(1))
      }
      val n = nodeIds.length
      var r10k = Array.fill(n)(10000L)
      (1 to iters).foreach { _ =>
        val inflow = new Array[Long](n)
        var u = 0
        while (u < n) {
          val contrib = (r10k(u) * 10000L) / adj(u).length
          adj(u).foreach(v => inflow(v) += contrib)
          u += 1
        }
        r10k = Array.tabulate(n)(v =>
          base10k + (d100 * inflow(v) + 500000L) / 1000000L)
      }
      val out = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) { out(i) = (nodeIds(i), r10k(i)); i += 1 }
      val ranksLocal = sparkS.createDataFrame(out.toSeq).toDF("id", "r10k")
      val result = allIds.select(col(idCol).cast("long").as(idCol))
        .join(ranksLocal.withColumnRenamed("id", idCol), Seq(idCol), "left")
        .select(col(idCol),
          (coalesce(col("r10k"), lit(base10k)).cast("double") / 10000.0)
            .as("rank"))
      return new PagerankRun(result, edges)
    }
    var ranks = edges.select(col("src").as("id")).distinct()
      .select(col("id"), lit(10000L).as("r10k"))
    (1 to iters).foreach { _ =>
      ranks = edges
        .join(ranks.select(col("id").as("src"), col("r10k")), "src")
        .groupBy(col("dst"))
        .agg(sum(expr("(r10k * 10000) DIV outdeg")).as("inflow"))
        .select(col("dst").as("id"),
          (lit(base10k) +
            expr(s"($d100 * inflow + 500000) DIV 1000000")).as("r10k"))
    }
    val result = allIds.select(col(idCol).cast("long").as(idCol))
      .join(ranks.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("r10k"), lit(base10k)).cast("double") / 10000.0)
          .as("rank"))
    new PagerankRun(result, edges)
  }

  /** Exact triangle census (edge count, total length-2 path count, and
    * triangle count — the global clustering coefficient is
    * 3·n_triangles/n_wedges) over an undirected simple graph given as
    * (id_a, id_b) pairs.
    *
    * The deduped edge list is PERSISTED inside the operator: the plan
    * references it six times (degrees, orientation, both wedge legs,
    * closure, counts), and each reference would otherwise re-execute
    * the caller's whole pair-generation lineage — measured 4.9 s → 1 s
    * on the near-dup graph at sf0.1. Edges are one row per pair
    * (tiny); sessions running many censuses use [[triangleRun]] and
    * `release()` after materializing.
    *
    * Scale shape — the classic degree-oriented algorithm: orient every
    * edge from its (degree, id)-smaller endpoint to the larger, so
    * wedges are enumerated at each triangle's UNIQUE lowest-degree
    * apex. That caps per-node wedge fan-out at the graph's degeneracy
    * (out-degree ≤ O(√edges) on any graph), the bound that makes
    * hub-heavy graphs tractable — an id-oriented join would enumerate
    * deg² wedges at every hub. Three equi-joins, all hash-partitioned;
    * the final counts are 1-row aggregates.
    * Output: one row (n_edges, n_wedges, n_triangles).
    */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    triangleRun(pairs, aCol, bCol).result

  /** [[triangleStats]] with the cache-release handle. */
  def triangleRun(
      pairs: DataFrame, aCol: String, bCol: String): TriangleRun = {
    // Normalize orientation BEFORE distinct: the graph is undirected, so
    // an input carrying both (a,b) and (b,a) is ONE edge — without the
    // least/greatest fold it would survive distinct() twice, doubling
    // degrees and corrupting every count downstream.
    val e = graft.SparkUtil.ensureParallelism(pairs)
      .select(col(aCol).cast("long").as("a0"), col(bCol).cast("long").as("b0"))
      .select(least(col("a0"), col("b0")).as("a"),
        greatest(col("a0"), col("b0")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ADAPTIVE local path (same conf key as CC/kcore/LPA/PageRank):
    // the distributed census is ~10 fixed-latency jobs (degree agg,
    // two orientation joins, wedge self-join, closing join, three
    // aggregates) regardless of size — measured 2.9 s warm on a
    // 3.9k-edge near-dup graph at sf0.1. The local replay is the EXACT
    // same census: n_edges = |E|, n_wedges = Σ deg·(deg−1)/2, and
    // n_triangles by degree-ordered orientation + sorted out-neighbor
    // intersection (each triangle counted once at its unique
    // (deg,id)-lowest apex) — all exact integer counts, so the two
    // paths are output-identical by construction. O(m^1.5) worst case
    // stays driver-feasible under the 2M-edge cap.
    val sparkT = pairs.sparkSession
    val localMaxT = sparkT.conf.getOption("spark.graft.cc.localEdgeMax")
      .map(_.toLong).getOrElse(2000000L)
    val edgeCountT = e.count()
    if (edgeCountT <= localMaxT) {
      val rows = e.collect()
      val idx = new java.util.HashMap[Long, Integer](
        math.min(edgeCountT * 2 + 16L, Int.MaxValue.toLong).toInt)
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      def node(id: Long): Int = {
        val got = idx.get(id)
        if (got != null) got.intValue()
        else {
          val n = ids.length
          idx.put(id, Integer.valueOf(n)); ids += id; n
        }
      }
      val ea = new Array[Int](rows.length)
      val eb = new Array[Int](rows.length)
      var ri = 0
      while (ri < rows.length) {
        val r = rows(ri)
        ea(ri) = node(r.getLong(0)); eb(ri) = node(r.getLong(1)); ri += 1
      }
      val n = ids.length
      val deg = new Array[Long](n)
      ri = 0
      while (ri < rows.length) { deg(ea(ri)) += 1; deg(eb(ri)) += 1; ri += 1 }
      var wedges = 0L
      var i = 0
      while (i < n) { wedges += deg(i) * (deg(i) - 1) / 2; i += 1 }
      // orient each edge from its (deg, id)-lower endpoint
      def lower(x: Int, y: Int): Boolean =
        deg(x) < deg(y) || (deg(x) == deg(y) && ids(x) < ids(y))
      val outDeg = new Array[Int](n)
      ri = 0
      while (ri < rows.length) {
        if (lower(ea(ri), eb(ri))) outDeg(ea(ri)) += 1
        else outDeg(eb(ri)) += 1
        ri += 1
      }
      val out = Array.tabulate(n)(u => new Array[Long](outDeg(u)))
      val fill = new Array[Int](n)
      ri = 0
      while (ri < rows.length) {
        val (u, v) =
          if (lower(ea(ri), eb(ri))) (ea(ri), eb(ri)) else (eb(ri), ea(ri))
        out(u)(fill(u)) = ids(v); fill(u) += 1
        ri += 1
      }
      i = 0
      while (i < n) { java.util.Arrays.sort(out(i)); i += 1 }
      var tri = 0L
      ri = 0
      while (ri < rows.length) {
        val (u, v) =
          if (lower(ea(ri), eb(ri))) (ea(ri), eb(ri)) else (eb(ri), ea(ri))
        // |N+(u) ∩ N+(v)| — every common out-neighbor closes one
        // triangle whose (deg,id)-lowest apex is u
        val xs = out(u); val ys = out(v)
        var p = 0; var q = 0
        while (p < xs.length && q < ys.length) {
          if (xs(p) < ys(q)) p += 1
          else if (xs(p) > ys(q)) q += 1
          else { tri += 1; p += 1; q += 1 }
        }
        ri += 1
      }
      // nullability mirrors the distributed shape exactly: counts are
      // non-null, the wedge SUM aggregate is nullable — and on an
      // EMPTY edge set the distributed sum-over-nothing is NULL, so
      // the local value is too
      val result = sparkT.range(1).select(
        lit(edgeCountT).as("n_edges"),
        when(lit(edgeCountT > 0), lit(wedges)).as("n_wedges"),
        lit(tri).as("n_triangles"))
      return new TriangleRun(result, e)
    }
    val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val oriented = e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // oriented wedges: both legs point OUT of the apex — each triangle
    // closes exactly ONE of these (at its unique (deg,id)-lowest apex)
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), "u")
      .where(col("x") < col("y"))
      .select("x", "y")
    val closing = oriented.select(
      least(col("u"), col("v")).as("x"), greatest(col("u"), col("v")).as("y"))
    val tri = wedges.join(closing, Seq("x", "y"))
      .agg(count(lit(1)).as("n_triangles"))
    // n_wedges is the TOTAL length-2 path count Σ deg·(deg−1)/2 (the
    // clustering-coefficient denominator), straight off the degree
    // table — not the (smaller) oriented wedge set above
    val wedgeTotal = deg.agg(
      sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges")) // exact longs
    val result = e.agg(count(lit(1)).as("n_edges"))
      .join(broadcast(wedgeTotal))
      .join(broadcast(tri))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"))
    new TriangleRun(result, e)
  }

  /** [[kcoreDegrees]] plus the handle releasing the internally cached
    * final edge set.
    */
  final class KcoreRun private[operators] (
      val result: DataFrame,
      cleanup: () => Unit) {
    /** Release the run's scratch edge state (call after materializing
      * `result` — the result reads from it).
      */
    def release(): Unit = cleanup()
  }

  /** k-core decomposition — the maximal subgraph in which every node
    * has degree ≥ k, found by iterated peeling of sub-k nodes. On a
    * near-dup graph the k-core separates DENSE duplication (template
    * families, boilerplate farms — what you delete wholesale) from
    * incidental pairwise matches; it is also the standard first cut
    * for community cores and spam-cluster mining.
    *
    * Iteration state is the SYMMETRIC alive-edge set with TRUNCATED
    * lineage every round: a reliable `checkpoint()` when the context
    * has a checkpoint dir, else a scratch-parquet round-trip. Round 8's
    * window-based loop relied on `persist()` alone — each round's plan
    * still chained on the previous round's, and the measured round cost
    * climbed 0.9 s → 28.7 s by round 11 (driver-side plan/GC growth;
    * ~369 s total at sf0.1, enough to heartbeat-kill a bench JVM). A
    * flat file-scan plan per round makes round cost constant.
    *
    * Each round peels the currently-sub-k nodes: one partial-agg degree
    * count over the symmetric edges (src-count = node degree), filter
    * `deg < k` — a tiny, shrinking node set — then two anti-joins
    * remove their edges. The sub-k set is an aggregate output, so AQE
    * sizes it at runtime and broadcasts the anti-joins; the edge set
    * itself is never shuffled. The k-core fixpoint is unique regardless
    * of peeling order; convergence = no sub-k nodes remain. Rounds are
    * bounded by the peel depth (~10-20 on real near-dup graphs);
    * `maxIter` guards pathological chains and THROWS rather than
    * returning a non-core.
    *
    * Output: (idCol, core_degree) for every surviving node.
    */
  def kcoreDegrees(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      k: Int,
      maxIter: Int = 50): DataFrame = {
    val run = kcoreDegreesRun(pairs, aCol, bCol, k, maxIter)
    run.result
  }

  def kcoreDegreesRun(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      k: Int,
      maxIter: Int = 50): KcoreRun = {
    require(k >= 1, "k must be >= 1")
    val spark = pairs.sparkSession
    // same undirected-simple-graph hygiene as triangleRun: normalize
    // orientation, drop self-loops, dedup, THEN symmetrize
    val e = graft.SparkUtil.ensureParallelism(pairs)
      .select(col(aCol).cast("long").as("a0"), col(bCol).cast("long").as("b0"))
      .select(least(col("a0"), col("b0")).as("a"),
        greatest(col("a0"), col("b0")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    // ADAPTIVE local path (the clustersFromPairs round-13 lesson,
    // same conf key): the distributed peel costs rounds × fixed job
    // latency (degree agg + anti-joins + a scratch round-trip per
    // round — q125 measured 12.5 s over a graph of a few thousand
    // edges). The near-dup graph is the detector's OUTPUT — orders of
    // magnitude under the corpus — so "tiny" is the common case even
    // at 100 TB; under `spark.graft.cc.localEdgeMax` (default 2M,
    // ~100 MB transient) the edges stream through a driver peel with
    // IDENTICAL output (the k-core is unique — removal order cannot
    // change the fixed point, and survivor degrees are alive-neighbor
    // counts either way).
    val localMax = spark.conf.getOption("spark.graft.cc.localEdgeMax")
      .map(_.toLong).getOrElse(2000000L)
    val eMat = e.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgeCount = eMat.count()
    if (edgeCount <= localMax) {
      val idx = new java.util.HashMap[Long, Integer](
        math.min(edgeCount * 2 + 16L, Int.MaxValue.toLong).toInt)
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      val adj = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[Int]]
      def node(id: Long): Int = {
        val got = idx.get(id)
        if (got != null) got.intValue()
        else {
          val n = ids.length
          idx.put(id, Integer.valueOf(n))
          ids += id
          adj += scala.collection.mutable.ArrayBuffer.empty[Int]
          n
        }
      }
      // collect(), not toLocalIterator(): the iterator fetches ONE
      // partition per sequential Spark job — measured 5-6.6 s to drain
      // a 3.9k-row cached edge list across 32 partitions vs 0.3 s for
      // the single collect job. Memory stays bounded by the
      // localEdgeMax gate above (~2M rows transient at the cap).
      val rows = eMat.collect()
      var ri = 0
      while (ri < rows.length) {
        val r = rows(ri); ri += 1
        val a = node(r.getLong(0))
        val b = node(r.getLong(1))
        adj(a) += b
        adj(b) += a
      }
      eMat.unpersist()
      val n = ids.length
      val deg = Array.tabulate(n)(adj(_).length)
      val dead = new Array[Boolean](n)
      val stack = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < n) {
        if (deg(i) < k) { dead(i) = true; stack += i }
        i += 1
      }
      while (stack.nonEmpty) {
        val u = stack.remove(stack.length - 1)
        adj(u).foreach { v =>
          if (!dead(v)) {
            deg(v) -= 1
            if (deg(v) < k) { dead(v) = true; stack += v }
          }
        }
      }
      val out = Seq.newBuilder[(Long, Long)]
      i = 0
      while (i < n) {
        if (!dead(i)) out += ((ids(i), deg(i).toLong))
        i += 1
      }
      val result = spark.createDataFrame(out.result())
        .toDF("node", "core_degree")
      return new KcoreRun(result, () => ())
    }
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    // Round-file root via ScratchSpace (conf'd URI → checkpoint dir →
    // per-JVM local temp with one shutdown hook): cluster-safe when
    // spark.graft.scratch.dir points at shared storage, and callers
    // using kcoreDegrees() without release() no longer stack hooks.
    val scratch =
      if (reliable) None
      else Some(graft.ScratchSpace.dir(spark, "kcore_"))
    var round = 0
    def materialize(df: DataFrame): DataFrame = {
      round += 1
      if (reliable) df.checkpoint()
      else {
        val p = s"${scratch.get}/round_$round"
        df.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
    }
    def cleanup(): Unit =
      scratch.foreach(graft.ScratchSpace.delete(spark, _))
    var alive = materialize(
      eMat.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(eMat.select(col("b").as("src"), col("a").as("dst"))))
    eMat.unpersist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // persisted so its two anti-join references don't recount degrees
      val bad = alive.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .where(col("deg") < k)
        .select(col("src").as("node"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (bad.count() == 0L) converged = true
      else alive = materialize(
        alive.join(bad, col("src") === col("node"), "left_anti")
          .join(bad, col("dst") === col("node"), "left_anti"))
      bad.unpersist()
      iter += 1
    }
    if (!converged) {
      cleanup()
      throw new IllegalStateException(
        s"kcoreDegrees did not converge in $maxIter rounds — peel depth " +
          "exceeds maxIter; raise maxIter")
    }
    val result = alive.groupBy(col("src"))
      .agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("node"), col("core_degree"))
    new KcoreRun(result, () => cleanup())
  }
  /** Synchronous label propagation (community detection, fixed
    * `rounds`): labels start as node ids; each round every node takes
    * the most frequent label among its NEIGHBORS (count desc, label
    * asc on ties — a total order, so the update is deterministic and
    * both engines replay it exactly); isolated nodes keep their own
    * label. Unlike min-label connected components (q41), LPA splits a
    * weakly-bridged graph into dense communities — the "which docs
    * cluster around which template" readout over the near-dup graph,
    * where CC would glue everything reachable together.
    *
    * Scale shape: per round, one join of the symmetric edge list to
    * the label table (both keyed by node id) + one (node, label)
    * count aggregate + one max-of-struct argmax per node — all hash
    * shuffles at node/edge grain, no windows over the corpus. A fixed
    * small round count keeps plans linear (the q111/q115 unrolled-
    * iteration discipline); long-loop callers should file-truncate
    * like [[kcoreDegreesRun]].
    */
  /** [[labelPropagation]]'s result plus the handle releasing the
    * cached symmetric edge list (each round's join references it, so
    * without the persist every round would re-run the caller's whole
    * pair pipeline — measured 2x on the LSH near-dup graph).
    */
  final class LpaRun private[operators] (
      val result: DataFrame,
      edges: DataFrame,
      ids: DataFrame) {
    def release(): Unit = { edges.unpersist(); ids.unpersist(): Unit }
  }

  /** Convenience form: materializes the labels via a scratch-parquet
    * round-trip and releases the cached edge/id sets immediately,
    * so repeated calls cannot accumulate executor cache (the round-12
    * footgun). The file round-trip survives executor loss — the
    * repo's no-localCheckpoint rule (SURVEY §4) is unconditional.
    * Loops that want to keep the lineage should use
    * [[labelPropagationRun]] and `release()` after materializing.
    */
  def labelPropagation(
      allIds: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      rounds: Int = 2): DataFrame = {
    val run = labelPropagationRun(allIds, idCol, pairs, aCol, bCol, rounds)
    val out = graft.ScratchSpace.materialize(run.result, "lpa_labels_")
    run.release()
    out
  }

  /** [[labelPropagation]] with the cache-release handle. */
  def labelPropagationRun(
      allIds: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      rounds: Int = 2): LpaRun = {
    require(rounds >= 1 && rounds <= 10,
      "rounds must be 1..10 (unrolled plans; file-truncate longer loops)")
    // ids is PERSISTED like the edge list: the round rebase below
    // references it once per round (+ the init), and an unpersisted
    // reference re-executes the caller's whole id-derivation subtree
    // each round — measured 4.2 -> 11.2 s on q176, whose ids come
    // through the digest-collapse join. Node-id grain: tiny.
    val ids = graft.SparkUtil.ensureParallelism(allIds)
      .select(col(idCol).cast("long").as("id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = graft.SparkUtil.ensureParallelism(pairs)
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ADAPTIVE small-graph path (the clustersFromPairs/kcore rule,
    // same conf key): the distributed loop costs rounds × ~1 s fixed
    // job latency regardless of data size — measured ~5 s of q176's
    // 6.3 s over a graph of a few thousand edges. Under
    // `spark.graft.cc.localEdgeMax` (default 2M) the symmetric edge
    // rows stream through a driver loop replaying the EXACT same
    // synchronous update (argmax by count desc, label asc — a total
    // order, so the two paths are output-identical by construction);
    // isolated ids keep their own label via the same left-join rebase.
    val spark = pairs.sparkSession
    val localMax = spark.conf.getOption("spark.graft.cc.localEdgeMax")
      .map(_.toLong).getOrElse(2000000L)
    val edgeCount = edges.count()
    if (edgeCount <= localMax) {
      val idx = new java.util.HashMap[Long, Integer](
        math.min(edgeCount * 2 + 16L, Int.MaxValue.toLong).toInt)
      val nodeIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      val adj = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[Int]]
      def node(id: Long): Int = {
        val got = idx.get(id)
        if (got != null) got.intValue()
        else {
          val n = nodeIds.length
          idx.put(id, Integer.valueOf(n))
          nodeIds += id
          adj += scala.collection.mutable.ArrayBuffer.empty[Int]
          n
        }
      }
      // One adjacency entry per DIRECTED symmetric edge row — exactly
      // the rows the distributed neigh join would count. That join
      // sources labels from the ids-rebased label table, so a dst
      // OUTSIDE allIds never contributes a label: filter those edge
      // rows out here too (left-semi on ids) or the two paths diverge
      // on inputs whose pair endpoints escape the id set.
      // collect(), not toLocalIterator(): the iterator fetches ONE
      // partition per sequential Spark job — measured 5-6.6 s to drain
      // a 3.9k-row cached edge list across 32 partitions vs 0.3 s for
      // the single collect job. Memory stays bounded by the
      // localEdgeMax gate above (~2M rows transient at the cap).
      val rows = edges
        .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .collect()
      var ri = 0
      while (ri < rows.length) {
        val r = rows(ri); ri += 1
        adj(node(r.getLong(0))) += node(r.getLong(1))
      }
      val n = nodeIds.length
      var lab = Array.tabulate(n)(i => nodeIds(i))
      for (_ <- 1 to rounds) {
        val next = new Array[Long](n)
        val cnt = new java.util.HashMap[Long, Long]()
        var u = 0
        while (u < n) {
          if (adj(u).isEmpty) next(u) = nodeIds(u) // isolated: own id
          else {
            cnt.clear()
            adj(u).foreach { v =>
              cnt.merge(lab(v), 1L, (a, b) => a + b): Unit
            }
            var bestLab = Long.MaxValue
            var bestC = 0L
            val e = cnt.entrySet().iterator()
            while (e.hasNext) {
              val kv = e.next()
              val (l, c) = (kv.getKey.longValue(), kv.getValue.longValue())
              if (c > bestC || (c == bestC && l < bestLab)) {
                bestC = c; bestLab = l
              }
            }
            next(u) = bestLab
          }
          u += 1
        }
        lab = next
      }
      val out = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) { out(i) = (nodeIds(i), lab(i)); i += 1 }
      val labelsLocal = spark.createDataFrame(out.toSeq).toDF("id", "label")
      return new LpaRun(
        ids.join(labelsLocal, Seq("id"), "left")
          .select(col("id").as(idCol),
            coalesce(col("label"), col("id")).as("community")),
        edges, ids)
    }
    var labels = ids.select(col("id"), col("id").as("label"))
    for (_ <- 1 to rounds) {
      val neigh = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc): max of (c, -label)
      val winner = neigh.groupBy(col("src"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
        .select(col("src").as("id"), (-col("w.nl")).as("label"))
      // Rebase each round on the CONSTANT id set, not the previous
      // labels: a node either has a winner row (it has neighbors —
      // every round) or never does (isolated — keeps its own id), so
      // ids.join(winner) is output-identical to labels.join(winner)
      // while referencing the previous round's labels exactly ONCE
      // (via neigh). Two references per round would DOUBLE the
      // unrolled plan each round — the exponential-lineage class
      // LoopLineageSpec guards (it asserts linear growth at rounds=8).
      labels = ids
        .join(winner, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("label"), col("id")).as("label"))
    }
    new LpaRun(
      labels.select(col("id").as(idCol), col("label").as("community")),
      edges, ids)
  }
  /** Newman modularity audit of a community assignment — the quality
    * readout that justifies (or indicts) a clustering: per community,
    * Q_c = intra_c/m − (d_c/2m)², where intra_c counts undirected
    * edges with both endpoints inside, d_c sums member degrees, and m
    * is the total undirected edge count. Σ Q_c near 0 means the
    * partition is no better than random wiring; a label-propagation
    * or CC output that scores ~0 should not drive curation decisions.
    *
    * Exactness: every input to Q_c is an exact integer (edge and
    * degree counts); the one float expression per community makes the
    * readout engine-identical. Scale shape: edge normalization +
    * degree/intra aggregates are hash shuffles at edge grain; the
    * single driver scalar is m (one count — the same bounded hop as
    * Baskets' guard). Output: (community, n_nodes, intra_edges,
    * degree_sum, contribution).
    */
  /** [[modularity]]'s result plus the handle releasing the cached
    * normalized edge list (referenced by m, degrees and intra counts).
    */
  final class ModularityRun private[operators] (
      val result: DataFrame,
      und: DataFrame) {
    def release(): Unit = { und.unpersist(): Unit }
  }

  /** Convenience form: materializes the (single-row) score via a
    * scratch-parquet round-trip (executor-loss-safe, unlike
    * localCheckpoint) and releases the cached edge list immediately —
    * repeated audits cannot accumulate executor cache.
    * Use [[modularityRun]] + `release()` to keep the lineage instead.
    */
  def modularity(
      labels: DataFrame,
      idCol: String,
      communityCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val run = modularityRun(labels, idCol, communityCol, pairs, aCol, bCol)
    val out = graft.ScratchSpace.materialize(run.result, "modularity_")
    run.release()
    out
  }

  /** [[modularity]] with the cache-release handle. */
  def modularityRun(
      labels: DataFrame,
      idCol: String,
      communityCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): ModularityRun = {
    val und = graft.SparkUtil.ensureParallelism(pairs)
      .select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = und.count()
    val lab = labels.select(col(idCol).cast("long").as("id"),
      col(communityCol).cast("long").as("c"))
    val deg = und.select(col("u").as("id"))
      .unionByName(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val intra = und
      .join(lab.select(col("id").as("u"), col("c").as("cu")), "u")
      .join(lab.select(col("id").as("v"), col("c").as("cv")), "v")
      .where(col("cu") === col("cv"))
      .groupBy(col("cu").as("c"))
      .agg(count(lit(1)).as("intra_edges"))
    val out = lab.join(deg, Seq("id"), "left")
      .groupBy("c")
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(coalesce(col("deg"), lit(0L))).as("degree_sum"))
      .join(intra, Seq("c"), "left")
      .select(
        col("c").as(communityCol),
        col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"),
        (if (m == 0) lit(0.0) else graft.functions.Numerics.fix4(
          coalesce(col("intra_edges"), lit(0L)).cast("double") / m.toDouble -
            (col("degree_sum").cast("double") / (2.0 * m)) *
              (col("degree_sum").cast("double") / (2.0 * m))))
          .as("contribution"))
    new ModularityRun(out, und)
  }
}
