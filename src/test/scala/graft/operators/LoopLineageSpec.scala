package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** Loop-cost discipline regression (VERDICT r10 item 5): the iterative
  * operators (k-core peel, connected-components label loop) are flat-
  * per-round ONLY because each round's state is file-truncated — a
  * refactor back to persist()-chaining recompounds plans (it happened
  * twice: r8 k-core, r9 q141). The observable invariant: the FINAL
  * result's logical plan size must not grow with the number of loop
  * rounds. These specs run the same operator on a few-round and a
  * many-round input and assert near-constant plan size; a lineage
  * regression makes the many-round plan linearly larger and fails
  * loudly here before it fails a 100x bench.
  */
class LoopLineageSpec extends SparkTestBase {

  private def planNodes(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case p => p }.size

  test("k-core peel: plan size is round-count-independent") {
    val ss = spark
    import ss.implicits._
    // a path graph with k=2 peels one endpoint pair per round: a path
    // of n nodes needs ~n/2 rounds to empty
    def path(n: Int): DataFrame =
      (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val few = Graphs.kcoreDegrees(path(6), "a", "b", k = 2)
    val many = Graphs.kcoreDegrees(path(40), "a", "b", k = 2)
    val (nf, nm) = (planNodes(few), planNodes(many))
    // identical shapes modulo noise: a compounding loop would make the
    // 20-round plan ~10x the 3-round plan
    assert(nm <= nf + 5,
      s"k-core plan grew with rounds: few=$nf many=$nm — lineage " +
        "truncation regressed")
  }

  test("connected components: plan size is round-count-independent") {
    val ss = spark
    import ss.implicits._
    // a long path maximizes label-propagation rounds (O(log diameter)
    // with pointer jumping)
    def ids(n: Int): DataFrame = (0L until n).toDF("id")
    def pathPairs(n: Int): DataFrame =
      (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val few = Dedup.clustersFromPairs(ids(4), "id", pathPairs(4))
    val many = Dedup.clustersFromPairs(ids(96), "id", pathPairs(96))
    val (nf, nm) = (planNodes(few), planNodes(many))
    assert(nm <= nf + 5,
      s"CC plan grew with rounds: few=$nf many=$nm — lineage " +
        "truncation regressed")
    // and the many-round answer is still one component
    assert(many.select("cluster_id").distinct().count() == 1L)
  }

  // The FIXED-UNROLL loops (LPA, PageRank) are not file-truncated —
  // they rely on a small round count and a LINEAR per-round plan
  // increment (one reference to the previous round's state). A
  // refactor that references the state twice per round doubles the
  // unrolled plan each round: exponential growth that only explodes
  // when someone later dials rounds up (VERDICT r11 item 6). Assert
  // linearity by second difference: the 4→8-round increment must not
  // exceed the 2→4-round increment (plus noise).

  private def linearGrowth(name: String, sizes: (Int, Int, Int)): Unit = {
    val (n2, n4, n8) = sizes
    assert(n8 - n4 <= (n4 - n2) * 2 + 5,
      s"$name plan unroll is super-linear: rounds 2/4/8 -> $n2/$n4/$n8")
  }

  test("label propagation: unrolled plan grows linearly in rounds") {
    val ss = spark
    import ss.implicits._
    val ids = (0L until 6L).toDF("id")
    val pairs = (0 until 5).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    def nodes(r: Int): Int = {
      val run = Graphs.labelPropagationRun(ids, "id", pairs, "a", "b", r)
      val n = planNodes(run.result)
      run.release(); n
    }
    linearGrowth("LPA", (nodes(2), nodes(4), nodes(8)))
  }

  test("pagerank: unrolled plan grows linearly in iters") {
    val ss = spark
    import ss.implicits._
    val ids = (0L until 6L).toDF("id")
    val pairs = (0 until 5).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    def nodes(r: Int): Int = {
      val run = Graphs.pagerankRun(ids, "id", pairs, "a", "b", r)
      val n = planNodes(run.result)
      run.release(); n
    }
    linearGrowth("PageRank", (nodes(2), nodes(4), nodes(8)))
  }
}
