package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Numerics

/** The relational/query surface (SURVEY.md §2.2): the engine a
  * blueprint user runs over the datasets the blueprints move.
  * Declarative DataFrame plans throughout — Catalyst handles pushdown,
  * pruning, partial aggregation and join strategy; broadcast hints mark
  * the star-schema dims, AQE handles the rest at scale.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val q04 = Q(
    "q04_filter_pushdown",
    (s, dir) =>
      t(s, dir, "lineitem")
        .where(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_discount").between(0.02, 0.06) &&
            col("l_quantity") < 24)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
          col("l_quantity"),
          col("l_discount"),
          Numerics.fix2(col("l_extendedprice") * col("l_discount"))
            .as("disc_amount"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some(s"""
      SELECT l_orderkey, l_linenumber,
             strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
             l_quantity, l_discount,
             ${Numerics.sqlFix("l_extendedprice * l_discount", 2)} AS disc_amount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.02 AND 0.06
        AND l_quantity < 24
      ORDER BY l_orderkey, l_linenumber"""))

  val q05 = Q(
    "q05_agg_groupby",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Numerics.moneySum(col("l_quantity")).as("sum_qty"),
          Numerics.moneySum(col("l_extendedprice")).as("sum_base_price"),
          Numerics.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          Numerics.moneyAvg(col("l_quantity")).as("avg_qty"),
          Numerics.moneyAvg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${Numerics.sqlMoneySum("l_quantity")} AS sum_qty,
             ${Numerics.sqlMoneySum("l_extendedprice")} AS sum_base_price,
             ${Numerics.sqlMoneySum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${Numerics.sqlMoneyAvg("l_quantity")} AS avg_qty,
             ${Numerics.sqlMoneyAvg("l_extendedprice")} AS avg_price,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  val q06 = Q(
    "q06_join_broadcast",
    (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("cust_cnt"),
          Numerics.moneySum(col("c_acctbal")).as("acctbal_sum"))
        .orderBy("r_name", "n_name"),
    Some(s"""
      SELECT r_name, n_name,
             CAST(count(*) AS BIGINT) AS cust_cnt,
             ${Numerics.sqlMoneySum("c_acctbal")} AS acctbal_sum
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  val q07 = Q(
    "q07_join_shuffle",
    (s, dir) =>
      t(s, dir, "orders").hint("shuffle_hash")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
        .agg(
          Numerics.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("order_month"),
    Some(s"""
      SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
             ${Numerics.sqlMoneySum("l_extendedprice * (1 - l_discount)")} AS revenue,
             CAST(count(*) AS BIGINT) AS n_items
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1
      ORDER BY order_month"""))

  /** Flagship: multi-way star join + aggregate (TPC-H Q5-flavored).
    * Fact-fact (orders⋈lineitem) shuffles on the key; all dims
    * broadcast.
    */
  def starJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders").where(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(
        Numerics.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("line_cnt"))
      .orderBy(col("revenue").desc, col("n_name"))

  val q08 = Q(
    "q08_star_join",
    (s, dir) => starJoin(s, dir),
    Some(s"""
      SELECT n_name,
             ${Numerics.sqlMoneySum("l_extendedprice * (1 - l_discount)")} AS revenue,
             CAST(count(*) AS BIGINT) AS line_cnt
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1999-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  val q09 = Q(
    "q09_window_rank",
    (s, dir) => {
      val totals = t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment", "c_custkey")
        .agg(Numerics.moneySum(col("o_totalprice")).as("total_price"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("total_price").desc, col("c_custkey").asc)
      totals
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    },
    Some(s"""
      SELECT * FROM (
        SELECT c_mktsegment, c_custkey, total_price,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                 ORDER BY total_price DESC, c_custkey ASC) AS INT) AS rn
        FROM (
          SELECT c_mktsegment, c_custkey,
                 ${Numerics.sqlMoneySum("o_totalprice")} AS total_price
          FROM customer JOIN orders ON c_custkey = o_custkey
          GROUP BY c_mktsegment, c_custkey))
      WHERE rn <= 5
      ORDER BY c_mktsegment, rn"""))

  val q10 = Q(
    "q10_topn",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20),
    Some(s"""
      SELECT o_orderkey, o_custkey, o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d') AS order_day
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 20"""))

  val q11 = Q(
    "q11_distinct",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
    Some(s"""
      SELECT o_orderpriority,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  val q12 = Q(
    "q12_anti_join",
    (s, dir) => {
      val pending = t(s, dir, "orders")
        .where(col("o_orderstatus") === "P").select("o_custkey")
      t(s, dir, "customer")
        .join(pending, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some(s"""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      ORDER BY c_custkey"""))

  val q44 = Q(
    "q44_semi_join",
    (s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      t(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some(s"""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  val q45 = Q(
    "q45_set_ops",
    (s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey").distinct()
      val finished = t(s, dir, "orders")
        .where(col("o_orderstatus") === "F")
        .select("o_custkey").distinct()
      def counted(op: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      counted("except", urgent.except(finished))
        .unionAll(counted("intersect", urgent.intersect(finished)))
        .unionAll(counted("union", urgent.union(finished).distinct()))
        .orderBy("op")
    },
    Some(s"""
      WITH a AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderpriority = '1-URGENT'),
      b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
      SELECT 'except' AS op, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      UNION ALL
      SELECT 'intersect', CAST(count(*) AS BIGINT)
        FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      UNION ALL
      SELECT 'union', CAST(count(*) AS BIGINT)
        FROM (SELECT * FROM a UNION SELECT * FROM b)
      ORDER BY op"""))

  val q46 = Q(
    "q46_salted_join",
    (s, dir) =>
      // Same semantics as q07, executed through the skew-salting path:
      // the fact side salted 8 ways, the other side replicated per
      // salt — proof the salting utility preserves exact join results.
      graft.SparkUtil.saltedJoin(
          t(s, dir, "lineitem"), t(s, dir, "orders"),
          col("l_orderkey"), col("o_orderkey"), saltFactor = 8)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
        .agg(
          Numerics.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("order_month"),
    Some(s"""
      SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
             ${Numerics.sqlMoneySum("l_extendedprice * (1 - l_discount)")} AS revenue,
             CAST(count(*) AS BIGINT) AS n_items
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1
      ORDER BY order_month"""))

  val q13 = Q(
    "q13_pivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          Numerics.moneySum(when(col("l_returnflag") === "A", col("l_quantity"))
            .otherwise(0.0)).as("qty_a"),
          Numerics.moneySum(when(col("l_returnflag") === "N", col("l_quantity"))
            .otherwise(0.0)).as("qty_n"),
          Numerics.moneySum(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(0.0)).as("qty_r"))
        .orderBy("l_linestatus"),
    Some(s"""
      SELECT l_linestatus,
             ${Numerics.sqlMoneySum("CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END")} AS qty_a,
             ${Numerics.sqlMoneySum("CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END")} AS qty_n,
             ${Numerics.sqlMoneySum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END")} AS qty_r
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus"""))

  val q14 = Q(
    "q14_rollup",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          Numerics.moneySum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag_grp"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status_grp"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag_grp", "status_grp"),
    Some(s"""
      SELECT coalesce(l_returnflag, 'ALL') AS flag_grp,
             coalesce(l_linestatus, 'ALL') AS status_grp,
             ${Numerics.sqlMoneySum("l_quantity")} AS sum_qty,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY flag_grp, status_grp"""))

  val q15 = Q(
    "q15_scalar_subquery",
    (s, dir) => {
      val part = t(s, dir, "part")
      // Scalar aggregate as a broadcast 1-row join — no driver collect,
      // no single-partition window.
      val avgPrice = part.agg(avg("p_retailprice").as("avg_price"))
      part.join(broadcast(avgPrice))
        .where(col("p_retailprice") > col("avg_price"))
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    },
    Some(s"""
      SELECT p_partkey, p_name, p_retailprice
      FROM part
      WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      ORDER BY p_partkey"""))

  val q19 = Q(
    "q19_sessionize",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(
          col("user_id"), col("event_id"),
          expr("ts DIV 1000000").as("ms"))
      graft.operators.Sessionize(ev, "user_id", "ms", "event_id", 1800000L)
        .orderBy("user_id", "session_seq")
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ms FROM events),
      marked AS (
        SELECT user_id, ms, event_id,
               CASE WHEN lag(ms) OVER w IS NULL
                         OR ms - lag(ms) OVER w > 1800000
                    THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      numbered AS (
        SELECT user_id, ms,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM marked)
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             CAST(count(*) AS BIGINT) AS n_events,
             min(ms) AS start_ms, max(ms) AS end_ms,
             max(ms) - min(ms) AS duration_ms
      FROM numbered
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq"""))

  // ---- q60: left outer join (null-extended fact side) ----

  val q60 = Q(
    "q60_left_outer_join",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_orders"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .cast("long").as("n_custs_without_orders"))
        .orderBy("c_mktsegment"),
    Some("""
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(o_orderkey) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_custs_without_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY c_mktsegment"""))

  // ---- q61: full outer join (null extension on BOTH sides) ----

  /** Per-nation supplier vs customer aggregates where each side covers
    * only SOME nations (even keys vs multiples of 3 — deterministic
    * partial overlap at EVERY scale factor), so the full outer join
    * null-extends in both directions.
    */
  val q61 = Q(
    "q61_full_outer_join",
    (s, dir) => {
      val supp = t(s, dir, "supplier")
        .where(col("s_nationkey") % 2 === 0)
        .groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      val cust = t(s, dir, "customer")
        .where(col("c_nationkey") % 3 === 0)
        .groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      supp.join(cust, col("nk_s") === col("nk_c"), "full_outer")
        .select(
          coalesce(col("nk_s"), col("nk_c")).cast("long").as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          (col("nk_s").isNull || col("nk_c").isNull).as("one_sided"))
        .orderBy("nationkey")
    },
    Some("""
      WITH s AS (SELECT s_nationkey AS nk_s, CAST(count(*) AS BIGINT) AS n_supp
                 FROM supplier WHERE s_nationkey % 2 = 0 GROUP BY 1),
      c AS (SELECT c_nationkey AS nk_c, CAST(count(*) AS BIGINT) AS n_cust
            FROM customer WHERE c_nationkey % 3 = 0 GROUP BY 1)
      SELECT CAST(coalesce(nk_s, nk_c) AS BIGINT) AS nationkey,
             coalesce(n_supp, 0) AS n_supp,
             coalesce(n_cust, 0) AS n_cust,
             (nk_s IS NULL OR nk_c IS NULL) AS one_sided
      FROM s FULL JOIN c ON nk_s = nk_c
      ORDER BY nationkey"""))

  // ---- q62: cube (all grouping-set combinations) ----

  val q62 = Q(
    "q62_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          Numerics.moneySum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status_grp"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio_grp"),
          col("sum_price"), col("cnt"))
        .orderBy("status_grp", "prio_grp"),
    Some(s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status_grp,
             coalesce(o_orderpriority, 'ALL') AS prio_grp,
             ${Numerics.sqlMoneySum("o_totalprice")} AS sum_price,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY status_grp, prio_grp"""))

  // ---- q67: rank + lag windows (beyond q09's row_number) ----
  // Two windows over one partition pass: rank() ordered by the value
  // alone (ties share a rank — deterministic because it depends only on
  // values), lag()/row_number() over the tie-broken total order (lag
  // needs an unambiguous predecessor). Catalyst evaluates both in a
  // single Window node per sort order; same shuffle by c_mktsegment.

  val q67 = Q(
    "q67_window_rank_lag",
    (s, dir) => {
      val base = t(s, dir, "customer").select(
        col("c_mktsegment"), col("c_custkey"),
        floor(col("c_acctbal") * 100.0 + 0.5).cast("long").as("acct_cents"))
      val wRank = Window.partitionBy("c_mktsegment")
        .orderBy(col("acct_cents").desc)
      val wSeq = Window.partitionBy("c_mktsegment")
        .orderBy(col("acct_cents").desc, col("c_custkey").asc)
      base
        .select(
          col("c_mktsegment"), col("c_custkey"), col("acct_cents"),
          rank().over(wRank).as("bal_rank"),
          lag(col("acct_cents"), 1).over(wSeq).as("prev_cents"),
          row_number().over(wSeq).as("rn"))
        .where(col("rn") <= 8)
        .orderBy("c_mktsegment", "rn")
    },
    Some(s"""
      SELECT * FROM (
        SELECT c_mktsegment, c_custkey, acct_cents,
               CAST(rank() OVER (PARTITION BY c_mktsegment
                 ORDER BY acct_cents DESC) AS INT) AS bal_rank,
               lag(acct_cents, 1) OVER (PARTITION BY c_mktsegment
                 ORDER BY acct_cents DESC, c_custkey ASC) AS prev_cents,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                 ORDER BY acct_cents DESC, c_custkey ASC) AS INT) AS rn
        FROM (
          SELECT c_mktsegment, c_custkey,
                 CAST(floor(c_acctbal*100.0 + 0.5) AS BIGINT) AS acct_cents
          FROM customer))
      WHERE rn <= 8
      ORDER BY c_mktsegment, rn"""))

  // ---- q70: ntile + percent_rank distribution summary ----
  // Quartile buckets per segment with each bucket's count, bounds and
  // top percent_rank. percent_rank over the tie-broken total order is
  // (row_number-1)/(n-1) in both engines — an exact integer ratio, and
  // fix4 guards the representation anyway.

  val q70 = Q(
    "q70_window_ntile",
    (s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("acct_cents").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(
          col("c_mktsegment"), col("c_custkey"),
          floor(col("c_acctbal") * 100.0 + 0.5).cast("long").as("acct_cents"))
        .select(
          col("c_mktsegment"), col("acct_cents"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"))
        .groupBy("c_mktsegment", "quartile")
        .agg(
          count(lit(1)).as("n"),
          min("acct_cents").as("min_cents"),
          max("acct_cents").as("max_cents"),
          Numerics.fix4(max(col("pr"))).as("max_pr"))
        .orderBy("c_mktsegment", "quartile")
    },
    Some(s"""
      SELECT c_mktsegment, quartile,
             CAST(count(*) AS BIGINT) AS n,
             min(acct_cents) AS min_cents,
             max(acct_cents) AS max_cents,
             ${Numerics.sqlFix("max(pr)", 4)} AS max_pr
      FROM (
        SELECT c_mktsegment,
               CAST(floor(c_acctbal*100.0 + 0.5) AS BIGINT) AS acct_cents,
               CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                 ORDER BY CAST(floor(c_acctbal*100.0 + 0.5) AS BIGINT) DESC,
                          c_custkey ASC) AS INT) AS quartile,
               percent_rank() OVER (PARTITION BY c_mktsegment
                 ORDER BY CAST(floor(c_acctbal*100.0 + 0.5) AS BIGINT) DESC,
                          c_custkey ASC) AS pr
        FROM customer)
      GROUP BY c_mktsegment, quartile
      ORDER BY c_mktsegment, quartile"""))

  // ---- q73: arbitrary grouping sets (beyond rollup/cube lattices) ----
  // ((status,prio),(prio),()) is NOT a rollup prefix chain and not the
  // full cube — it exercises the general Expand-based grouping-set
  // path: one scan, one Expand (3 replicas), one hash aggregate. At
  // scale the Expand multiplies shuffle volume by the set count, which
  // is why the set list is explicit rather than a cube over k columns.

  val q73 = Q(
    "q73_grouping_sets",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupingSets(
          Seq(
            Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")),
            Seq.empty[org.apache.spark.sql.Column]),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          Numerics.moneySum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status_grp"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio_grp"),
          col("sum_price"), col("cnt"))
        .orderBy("status_grp", "prio_grp")
    },
    Some(s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status_grp,
             coalesce(o_orderpriority, 'ALL') AS prio_grp,
             ${Numerics.sqlMoneySum("o_totalprice")} AS sum_price,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                              (o_orderpriority), ())
      ORDER BY status_grp, prio_grp"""))

  // ---- q74: value-range window frame (trailing 1h per user) ----
  // RANGE frame over epoch-ms, unlike q37's ROWS frame: the frame is
  // defined by the ORDER-BY value, so peers (same user, same ms) are
  // all included and the result is order-insensitive — no tie-break
  // column needed for determinism. One shuffle by user_id; the frame
  // scan is a sliding two-pointer per partition, O(n) not O(n·frame).

  val q74 = Q(
    "q74_range_frame_window",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ms"))
        .rangeBetween(-3600000L, Window.currentRow)
      Tables.events(s, dir)
        .select(
          col("event_id"), col("user_id"),
          expr("ts DIV 1000000").as("ms"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("val_cents"))
        .select(
          col("event_id"), col("user_id"), col("ms"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("val_cents")).over(w).as("cents_1h"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000000 AS ms,
                        CAST(floor(value*100.0 + 0.5) AS BIGINT) AS val_cents
                 FROM events)
      SELECT event_id, user_id, ms,
             CAST(count(*) OVER (PARTITION BY user_id ORDER BY ms
               RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_1h,
             CAST(sum(val_cents) OVER (PARTITION BY user_id ORDER BY ms
               RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cents_1h
      FROM e ORDER BY event_id"""))

  // ---- q81: correlated EXISTS / NOT EXISTS through the SQL front-end ----
  // Unlike q12/q44 (DataFrame-API anti/semi joins), this exercises the
  // parser + RewritePredicateSubquery decorrelation: both correlated
  // subqueries rewrite to one semi and one anti hash join on
  // o_custkey — no per-row subquery execution, no nested loop.

  val q81 = Q(
    "q81_exists_subquery",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_q81_customer")
      t(s, dir, "orders").createOrReplaceTempView("graft_q81_orders")
      s.sql("""
        SELECT c_custkey, c_name
        FROM graft_q81_customer c
        WHERE EXISTS (SELECT 1 FROM graft_q81_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM graft_q81_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  // ---- q83: bucketed co-located fact-fact join, end-to-end ----
  // Both facts are written bucketBy(8) + sortBy on the join key, so
  // the sort-merge join (forced via merge hints — at test SF the
  // optimizer would broadcast instead) consumes the bucket layout
  // directly: ZERO Exchange and ZERO Sort in the plan
  // (PlanHygieneSpec asserts it). At 100 TB this is THE recurring
  // fact-fact join shape: pay the shuffle once at write time, never
  // again per query.

  val q83 = Q(
    "q83_bucketed_join",
    (s, dir) => {
      // External-table paths under the per-JVM scratch root: a fresh
      // dir per invocation, so repeated runs (bench warm-ups) and
      // OTHER JVMs sharing the cwd's spark-warehouse never collide on
      // a leftover table location.
      val base = Scratch.dir(s, "q83_")
      s.sql("DROP TABLE IF EXISTS graft_q83_orders")
      s.sql("DROP TABLE IF EXISTS graft_q83_lineitem")
      t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .write.option("path", s"$base/orders")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_q83_orders")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.option("path", s"$base/lineitem")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_q83_lineitem")
      s.table("graft_q83_orders").hint("merge")
        .join(s.table("graft_q83_lineitem").hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
          Numerics.moneySum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },
    Some(s"""
      SELECT o_orderstatus,
             ${Numerics.sqlMoneySum("l_extendedprice")} AS sum_price,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1
      ORDER BY o_orderstatus"""))

  // ---- q183: UNPIVOT / melt (wide -> long reshape) ----
  // The inverse of q13's pivot: measure columns melt into
  // (measure, value) rows via the native Dataset.unpivot (codegen'd
  // Expand — one scan emits all measures, no self-union of scans),
  // then a per-measure exact profile. Cents floor keeps every
  // aggregate integer-exact across engines.

  val q183 = Q(
    "q183_melt_unpivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity").as("quantity"),
            col("l_discount").as("discount"), col("l_tax").as("tax")),
          "measure", "value")
        .groupBy("measure")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(floor(col("value") * 100.0 + 0.5).cast("long"))
            .as("cents_sum"),
          min(floor(col("value") * 100.0 + 0.5).cast("long"))
            .as("cents_min"),
          max(floor(col("value") * 100.0 + 0.5).cast("long"))
            .as("cents_max"))
        .orderBy("measure"),
    Some("""
      WITH m AS (
        SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL SELECT 'discount', l_discount FROM lineitem
        UNION ALL SELECT 'tax', l_tax FROM lineitem)
      SELECT measure,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS cents_sum,
             CAST(min(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS cents_min,
             CAST(max(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS cents_max
      FROM m GROUP BY 1 ORDER BY measure"""))

  val all: Seq[Q] =
    Seq(q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15, q19,
      q44, q45, q46, q60, q61, q62, q67, q70, q73, q74, q81, q83, q183)
}
