package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Numerics
import graft.sources.{DatasetCatalog, DatasetIO, MatchMode}

/** Blueprint-parity surface (SURVEY.md §2.1): list/select/read/write/
  * move/remove as dataset-level operators, exercised end-to-end against
  * the driver's tables (plus scratch temp dirs for the write paths) and
  * verified against oracles over the SOURCE tables — a roundtrip that
  * drops or corrupts anything fails the hash compare.
  */
object EtlQueries {

  private def scratch(s: SparkSession, prefix: String): String =
    Scratch.dir(s, prefix)

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val q01 = Q(
    "q01_scan_exact",
    (s, dir) =>
      new DatasetIO(s)
        .readMatched(dir, "lineitem.parquet", MatchMode.Exact)
        .where(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
    Some(s"""
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem
      WHERE l_quantity > 45
      ORDER BY l_orderkey, l_linenumber"""))

  val q02 = Q(
    "q02_scan_regex",
    (s, dir) =>
      new DatasetIO(s)
        .readMatched(dir, "^ord[a-z]*\\.parquet$", MatchMode.Regex)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("order_cnt"),
          Numerics.moneySum(col("o_totalprice")).as("total_price"))
        .orderBy("o_orderstatus"),
    Some(s"""
      SELECT o_orderstatus,
             CAST(count(*) AS BIGINT) AS order_cnt,
             ${Numerics.sqlMoneySum("o_totalprice")} AS total_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""))

  val q03 = Q(
    "q03_read_csv_roundtrip",
    (s, dir) => {
      val io = new DatasetIO(s)
      val tmp = scratch(s, "csv")
      val csvPath = s"$tmp/customer.csv"
      io.write(io.read(s"$dir/customer.parquet"), csvPath)
      io.read(csvPath, schema = Some(customerSchema))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("cust_cnt"),
          Numerics.moneySum(col("c_acctbal")).as("acctbal_sum"))
        .orderBy("c_mktsegment")
    },
    Some(s"""
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS cust_cnt,
             ${Numerics.sqlMoneySum("c_acctbal")} AS acctbal_sum
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** Listing + regex selection over the catalog, hash-gated on CONTENT
    * (VERDICT r9 item 4): a planted fixture tree with byte-exact raw
    * files (sizes are deterministic — no parquet/compression metadata
    * in the byte count) is listed recursively with a regex that must
    * exclude the decoy, and the (relative name, size) rows compare
    * against a DuckDB VALUES literal. Pagination over large prefixes
    * stays ScalaTest-gated (DatasetCatalogSpec).
    */
  val q16 = Q(
    "q16_catalog_list",
    (s, dir) => {
      val root = s"${scratch(s, "cat")}/tree"
      def plant(rel: String, n: Int): Unit =
        graft.ScratchSpace.writeBytes(s, root, rel,
          Array.fill[Byte](n)('x'.toByte))
      plant("alpha.csv", 120)
      plant("beta.csv", 64)
      plant("data/gamma.csv", 2048)
      plant("data/inner/delta.csv", 7)
      plant("notes.txt", 33) // decoy: the regex must not select it
      val refs = new DatasetCatalog(s)
        .selectRecursive(root, "\\.csv$", MatchMode.Regex)
        .map(r => (r.name, r.sizeBytes))
      import s.implicits._
      refs.toDF("dataset_name", "size_bytes").orderBy("dataset_name")
    },
    Some("""
      SELECT * FROM (VALUES
        ('alpha.csv', CAST(120 AS BIGINT)),
        ('beta.csv', CAST(64 AS BIGINT)),
        ('data/gamma.csv', CAST(2048 AS BIGINT)),
        ('data/inner/delta.csv', CAST(7 AS BIGINT)))
        AS t(dataset_name, size_bytes)
      ORDER BY dataset_name"""))

  val q17 = Q(
    "q17_move_dataset",
    (s, dir) => {
      val io = new DatasetIO(s)
      val tmpA = scratch(s, "mv_a")
      val tmpB = scratch(s, "mv_b")
      io.write(io.read(s"$dir/nation.parquet"), s"$tmpA/nation_copy.parquet")
      io.move(tmpA, "nation_copy.parquet", MatchMode.Exact,
        tmpB, destName = Some("nation_moved.parquet"))
      io.read(s"$tmpB/nation_moved.parquet")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("nation_cnt"))
        .orderBy("n_regionkey")
    },
    Some(s"""
      SELECT n_regionkey, CAST(count(*) AS BIGINT) AS nation_cnt
      FROM nation
      GROUP BY n_regionkey
      ORDER BY n_regionkey"""))

  val q18 = Q(
    "q18_remove_matched",
    (s, dir) => {
      val io = new DatasetIO(s)
      val tmp = scratch(s, "rm")
      io.write(io.read(s"$dir/nation.parquet"), s"$tmp/keep_nation.parquet")
      io.write(io.read(s"$dir/region.parquet"), s"$tmp/rm_region.parquet")
      io.write(io.read(s"$dir/region.parquet"), s"$tmp/rm_region2.parquet")
      io.remove(tmp, "^rm_", MatchMode.Regex)
      val remaining = io.catalog
        .select(tmp, "\\.parquet$", MatchMode.Regex)
      val df = io.read(remaining.head.path)
      df.agg(
        lit(remaining.size.toLong).as("n_datasets"),
        count(lit(1)).as("total_rows"))
    },
    Some(s"""
      SELECT CAST(1 AS BIGINT) AS n_datasets,
             CAST(count(*) AS BIGINT) AS total_rows
      FROM nation"""))

  val q48 = Q(
    "q48_partition_pruning",
    (s, dir) => {
      val io = new DatasetIO(s)
      val tmp = scratch(s, "part")
      io.write(io.read(s"$dir/orders.parquet"), s"$tmp/orders_part",
        partitionBy = Seq("o_orderstatus"))
      // the filter prunes to ONE partition directory (PartitionFilters
      // in the scan — asserted in PlanHygieneSpec)
      io.read(s"$tmp/orders_part")
        .where(col("o_orderstatus") === "F")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("order_cnt"),
          Numerics.moneySum(col("o_totalprice")).as("total_price"))
        .orderBy("o_orderstatus")
    },
    Some(s"""
      SELECT o_orderstatus,
             CAST(count(*) AS BIGINT) AS order_cnt,
             ${Numerics.sqlMoneySum("o_totalprice")} AS total_price
      FROM orders
      WHERE o_orderstatus = 'F'
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""))

  /** Recursive glob selection over a nested tree — the reference
    * upload's recursive two-star `{folder}` walk (upload_file.py:174-182):
    * lay customer
    * out as one directory per segment, then select only the BUILDING
    * subtree's data files with a `seg=B*&#47;*.parquet` glob and read
    * them as one scan. Leaf files carry no partition column, so the
    * aggregate proves the selection picked exactly that subtree.
    */
  val q50 = Q(
    "q50_glob_select_tree",
    (s, dir) => {
      val io = new DatasetIO(s)
      val tmp = scratch(s, "glob")
      io.write(io.read(s"$dir/customer.parquet"), s"$tmp/ctree",
        partitionBy = Seq("c_mktsegment"))
      io.readMatched(s"$tmp/ctree", "c_mktsegment=B*/*.parquet",
          MatchMode.Glob, recursive = true)
        .agg(
          count(lit(1)).as("cust_cnt"),
          Numerics.moneySum(col("c_acctbal")).as("acctbal_sum"))
    },
    Some(s"""
      SELECT CAST(count(*) AS BIGINT) AS cust_cnt,
             ${Numerics.sqlMoneySum("c_acctbal")} AS acctbal_sum
      FROM customer
      WHERE c_mktsegment LIKE 'B%'"""))

  // ---- q85: schema-evolution ingestion (union-by-name) ----
  // Two parquet drops with DIFFERENT column subsets (the real shape of
  // a long-lived landing zone: producers add/drop columns over time)
  // are read separately and merged by COLUMN NAME with missing columns
  // null-filled — order-insensitive, unlike positional union. The
  // aggregate proves both the row routing and the null-fill.

  val q85 = Q(
    "q85_union_by_name",
    (s, dir) => {
      val base = scratch(s, "q85_union")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.where(col("l_partkey") % 2 === 0)
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite").parquet(s"$base/drop_a")
      li.where(col("l_partkey") % 2 === 1)
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$base/drop_b")
      s.read.parquet(s"$base/drop_a")
        .unionByName(
          s.read.parquet(s"$base/drop_b"), allowMissingColumns = true)
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("l_quantity")).as("n_qty"),
          count(col("l_extendedprice")).as("n_price"),
          Numerics.moneySum(col("l_quantity")).as("sum_qty"),
          Numerics.moneySum(col("l_extendedprice")).as("sum_price"))
    },
    Some(s"""
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(CASE WHEN l_partkey % 2 = 0 THEN 1 END) AS BIGINT)
               AS n_qty,
             CAST(count(CASE WHEN l_partkey % 2 = 1 THEN 1 END) AS BIGINT)
               AS n_price,
             ${Numerics.sqlMoneySum("CASE WHEN l_partkey % 2 = 0 THEN l_quantity END")}
               AS sum_qty,
             ${Numerics.sqlMoneySum("CASE WHEN l_partkey % 2 = 1 THEN l_extendedprice END")}
               AS sum_price
      FROM lineitem"""))

  // ---- q134: multi-format roundtrip (csv / json+gzip / orc+zlib) ----
  // The DataSource surface beyond parquet: the same typed slice writes
  // through three formats (with a compression codec on each compressed
  // path) and reads back under an explicit schema; per-format exact
  // checksums (counts, integer products, cents, epoch-day sums) must
  // all equal the parquet source's. Doubles survive the CSV text hop
  // because Spark prints shortest-roundtrip representations; dates are
  // the lossy-prone type, hence the explicit day_sum probe.

  val q134 = Q(
    "q134_format_roundtrip",
    (s, dir) => {
      val base = Tables(s, dir, "lineitem")
        .where(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_returnflag"),
          col("l_shipdate").cast("date").as("ship_day"))
      val out = scratch(s, "q134_fmt_")
      val schema = base.schema
      def checks(fmt: String, wopts: Map[String, String]): DataFrame = {
        val p = s"$out/$fmt"
        base.write.mode("overwrite").options(wopts).format(fmt).save(p)
        // the csv reader needs the SAME header option or it parses the
        // header line as a (null-filled) data row
        s.read.schema(schema).options(wopts.filter(_._1 == "header"))
          .format(fmt).load(p)
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("l_orderkey") * col("l_linenumber")).as("key_sum"),
            sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
              .as("cents_sum"),
            sum(datediff(col("ship_day"), to_date(lit("1970-01-01")))
              .cast("long")).as("day_sum"))
          .select(lit(fmt).as("fmt"), col("n_rows"), col("key_sum"),
            col("cents_sum"), col("day_sum"))
      }
      Seq(
        checks("csv", Map("header" -> "true")),
        checks("json", Map("compression" -> "gzip")),
        checks("orc", Map("compression" -> "zlib")))
        .reduceLeft(_.unionAll(_))
        .orderBy("fmt")
    },
    Some("""
      WITH agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(l_orderkey * l_linenumber) AS BIGINT) AS key_sum,
               CAST(sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT))
                 AS BIGINT) AS cents_sum,
               CAST(sum(CAST(l_shipdate AS DATE) - DATE '1970-01-01')
                 AS BIGINT) AS day_sum
        FROM lineitem WHERE l_orderkey < 1000)
      SELECT fmt, n_rows, key_sum, cents_sum, day_sum
      FROM (VALUES ('csv'), ('json'), ('orc')) AS f(fmt)
      CROSS JOIN agg
      ORDER BY fmt"""))


  // ---- q168: dynamic-partition overwrite (partition-grain upsert) ----
  // Re-land ONE partition of a partitioned lake table: only that
  // partition's files may change. Byte-stability of every untouched
  // partition is PROVEN by md5-ing each partition's files before and
  // after the overwrite; the oracle then pins which partitions were
  // allowed to change and the post-state totals.

  val q168 = Q(
    "q168_dynamic_overwrite",
    (s, dir) => {
      val io = new DatasetIO(s)
      val tmp = scratch(s, "q168_dynov")
      val table = s"$tmp/orders_dyn"
      val orders = io.read(s"$dir/orders.parquet")
      io.write(orders, table, partitionBy = Seq("o_orderpriority"))
      // per-partition content fingerprint: sorted (name, md5) of every
      // data file, walked through the table's own Hadoop FS (works on
      // an object-store scratch root too) — partition dirs at this
      // grain hold a handful of files, so the walk is metadata-cheap
      def snapshot(): Map[String, String] =
        graft.ScratchSpace.partitionDigests(s, table)
      val before = snapshot()
      // the re-landed slice: URGENT orders with doubled totals (x2 is
      // exponent arithmetic — exact in double, exact in the oracle)
      io.overwritePartitions(
        orders.where(col("o_orderpriority") === "1-URGENT")
          .withColumn("o_totalprice", col("o_totalprice") * 2.0),
        table, partitionBy = Seq("o_orderpriority"))
      val after = snapshot()
      val stable = before.map { case (part, dg) =>
        // URL-decode the dir name ("1-URGENT" needs none, but partition
        // dirs escape specials in general)
        val v = java.net.URLDecoder.decode(
          part.stripPrefix("o_orderpriority="), "UTF-8")
        (v, if (after.get(part).contains(dg)) 1 else 0)
      }.toSeq
      val stableDf = s.createDataFrame(stable.map(t => Tuple2(t._1, t._2)))
        .toDF("o_orderpriority", "byte_stable")
      io.read(table)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("order_cnt"),
          Numerics.moneySum(col("o_totalprice")).as("total_price"))
        .join(broadcast(stableDf), Seq("o_orderpriority"))
        .orderBy("o_orderpriority")
    },
    Some(s"""
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS order_cnt,
             ${Numerics.sqlMoneySum(
               "o_totalprice * (CASE WHEN o_orderpriority = '1-URGENT' " +
                 "THEN 2.0 ELSE 1.0 END)")} AS total_price,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END
               AS byte_stable
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  // ---- q203: small-file compaction plan ----
  // The S3 pipeline's chronic cost center priced before the rewrite:
  // DatasetIO.compactionPlan lists metadata only and assigns each file
  // to a bin via the packingMap first-fit rule (deterministic hash
  // order, prefix sum, bin = start DIV target). The oracle replays the
  // identical md5-order cumsum arithmetic over the same planted
  // (name, size) list; the zero-byte decoy must vanish from the plan.

  val q203 = Q(
    "q203_compaction_plan",
    (s, dir) => {
      val root = s"${scratch(s, "q203_plan")}/small"
      val sizes = Seq(
        "f01.bin" -> 120, "f02.bin" -> 64, "f03.bin" -> 2048,
        "f04.bin" -> 500, "f05.bin" -> 900, "f06.bin" -> 333,
        "f07.bin" -> 10, "f08.bin" -> 777, "sub/f09.bin" -> 1500,
        "sub/f10.bin" -> 250, "empty.bin" -> 0)
      sizes.foreach { case (rel, n) =>
        graft.ScratchSpace.writeBytes(s, root, rel,
          Array.fill[Byte](n)('x'.toByte))
      }
      new graft.sources.DatasetIO(s)
        .compactionPlan(root, targetBytesPerFile = 1000L)
    },
    Some("""
      WITH f AS (SELECT * FROM (VALUES
          ('f01.bin', 120), ('f02.bin', 64), ('f03.bin', 2048),
          ('f04.bin', 500), ('f05.bin', 900), ('f06.bin', 333),
          ('f07.bin', 10), ('f08.bin', 777), ('sub/f09.bin', 1500),
          ('sub/f10.bin', 250), ('empty.bin', 0))
          AS t(file_name, bytes)),
      t AS (SELECT file_name, CAST(bytes AS BIGINT) AS n,
                   ('0x'||substr(md5('0|'||file_name),1,15))::BIGINT AS ord
            FROM f WHERE bytes > 0),
      c AS (SELECT file_name, n,
                   sum(n) OVER (ORDER BY ord, file_name
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
            FROM t),
      b AS (SELECT file_name, n,
                   CAST((e - n) // 1000 AS BIGINT) AS bin
            FROM c)
      SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(n) AS BIGINT) AS bytes,
             min(file_name) AS first_file
      FROM b GROUP BY 1 ORDER BY bin"""))

  // ---- q219: read-only Delta table scan (_delta_log replay) ----
  // Interop with the lake's dominant table format: plant a REAL
  // multi-commit PARTITIONED Delta log (v0 protocol+metaData+2 adds;
  // v1 append; v2 remove+add) via the DeltaFixture authoring twin,
  // replay it with DeltaRead, and hash-match the live rows against a
  // DuckDB reconstruction from the source table. The removed file's
  // rows must vanish, and the `src` partition column exists ONLY in
  // the log's partitionValues (Delta data files don't carry partition
  // columns) — a broken partition attach fails the hash.

  val q219 = Q(
    "q219_delta_read",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q219_delta")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType),
        StructField("src", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      val a = DFx.plantDataFile(s, base.where(col("k") < 13), t, "a.parquet")
      val b = DFx.plantDataFile(s, base.where(col("k") >= 13), t, "b.parquet")
      val c = DFx.plantDataFile(s,
        base.withColumn("k", col("k") + 100), t, "c.parquet")
      val d = DFx.plantDataFile(s,
        nation.where(col("n_regionkey") === 2).select(
          (col("n_nationkey").cast("long") + 200).as("k"),
          col("n_name").as("name")), t, "d.parquet")
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolLine(),
        DFx.metaDataLine("q219-fixture", schema, Seq("src")),
        DFx.addLine("a.parquet", a, Map("src" -> Some("n0"))),
        DFx.addLine("b.parquet", b, Map("src" -> Some("n0")))))
      DFx.writeCommit(s, t, 1, Seq(
        DFx.addLine("c.parquet", c, Map("src" -> Some("n1")))))
      DFx.writeCommit(s, t, 2, Seq(
        DFx.removeLine("b.parquet"),
        DFx.addLine("d.parquet", d, Map("src" -> Some("n2")))))
      DeltaRead.read(s, t).orderBy("k", "src")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
               'n0' AS src
        FROM nation WHERE n_nationkey < 13
        UNION ALL
        SELECT CAST(n_nationkey + 100 AS BIGINT), n_name, 'n1'
        FROM nation
        UNION ALL
        SELECT CAST(n_nationkey + 200 AS BIGINT), n_name, 'n2'
        FROM nation WHERE n_regionkey = 2)
      ORDER BY k, src"""))

  // ---- q224: Delta checkpoint replay (vacuumed-head log) ----
  // The production shape q219 refuses: a log whose early JSON commits
  // were vacuumed after a checkpoint. Plant the net state at v2 as a
  // single-part classic checkpoint.parquet (protocol/metaData/add
  // rows — the DeltaFixture.writeCheckpoint authoring twin), JSONs
  // ONLY for v3 (append) and v4 (remove+add), and replay: base from
  // the checkpoint, tail from JSON. The checkpoint's partitionValues
  // must survive the round-trip through the parquet map column, and
  // v4's remove must delete a CHECKPOINT-era file — both fail the
  // hash if the base/tail seam is wrong.

  val q224 = Q(
    "q224_delta_checkpoint_read",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q224_delta")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType),
        StructField("src", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      DFx.plantDataFile(s, base.where(col("k") < 13), t, "a.parquet"): Unit
      DFx.plantDataFile(s, base.where(col("k") >= 13), t, "b.parquet"): Unit
      val c = DFx.plantDataFile(s,
        base.withColumn("k", col("k") + 100), t, "c.parquet")
      val d = DFx.plantDataFile(s,
        nation.where(col("n_regionkey") === 2).select(
          (col("n_nationkey").cast("long") + 200).as("k"),
          col("n_name").as("name")), t, "d.parquet")
      // checkpoint at v2: a + b live (JSONs 0-2 vacuumed)
      DFx.writeCheckpoint(s, t, 2, schema, Seq("src"),
        adds = Seq(
          "a.parquet" -> Map("src" -> Some("n0")),
          "b.parquet" -> Map("src" -> Some("n0"))))
      DFx.writeCommit(s, t, 3, Seq(
        DFx.addLine("c.parquet", c, Map("src" -> Some("n1")))))
      DFx.writeCommit(s, t, 4, Seq(
        DFx.removeLine("b.parquet"),
        DFx.addLine("d.parquet", d, Map("src" -> Some("n2")))))
      DeltaRead.read(s, t).orderBy("k", "src")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
               'n0' AS src
        FROM nation WHERE n_nationkey < 13
        UNION ALL
        SELECT CAST(n_nationkey + 100 AS BIGINT), n_name, 'n1'
        FROM nation
        UNION ALL
        SELECT CAST(n_nationkey + 200 AS BIGINT), n_name, 'n2'
        FROM nation WHERE n_regionkey = 2)
      ORDER BY k, src"""))

  // ---- q225: Delta partition-pruned + zone-map-skipped scan ----
  // The scan that makes the log's metadata pay at 100 TB: q219/q224
  // read every live file regardless of predicate; this gate proves
  // readPruned prunes the file LIST driver-side (partitionValues
  // equality + add-stats min/max disproof) and still row-applies the
  // predicates, so the result is bit-identical to read().where().
  // Fixture: a (k 0-12, src n0, stats), b (k 13-24, src n0, stats —
  // skipped by the range), c (src n1 — pruned by partition), d (src
  // n0, NO stats — must be kept and row-filtered, proving skipping is
  // an optimization, never a correctness input).

  val q225 = Q(
    "q225_delta_pruned_read",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q225_delta")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType),
        StructField("src", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      val a = DFx.plantDataFile(s, base.where(col("k") < 13), t, "a.parquet")
      val b = DFx.plantDataFile(s, base.where(col("k") >= 13), t, "b.parquet")
      val c = DFx.plantDataFile(s,
        base.withColumn("k", col("k") + 100), t, "c.parquet")
      val d = DFx.plantDataFile(s,
        base.withColumn("k", col("k") + 200), t, "d.parquet")
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolLine(),
        DFx.metaDataLine("q225-fixture", schema, Seq("src")),
        DFx.addLine("a.parquet", a, Map("src" -> Some("n0")),
          stats = Some(DFx.statsJson(13, Map("k" -> ((0L, 12L)))))),
        DFx.addLine("b.parquet", b, Map("src" -> Some("n0")),
          stats = Some(DFx.statsJson(12, Map("k" -> ((13L, 24L))))))))
      DFx.writeCommit(s, t, 1, Seq(
        DFx.addLine("c.parquet", c, Map("src" -> Some("n1")),
          stats = Some(DFx.statsJson(25, Map("k" -> ((100L, 124L)))))),
        DFx.addLine("d.parquet", d, Map("src" -> Some("n0")))))
      DeltaRead.readPruned(s, t,
        partitionEquals = Map("src" -> "n0"),
        range = Some(("k", 5L, 12L)))
        .orderBy("k", "src")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             'n0' AS src
      FROM nation WHERE n_nationkey BETWEEN 5 AND 12
      ORDER BY k, src"""))

  // ---- q227: Delta metadata-only row count ----
  // SELECT count(*) without touching a data file: sum of the live
  // adds' stats.numRecords over the replayed log — counts at v0 and
  // after a remove+append must track the live set exactly, and the
  // asOf counts prove the replay, not a directory listing, is the
  // source. (A table with ANY stats-less live file refuses —
  // spec-gated — so a metadata count can never be silently partial.)

  val q227 = Q(
    "q227_delta_meta_count",
    (s, dir) => {
      import s.implicits._
      import graft.sources.{DeltaFixture => DFx, DeltaRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q227_delta")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      val nA = base.where(col("k") < 13).count()
      val nB = base.where(col("k") >= 13).count()
      val nC = base.count()
      val a = DFx.plantDataFile(s, base.where(col("k") < 13), t, "a.parquet")
      val b = DFx.plantDataFile(s, base.where(col("k") >= 13), t, "b.parquet")
      val c = DFx.plantDataFile(s,
        base.withColumn("k", col("k") + 100), t, "c.parquet")
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolLine(),
        DFx.metaDataLine("q227-fixture", schema),
        DFx.addLine("a.parquet", a,
          stats = Some(DFx.statsJson(nA, Map.empty))),
        DFx.addLine("b.parquet", b,
          stats = Some(DFx.statsJson(nB, Map.empty)))))
      DFx.writeCommit(s, t, 1, Seq(
        DFx.removeLine("a.parquet"),
        DFx.addLine("c.parquet", c,
          stats = Some(DFx.statsJson(nC, Map.empty)))))
      Seq(
        ("v0", DeltaRead.countRows(s, t, asOf = Some(0L))),
        ("v1", DeltaRead.countRows(s, t))).toDF("at", "n_rows")
        .orderBy("at")
    },
    Some("""
      SELECT * FROM (
        SELECT 'v0' AS at, CAST(count(*) AS BIGINT) AS n_rows
        FROM nation
        UNION ALL
        SELECT 'v1', CAST(count(*) FILTER (WHERE n_nationkey >= 13)
          AS BIGINT) + CAST(count(*) AS BIGINT)
        FROM nation)
      ORDER BY at"""))

  // ---- q232: WARC (Common Crawl) record-grain ingestion ----
  // The physical shape of raw crawl text on S3: plant four WARC
  // containers whose response bodies are documents rows — two
  // multi-member `.warc.gz` in the Common Crawl record-per-member
  // layout, one plain `.warc`, and one gzipped archive whose last
  // record is TRUNCATED mid-content-block — then read them back at
  // record grain with [[graft.sources.Warc.readDir]]. The oracle
  // replays every field from the documents table (payload bodies
  // hash-checked via md5), the warcinfo file headers analytically,
  // and the truncated tail as the contract's single decline row
  // after the salvaged prefix. Parallelism is per FILE (a crawl
  // snapshot is ~64k independent ~1 GB segments), parsing is
  // streaming within a file — the 100 TB shape needs no shuffle at
  // all until the first downstream aggregate.

  val q232 = Q(
    "q232_warc_ingest",
    (s, dir) => {
      import graft.sources.{Warc, WarcFixture => WFx}
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      // Fixture authoring: 24 bounded rows collected to frame record
      // bytes on the driver — the same fixture grain as the WAV/MP4
      // byte fixtures, NOT a corpus-sized collect.
      val docs = Tables(s, dir, "documents")
        .where(col("doc_id") < 24)
        .select(col("doc_id"), col("text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1)
      def resp(d: (Long, String)): Array[Byte] =
        WFx.response(s"http://example.com/doc/${d._1}", 200,
          d._2.getBytes(utf8))
      val info = WFx.warcinfo("software: graft-warc/1.0\n".getBytes(utf8))
      val f1 = WFx.gzMembers(info +: docs.filter(_._1 < 8).map(resp).toSeq)
      val f2 = WFx.gzMembers(
        info +: docs.filter(d => d._1 >= 8 && d._1 < 16).map(resp).toSeq)
      val f3 = WFx.plain(info +: docs.filter(_._1 >= 16).map(resp).toSeq)
      // valid prefix, then a record cut 40 bytes short of its declared
      // Content-Length: the reader must salvage the prefix and emit
      // ONE all-null decline row for the damaged tail.
      val cut = WFx.record(Seq("WARC-Type" -> "resource"),
        Array.fill[Byte](64)(7)).dropRight(40)
      val f4 = WFx.gzMembers(docs.filter(_._1 < 4).map(resp).toSeq :+ cut)
      val t = scratch(s, "q232_warc_")
      graft.ScratchSpace.writeBytes(s, t, "w1.warc.gz", f1)
      graft.ScratchSpace.writeBytes(s, t, "w2.warc.gz", f2)
      graft.ScratchSpace.writeBytes(s, t, "w3.warc", f3)
      graft.ScratchSpace.writeBytes(s, t, "w4.warc.gz", f4)
      Warc.readDir(s, t,
          idFromPath = p => regexp_extract(p, "w(\\d+)\\.warc", 1))
        .select(
          col("file_id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("http_status"), col("payload_len"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("file_id", "rec_idx")
    },
    Some("""
      WITH recs AS (
        SELECT CAST(CASE WHEN doc_id < 8 THEN 1
                         WHEN doc_id < 16 THEN 2 ELSE 3 END AS BIGINT)
                 AS file_id,
               CAST(doc_id % 8 + 1 AS INTEGER) AS rec_idx,
               'response' AS warc_type,
               'http://example.com/doc/' || doc_id AS target_uri,
               CAST(200 AS INTEGER) AS http_status,
               CAST(strlen(text) AS BIGINT) AS payload_len,
               md5(text) AS payload_md5
        FROM documents WHERE doc_id < 24
        UNION ALL
        SELECT 4, CAST(doc_id AS INTEGER), 'response',
               'http://example.com/doc/' || doc_id, 200,
               strlen(text), md5(text)
        FROM documents WHERE doc_id < 4
        UNION ALL
        SELECT f.file_id, 0, 'warcinfo', NULL, NULL,
               CAST(strlen('software: graft-warc/1.0' || chr(10))
                 AS BIGINT),
               md5('software: graft-warc/1.0' || chr(10))
        FROM (VALUES (1),(2),(3)) f(file_id)
        UNION ALL
        SELECT 4, NULL, NULL, NULL, NULL, NULL, NULL)
      SELECT file_id, rec_idx, warc_type, target_uri, http_status,
             payload_len, payload_md5
      FROM recs
      ORDER BY file_id, rec_idx NULLS FIRST"""))

  // ---- q233: WebDataset (tar-shard) sample ingestion ----
  // The standard physical shape of multimodal training data: `.tar`
  // shards whose members group into samples by basename key
  // (000042.txt + 000042.json + 000042.cls = one sample). Plant three
  // healthy shards (one gzipped) plus one truncated mid-member, read
  // them at member grain with [[graft.sources.Tar.readDir]], group
  // with `Tar.groupSamples` (ONE shuffle by (shard, key)), and emit
  // per-sample part counts / byte totals / payload hashes. The oracle
  // replays everything from the documents table, including the
  // salvaged-prefix semantics of the truncated shard: doc 0's full
  // sample survives, doc 1 surfaces with its txt part only, and the
  // member under the damage point never appears. A directory member
  // and a PAX 'x' metadata member in shard 1 must be skipped without
  // touching sample grain.

  val q233 = Q(
    "q233_webdataset_ingest",
    (s, dir) => {
      import graft.sources.{Tar, TarFixture => TFx}
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      // Fixture authoring: 30 bounded rows collected to frame member
      // bytes on the driver — fixture grain, not a corpus collect.
      val docs = Tables(s, dir, "documents")
        .where(col("doc_id") < 30)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3)))
        .sortBy(_._1)
      def key(id: Long) = f"$id%06d"
      def sample(d: (Long, String, String, String)): Seq[Array[Byte]] =
        Seq(
          TFx.member(s"${key(d._1)}.txt", d._2.getBytes(utf8)),
          TFx.member(s"${key(d._1)}.json",
            s"""{"id":${d._1},"source":"${d._4}"}""".getBytes(utf8)),
          TFx.member(s"${key(d._1)}.cls", d._3.getBytes(utf8)))
      def shard(ids: Range): Seq[Array[Byte]] =
        docs.filter(d => ids.contains(d._1.toInt)).flatMap(sample).toSeq
      val t1 = TFx.archive(
        (TFx.dirMember("data/") +:
          TFx.member("meta", "comment=x".getBytes(utf8), 'x') +:
          shard(0 until 10)))
      val t2 = TFx.archiveGz(shard(10 until 20))
      val t3 = TFx.archive(shard(20 until 30))
      // shard 4: doc 0 complete, doc 1's txt, then a member whose
      // content block is cut 700 bytes short — salvage the prefix,
      // decline the tail (decline rows carry no sample parts).
      val cut = TFx.member("zzzz.bin", Array.fill[Byte](600)(3))
        .dropRight(700)
      val t4 = Array.concat(
        (sample(docs(0)) ++
          Seq(TFx.member(s"${key(1)}.txt", docs(1)._2.getBytes(utf8)),
            cut)): _*)
      val t = scratch(s, "q233_wds_")
      graft.ScratchSpace.writeBytes(s, t, "t1.tar", t1)
      graft.ScratchSpace.writeBytes(s, t, "t2.tar.gz", t2)
      graft.ScratchSpace.writeBytes(s, t, "t3.tar", t3)
      graft.ScratchSpace.writeBytes(s, t, "t4.tar", t4)
      Tar.groupSamples(Tar.readDir(s, t,
          idFromPath = p => regexp_extract(p, "t(\\d+)\\.tar", 1)))
        .select(
          col("file_id"), col("sample_key"), col("n_parts"),
          col("sample_bytes"),
          md5(try_element_at(col("parts"), lit("txt"))).as("txt_md5"),
          try_element_at(col("parts"), lit("cls")).cast("string")
            .as("lang"))
        .orderBy("file_id", "sample_key")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, text, lang,
               '{"id":' || doc_id || ',"source":"' || source || '"}'
                 AS js
        FROM documents WHERE doc_id < 30),
      samples AS (
        SELECT CAST(doc_id // 10 + 1 AS BIGINT) AS file_id,
               printf('%06d', doc_id) AS sample_key,
               CAST(3 AS BIGINT) AS n_parts,
               CAST(strlen(text) + strlen(js) + strlen(lang) AS BIGINT)
                 AS sample_bytes,
               md5(text) AS txt_md5,
               lang
        FROM d
        UNION ALL
        SELECT 4, printf('%06d', doc_id), 3,
               strlen(text) + strlen(js) + strlen(lang), md5(text), lang
        FROM d WHERE doc_id = 0
        UNION ALL
        SELECT 4, printf('%06d', doc_id), 1, strlen(text), md5(text),
               NULL
        FROM d WHERE doc_id = 1)
      SELECT file_id, sample_key, n_parts, sample_bytes, txt_md5, lang
      FROM samples
      ORDER BY file_id, sample_key"""))

  // ---- q234: gzip-JSONL ingestion with quarantine ----
  // The dominant text-corpus interchange format: write documents rows
  // as gzipped JSONL through the engine's own to_json sink (so the
  // text roundtrips Spark's exact escaping), add a hand-authored file
  // carrying two extra good lines and three corrupt ones, read the
  // directory back with an EXPLICIT schema in PERMISSIVE mode, and
  // split good/quarantine. The oracle replays good rows from the
  // documents table and quarantine rows as the RAW corrupt lines
  // (md5-checked — the quarantine must preserve bytes for
  // reprocessing, not a parse error message). Scale: schema is
  // declared (inference would be a second full pass over 100 TB),
  // gzip keeps one task per object — matching real corpus sharding.

  val q234 = Q(
    "q234_jsonl_ingest",
    (s, dir) => {
      import graft.sources.Jsonl
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType)))
      val t = scratch(s, "q234_jsonl_")
      Jsonl.write(
        Tables(s, dir, "documents")
          .where(col("doc_id") < 40)
          .select(col("doc_id").as("id"), col("text"), col("lang")),
        t, gzip = true)
      graft.ScratchSpace.writeBytes(s, t, "extra.jsonl", Seq(
        """{"id":900,"text":"niner hundred","lang":"en"}""",
        """not json at all {{{""",
        """{"id":901,"text":"nine oh one","lang":"de"}""",
        """{"id":12,""",
        "42",
        "").mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val (good, bad) = Jsonl.split(Jsonl.readDir(s, t, schema))
      good.select(
          col("id"), col("lang"), md5(col("text")).as("txt_md5"),
          lit(false).as("is_corrupt"))
        .unionAll(bad.select(
          lit(null).cast("long").as("id"),
          lit(null).cast("string").as("lang"),
          md5(col(Jsonl.Corrupt)).as("txt_md5"),
          lit(true).as("is_corrupt")))
        .orderBy("is_corrupt", "id", "txt_md5")
    },
    Some("""
      WITH rows_all AS (
        SELECT doc_id AS id, lang, md5(text) AS txt_md5,
               FALSE AS is_corrupt
        FROM documents WHERE doc_id < 40
        UNION ALL
        SELECT CAST(900 AS BIGINT), 'en', md5('niner hundred'), FALSE
        UNION ALL
        SELECT 901, 'de', md5('nine oh one'), FALSE
        UNION ALL
        SELECT NULL, NULL, md5('not json at all {{{'), TRUE
        UNION ALL
        SELECT NULL, NULL, md5('{"id":12,'), TRUE
        UNION ALL
        SELECT NULL, NULL, md5('42'), TRUE)
      SELECT id, lang, txt_md5, is_corrupt
      FROM rows_all
      ORDER BY is_corrupt, id NULLS FIRST, txt_md5"""))

  // ---- q235: transactional Delta write (append/overwrite) ----
  // Closes the q219 interop loop: the engine WRITES the lake's table
  // format, not only reads it. Two partitioned appends then an
  // overwrite run through DeltaWrite's real commit protocol (staged
  // data + rename, per-file stats, create-exclusive versioned JSON),
  // and the result is read back through DeltaRead at two versions —
  // time travel to the pre-overwrite tip must see both appends, the
  // final read only the overwrite; the engine-side require proves the
  // written stats power the metadata-only count path. The oracle
  // replays both states from the nation source table.

  val q235 = Q(
    "q235_delta_write",
    (s, dir) => {
      import graft.sources.{DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q235_deltaw")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        concat(lit("r"), col("n_regionkey").cast("string")).as("src"))
      val v0 = DeltaWrite.append(
        base.where(col("k") < 13), t, partitionBy = Seq("src"))
      val v1 = DeltaWrite.append(
        base.where(col("k") >= 13), t, partitionBy = Seq("src"))
      val v2 = DeltaWrite.overwrite(
        base.where(col("k") % 2 === 0)
          .withColumn("k", col("k") + 100),
        t, partitionBy = Seq("src"))
      require(v0 == 0L && v1 == 1L && v2 == 2L,
        s"unexpected commit versions ($v0, $v1, $v2)")
      // written stats must power the metadata-only count path
      val nAll = nation.count()
      val nEven = nation.where(col("n_nationkey") % 2 === 0).count()
      require(DeltaRead.countRows(s, t, asOf = Some(1L)) == nAll,
        "metadata count at v1 != nation rows")
      require(DeltaRead.countRows(s, t) == nEven,
        "metadata count at tip != overwrite rows")
      DeltaRead.read(s, t, asOf = Some(1L))
        .select(lit("v1").as("at"), col("k"), col("name"), col("src"))
        .unionAll(DeltaRead.read(s, t)
          .select(lit("v2").as("at"), col("k"), col("name"), col("src")))
        .orderBy("at", "k")
    },
    Some("""
      SELECT * FROM (
        SELECT 'v1' AS at, CAST(n_nationkey AS BIGINT) AS k,
               n_name AS name, 'r' || n_regionkey AS src
        FROM nation
        UNION ALL
        SELECT 'v2', CAST(n_nationkey + 100 AS BIGINT), n_name,
               'r' || n_regionkey
        FROM nation WHERE n_nationkey % 2 = 0)
      ORDER BY at, k"""))

  // ---- q239: Delta MERGE (CDC upsert into the lake) ----
  // Row 90/109's CDC merge-apply, persisted into the table format the
  // lake actually stores: one DeltaWrite.merge call carries updates
  // (key-matched row replacement), deletes (marker column), and
  // inserts (unmatched keys) in ONE atomic commit, copy-on-write —
  // only data files containing matched keys rewrite. Read back via
  // DeltaRead; the oracle replays the merged state from nation.

  val q239 = Q(
    "q239_delta_merge",
    (s, dir) => {
      import graft.sources.{DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q239_deltam")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        concat(lit("r"), col("n_regionkey").cast("string")).as("src"))
      require(DeltaWrite.append(base, t, partitionBy = Seq("src")) == 0L)
      val upd = base.where(col("k") % 3 === 0)
        .select(col("k"),
          concat(lit("UPD_"), col("name")).as("name"),
          col("src"), lit(false).as("del"))
      val del = base.where(col("k") % 3 === 1)
        .select(col("k"), col("name"), col("src"), lit(true).as("del"))
      val ins = base.where(col("k") % 5 === 2)
        .select((col("k") + 500).as("k"),
          concat(lit("NEW_"), col("name")).as("name"),
          col("src"), lit(false).as("del"))
      val v = DeltaWrite.merge(
        upd.unionAll(del).unionAll(ins), t, Seq("k"),
        deleteCol = Some("del"))
      require(v == 1L, s"merge committed at $v, expected 1")
      // merged stats keep the metadata-count path alive
      val expect = nation.where(col("n_nationkey") % 3 =!= 1).count() +
        nation.where(col("n_nationkey") % 5 === 2).count()
      require(DeltaRead.countRows(s, t) == expect,
        "metadata count after merge != expected merged rows")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k,
               CASE WHEN n_nationkey % 3 = 0 THEN 'UPD_' || n_name
                    ELSE n_name END AS name,
               'r' || n_regionkey AS src
        FROM nation WHERE n_nationkey % 3 <> 1
        UNION ALL
        SELECT CAST(n_nationkey + 500 AS BIGINT), 'NEW_' || n_name,
               'r' || n_regionkey
        FROM nation WHERE n_nationkey % 5 = 2)
      ORDER BY k"""))

  // ---- q240: Delta VACUUM ----
  // The cleanup verb for rows 240/244's write paths: after an
  // overwrite, the superseded files are dead weight the log still
  // names; crashed writers leave staging orphans. VACUUM deletes
  // unreferenced-and-older-than-retention files, keeps the live set
  // bit-identical, and (like the real engines) sacrifices time travel
  // to vacuumed versions. Engine requires pin the report arithmetic;
  // the graded rows prove the CURRENT state survived the deletion
  // pass untouched.

  val q240 = Q(
    "q240_delta_vacuum",
    (s, dir) => {
      import graft.sources.{DeltaFixture, DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q240_deltav")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      DeltaWrite.append(base.where(col("k") < 13), t): Unit
      val deadFiles = DeltaRead.snapshot(s, t).liveFiles.size
      DeltaWrite.overwrite(base, t): Unit
      val liveFiles = DeltaRead.snapshot(s, t).liveFiles.size
      DeltaFixture.plantDataFile(s, base.where(col("k") < 2), t,
        "_staging-crashed/part-orphan.parquet"): Unit
      val rep = DeltaWrite.vacuum(s, t, retainMs = 0)
      require(rep.removed.size == deadFiles + 1,
        s"vacuum removed ${rep.removed.size}, expected ${deadFiles + 1}")
      require(rep.liveKept == liveFiles.toLong,
        s"vacuum kept ${rep.liveKept} live, expected $liveFiles")
      require(DeltaWrite.vacuum(s, t, retainMs = 0).removed.isEmpty,
        "second vacuum found leftovers")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation ORDER BY k"""))

  // ---- q241: Delta schema-evolution append ----
  // The additive mergeSchema append: a later producer ships an extra
  // column; the commit carries a new metaData action with the merged
  // schema and historical files read the new column as null (parquet
  // missing-column semantics — the protocol's own behavior).
  // Destructive changes (drop/retype) refuse in DeltaWrite.

  val q241 = Q(
    "q241_delta_evolve",
    (s, dir) => {
      import graft.sources.{DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q241_deltae")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      DeltaWrite.append(base, t): Unit
      val v = DeltaWrite.appendEvolve(
        nation.select(
          (col("n_nationkey").cast("long") + 100).as("k"),
          col("n_name").as("name"),
          concat(lit("r"), col("n_regionkey").cast("string"))
            .as("region")),
        t)
      require(v == 1L, s"evolve committed at $v, expected 1")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
               NULL AS region
        FROM nation
        UNION ALL
        SELECT CAST(n_nationkey + 100 AS BIGINT), n_name,
               'r' || n_regionkey
        FROM nation)
      ORDER BY k"""))

  // ---- q246: Delta checkpoint write + log cleanup ----
  // The log-compaction half of the writer: after appends, an
  // idempotent (txn-marked) append, and an overwrite, ONE checkpoint
  // parquet captures protocol + metaData (id/configuration) + every
  // live add with stats/size + every appId's txn counter, and
  // cleanupLog retires the JSON commits at or below it. The graded
  // read then comes from the CHECKPOINT alone (q224 proved the read
  // path on fixtures; this proves the engine's own compaction is
  // readable), with engine requires pinning that metadata counts and
  // txn idempotence survive, and that the table keeps committing past
  // the checkpoint.

  val q246 = Q(
    "q246_delta_checkpoint_write",
    (s, dir) => {
      import graft.sources.{DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q246_deltacp")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      DeltaWrite.append(base.where(col("k") < 13), t): Unit
      DeltaWrite.idempotentAppend(
        base.where(col("k") >= 13), t, "feeder", 0L): Unit
      DeltaWrite.overwrite(
        base.where(col("k") % 2 === 0), t): Unit
      val cv = DeltaWrite.checkpoint(s, t)
      require(cv == 2L, s"checkpoint at $cv, expected 2")
      val removed = DeltaWrite.cleanupLog(s, t)
      require(removed == 3, s"cleanup removed $removed JSONs, expected 3")
      require(DeltaRead.versions(s, t) == Seq(2L),
        "post-cleanup versions != [checkpoint]")
      val nEven = nation.where(col("n_nationkey") % 2 === 0).count()
      require(DeltaRead.countRows(s, t) == nEven,
        "metadata count lost through compaction")
      require(DeltaWrite.idempotentAppend(
        base.where(col("k") >= 13), t, "feeder", 0L).isEmpty,
        "txn idempotence lost through compaction")
      // the table keeps accepting commits past the checkpoint
      require(DeltaWrite.append(
        base.where(col("k") === 1).withColumn("k", col("k") + 900),
        t) == 3L, "post-cleanup append did not land at v3")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
        FROM nation WHERE n_nationkey % 2 = 0
        UNION ALL
        SELECT CAST(n_nationkey + 900 AS BIGINT), n_name
        FROM nation WHERE n_nationkey = 1)
      ORDER BY k"""))

  // ---- q247: zip container ingestion ----
  // The third corpus container (scraped datasets, Kaggle-style drops,
  // document dumps): streaming local-header walk — members decompress
  // WITHOUT the central directory, so a truncated upload salvages its
  // prefix (one decline row ends the file, the WARC/tar contract).
  // Plant two healthy archives of documents members plus one cut
  // inside an incompressible member's deflate data; the oracle
  // replays names/sizes/md5 from the documents table.

  val q247 = Q(
    "q247_zip_ingest",
    (s, dir) => {
      import graft.sources.{Zip, ZipFixture}
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val fixture = Tables(s, dir, "documents")
        .where(col("doc_id") < 20)
        .select(col("doc_id"), col("text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1)
      def member(d: (Long, String)): (String, Array[Byte]) =
        f"${d._1}%06d.txt" -> d._2.getBytes(utf8)
      val t = scratch(s, "q247_zip_")
      graft.ScratchSpace.writeBytes(s, t, "z1.zip",
        ZipFixture.archive(fixture.filter(_._1 < 10).map(member).toSeq))
      graft.ScratchSpace.writeBytes(s, t, "z2.zip",
        ZipFixture.archive(fixture.filter(_._1 >= 10).map(member).toSeq))
      // incompressible LCG member so the cut lands mid-deflate-data
      var seed = 98765L
      val noise = Array.fill[Byte](100000) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (seed >>> 33).toByte
      }
      graft.ScratchSpace.writeBytes(s, t, "z3.zip",
        ZipFixture.archive(
          fixture.filter(_._1 < 3).map(member).toSeq :+
            ("noise.bin" -> noise)).dropRight(50000))
      Zip.readDir(s, t,
          idFromPath = p => regexp_extract(p, "z(\\d+)\\.zip", 1))
        .select(
          col("file_id"), col("entry_idx"), col("name"), col("size"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("file_id", "entry_idx")
    },
    Some("""
      WITH r AS (
        SELECT CAST(doc_id // 10 + 1 AS BIGINT) AS file_id,
               CAST(doc_id % 10 AS INTEGER) AS entry_idx,
               printf('%06d.txt', doc_id) AS name,
               CAST(strlen(text) AS BIGINT) AS size,
               md5(text) AS payload_md5
        FROM documents WHERE doc_id < 20
        UNION ALL
        SELECT 3, CAST(doc_id AS INTEGER), printf('%06d.txt', doc_id),
               strlen(text), md5(text)
        FROM documents WHERE doc_id < 3
        UNION ALL
        SELECT 3, NULL, NULL, NULL, NULL)
      SELECT file_id, entry_idx, name, size, payload_md5
      FROM r ORDER BY file_id, entry_idx NULLS FIRST"""))

  // ---- q251: Delta column-mapping (name mode) read ----
  // The most common real-lake table state after plain v1: one column
  // rename by any modern writer flips the table to reader v2 with
  // delta.columnMapping.mode=name — physical parquet names diverge
  // from the logical schema. Fixture: data files carry PHYSICAL
  // column names (col-xxxx), the metaData schemaString maps them back
  // via field metadata, partition values key by the physical
  // partition name, and a post-rename commit proves the mapping is
  // replay-consistent. The oracle replays the logical content from
  // nation.

  val q251 = Q(
    "q251_delta_column_mapping",
    (s, dir) => {
      import org.apache.spark.sql.types.MetadataBuilder
      import graft.sources.{DeltaFixture => DFx, DeltaRead}
      def mf(name: String, dt: org.apache.spark.sql.types.DataType,
          phys: String, id: Long) =
        StructField(name, dt, nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", phys)
            .putLong("delta.columnMapping.id", id).build())
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q251_deltacm")
      val base = nation.select(
        col("n_nationkey").cast("long").as("col-4b1"),
        col("n_name").as("col-9f2"))
      val a = DFx.plantDataFile(s,
        base.where(col("`col-4b1`") < 13), t, "a.parquet")
      val b = DFx.plantDataFile(s,
        base.where(col("`col-4b1`") >= 13), t, "b.parquet")
      val c = DFx.plantDataFile(s,
        base.withColumn("col-4b1", col("`col-4b1`") + 100),
        t, "c.parquet")
      val schemaV0 = StructType(Seq(
        mf("k", LongType, "col-4b1", 1),
        mf("name", StringType, "col-9f2", 2),
        mf("src", StringType, "col-7e3", 3)))
      val cmCfg = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "3")
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolLine(minReader = 2, minWriter = 5),
        DFx.metaDataLine("q251-fixture", schemaV0, Seq("src"),
          configuration = cmCfg),
        DFx.addLine("a.parquet", a, Map("col-7e3" -> Some("n0"))),
        DFx.addLine("b.parquet", b, Map("col-7e3" -> Some("n0")))))
      // v1: RENAME k -> key (the operation that creates name mode in
      // real lakes: logical name changes, physical name is stable)
      val schemaV1 = StructType(Seq(
        mf("key", LongType, "col-4b1", 1),
        mf("name", StringType, "col-9f2", 2),
        mf("src", StringType, "col-7e3", 3)))
      DFx.writeCommit(s, t, 1, Seq(
        DFx.metaDataLine("q251-fixture", schemaV1, Seq("src"),
          configuration = cmCfg)))
      DFx.writeCommit(s, t, 2, Seq(
        DFx.removeLine("b.parquet"),
        DFx.addLine("c.parquet", c, Map("col-7e3" -> Some("n1")))))
      // prove the pruned path translates logical -> physical too
      require(DeltaRead.readPruned(s, t,
        partitionEquals = Map("src" -> "n1")).count() ==
        nation.count(), "q251: partition pruning through the mapping")
      DeltaRead.read(s, t).orderBy("key", "src")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS key, n_name AS name,
               'n0' AS src
        FROM nation WHERE n_nationkey < 13
        UNION ALL
        SELECT CAST(n_nationkey + 100 AS BIGINT), n_name, 'n1'
        FROM nation)
      ORDER BY key, src"""))

  // ---- q252: Delta deletion-vector read ----
  // DML-heavy lakehouse tables carry DVs by default now: a DELETE
  // rewrites nothing, it attaches a roaring bitmap of dead row
  // indexes to the add. Fixture: two data files; file a gets an
  // INLINE DV (z85 payload in the descriptor), file b an on-disk
  // 'u'-type DV file (uuid-derived name, CRC-framed) — a remove/add
  // pair at v1 attaches them, exactly the commit shape a real DELETE
  // produces. The gate proves surviving-row content AND the
  // metadata-count path (numRecords minus cardinality) against the
  // oracle's replay of the same predicate.

  val q252 = Q(
    "q252_delta_deletion_vectors",
    (s, dir) => {
      import graft.sources.{DeletionVectors => DVs,
        DeltaFixture => DFx, DeltaRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q252_deltadv")
      val p = new org.apache.hadoop.fs.Path(t)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      val root = fs.makeQualified(p)
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      // deterministic row order inside each file: single part, sorted
      val a = DFx.plantDataFile(s,
        base.where(col("k") < 13).coalesce(1).sortWithinPartitions("k"),
        t, "a.parquet")
      val b = DFx.plantDataFile(s,
        base.where(col("k") >= 13).coalesce(1).sortWithinPartitions("k"),
        t, "b.parquet")
      val nA = 13L
      val nB = nation.count() - nA
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolFeaturesLine(3, 7, Seq("deletionVectors")),
        DFx.metaDataLine("q252-fixture", schema),
        DFx.addLine("a.parquet", a,
          stats = Some(DFx.statsJson(nA, Map("k" -> (0L, 12L))))),
        DFx.addLine("b.parquet", b,
          stats = Some(DFx.statsJson(nB, Map("k" -> (13L, nA + nB - 1)))))))
      // v1, the DELETE: kill k in {1,3,5} (file a row indexes 1,3,5 —
      // inline DV) and the LAST row of b (on-disk 'u' DV)
      val inline = DVs.serialize(Array(1L, 3L, 5L))
      val dvA = DVs.DvDescriptor("i", DVs.z85Encode(inline), None,
        inline.length, 3L)
      val uuid = java.util.UUID.nameUUIDFromBytes(
        "q252-dv".getBytes("UTF-8"))
      val spans = DVs.writeDvFile(fs,
        new org.apache.hadoop.fs.Path(root, s"deletion_vector_$uuid.bin"),
        Seq(Array(nB - 1)))
      val ub = java.nio.ByteBuffer.allocate(16)
      ub.putLong(uuid.getMostSignificantBits)
      ub.putLong(uuid.getLeastSignificantBits)
      val dvB = DVs.DvDescriptor("u", DVs.z85Encode(ub.array()),
        Some(spans.head._1), spans.head._2, 1L)
      DFx.writeCommit(s, t, 1, Seq(
        DFx.removeLine("a.parquet"),
        DFx.addLine("a.parquet", a, dv = Some(dvA),
          stats = Some(DFx.statsJson(nA, Map("k" -> (0L, 12L))))),
        DFx.removeLine("b.parquet"),
        DFx.addLine("b.parquet", b, dv = Some(dvB),
          stats = Some(DFx.statsJson(nB, Map("k" -> (13L, nA + nB - 1)))))))
      // the metadata-only count path must subtract DV cardinality
      require(DeltaRead.countRows(s, t) == nA + nB - 4,
        "q252: countRows must be numRecords minus DV cardinality")
      // time travel BEFORE the delete still sees every row
      require(DeltaRead.read(s, t, asOf = Some(0L)).count() == nA + nB,
        "q252: pre-DV version must be intact")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      WHERE n_nationkey NOT IN (1, 3, 5)
        AND n_nationkey <> (SELECT max(n_nationkey) FROM nation)
      ORDER BY k"""))

  // ---- q253: Delta multi-part checkpoint read ----
  // Large production tables write classic checkpoints SPLIT across n
  // parquet parts; any part may hold any action type and a reader
  // must union all of them (and refuse torn sets). Fixture: a
  // vacuumed-head log whose base state exists ONLY as a 2-part
  // checkpoint at v5 (protocol+metaData in part 1, adds round-robin
  // across both parts), plus a JSON tail at v6 that removes a
  // checkpoint-era file and appends a new one — the base/tail seam
  // and the cross-part union both gate the hash.

  val q253 = Q(
    "q253_delta_multipart_checkpoint",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q253_deltamp")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType),
        StructField("src", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      DFx.plantDataFile(s, base.where(col("k") < 13), t, "a.parquet"): Unit
      DFx.plantDataFile(s, base.where(col("k") >= 13), t, "b.parquet"): Unit
      val c = DFx.plantDataFile(s,
        base.withColumn("k", col("k") + 100), t, "c.parquet")
      val d = DFx.plantDataFile(s,
        nation.where(col("n_regionkey") === 2).select(
          (col("n_nationkey").cast("long") + 200).as("k"),
          col("n_name").as("name")), t, "d.parquet")
      DFx.writeMultiCheckpoint(s, t, 5, schema, nParts = 2,
        partitionColumns = Seq("src"),
        adds = Seq(
          "a.parquet" -> Map("src" -> Some("n0")),
          "b.parquet" -> Map("src" -> Some("n0")),
          "c.parquet" -> Map("src" -> Some("n1"))))
      DFx.writeCommit(s, t, 6, Seq(
        DFx.removeLine("b.parquet"),
        DFx.addLine("d.parquet", d, Map("src" -> Some("n2")))))
      require(DeltaRead.versions(s, t) == Seq(5L, 6L),
        "q253: checkpoint version must be visible")
      DeltaRead.read(s, t).orderBy("k", "src")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
               'n0' AS src
        FROM nation WHERE n_nationkey < 13
        UNION ALL
        SELECT CAST(n_nationkey + 100 AS BIGINT), n_name, 'n1'
        FROM nation
        UNION ALL
        SELECT CAST(n_nationkey + 200 AS BIGINT), n_name, 'n2'
        FROM nation WHERE n_regionkey = 2)
      ORDER BY k, src"""))

  // ---- q254: zstd-JSONL ingestion ----
  // The codec the dominant open LLM corpora actually ship (Dolma,
  // RedPajama releases): .jsonl.zst objects, often multi-frame.
  // Fixture: one gzip object (the engine's own sink), one two-frame
  // zstd object, one plain object with corrupt lines — the MIXED dir
  // a real bucket is. All three read through ONE from_json parse;
  // quarantine preserves raw bytes. The oracle replays good rows from
  // documents and the corrupt lines by md5.

  val q254 = Q(
    "q254_jsonl_zstd",
    (s, dir) => {
      import graft.sources.Jsonl
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      def zstFrame(lines: Seq[String]): Array[Byte] =
        com.github.luben.zstd.Zstd.compress(
          (lines.mkString("\n") + "\n").getBytes(utf8))
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType)))
      val t = scratch(s, "q254_jsonlzst_")
      Jsonl.write(
        Tables(s, dir, "documents")
          .where(col("doc_id") < 20)
          .select(col("doc_id").as("id"), col("text"), col("lang")),
        t, gzip = true)
      // two-frame zstd: rows 20-39 split across independent frames
      // (the Dolma shard layout — frames must decode end-to-end)
      val docRows = Tables(s, dir, "documents")
        .where(col("doc_id") >= 20 && col("doc_id") < 40)
        .select(to_json(struct(
          col("doc_id").as("id"), col("text"), col("lang"))).as("j"))
        .orderBy(col("j"))
        .collect().map(_.getString(0)).toSeq
      val (f1, f2) = docRows.splitAt(docRows.size / 2)
      graft.ScratchSpace.writeBytes(s, t, "shard.jsonl.zst",
        zstFrame(f1) ++ zstFrame(f2))
      graft.ScratchSpace.writeBytes(s, t, "extra.jsonl", Seq(
        """{"id":900,"text":"niner hundred","lang":"en"}""",
        """zst mixed dir garbage [[[""",
        "7").mkString("\n").getBytes(utf8))
      val (good, bad) = Jsonl.split(Jsonl.readDir(s, t, schema))
      good.select(
          col("id"), col("lang"), md5(col("text")).as("txt_md5"),
          lit(false).as("is_corrupt"))
        .unionAll(bad.select(
          lit(null).cast("long").as("id"),
          lit(null).cast("string").as("lang"),
          md5(col(Jsonl.Corrupt)).as("txt_md5"),
          lit(true).as("is_corrupt")))
        .orderBy("is_corrupt", "id", "txt_md5")
    },
    Some("""
      WITH rows_all AS (
        SELECT doc_id AS id, lang, md5(text) AS txt_md5,
               FALSE AS is_corrupt
        FROM documents WHERE doc_id < 40
        UNION ALL
        SELECT CAST(900 AS BIGINT), 'en', md5('niner hundred'), FALSE
        UNION ALL
        SELECT NULL, NULL, md5('zst mixed dir garbage [[['), TRUE
        UNION ALL
        SELECT NULL, NULL, md5('7'), TRUE)
      SELECT id, lang, txt_md5, is_corrupt
      FROM rows_all
      ORDER BY is_corrupt, id NULLS FIRST, txt_md5"""))

  // ---- q256: Iceberg table read ----
  // The lake's OTHER table format: metadata JSON → manifest-list
  // (Avro OCF) → manifests (Avro OCF) → live parquet files, per the
  // public Iceberg spec. Fixture: a two-snapshot table planted from
  // nation — snapshot 1 adds files a+b, snapshot 2 carries a as
  // EXISTING, marks b DELETED, and adds c through a SECOND manifest,
  // so the gate exercises the manifest-list union, all three entry
  // statuses, and snapshot time travel (require()-gated) plus the
  // record_count metadata-only count. The oracle replays the live
  // content from nation.

  val q256 = Q(
    "q256_iceberg_read",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, IcebergFixture => IFx,
        IcebergRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q256_iceberg")
      val schema = IFx.withFieldIds(StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType))), Seq(1, 2))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      IFx.plantDataFile(s, base.where(col("k") < 13),
        t, "data/a.parquet", Seq(1, 2)): Unit
      IFx.plantDataFile(s, base.where(col("k") >= 13),
        t, "data/b.parquet", Seq(1, 2)): Unit
      IFx.plantDataFile(s, base.withColumn("k", col("k") + 100),
        t, "data/c.parquet", Seq(1, 2)): Unit
      val nAll = nation.count()
      val nA = 13L
      val nB = nAll - nA
      val m1 = IFx.writeManifest(s, t, "m1.avro", Seq(
        IFx.Entry(1, "data/a.parquet", nA),
        IFx.Entry(1, "data/b.parquet", nB)))
      IFx.writeManifestList(s, t, "ml1.avro",
        Seq(("m1.avro", m1, 0, 1L)))
      val m2 = IFx.writeManifest(s, t, "m2.avro", Seq(
        IFx.Entry(0, "data/a.parquet", nA),
        IFx.Entry(2, "data/b.parquet", nB)))
      val m3 = IFx.writeManifest(s, t, "m3.avro", Seq(
        IFx.Entry(1, "data/c.parquet", nAll)))
      IFx.writeManifestList(s, t, "ml2.avro", Seq(
        ("m2.avro", m2, 0, 1L), ("m3.avro", m3, 0, 2L)))
      IFx.writeMetadata(s, t, 2, Map(0 -> schema), Seq(
        IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro")))
      // record_count metadata path + time travel both gate
      require(IcebergRead.countRows(s, t) == nA + nAll,
        "q256: metadata-only count")
      require(IcebergRead.read(s, t, snapshotId = Some(101L))
        .count() == nAll, "q256: snapshot time travel")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
        FROM nation WHERE n_nationkey < 13
        UNION ALL
        SELECT CAST(n_nationkey + 100 AS BIGINT), n_name
        FROM nation)
      ORDER BY k"""))

  // ---- q257: Avro OCF ingestion ----
  // The fourth record container (event exports, Kafka dumps, Hive-era
  // datasets): null + deflate codecs through the Avro reference
  // reader, explicit caller schema, name-resolved fields with
  // null-union unwrapping. Damage contract is STRONGER than the
  // reference reader's: Avro's DataFileStream treats a truncated
  // final block as clean EOF (silent data loss) — the engine proves
  // container integrity with a trailing-sync check and appends a loud
  // quarantine marker row, here gated as the all-null corrupt row.

  val q257 = Q(
    "q257_avro_ingest",
    (s, dir) => {
      import graft.sources.{AvroOcf, AvroOcfFixture => AFx}
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType)))
      val t = scratch(s, "q257_avro_")
      val rows = Tables(s, dir, "documents")
        .where(col("doc_id") < 30)
        .select(col("doc_id").as("id"), col("text"), col("lang"))
        .orderBy("id")
        .collect().map(r => Seq[Any](r.getLong(0), r.getString(1),
          r.getString(2))).toSeq
      AFx.write(s, t, "a.avro", schema, rows.take(15))
      AFx.write(s, t, "b.avro", schema, rows.drop(15), deflate = true)
      // damaged object: single block, truncated tail — the reference
      // reader would END CLEANLY here; the sync check must not
      AFx.write(s, t, "d.avro", schema, Seq(
        Seq[Any](900L, "lost one", "en"), Seq[Any](901L, "lost two", "de")))
      val p = new org.apache.hadoop.fs.Path(t, "d.avro")
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      val len = fs.getFileStatus(p).getLen
      val bytes = new Array[Byte](len.toInt)
      val in = fs.open(p)
      try in.readFully(0L, bytes) finally in.close()
      val out = fs.create(p, true)
      try out.write(bytes, 0, len.toInt - 8) finally out.close()
      val (good, bad) = AvroOcf.split(AvroOcf.readDir(s, t, schema))
      good.select(
          col("id"), col("lang"), md5(col("text")).as("txt_md5"),
          lit(false).as("is_corrupt"))
        .unionAll(bad.select(
          lit(null).cast("long").as("id"),
          lit(null).cast("string").as("lang"),
          lit(null).cast("string").as("txt_md5"),
          lit(true).as("is_corrupt")))
        .orderBy("is_corrupt", "id", "txt_md5")
    },
    Some("""
      SELECT * FROM (
        SELECT doc_id AS id, lang, md5(text) AS txt_md5,
               FALSE AS is_corrupt
        FROM documents WHERE doc_id < 30
        UNION ALL
        SELECT NULL, NULL, NULL, TRUE)
      ORDER BY is_corrupt, id NULLS FIRST, txt_md5"""))

  // ---- q259: Iceberg position-delete read (v2 merge-on-read) ----
  // The Iceberg twin of q252's Delta DVs: a v2 DELETE writes no data,
  // it adds a delete manifest pointing at parquet files of
  // (file_path, pos) rows. Fixture: snapshot 1 = two data files;
  // snapshot 2 adds a position-delete file masking three rows of one
  // file plus a STALE row referencing a vanished path (must be
  // harmless — immutable unique paths make sequence-number
  // bookkeeping unnecessary, the documented reasoning). Time travel
  // and the metadata-count refusal are require()-gated.

  val q259 = Q(
    "q259_iceberg_pos_deletes",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, IcebergFixture => IFx,
        IcebergRead}
      import s.implicits._
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q259_icedel")
      val schema = IFx.withFieldIds(StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType))), Seq(1, 2))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      IFx.plantDataFile(s,
        base.where(col("k") < 13).coalesce(1).sortWithinPartitions("k"),
        t, "data/a.parquet", Seq(1, 2)): Unit
      IFx.plantDataFile(s,
        base.where(col("k") >= 13).coalesce(1).sortWithinPartitions("k"),
        t, "data/b.parquet", Seq(1, 2)): Unit
      val nAll = nation.count()
      val nA = 13L
      val m1 = IFx.writeManifest(s, t, "m1.avro", Seq(
        IFx.Entry(1, "data/a.parquet", nA),
        IFx.Entry(1, "data/b.parquet", nAll - nA)))
      IFx.writeManifestList(s, t, "ml1.avro",
        Seq(("m1.avro", m1, 0, 1L)))
      // the DELETE: a.parquet positions 2, 4, 6 (= k 2, 4, 6 — the
      // file is k-sorted single-part) + one stale row
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(s.sessionState.newHadoopConf())
      val root = fs.makeQualified(new org.apache.hadoop.fs.Path(t))
      val aUri = new org.apache.hadoop.fs.Path(root, "data/a.parquet")
        .toUri.toString
      DFx.plantDataFile(s,
        Seq((aUri, 2L), (aUri, 4L), (aUri, 6L),
          (s"$root/data/vanished.parquet", 0L)).toDF("file_path", "pos"),
        t, "data/del1.parquet"): Unit
      val m2 = IFx.writeManifest(s, t, "m2.avro", Seq(
        IFx.Entry(0, "data/a.parquet", nA),
        IFx.Entry(0, "data/b.parquet", nAll - nA)))
      val md = IFx.writeManifest(s, t, "md.avro", Seq(
        IFx.Entry(1, "data/del1.parquet", 4L, content = 1)))
      IFx.writeManifestList(s, t, "ml2.avro", Seq(
        ("m2.avro", m2, 0, 1L), ("md.avro", md, 1, 2L)))
      IFx.writeMetadata(s, t, 2, Map(0 -> schema), Seq(
        IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro")))
      require(IcebergRead.read(s, t, Some(101L)).count() == nAll,
        "q259: pre-delete snapshot must be intact")
      require(
        try { IcebergRead.countRows(s, t); false }
        catch { case _: IllegalArgumentException => true },
        "q259: metadata count must refuse under merge-on-read")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      WHERE n_nationkey NOT IN (2, 4, 6)
      ORDER BY k"""))

  // ---- q260: Delta incremental (version-range) read ----
  // The streaming-source verb: consume a lake table's CHANGES since a
  // version instead of rescanning it — at 100 TB the difference
  // between one day's appends and the whole table. Three real
  // DeltaWrite appends, then readChanges(from v1) returns exactly the
  // later appends' rows tagged with their __commit_version; the
  // pure-append guard and compaction-invisibility are
  // require()-gated, the row set + version attribution hash-gated.

  val q260 = Q(
    "q260_delta_incremental",
    (s, dir) => {
      import graft.sources.{DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q260_deltainc")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      DeltaWrite.append(base.where(col("k") < 10), t): Unit // v0
      DeltaWrite.append(
        base.where(col("k") >= 10 && col("k") < 18), t): Unit // v1
      DeltaWrite.append(base.where(col("k") >= 18), t): Unit // v2
      // bounded range + full-range sanity
      require(DeltaRead.readChanges(s, t, 1, Some(1L)).count() == 8L,
        "q260: bounded range")
      require(DeltaRead.readChanges(s, t, 0).count() == nation.count(),
        "q260: full range = full table")
      DeltaRead.readChanges(s, t, fromVersion = 1)
        .orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             CAST(CASE WHEN n_nationkey < 18 THEN 1 ELSE 2 END
               AS BIGINT) AS __commit_version
      FROM nation WHERE n_nationkey >= 10
      ORDER BY k"""))

  // ---- q261: Iceberg renamed-column read (field-id resolution) ----
  // Renaming a column is Iceberg's headline feature: old data files
  // keep the OLD physical name, and the spec requires readers to
  // resolve columns by FIELD ID, never by name. Fixture: schema 0
  // names field 1 "k"; a.parquet is written under that name; schema 1
  // renames field 1 to "key_renamed" and b.parquet is written under
  // the new name. The current snapshot must read BOTH files into the
  // renamed column with correct values — a by-name reader nulls (or
  // refuses) the old file's column, so the value hash gates the id
  // resolution end-to-end. The old snapshot still reads with its own
  // schema (old name), require()-gated.

  val q261 = Q(
    "q261_iceberg_renamed_read",
    (s, dir) => {
      import graft.sources.{IcebergFixture => IFx, IcebergRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q261_icerename")
      val schema0 = IFx.withFieldIds(StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType))), Seq(1, 2))
      val schema1 = IFx.withFieldIds(StructType(Seq(
        StructField("key_renamed", LongType),
        StructField("name", StringType))), Seq(1, 2))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      IFx.plantDataFile(s, base.where(col("k") < 13),
        t, "data/a.parquet", Seq(1, 2)): Unit
      IFx.plantDataFile(s,
        base.where(col("k") >= 13).withColumnRenamed("k", "key_renamed"),
        t, "data/b.parquet", Seq(1, 2)): Unit
      val nAll = nation.count()
      val nA = 13L
      val m1 = IFx.writeManifest(s, t, "m1.avro", Seq(
        IFx.Entry(1, "data/a.parquet", nA)))
      IFx.writeManifestList(s, t, "ml1.avro",
        Seq(("m1.avro", m1, 0, 1L)))
      val m2 = IFx.writeManifest(s, t, "m2.avro", Seq(
        IFx.Entry(0, "data/a.parquet", nA, seq = Some(1L)),
        IFx.Entry(1, "data/b.parquet", nAll - nA)))
      IFx.writeManifestList(s, t, "ml2.avro",
        Seq(("m2.avro", m2, 0, 2L)))
      IFx.writeMetadata(s, t, 2, Map(0 -> schema0, 1 -> schema1), Seq(
        IFx.Snap(101L, "ml1.avro", schemaId = 0),
        IFx.Snap(202L, "ml2.avro", schemaId = 1)),
        currentSchemaId = 1)
      // the pre-rename snapshot reads under the OLD name
      val old = IcebergRead.read(s, t, Some(101L))
      require(old.schema.fieldNames.toSeq == Seq("k", "name"),
        "q261: old snapshot must read with its own schema")
      require(old.count() == nA, "q261: old snapshot row count")
      // current: both files resolve field 1 by ID into key_renamed
      IcebergRead.read(s, t).orderBy("key_renamed")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS key_renamed, n_name AS name
      FROM nation
      ORDER BY key_renamed"""))

  // ---- q262: Iceberg equality-delete read ----
  // Flink/CDC-written v2 tables are equality-delete heavy: a delete
  // file carries VALUES of its equality_ids columns, deleting any
  // matching row in data files with a STRICTLY SMALLER data sequence
  // number. Fixture: seq-1 data (a+b), a seq-2 delete on k {1,3,5}
  // (with a duplicate row and a stale k=999 — both must be harmless),
  // a seq-2 delete keyed on a DIFFERENT column set (name, deleting
  // k=20's name), and a seq-3 re-insert of k=3 that must SURVIVE the
  // earlier delete (the strict < rule). Expected: all nation rows
  // except k in {1,5,20}, with k=3 present exactly once (deleted,
  // then re-inserted).

  val q262 = Q(
    "q262_iceberg_eq_deletes",
    (s, dir) => {
      import graft.sources.{IcebergFixture => IFx, IcebergRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q262_iceeq")
      val schema = IFx.withFieldIds(StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType))), Seq(1, 2))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      IFx.plantDataFile(s, base.where(col("k") < 13),
        t, "data/a.parquet", Seq(1, 2)): Unit
      IFx.plantDataFile(s, base.where(col("k") >= 13),
        t, "data/b.parquet", Seq(1, 2)): Unit
      // delete files: k-keyed (ids [1]) with duplicate + stale rows;
      // name-keyed (ids [2]) deleting nation 20's name
      val delK = base.where(col("k").isin(1L, 3L, 5L))
        .select(col("k"))
        .unionByName(s.range(1).select(lit(3L).as("k"))) // duplicate
        .unionByName(s.range(1).select(lit(999L).as("k"))) // stale
      IFx.plantDataFile(s, delK, t, "data/eqdel_k.parquet", Seq(1))
      val delName = base.where(col("k") === 20L).select(col("name"))
      IFx.plantDataFile(s, delName, t, "data/eqdel_name.parquet", Seq(2))
      // seq-3 re-insert of k=3 (survives the seq-2 delete: 3 is NOT
      // strictly smaller than 2... it is the delete that is older)
      IFx.plantDataFile(s, base.where(col("k") === 3L),
        t, "data/c.parquet", Seq(1, 2)): Unit
      val nAll = nation.count()
      val nA = 13L
      val m1 = IFx.writeManifest(s, t, "m1.avro", Seq(
        IFx.Entry(1, "data/a.parquet", nA),
        IFx.Entry(1, "data/b.parquet", nAll - nA)))
      IFx.writeManifestList(s, t, "ml1.avro",
        Seq(("m1.avro", m1, 0, 1L)))
      val m2 = IFx.writeManifest(s, t, "m2.avro", Seq(
        IFx.Entry(0, "data/a.parquet", nA, seq = Some(1L)),
        IFx.Entry(0, "data/b.parquet", nAll - nA, seq = Some(1L))))
      val me = IFx.writeManifest(s, t, "me.avro", Seq(
        IFx.Entry(1, "data/eqdel_k.parquet", 5L, content = 2,
          equalityIds = Seq(1)),
        IFx.Entry(1, "data/eqdel_name.parquet", 1L, content = 2,
          equalityIds = Seq(2))))
      val m3 = IFx.writeManifest(s, t, "m3.avro", Seq(
        IFx.Entry(1, "data/c.parquet", 1L)))
      IFx.writeManifestList(s, t, "ml2.avro", Seq(
        ("m2.avro", m2, 0, 1L), ("me.avro", me, 1, 2L)))
      IFx.writeManifestList(s, t, "ml3.avro", Seq(
        ("m2.avro", m2, 0, 1L), ("me.avro", me, 1, 2L),
        ("m3.avro", m3, 0, 3L)))
      IFx.writeMetadata(s, t, 3, Map(0 -> schema), Seq(
        IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro"),
        IFx.Snap(303L, "ml3.avro")))
      // pre-delete snapshot intact; metadata count refuses under MOR
      require(IcebergRead.read(s, t, Some(101L)).count() == nAll,
        "q262: pre-delete snapshot must be intact")
      require(IcebergRead.read(s, t, Some(202L)).count() == nAll - 4,
        "q262: post-delete pre-reinsert count")
      require(
        try { IcebergRead.countRows(s, t); false }
        catch { case _: IllegalArgumentException => true },
        "q262: metadata count must refuse under merge-on-read")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      WHERE n_nationkey NOT IN (1, 5, 20)
      ORDER BY k"""))

  // ---- q263: Delta change-data-feed read ----
  // readChanges (q260) covers pure appends; real downstream consumers
  // poll MERGE/UPDATE commits too — that takes the change-data-feed.
  // Fixture: a CDF-enabled table (writer v4 + delta.
  // enableChangeDataFeed=true), one append, then the repo's own
  // DeltaWrite.merge (2 updates, 1 insert, 1 delete) which WRITES the
  // cdc files + actions; readCdf replays v0 as derived inserts and v1
  // from its cdc files — per-row _change_type/_commit_version
  // attribution hash-gated. readChanges refusing the same commit is
  // require()-gated (the two consumers are complements).

  val q263 = Q(
    "q263_delta_cdf",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q263_deltacdf")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      val a = DFx.plantDataFile(s, base, t, "a.parquet")
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolLine(minWriter = 4),
        DFx.metaDataLine("q263-fixture", schema,
          configuration = Map("delta.enableChangeDataFeed" -> "true")),
        DFx.addLine("a.parquet", a)))
      // the merge: update names of k 2 and 4, delete k 7, insert 200
      val updates = base.where(col("k").isin(2L, 4L))
        .withColumn("name", concat(col("name"), lit("_v2")))
        .withColumn("__del", lit(false))
        .unionByName(s.range(1).select(
          lit(200L).as("k"), lit("NEWROW").as("name"),
          lit(false).as("__del")))
        .unionByName(base.where(col("k") === 7L)
          .withColumn("__del", lit(true)))
      val v = DeltaWrite.merge(updates, t, keyCols = Seq("k"),
        deleteCol = Some("__del"))
      require(v == 1L, "q263: merge version")
      // the append-only consumer refuses the merge commit...
      require(
        try { DeltaRead.readChanges(s, t, 0).count(); false }
        catch { case _: IllegalArgumentException => true },
        "q263: readChanges must refuse the update-shape commit")
      // ...and the CDF consumer replays it: 2 pre + 2 post + 1 del +
      // 1 ins
      require(DeltaRead.readCdf(s, t, 1).count() == 6L,
        "q263: merge commit change-row count")
      DeltaRead.readCdf(s, t, 0)
        .orderBy("_commit_version", "_change_type", "k")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
               'insert' AS _change_type,
               CAST(0 AS BIGINT) AS _commit_version
        FROM nation
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT), n_name,
               'update_preimage', CAST(1 AS BIGINT)
        FROM nation WHERE n_nationkey IN (2, 4)
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT), n_name || '_v2',
               'update_postimage', CAST(1 AS BIGINT)
        FROM nation WHERE n_nationkey IN (2, 4)
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT), n_name,
               'delete', CAST(1 AS BIGINT)
        FROM nation WHERE n_nationkey = 7
        UNION ALL
        SELECT CAST(200 AS BIGINT), 'NEWROW', 'insert',
               CAST(1 AS BIGINT))
      ORDER BY _commit_version, _change_type, k"""))

  // ---- q264: Delta column-mapping mode=id read ----
  // Tables column-mapped FROM BIRTH by some engines use id mode: the
  // reader must resolve columns by parquet footer FIELD ID against
  // the schemaString's delta.columnMapping.id — physical column
  // NAMES are free to differ per file. Fixture: two data files with
  // the same field ids but DIFFERENT physical column names (spec-
  // legal under id mode); a by-name or by-physicalName reader cannot
  // read both — the value hash gates true id resolution.

  val q264 = Q(
    "q264_delta_id_mapping",
    (s, dir) => {
      import org.apache.spark.sql.types.MetadataBuilder
      import graft.sources.{DeltaFixture => DFx,
        IcebergFixture => IFx, DeltaRead}
      def mf(name: String, dt: org.apache.spark.sql.types.DataType,
          phys: String, id: Long) =
        StructField(name, dt, nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", phys)
            .putLong("delta.columnMapping.id", id).build())
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q264_deltaid")
      // file a: physical names col-4b1/col-9f2; file b: x1/x2 — SAME
      // field ids (1, 2). Footer ids ride in via the Iceberg
      // fixture's id-tagged planting (the parquet mechanics are
      // format-agnostic).
      val baseA = nation.where(col("n_nationkey") < 13).select(
        col("n_nationkey").cast("long").as("col-4b1"),
        col("n_name").as("col-9f2"))
      val baseB = nation.where(col("n_nationkey") >= 13).select(
        col("n_nationkey").cast("long").as("x1"),
        col("n_name").as("x2"))
      val a = IFx.plantDataFile(s, baseA, t, "a.parquet", Seq(1, 2))
      val b = IFx.plantDataFile(s, baseB, t, "b.parquet", Seq(1, 2))
      val schema = StructType(Seq(
        mf("k", LongType, "col-4b1", 1),
        mf("name", StringType, "col-9f2", 2)))
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolLine(minReader = 2, minWriter = 5),
        DFx.metaDataLine("q264-fixture", schema,
          configuration = Map(
            "delta.columnMapping.mode" -> "id",
            "delta.columnMapping.maxColumnId" -> "2")),
        DFx.addLine("a.parquet", a),
        DFx.addLine("b.parquet", b)))
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      ORDER BY k"""))

  // ---- q265: Delta time travel by TIMESTAMP ----
  // Humans time-travel by instant, not version number. Resolution:
  // the latest commit whose commitInfo.timestamp (file mtime
  // fallback, monotonicity-adjusted) is at or before the instant —
  // fixture commits carry planted timestamps 1000/2000/3000, the
  // gate reads the table as of 2500 (= version 1's state);
  // boundary/refusal semantics require()-gated.

  val q265 = Q(
    "q265_delta_ts_travel",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q265_deltats")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      def ci(ts: Long) =
        s"""{"commitInfo":{"timestamp":$ts,"operation":"fixture"}}"""
      val a = DFx.plantDataFile(s, base.where(col("k") < 10),
        t, "a.parquet")
      val b = DFx.plantDataFile(s,
        base.where(col("k") >= 10 && col("k") < 18), t, "b.parquet")
      val c = DFx.plantDataFile(s, base.where(col("k") >= 18),
        t, "c.parquet")
      DFx.writeCommit(s, t, 0, Seq(ci(1000L),
        DFx.protocolLine(), DFx.metaDataLine("q265-fixture", schema),
        DFx.addLine("a.parquet", a)))
      DFx.writeCommit(s, t, 1, Seq(ci(2000L),
        DFx.addLine("b.parquet", b)))
      DFx.writeCommit(s, t, 2, Seq(ci(3000L),
        DFx.addLine("c.parquet", c)))
      require(DeltaRead.versionAt(s, t, 1000L) == 0L &&
        DeltaRead.versionAt(s, t, 2999L) == 1L &&
        DeltaRead.versionAt(s, t, 99999L) == 2L,
        "q265: boundary resolution")
      require(
        try { DeltaRead.versionAt(s, t, 999L); false }
        catch { case _: IllegalArgumentException => true },
        "q265: pre-table instants must refuse")
      DeltaRead.readAsOfTimestamp(s, t, 2500L).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation WHERE n_nationkey < 18
      ORDER BY k"""))

  // ---- q266: Iceberg time travel by TIMESTAMP ----
  // The Iceberg twin of q265: snapshots carry timestamp-ms; the gate
  // reads the table as of an instant between the two snapshots.

  val q266 = Q(
    "q266_iceberg_ts_travel",
    (s, dir) => {
      import graft.sources.{IcebergFixture => IFx, IcebergRead}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q266_icets")
      val schema = IFx.withFieldIds(StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType))), Seq(1, 2))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      IFx.plantDataFile(s, base.where(col("k") < 13),
        t, "data/a.parquet", Seq(1, 2)): Unit
      IFx.plantDataFile(s, base.where(col("k") >= 13),
        t, "data/b.parquet", Seq(1, 2)): Unit
      val nAll = nation.count()
      val nA = 13L
      val m1 = IFx.writeManifest(s, t, "m1.avro", Seq(
        IFx.Entry(1, "data/a.parquet", nA)))
      IFx.writeManifestList(s, t, "ml1.avro",
        Seq(("m1.avro", m1, 0, 1L)))
      val m2 = IFx.writeManifest(s, t, "m2.avro", Seq(
        IFx.Entry(0, "data/a.parquet", nA),
        IFx.Entry(1, "data/b.parquet", nAll - nA)))
      IFx.writeManifestList(s, t, "ml2.avro",
        Seq(("m2.avro", m2, 0, 2L)))
      // Snap default timestamp ladder: 1000, 2000
      IFx.writeMetadata(s, t, 2, Map(0 -> schema), Seq(
        IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro")))
      require(IcebergRead.snapshotIdAt(s, t, 1999L) == 101L &&
        IcebergRead.snapshotIdAt(s, t, 2000L) == 202L,
        "q266: boundary resolution")
      require(
        try { IcebergRead.snapshotIdAt(s, t, 999L); false }
        catch { case _: IllegalArgumentException => true },
        "q266: pre-table instants must refuse")
      IcebergRead.readAsOfTimestamp(s, t, 1500L).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation WHERE n_nationkey < 13
      ORDER BY k"""))

  // ---- q267: transactional Iceberg APPEND write ----
  // The produce-side gap: the engine wrote Delta but was read-only on
  // Iceberg. IcebergWrite.append creates the table (v2 metadata,
  // footer field ids, real Avro manifests) and appends with the
  // create-exclusive metadata-version commit; the gate round-trips
  // two appends through the repo's own reader — content hash-gated,
  // metadata-only count + snapshot time travel require()-gated.

  val q267 = Q(
    "q267_iceberg_write",
    (s, dir) => {
      import graft.sources.{IcebergRead, IcebergWrite}
      val nation = Tables(s, dir, "nation")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      val t = scratch(s, "q267_icewrite")
      require(IcebergWrite.append(base.where(col("k") < 13), t) == 1L,
        "q267: create snapshot id")
      require(IcebergWrite.append(base.where(col("k") >= 13), t) == 2L,
        "q267: append snapshot id")
      require(IcebergRead.countRows(s, t) == nation.count(),
        "q267: metadata-only count over written record_count stats")
      require(IcebergRead.read(s, t, Some(1L)).count() == 13L,
        "q267: snapshot time travel over written history")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      ORDER BY k"""))

  // ---- q268: Delta RESTORE ----
  // The undo verb: revert the table to an earlier version as a NEW
  // commit — history stays time-travelable, nothing is rewritten
  // (removes for files the target lacks, verbatim re-adds for files
  // it had). Fixture: append all nation, merge mutates (2 updates,
  // 1 delete, 1 insert), restore to v0 — the read must be the
  // ORIGINAL content; the merge state staying reachable at v1 is
  // require()-gated, as is the vacuumed-target refusal elsewhere
  // (spec).

  val q268 = Q(
    "q268_delta_restore",
    (s, dir) => {
      import graft.sources.{DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q268_deltarestore")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      DeltaWrite.append(base, t): Unit // v0
      val updates = base.where(col("k").isin(2L, 4L))
        .withColumn("name", concat(col("name"), lit("_v2")))
        .withColumn("__del", lit(false))
        .unionByName(s.range(1).select(
          lit(300L).as("k"), lit("NEW").as("name"),
          lit(false).as("__del")))
        .unionByName(base.where(col("k") === 7L)
          .withColumn("__del", lit(true)))
      require(DeltaWrite.merge(updates, t, Seq("k"),
        deleteCol = Some("__del")) == 1L, "q268: merge version")
      require(DeltaWrite.restore(s, t, 0L) == 2L, "q268: restore version")
      // the merge state is STILL time travel-reachable
      require(DeltaRead.read(s, t, asOf = Some(1L)).count() ==
        nation.count(), "q268: in-between state reachable")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      ORDER BY k"""))

  // ---- q269: Delta OPTIMIZE (bin-packing compaction) ----
  // The maintenance verb every 100 TB table needs daily: small live
  // files rewrite into few, committed as dataChange=false remove/add
  // pairs so incremental consumers (q260 readChanges, q263 readCdf)
  // stay blind — bytes moved, data didn't. Stats re-collect so the
  // metadata count and zone-map pruning survive; content equality is
  // the hash gate.

  val q269 = Q(
    "q269_delta_optimize",
    (s, dir) => {
      import graft.sources.{DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q269_deltaopt")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      DeltaWrite.append(base.repartition(8), t): Unit // 8 small files
      val before = DeltaRead.snapshot(s, t).liveFiles.size
      val rep = DeltaWrite.optimize(s, t)
      require(rep.rewrittenFiles == before.toLong &&
        DeltaRead.snapshot(s, t).liveFiles.size < before,
        "q269: compaction must shrink the live file count")
      // incremental consumers see NOTHING from the optimize commit
      require(DeltaRead.readChanges(s, t, 1, Some(1L)).count() == 0L,
        "q269: readChanges must be blind to compaction")
      require(DeltaRead.readCdf(s, t, 1, Some(1L)).count() == 0L,
        "q269: readCdf must be blind to compaction")
      // stats survived the rewrite: metadata-only count still works
      require(DeltaRead.countRows(s, t) == nation.count(),
        "q269: stats re-collected")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      ORDER BY k"""))

  // ---- q270: Iceberg snapshot expiration ----
  // The Iceberg vacuum twin: expire old snapshots, commit the
  // shrunken metadata (create-exclusive), THEN garbage-collect
  // everything reachable only from expired snapshots — expired-only
  // data files, unreferenced manifests, manifest lists. Kept
  // snapshots stay whole (shared files survive); expired ids stop
  // resolving, require()-gated; surviving content is the hash gate.

  val q270 = Q(
    "q270_iceberg_expire",
    (s, dir) => {
      import graft.sources.{IcebergFixture => IFx, IcebergRead,
        IcebergWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q270_iceexpire")
      val schema = IFx.withFieldIds(StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType))), Seq(1, 2))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      IFx.plantDataFile(s, base.where(col("k") < 13),
        t, "data/a.parquet", Seq(1, 2)): Unit
      IFx.plantDataFile(s, base.where(col("k") >= 13),
        t, "data/b.parquet", Seq(1, 2)): Unit
      IFx.plantDataFile(s, base.withColumn("k", col("k") + 100),
        t, "data/c.parquet", Seq(1, 2)): Unit
      val nAll = nation.count()
      val nA = 13L
      // snap 1 = {a, b}; snap 2 = {a EXISTING, b DELETED, c ADDED}
      val m1 = IFx.writeManifest(s, t, "m1.avro", Seq(
        IFx.Entry(1, "data/a.parquet", nA),
        IFx.Entry(1, "data/b.parquet", nAll - nA)))
      IFx.writeManifestList(s, t, "ml1.avro",
        Seq(("m1.avro", m1, 0, 1L)))
      val m2 = IFx.writeManifest(s, t, "m2.avro", Seq(
        IFx.Entry(0, "data/a.parquet", nA, seq = Some(1L)),
        IFx.Entry(2, "data/b.parquet", nAll - nA)))
      val m3 = IFx.writeManifest(s, t, "m3.avro", Seq(
        IFx.Entry(1, "data/c.parquet", nAll)))
      IFx.writeManifestList(s, t, "ml2.avro", Seq(
        ("m2.avro", m2, 0, 1L), ("m3.avro", m3, 0, 2L)))
      IFx.writeMetadata(s, t, 1, Map(0 -> schema), Seq(
        IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro")))
      val rep = IcebergWrite.expireSnapshots(s, t, keepLast = 1)
      require(rep.expiredSnapshots == Seq(101L) &&
        rep.deletedFiles == 3L, // b.parquet, ml1.avro, m1.avro
        s"q270: expected exactly the expired-only files gone, got $rep")
      require(IcebergRead.snapshots(s, t) == Seq(202L),
        "q270: expired id must stop resolving")
      require(
        try { IcebergRead.read(s, t, Some(101L)); false }
        catch { case _: IllegalArgumentException => true },
        "q270: expired snapshot read must refuse")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT * FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
        FROM nation WHERE n_nationkey < 13
        UNION ALL
        SELECT CAST(n_nationkey + 100 AS BIGINT), n_name
        FROM nation)
      ORDER BY k"""))

  // ---- q271: Delta DELETE via deletion vectors ----
  // The DML write side of q252's DV read: a DELETE attaches per-file
  // roaring bitmaps instead of rewriting files. DV authoring is
  // DISTRIBUTED (matched rows group by file, each task serializes +
  // writes its file's sidecar; only log-grain descriptors reach the
  // driver); a second delete MERGES with the first file's existing
  // DV; survivors are the hash gate, the metadata count and
  // no-rewrite property require()-gated.

  val q271 = Q(
    "q271_delta_dv_delete",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q271_dvdelete")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      val nAll = nation.count()
      val nA = 13L
      val a = DFx.plantDataFile(s, base.where(col("k") < 13),
        t, "a.parquet")
      val b = DFx.plantDataFile(s, base.where(col("k") >= 13),
        t, "b.parquet")
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolFeaturesLine(3, 7,
          Seq("deletionVectors"), Seq("deletionVectors")),
        DFx.metaDataLine("q271-fixture", schema),
        DFx.addLine("a.parquet", a,
          stats = Some(DFx.statsJson(nA, Map("k" -> ((0L, 12L)))))),
        DFx.addLine("b.parquet", b,
          stats = Some(DFx.statsJson(nAll - nA,
            Map("k" -> ((13L, nAll - 1))))))))
      val r1 = DeltaWrite.deleteWhere(s, t, col("k").isin(1L, 3L, 20L))
      require(r1.deletedRows == 3L && r1.filesTouched == 2L &&
        r1.filesFullyRemoved == 0L, s"q271: first delete $r1")
      // second delete MERGES with file a's existing DV
      val r2 = DeltaWrite.deleteWhere(s, t, col("k") === 5L)
      require(r2.deletedRows == 1L, s"q271: merge delete $r2")
      // nothing was rewritten: the ORIGINAL two data files are still
      // the live set
      require(DeltaRead.snapshot(s, t).liveFiles.map(_.path).sorted ==
        Seq("a.parquet", "b.parquet"), "q271: no rewrite")
      require(DeltaRead.countRows(s, t) == nAll - 4,
        "q271: metadata count subtracts DV cardinality")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      WHERE n_nationkey NOT IN (1, 3, 5, 20)
      ORDER BY k"""))

  // ---- q272: Iceberg DELETE via position-delete files ----
  // The DML write side of q259's position-delete read: matched rows
  // become spec-verbatim (file_path, pos) delete parquet committed as
  // a content=1 delete manifest in a new snapshot — no data rewrite,
  // history intact, deletes accumulate, and a LATER re-insert of a
  // deleted key is untouched (position deletes target the original
  // file only).

  val q272 = Q(
    "q272_iceberg_delete",
    (s, dir) => {
      import graft.sources.{IcebergRead, IcebergWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q272_icedelete")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      require(IcebergWrite.append(base, t) == 1L, "q272: create")
      require(IcebergWrite.deleteWhere(s, t,
        col("k").isin(2L, 4L, 6L)) == 2L, "q272: delete snapshot")
      // re-insert k=4 AFTER the delete: must survive
      require(IcebergWrite.append(base.where(col("k") === 4L), t) == 3L,
        "q272: re-insert")
      require(IcebergRead.read(s, t, Some(1L)).count() == nation.count(),
        "q272: pre-delete history intact")
      require(
        try { IcebergRead.countRows(s, t); false }
        catch { case _: IllegalArgumentException => true },
        "q272: metadata count refuses under merge-on-read")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      WHERE n_nationkey NOT IN (2, 6)
      ORDER BY k"""))

  // ---- q273: Delta UPDATE via deletion vectors ----
  // Completes the DV DML triangle (DELETE q271, MERGE q239): matched
  // rows get DV-masked in their original files and their UPDATED
  // images append as new data files in ONE commit — untouched rows
  // never rewrite. The CDF feed carries update_preimage/postimage
  // rows from the same commit, require()-gated; updated content is
  // the hash gate.

  val q273 = Q(
    "q273_delta_dv_update",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q273_dvupdate")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      val nAll = nation.count()
      val a = DFx.plantDataFile(s, base, t, "a.parquet")
      val metaLine = DFx.metaDataLine("q273-fixture", schema,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolFeaturesLine(3, 7,
          Seq("deletionVectors"), Seq("deletionVectors")),
        metaLine,
        DFx.addLine("a.parquet", a,
          stats = Some(DFx.statsJson(nAll, Map("k" -> ((0L, nAll - 1))))))))
      val rep = DeltaWrite.updateWhere(s, t,
        col("k").isin(2L, 4L, 17L),
        Map("name" -> concat(col("name"), lit("_u"))))
      require(rep.updatedRows == 3L && rep.filesTouched == 1L,
        s"q273: $rep")
      // the original file is still live, DV'd — no rewrite
      require(DeltaRead.snapshot(s, t).liveFiles
        .exists(f => f.path == "a.parquet" && f.dv.nonEmpty),
        "q273: original file must stay, DV-masked")
      // the CDF feed from the SAME commit carries pre+post images
      require(DeltaRead.readCdf(s, t, 1).count() == 6L,
        "q273: cdc pre/post rows")
      require(DeltaRead.countRows(s, t) == nAll,
        "q273: metadata count unchanged by an update")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k,
             CASE WHEN n_nationkey IN (2, 4, 17)
               THEN n_name || '_u' ELSE n_name END AS name
      FROM nation
      ORDER BY k"""))

  // ---- q274: Iceberg PARTITIONED append + partition-pruned read ----
  // The produce-side partitioning real Iceberg tables almost always
  // carry: identity spec in the metadata, every data file holds ONE
  // partition tuple AND contains the partition column (Iceberg's
  // physical shape — unlike Hive/Delta), manifest entries carry the
  // partition record, and readPruned skips non-matching files at the
  // MANIFEST walk (require()-gated file-level skip, not a post-scan
  // filter). The pruned segment's content is the hash gate.

  val q274 = Q(
    "q274_iceberg_partitioned_write",
    (s, dir) => {
      import graft.sources.{IcebergRead, IcebergWrite}
      val customer = Tables(s, dir, "customer")
      val t = scratch(s, "q274_icepart")
      val base = customer.select(
        col("c_custkey").cast("long").as("k"),
        col("c_mktsegment").as("segment"))
      require(IcebergWrite.append(base, t,
        partitionBy = Seq("segment")) == 1L, "q274: create")
      // second append through the same spec
      require(IcebergWrite.append(base.limit(0), t,
        partitionBy = Seq("segment")) == 2L, "q274: empty append")
      val snap = IcebergRead.snapshot(s, t)
      val segFiles = snap.liveFiles.groupBy(_.partition("segment"))
      require(segFiles.size >= 2, "q274: multiple partitions written")
      // the prune SKIPS files at the manifest walk
      require(segFiles("BUILDING").size < snap.liveFiles.size,
        "q274: pruned file set must be strictly smaller")
      // full read still whole (partition col lives IN the files)
      require(IcebergRead.read(s, t).count() == customer.count(),
        "q274: full read")
      require(IcebergRead.countRows(s, t) == customer.count(),
        "q274: metadata-only count")
      // eq-delete upsert refuses on partitioned tables (the reader
      // refuses partition-scoped equality deletes)
      require(
        try {
          IcebergWrite.upsert(base.limit(1), t, Seq("k")); false
        } catch { case _: IllegalArgumentException => true },
        "q274: upsert must refuse on a partitioned table")
      IcebergRead.readPruned(s, t, Map("segment" -> "BUILDING"))
        .orderBy("k")
    },
    Some("""
      SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS segment
      FROM customer
      WHERE c_mktsegment = 'BUILDING'
      ORDER BY k"""))

  // ---- q275: Iceberg UPSERT via equality-delete files ----
  // The CDC-ingest produce shape (Flink-style): each batch is ONE
  // snapshot carrying an equality-delete manifest on the key columns
  // plus the batch's data manifest at the SAME new sequence number —
  // the spec's strict data_seq < delete_seq rule masks only OLDER
  // rows. Two batches including a delete and a RE-INSERT of the
  // deleted key prove the rule end-to-end through the repo's own
  // eq-delete reader; final content is the hash gate.

  val q275 = Q(
    "q275_iceberg_upsert",
    (s, dir) => {
      import graft.sources.{IcebergRead, IcebergWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q275_iceupsert")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      require(IcebergWrite.append(base.where(col("k") < 20), t) == 1L,
        "q275: create")
      val b1 = s.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(2L, "A2", false),
        org.apache.spark.sql.Row(4L, "A4", false),
        org.apache.spark.sql.Row(7L, "gone", true),
        org.apache.spark.sql.Row(300L, "N300", false)),
        StructType(Seq(StructField("k", LongType),
          StructField("name", StringType),
          StructField("__del", BooleanType))))
      require(IcebergWrite.upsert(b1, t, Seq("k"),
        deleteCol = Some("__del")) == 2L, "q275: batch 1")
      require(IcebergRead.read(s, t).where(col("k") === 7L).isEmpty,
        "q275: k=7 deleted after batch 1")
      val b2 = s.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(7L, "BACK7", false),
        org.apache.spark.sql.Row(2L, "B2", false)),
        b1.schema)
      require(IcebergWrite.upsert(b2, t, Seq("k"),
        deleteCol = Some("__del")) == 3L, "q275: batch 2 (re-insert)")
      // pre-upsert history still reads whole
      require(IcebergRead.read(s, t, Some(1L)).count() == 20L,
        "q275: history intact")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT k, name FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k,
               CASE WHEN n_nationkey = 2 THEN 'B2'
                    WHEN n_nationkey = 4 THEN 'A4'
                    WHEN n_nationkey = 7 THEN 'BACK7'
                    ELSE n_name END AS name
        FROM nation WHERE n_nationkey < 20
        UNION ALL
        SELECT CAST(300 AS BIGINT), 'N300')
      ORDER BY k"""))

  // ---- q276: Iceberg delete-compaction (rewrite data files) ----
  // The OPTIMIZE twin of q269 for the other lake format: data files
  // masked by position deletes rewrite WITH the deletes applied and
  // every delete file drops in the same snapshot — scans stop paying
  // the merge-on-read anti-join, metadata-only counts work again
  // (require()-gated), untouched files carry forward as EXISTING
  // entries, and older snapshots stay time-travelable. Post-rewrite
  // content is the hash gate (must equal the pre-rewrite live rows).

  val q276 = Q(
    "q276_iceberg_rewrite",
    (s, dir) => {
      import graft.sources.{IcebergRead, IcebergWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q276_icerewrite")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      require(IcebergWrite.append(base.where(col("k") < 13), t) == 1L,
        "q276: create")
      require(IcebergWrite.append(base.where(col("k") >= 13), t) == 2L,
        "q276: second file set")
      require(IcebergWrite.deleteWhere(s, t,
        col("k").isin(2L, 4L, 17L)) == 3L, "q276: delete")
      val before = IcebergRead.snapshot(s, t)
      require(before.deleteFiles.nonEmpty, "q276: MOR state exists")
      val rep = IcebergWrite.rewriteDataFiles(s, t)
      require(rep.droppedDeleteFiles == before.deleteFiles.size.toLong &&
        rep.version.nonEmpty, s"q276: $rep")
      val after = IcebergRead.snapshot(s, t)
      require(after.deleteFiles.isEmpty && after.eqDeleteFiles.isEmpty,
        "q276: zero delete files after rewrite")
      // the metadata-only count path works again post-compaction
      require(IcebergRead.countRows(s, t) == nation.count() - 3,
        "q276: metadata count restored")
      // pre-delete history still whole
      require(IcebergRead.read(s, t, Some(2L)).count() == nation.count(),
        "q276: time travel intact")
      // nothing left to rewrite
      require(IcebergWrite.rewriteDataFiles(s, t).version.isEmpty,
        "q276: idempotent")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      WHERE n_nationkey NOT IN (2, 4, 17)
      ORDER BY k"""))

  // ---- q278: Delta table-feature UPGRADE (enableFeature) ----
  // The "ALTER TABLE enable feature" verb: an ORDINARY table (born
  // minWriter=2) upgrades to v7 with deletionVectors declared —
  // protocol lists the legacy obligations the old version implied —
  // and the DV DML verbs work on it immediately (q271/q273 needed
  // fixture-born tables before this). Idempotence and the
  // post-upgrade append are require()-gated; post-DML content is the
  // hash gate.

  val q278 = Q(
    "q278_delta_feature_upgrade",
    (s, dir) => {
      import graft.sources.{DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q278_upgrade")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      require(DeltaWrite.append(base, t) == 0L, "q278: create")
      // pre-upgrade: DV DML refuses
      require(
        try { DeltaWrite.deleteWhere(s, t, col("k") === 1L); false }
        catch { case _: IllegalArgumentException => true },
        "q278: DV DML must refuse before the upgrade")
      require(DeltaWrite.enableFeature(s, t, "deletionVectors") == 1L,
        "q278: upgrade commit")
      require(DeltaWrite.enableFeature(s, t, "deletionVectors") == 1L,
        "q278: idempotent (no empty commits)")
      val rep = DeltaWrite.deleteWhere(s, t, col("k").isin(2L, 4L))
      require(rep.deletedRows == 2L, s"q278: $rep")
      // ordinary writes still pass the upgraded gate
      require(DeltaWrite.append(base.where(col("k") === 2L), t) == 3L,
        "q278: post-upgrade append")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
      FROM nation
      WHERE n_nationkey <> 4
      ORDER BY k"""))

  // ---- q279: Delta CHECK-constraint enforcement ----
  // Writer v3's obligation HONORED instead of refused: a table
  // declaring delta.constraints.* accepts conforming writes and
  // refuses violating ones loudly (per-constraint aggregate over the
  // fresh rows only — never a table rescan). The refusal, its
  // atomicity (nothing lands), and survival through appendEvolve are
  // require()-gated; surviving content is the hash gate.

  val q279 = Q(
    "q279_delta_check_constraints",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q279_check")
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType)))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      val a = DFx.plantDataFile(s, base, t, "a.parquet")
      val metaLine = DFx.metaDataLine("q279-fixture", schema)
        .replace("\"configuration\":{}",
          "\"configuration\":{\"delta.constraints.kpos\":\"k >= 0\"}")
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolLine(minWriter = 3),
        metaLine,
        DFx.addLine("a.parquet", a)))
      // conforming append commits
      require(DeltaWrite.append(base.where(col("k") === 0L)
        .withColumn("k", col("k") + 1000), t) == 1L,
        "q279: conforming append")
      // violating append refuses LOUDLY and atomically
      require(
        try {
          DeltaWrite.append(base.limit(2)
            .withColumn("k", col("k") - 9999), t); false
        } catch {
          case e: IllegalArgumentException =>
            e.getMessage.contains("CHECK constraint 'kpos'")
        },
        "q279: violating append must refuse with the constraint name")
      // the constraint SURVIVES schema evolution (configuration
      // carried through the metaData replacement)
      require(DeltaWrite.appendEvolve(base.where(col("k") === 1L)
        .withColumn("extra", lit("x")), t) == 2L, "q279: evolve")
      require(
        try {
          DeltaWrite.append(base.limit(1)
            .withColumn("k", lit(-5L)).withColumn("extra", lit("y")),
            t); false
        } catch {
          case e: IllegalArgumentException =>
            e.getMessage.contains("CHECK constraint 'kpos'")
        },
        "q279: post-evolution writes still enforce")
      DeltaRead.read(s, t).select("k", "name").orderBy("k")
    },
    Some("""
      SELECT k, name FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name
        FROM nation
        UNION ALL
        SELECT CAST(1000 AS BIGINT), n_name FROM nation
        WHERE n_nationkey = 0
        UNION ALL
        SELECT CAST(1 AS BIGINT), n_name FROM nation
        WHERE n_nationkey = 1)
      ORDER BY k"""))

  // ---- q280: Iceberg incremental (snapshot-range) read ----
  // The q260 twin for the other lake format — the same semantics real
  // engines give start-snapshot-id: rows ADDED after a snapshot
  // (exclusive) up to another (inclusive), tagged `__snapshot_id` by
  // file-set difference between consecutive snapshots. Strict
  // pure-append: a snapshot introducing delete files or dropping live
  // files refuses loudly (require()-gated on a DML'd twin table);
  // version attribution is the hash gate.

  val q280 = Q(
    "q280_iceberg_incremental",
    (s, dir) => {
      import graft.sources.{IcebergRead, IcebergWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q280_iceinc")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      require(IcebergWrite.append(base.where(col("k") < 10), t) == 1L,
        "q280: snap 1")
      require(IcebergWrite.append(
        base.where(col("k") >= 10 && col("k") < 18), t) == 2L,
        "q280: snap 2")
      require(IcebergWrite.append(base.where(col("k") >= 18), t) == 3L,
        "q280: snap 3")
      // bounded range
      require(IcebergRead.readIncremental(s, t, 1L, Some(2L))
        .count() == 8L, "q280: bounded range")
      // a DML'd table refuses mid-range (deletes cannot attribute)
      val t2 = scratch(s, "q280_dml")
      require(IcebergWrite.append(base.where(col("k") < 5), t2) == 1L,
        "q280: dml twin")
      IcebergWrite.deleteWhere(s, t2, col("k") === 1L): Unit
      require(
        try { IcebergRead.readIncremental(s, t2, 1L); false }
        catch { case _: IllegalArgumentException => true },
        "q280: delete-introducing snapshot must refuse")
      IcebergRead.readIncremental(s, t, 1L).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             CAST(CASE WHEN n_nationkey < 18 THEN 2 ELSE 3 END
               AS BIGINT) AS __snapshot_id
      FROM nation WHERE n_nationkey >= 10
      ORDER BY k"""))

  // ---- q283: Iceberg schema-evolution append ----
  // The q241 (Delta appendEvolve) twin through Iceberg's own
  // mechanism: new columns take FRESH field ids, a new schema joins
  // the metadata under the next schema-id, and historical files read
  // the new columns as NULL under field-id resolution (their footers
  // carry ids; the new ids are simply absent). Past snapshots keep
  // reading under THEIR schema-id, require()-gated; the evolved full
  // read with nulls is the hash gate.

  val q283 = Q(
    "q283_iceberg_evolve",
    (s, dir) => {
      import graft.sources.{IcebergRead, IcebergWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q283_iceevolve")
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"))
      require(IcebergWrite.append(base.where(col("k") < 20), t) == 1L,
        "q283: create")
      val evolved = base.where(col("k") >= 20)
        .withColumn("extra", concat(lit("E"), col("k")))
      require(IcebergWrite.appendEvolve(evolved, t) == 2L,
        "q283: evolve")
      // the pre-evolution snapshot reads under ITS schema
      require(IcebergRead.read(s, t, Some(1L)).columns.toSeq ==
        Seq("k", "name"), "q283: past snapshot keeps its schema")
      // old-shape appends refuse after evolution
      require(
        try { IcebergWrite.append(base.limit(1), t); false }
        catch { case _: IllegalArgumentException => true },
        "q283: old-shape append must refuse")
      IcebergRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             CASE WHEN n_nationkey >= 20
               THEN 'E' || CAST(n_nationkey AS BIGINT) END AS extra
      FROM nation
      ORDER BY k"""))

  // ---- q284: Delta GENERATED columns + column INVARIANTS ----
  // The last two "cannot compute" writer refusals become honored
  // obligations: a table declaring delta.generationExpression gets
  // its generated column COMPUTED when the writer omits it and
  // VALIDATED (null-safe equality) when provided; column invariants
  // (delta.invariants field metadata) enforce like CHECK constraints.
  // Inconsistent generated values and invariant violations refuse
  // loudly, require()-gated; the computed content is the hash gate.

  val q284 = Q(
    "q284_delta_generated",
    (s, dir) => {
      import graft.sources.{DeltaFixture => DFx, DeltaRead, DeltaWrite}
      val nation = Tables(s, dir, "nation")
      val t = scratch(s, "q284_generated")
      val genSchema = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType),
        StructField("k_bucket", LongType, nullable = true,
          new MetadataBuilder()
            .putString("delta.generationExpression", "k % 5").build()),
        StructField("name_len", IntegerType, nullable = true,
          new MetadataBuilder().putString("delta.invariants",
            """{"expression":{"expression":"name_len >= 0"}}""")
            .build())))
      val base = nation.select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        (col("n_nationkey").cast("long") % 5).as("k_bucket"),
        length(col("n_name")).as("name_len"))
      val a = DFx.plantDataFile(s, base.where(col("k") < 10), t,
        "a.parquet")
      DFx.writeCommit(s, t, 0, Seq(
        DFx.protocolLine(minWriter = 4),
        DFx.metaDataLine("q284-fixture", genSchema),
        DFx.addLine("a.parquet", a)))
      // the writer OMITS the generated column — computed on append
      require(DeltaWrite.append(
        nation.where(col("n_nationkey") >= 10).select(
          col("n_nationkey").cast("long").as("k"),
          col("n_name").as("name"),
          length(col("n_name")).as("name_len")), t) == 1L,
        "q284: append computing the generated column")
      // a provided-but-INCONSISTENT generated value refuses
      require(
        try {
          DeltaWrite.append(base.limit(1)
            .withColumn("k_bucket", lit(99L)), t); false
        } catch {
          case e: IllegalArgumentException =>
            e.getMessage.contains("generated column 'k_bucket'")
        }, "q284: inconsistent generated value must refuse")
      // an invariant violation refuses with the column name
      require(
        try {
          DeltaWrite.append(base.limit(1)
            .withColumn("name_len", lit(-1)), t); false
        } catch {
          case e: IllegalArgumentException =>
            e.getMessage.contains("invariant on column 'name_len'")
        }, "q284: invariant violation must refuse")
      DeltaRead.read(s, t).orderBy("k")
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             CAST(n_nationkey AS BIGINT) % 5 AS k_bucket,
             CAST(length(n_name) AS INTEGER) AS name_len
      FROM nation
      ORDER BY k"""))

  // ---- q285: Iceberg PARTITIONED DML (delete + rewrite) ----
  // DML on the partitioned tables real deployments actually run:
  // position deletes are PARTITION-SCOPED (every delete file holds
  // one partition tuple, recorded in its manifest entry and its
  // physical `<col>=<val>/` dir — the shape conformant writers emit),
  // pruned reads apply them, and the delete-compaction rewrite folds
  // them in per partition. The post-rewrite pruned segment is the
  // hash gate; scoping, pruned-delete application, and history are
  // require()-gated.

  val q285 = Q(
    "q285_iceberg_partitioned_dml",
    (s, dir) => {
      import graft.sources.{IcebergRead, IcebergWrite}
      val customer = Tables(s, dir, "customer")
      val t = scratch(s, "q285_icepdml")
      val base = customer.select(
        col("c_custkey").cast("long").as("k"),
        col("c_mktsegment").as("segment"))
      require(IcebergWrite.append(base, t,
        partitionBy = Seq("segment")) == 1L, "q285: create")
      // delete across partitions: every 7th key
      require(IcebergWrite.deleteWhere(s, t,
        pmod(col("k"), lit(7)) === 0) == 2L, "q285: delete")
      val snap = IcebergRead.snapshot(s, t)
      require(snap.deleteFiles.nonEmpty &&
        snap.deleteFiles.forall(_.path
          .matches("data/segment=[A-Z]+/delete-.*\\.parquet")),
        "q285: delete files must be partition-scoped")
      // pruned reads apply the deletes
      require(IcebergRead.readPruned(s, t, Map("segment" -> "BUILDING"))
        .where(pmod(col("k"), lit(7)) === 0).isEmpty,
        "q285: pruned scan applies deletes")
      // rewrite folds them in per partition
      val rep = IcebergWrite.rewriteDataFiles(s, t)
      require(rep.droppedDeleteFiles == snap.deleteFiles.size.toLong,
        s"q285: $rep")
      require(IcebergRead.snapshot(s, t).deleteFiles.isEmpty,
        "q285: zero delete files post-rewrite")
      require(IcebergRead.read(s, t, Some(1L)).count() ==
        customer.count(), "q285: history intact")
      IcebergRead.readPruned(s, t, Map("segment" -> "BUILDING"))
        .orderBy("k")
    },
    Some("""
      SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS segment
      FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_custkey % 7 <> 0
      ORDER BY k"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q16, q17, q18, q48, q50, q85,
    q134, q168, q203, q219, q224, q225, q227, q232, q233, q234, q235,
    q239, q240, q241, q246, q247, q251, q252, q253, q254, q256, q257,
    q259, q260, q261, q262, q263, q264, q265, q266, q267, q268, q269,
    q270, q271, q272, q273, q274, q275, q276, q278, q279, q280, q283,
    q284, q285)
}
