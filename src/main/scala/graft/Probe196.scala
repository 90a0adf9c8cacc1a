package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// TEMPORARY phase probe for q196 — not committed.
object Probe196 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warmup whole query once
    (0 until 3).foreach { it =>
      println(s"[probe] === iteration $it ===")
      val s = spark
      val d = t("tables.docs") {
        graft.Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      }
      val watch = graft.ScratchSpace.dir(s, "p196_watch_")
      val state = graft.ScratchSpace.dir(s, "p196_state_")
      t("seed") {
        graft.streaming.StreamingOps.seedNearDupState(
          d.where(lit(false)), state, "doc_id", "text")
      }
      val hc = s.sessionState.newHadoopConf()
      t("stage 3 files") {
        (0 until 3).foreach { k =>
          val stage = s"$state/stage$k"
          d.where(col("doc_id") % 3 === k)
            .coalesce(1).write.mode("overwrite").parquet(stage)
          val p = new org.apache.hadoop.fs.Path(stage)
          val part = p.getFileSystem(hc).listStatus(p).map(_.getPath)
            .find(_.getName.startsWith("part-")).get
          graft.ScratchSpace.copyIn(s, part.toString, watch,
            f"docs_$k%03d.parquet")
        }
      }
      val sink = graft.streaming.StreamingOps.nearDupSink(
        state, "doc_id", "text", threshold = 0.6)
      if (it == 2) {
        // manual batches against a SEPARATE state dir: sink compute
        // without streaming machinery
        val state2 = graft.ScratchSpace.dir(s, "p196_state2_")
        graft.streaming.StreamingOps.seedNearDupState(
          d.where(lit(false)), state2, "doc_id", "text")
        val sink2 = graft.streaming.StreamingOps.nearDupSink(
          state2, "doc_id", "text", threshold = 0.6)
        (0 until 3).foreach { k =>
          t(s"manual sink batch $k") {
            sink2(s.read.parquet(s"$watch/docs_00$k.parquet"), k.toLong)
          }
        }
        // fine-grained batch 2 replay against a third state dir
        val state3 = graft.ScratchSpace.dir(s, "p196_state3_")
        graft.streaming.StreamingOps.seedNearDupState(
          d.where(lit(false)), state3, "doc_id", "text")
        val sink3 = graft.streaming.StreamingOps.nearDupSink(
          state3, "doc_id", "text", threshold = 0.6)
        (0 until 2).foreach { k =>
          sink3(s.read.parquet(s"$watch/docs_00$k.parquet"), k.toLong)
        }
        val bTag = "2"
        val fresh = s.read.parquet(s"$watch/docs_002.parquet")
          .select(col("doc_id"), col("text"))
        t("b2 isEmpty") { fresh.isEmpty }
        val baseSigs = s.read.parquet(s"$state3/sigs")
          .where(col("batch").cast("string") =!= bTag)
          .select("id", "band", "key")
        val baseDocs = s.read.parquet(s"$state3/docs")
          .where(col("batch").cast("string") =!= bTag)
          .select(col("doc_id"), col("text"))
        val inc = t("b2 build inc (lazy)") {
          graft.operators.Dedup.incrementalNearDupFromSignatures(
            baseSigs, baseDocs, fresh, "doc_id", "text", 3, 8, 3, 0.6)
        }
        t("b2 freshSignatures count") { inc.freshSignatures.count() }
        t("b2 pairs write") {
          inc.pairs.write.mode("overwrite")
            .parquet(s"$state3/pairs/batch=$bTag")
        }
        t("b2 sigs write") {
          inc.freshSignatures.write.mode("overwrite")
            .parquet(s"$state3/sigs/batch=$bTag")
        }
        t("b2 docs write") {
          fresh.write.mode("overwrite")
            .parquet(s"$state3/docs/batch=$bTag")
        }
        t("b2 release") { inc.release() }
      }
      t("stream drain (3 batches)") {
        val q = s.readStream.schema(d.schema)
          .option("maxFilesPerTrigger", "1").parquet(watch)
          .writeStream.option("checkpointLocation", s"$state/ckpt")
          .foreachBatch(sink).start()
        try q.processAllAvailable() finally q.stop()
      }
      t("read pairs + noop") {
        graft.streaming.StreamingOps.nearDupPairs(s, state)
          .orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
