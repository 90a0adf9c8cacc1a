package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// TEMPORARY phase probe for the q176/q177 pipeline — not committed.
object Probe176 {
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
    val s = spark
    (0 until 3).foreach { it =>
      println(s"[probe] === iteration $it ===")
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val dg = d.select(col("doc_id"), md5(col("text")).as("dg"))
      val rep = t("rep agg (lazy)") {
        dg.groupBy("dg").agg(min(col("doc_id")).as("rep_id"))
      }
      val ldir = graft.ScratchSpace.dir(s, "p176_")
      t("collapse write") {
        d.select(col("doc_id"), col("text"))
          .join(rep.select(col("rep_id").as("doc_id")), "doc_id")
          .write.mode("overwrite").parquet(s"$ldir/c")
      }
      val repDocs = s.read.parquet(s"$ldir/c")
      t("minhashNearDup -> pairs write") {
        graft.operators.Dedup.minhashNearDup(repDocs, "doc_id", "text",
            shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6)
          .select("id_a", "id_b")
          .write.mode("overwrite").parquet(s"$ldir/p")
      }
      val pairs = s.read.parquet(s"$ldir/p")
      val run = t("lpa run (4 rounds)") {
        val r = graft.operators.Graphs.labelPropagationRun(
          repDocs.select(col("doc_id")), "doc_id",
          pairs, "id_a", "id_b", rounds = 4)
        r.result.write.mode("overwrite").parquet(s"$ldir/l")
        r
      }
      run.release()
      val lpa = s.read.parquet(s"$ldir/l")
      t("final join + noop") {
        dg.join(rep, "dg")
          .join(lpa.select(col("doc_id").as("rep_id"), col("community")),
            "rep_id")
          .select(col("doc_id"), col("community"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
