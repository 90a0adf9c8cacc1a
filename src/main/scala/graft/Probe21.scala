package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Texts

// TEMPORARY stage probe for minhashNearDup — not committed.
object Probe21 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val s = spark
    (0 until 3).foreach { it =>
      println(s"[probe] === iteration $it ===")
      val d = graft.SparkUtil.ensureParallelism(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")))
      val shingleExpr = Texts.shinglesOf(col("text"), 3)
      t("scan+md5") { noop(d.select(md5(col("text")))) }
      t("words only") { noop(d.select(explode(Texts.words(col("text"))))) }
      t("shingle explode") {
        noop(d.select(col("doc_id"), explode(shingleExpr).as("sh"))
          .select(col("doc_id"), xxhash64(col("sh"))))
      }
      t("shingle array (no explode)") {
        noop(d.select(col("doc_id"), shingleExpr.as("sh")))
      }
      t("minhash signatures") {
        noop(graft.operators.Dedup.minhashSignatures(
          d, col("doc_id"), shingleExpr, 24))
      }
      t("banded signatures") {
        noop(graft.operators.Dedup.bandedSignatures(
          d, col("doc_id"), shingleExpr, 8, 3))
      }
      t("lsh candidates") {
        noop(graft.operators.Dedup.lshCandidates(
          d, col("doc_id"), shingleExpr, 8, 3))
      }
      t("full minhashNearDup") {
        noop(graft.operators.Dedup.minhashNearDup(
          d, "doc_id", "text", 3, 8, 3, 0.6))
      }
    }
    spark.stop()
  }
}
