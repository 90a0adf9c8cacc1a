package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Metadata-only parquet statistics — answering min/max/count questions
  * from FOOTERS alone, without reading a single data page.
  *
  * This is the 100 TB pruning primitive: a partition-pruned scan is
  * cheap exactly because the planner can decide relevance from
  * row-group statistics. This operator surfaces those statistics as a
  * DataFrame, so a pipeline can (a) audit that its layout actually
  * produces prunable files (tight per-file min/max ranges), and
  * (b) answer per-partition count/min/max rollups at metadata cost —
  * O(files) footer reads, zero data IO, instead of a full scan.
  *
  * Scale shape: the file list is discovered driver-side (the same
  * iterator-paged listing the catalog operators use — names only, no
  * data), then footers are read ON EXECUTORS, one task per file batch,
  * so a million-file lake parallelizes across the cluster. Each footer
  * read is a few KB of IO regardless of file size. The returned frame
  * is row-group-grained; callers aggregate to file or partition grain.
  *
  * Reference behavior anchor: the reference engine's blueprints
  * enumerate S3 objects and act on names/sizes only
  * (amazons3-blueprints download_file.py:101-228); this extends the
  * same "metadata before data" discipline to parquet's own statistics
  * layer.
  */
object Meta {

  /** One row per (file, row-group): partition-dir value (from the
    * trailing `key=value` path segment, empty when unpartitioned),
    * row count, and the column-chunk min/max for `column` as doubles.
    *
    * Row groups whose chunk lacks statistics (`hasNonNullValue` false
    * — e.g. an all-null chunk) report null min/max but keep their row
    * count, so totals stay exact even when stats are absent.
    */
  def footerStats(
      spark: SparkSession,
      dir: String,
      column: String): DataFrame = {
    import spark.implicits._
    val rootPath = new Path(dir)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(rootPath, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
          b += f.getPath.toString
      }
      b.result()
    }
    val partRe = ".*/[^/=]+=([^/]+)/[^/]*$".r
    val nFiles = files.size.max(1)
    spark.createDataset(files)
      .repartition(math.min(nFiles, spark.sparkContext.defaultParallelism))
      .mapPartitions { paths =>
        // Fresh Hadoop conf per task: local/HDFS defaults suffice for
        // footer reads; object-store credentials ride on the
        // executor-side default conf in cluster deployments.
        val conf = new org.apache.hadoop.conf.Configuration()
        paths.flatMap { p =>
          val part = p match {
            case partRe(v) => v
            case _ => ""
          }
          val reader =
            ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p), conf))
          try {
            reader.getFooter.getBlocks.asScala.map { block =>
              val chunk = block.getColumns.asScala
                .find(_.getPath.toDotString == column)
                .getOrElse(throw new IllegalArgumentException(
                  s"column $column absent from footer of $p"))
              val st = chunk.getStatistics
              val (mn, mx) =
                if (st != null && st.hasNonNullValue)
                  (Some(st.genericGetMin.asInstanceOf[Number].doubleValue),
                    Some(st.genericGetMax.asInstanceOf[Number].doubleValue))
                else (None, None)
              (part, p, block.getRowCount, mn, mx)
            }.toSeq
          } finally reader.close()
        }
      }
      .toDF("part", "file", "n_rows", "min_v", "max_v")
  }
}
