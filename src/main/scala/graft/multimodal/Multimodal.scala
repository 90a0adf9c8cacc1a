package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One opaque media object: bytes + typed metadata. At 100 TB the
  * binary column stays columnar (parquet binary chunks); only the
  * per-partition decode pass materializes bytes, and partition sizing
  * is governed by `spark.sql.files.maxPartitionBytes` like any scan.
  */
final case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String)

/** Decoded features. `width`/`height` come from the (stubbed) decoder;
  * the deterministic fields are real and oracle-checked.
  */
final case class MediaFeatures(
    doc_id: Long,
    byte_len: Long,
    header_hex: String,
    content_sha: String,
    width: Option[Int],
    height: Option[Int])

/** Multimodal-column plumbing: schema, partitioning, and the
  * per-partition decode pass are real; only the media decode itself is
  * STUBBED (no image/audio codecs in this environment).
  */
object Multimodal {

  /** Pack a text column as a binary media column — stands in for
    * image/audio payload ingestion. DuckDB: `encode(text)`.
    */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("text/plain").as("mime"))

  /** Ingest raw media objects from a directory via Spark's binaryFile
    * source — the real multimodal ingestion path (each file becomes one
    * row of path/length/bytes, read distributed, partition-sized by
    * `spark.sql.files.maxPartitionBytes`). Ids are derived from the
    * file name digits (or a hash when none), mime from the extension.
    */
  def readBinaryDir(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: String = "*"): DataFrame = {
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val digits = regexp_extract(col("path"), "(\\d+)[^/\\d]*$", 1)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        when(digits =!= "", digits.cast("long"))
          .otherwise(xxhash64(col("path"))).as("doc_id"),
        col("content").as("media"),
        when(ext === "png", "image/png")
          .when(ext === "jpg" || ext === "jpeg", "image/jpeg")
          .when(ext === "wav", "audio/wav")
          .when(ext === "mp4", "video/mp4")
          .when(ext === "txt", "text/plain")
          .otherwise(concat(lit("application/"), ext)).as("mime"))
  }

  /** ======== STUB ========
    * A real deployment would decode `media` here (image dims, audio
    * duration, frame samples) inside this same mapPartitions pass.
    * The codec call is stubbed to None; everything else — the typed
    * Dataset plumbing, per-partition batching, deterministic byte-level
    * features — is real and tested.
    */
  private def decodeDimensionsStub(media: Array[Byte]): (Option[Int], Option[Int]) =
    (None, None)

  /** Per-partition feature extraction over the binary column. One pass,
    * one MessageDigest per record, no shuffle.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val sha = MessageDigest.getInstance("SHA-256").digest(r.media)
        val header = r.media.take(4).map(b => f"$b%02X").mkString
        MediaFeatures(
          doc_id = r.doc_id,
          byte_len = r.media.length.toLong,
          header_hex = header,
          content_sha = sha.map(b => f"$b%02x").mkString,
          width = decodeDimensionsStub(r.media)._1,
          height = decodeDimensionsStub(r.media)._2)
      }
    }
  }
}
