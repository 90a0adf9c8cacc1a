package graft.multimodal

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

  /** The deterministic byte-level feature expressions — exactly the
    * codegen'd `length`/`hex(substring)`/`sha2` built-ins, shared by
    * [[deterministicFeatures]] and [[extractFeatures]] so the two can
    * never drift.
    */
  private val featureColumns = Seq(
    length(col("media")).cast("long").as("byte_len"),
    upper(hex(substring(col("media"), 1, 4))).as("header_hex"),
    sha2(col("media"), 256).as("content_sha"))

  /** Deterministic byte-level features as pure Column expressions:
    * whole-stage codegen, no typed pass, no per-record MessageDigest
    * allocation.
    */
  def deterministicFeatures(df: DataFrame): DataFrame =
    df.select(col("doc_id") +: featureColumns: _*)

  /** Full feature extraction: deterministic features via the codegen'd
    * Columns above; ONLY the (stubbed) codec runs in the typed
    * per-partition pass, so the decode's cost never taxes the real
    * features.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.toDF()
      .select(col("doc_id") +: featureColumns :+ col("media"): _*)
      .as[(Long, Long, String, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, len, hdr, sha, media) =>
          val (w, h) = decodeDimensionsStub(media)
          MediaFeatures(id, len, hdr, sha, w, h)
        }
      }
  }
}
