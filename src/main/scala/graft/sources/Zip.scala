package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed zip member. */
final case class ZipMember(
    entry_idx: Int,
    name: String,
    size: Long,
    is_dir: Boolean,
    payload: Array[Byte])

/** Zip ingestion — the third corpus container after [[Warc]] and
  * [[Tar]]: scraped datasets, Kaggle-style drops, and document dumps
  * ship as `.zip` objects. Parsing is STREAMING over the local-header
  * sequence (`java.util.zip.ZipInputStream` — stdlib), one member
  * payload in memory at a time, so members decompress without the
  * central directory (which a truncated upload may have lost — the
  * streaming walk salvages everything before the damage, matching the
  * WARC/tar prefix-salvage contract: records out until the first
  * violation, then ONE all-null decline row ends the file).
  *
  * Scale design mirrors the siblings: parallelism per ARCHIVE
  * (file-grain tasks, zero shuffle until the first downstream op);
  * per-member byte cap against hostile deflate bombs.
  */
object Zip {

  /** Max decompressed bytes per member — zip-bomb guard. */
  private val MaxMemberBytes = 256 << 20

  private[sources] def parseBytes(
      bytes: Array[Byte]): Iterator[Option[ZipMember]] =
    parseStream(new ByteArrayInputStream(bytes))

  /** Lazily parse one zip stream into members, appending ONE decline
    * marker (None) at the first framing/deflate violation.
    */
  private[sources] def parseStream(
      raw: InputStream): Iterator[Option[ZipMember]] = {
    val in = new ZipInputStream(raw)
    var idx = 0
    var done = false

    def nextMember(): Option[Option[ZipMember]] =
      try {
        val e: ZipEntry = in.getNextEntry
        if (e == null) { done = true; return None } // clean EOF
        val out = new ByteArrayOutputStream(
          math.max(64, math.min(e.getSize, 1 << 20).toInt))
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          if (out.size > MaxMemberBytes)
            throw new java.util.zip.ZipException(
              s"member exceeds $MaxMemberBytes bytes")
          n = in.read(buf)
        }
        in.closeEntry()
        val payload = out.toByteArray
        val m = ZipMember(idx, e.getName, payload.length.toLong,
          e.isDirectory, payload)
        idx += 1
        Some(Some(m))
      } catch {
        case _: java.io.IOException | _: IllegalArgumentException =>
          done = true
          Some(None)
      }

    new Iterator[Option[ZipMember]] {
      private var nextVal: Option[Option[ZipMember]] = null

      private def advance(): Unit =
        if (nextVal == null && !done) {
          nextVal = nextMember()
          if (nextVal.isEmpty) nextVal = null
        }

      override def hasNext: Boolean = {
        if (done && nextVal == null) return false
        advance()
        nextVal != null
      }

      override def next(): Option[ZipMember] = {
        advance()
        val v = nextVal
        nextVal = null
        v.get
      }
    }
  }

  /** Read a directory of `.zip` objects into one member-grain
    * DataFrame: (file_id, entry_idx, name, size, is_dir, payload).
    * The decline row for a damaged tail carries nulls in every column
    * but `file_id`.
    */
  def readDir(
      spark: SparkSession,
      dir: String,
      glob: String = "*",
      idFromPath: Column => Column = p => xxhash64(p)): DataFrame = {
    import spark.implicits._
    membersOf(spark, spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        idFromPath(col("path")).cast("long").as("file_id"),
        col("path"))
      .as[(Long, String)])
  }

  /** Streaming twin of [[readDir]] — same parser, one code path. */
  def readStreamDir(
      spark: SparkSession,
      dir: String,
      glob: String = "*",
      idFromPath: Column => Column = p => xxhash64(p)): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    membersOf(spark, spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        idFromPath(col("path")).cast("long").as("file_id"),
        col("path"))
      .as[(Long, String)])
  }

  /** The shared archive→members transform: (file_id, path) rows only
    * (content pruned from the lister); tasks open archives through the
    * Hadoop FS API and stream the member walk ([[FileStreams]]) — no
    * per-archive size bound.
    */
  private def membersOf(
      spark: SparkSession,
      files: org.apache.spark.sql.Dataset[(Long, String)])
      : DataFrame = {
    import spark.implicits._
    val confH = new graft.operators.HadoopConfHolder(
      spark.sessionState.newHadoopConf())
    def decline(fileId: Long) =
      (fileId, None: Option[Int], None: Option[String],
        None: Option[Long], None: Option[Boolean],
        None: Option[Array[Byte]])
    files.mapPartitions { it =>
      it.flatMap { case (fileId, path) =>
        FileStreams.openSniffed(confH.value, path) match {
          case None => Iterator.single(decline(fileId))
          case Some(in) =>
            FileStreams.closing(in, parseStream(in).map {
              case Some(m) =>
                (fileId, Some(m.entry_idx), Some(m.name), Some(m.size),
                  Some(m.is_dir), Some(m.payload))
              case None => decline(fileId)
            })
        }
      }
    }.toDF("file_id", "entry_idx", "name", "size", "is_dir", "payload")
  }
}

/** Authoring twin for [[Zip]] (stdlib ZipOutputStream). */
object ZipFixture {

  /** A complete archive of (name, content) members (deflate). */
  def archive(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    members.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** A directory entry (name must end with '/'). */
  def dirEntry(name: String): (String, Array[Byte]) = {
    require(name.endsWith("/"), "zip directory names end with /")
    name -> Array.emptyByteArray
  }
}
