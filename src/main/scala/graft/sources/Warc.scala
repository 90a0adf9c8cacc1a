package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record (ISO 28500 / WARC 1.0-1.1 framing).
  *
  * `http_status`/`payload` carry the HTTP-response split when the
  * record's Content-Type announces `application/http`: status from
  * the status line, payload = the entity body after the HTTP header
  * block. For every other record type the payload is the whole
  * content block and `http_status` is None.
  */
final case class WarcParsed(
    rec_idx: Int,
    offset: Long,
    warc_type: Option[String],
    target_uri: Option[String],
    content_type: Option[String],
    content_length: Long,
    http_status: Option[Int],
    payload: Array[Byte])

/** WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl
  * container format, and therefore the single most common physical
  * shape of raw LLM pretraining text on S3.
  *
  * Framing (public spec; also see the reference's generic binary
  * download path, download_file.py:167-296, which this extends from
  * opaque objects to record-structured ones): a WARC file is a
  * concatenation of records, each
  *
  * {{{
  *   WARC/1.0<CRLF>
  *   Header-Name: value<CRLF> ...
  *   <CRLF>
  *   <Content-Length bytes of content block>
  *   <CRLF><CRLF>
  * }}}
  *
  * Scale design: parallelism is per FILE — exactly the production
  * layout (a Common Crawl snapshot is ~64k independent `.warc.gz`
  * segments of ~1 GB; file-grain tasks saturate any cluster without
  * a shuffle). Within a file, parsing is STREAMING — one record's
  * payload in memory at a time over the (multi-member) gzip stream,
  * so a 1 GB segment never materializes its ~5 GB uncompressed form.
  * Files are opened through the Hadoop FS API and streamed per task
  * ([[FileStreams]]) — no per-file size bound, no whole-shard heap
  * cost; the `binaryFile` source acts only as the file LISTER (its
  * content column is pruned away).
  *
  * Error contract (prefix-salvage): records stream out until the
  * first framing violation; a violated or truncated tail emits ONE
  * all-null decline row and ends the file. This is the production
  * semantics (crawl readers salvage the valid prefix of a truncated
  * segment) and it is what lazy streaming can honestly promise —
  * unlike a whole-file decline, it never requires buffering the file
  * to certify it first.
  */
object Warc {

  private final class WarcFormat(msg: String) extends Exception(msg)

  /** Max accepted header-line length — bounds hostile/garbage input. */
  private val MaxLine = 64 * 1024

  /** Max header lines per record — same purpose. */
  private val MaxHeaders = 256

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B

  /** A counting reader over the uncompressed stream: `offset` is the
    * position in the UNCOMPRESSED byte stream (for `.warc.gz`, where
    * records are individual gzip members, the member boundary — the
    * real-world seek key — is recoverable from it).
    */
  private final class Counting(in: InputStream) {
    var pos: Long = 0L

    def read(): Int = {
      val b = in.read()
      if (b >= 0) pos += 1
      b
    }

    /** Reads exactly n bytes or throws EOFException. */
    def readN(n: Long): Array[Byte] = {
      require(n <= Int.MaxValue, s"record content block of $n bytes")
      val out = new Array[Byte](n.toInt)
      var off = 0
      while (off < n.toInt) {
        val got = in.read(out, off, n.toInt - off)
        if (got < 0) throw new EOFException(s"EOF inside content block")
        off += got
        pos += got
      }
      out
    }

    /** One CRLF-terminated line as ISO-8859-1 (header bytes are
      * ASCII per spec; 8859-1 is the lossless fallback), without the
      * terminator. Returns null at clean EOF BEFORE any byte is read.
      */
    def readLine(): String = {
      val buf = new ByteArrayOutputStream(96)
      var b = read()
      if (b < 0) return null
      while (b >= 0) {
        if (b == '\r') {
          val nl = read()
          if (nl != '\n') throw new WarcFormat("CR without LF in header")
          return new String(buf.toByteArray, StandardCharsets.ISO_8859_1)
        }
        if (b == '\n') throw new WarcFormat("bare LF in header")
        buf.write(b)
        if (buf.size > MaxLine) throw new WarcFormat("header line too long")
        b = read()
      }
      throw new WarcFormat("EOF inside header line")
    }
  }

  /** Lazily parse one uncompressed WARC stream into records,
    * appending ONE decline marker (None) if the stream violates
    * framing before clean EOF.
    */
  private[sources] def parseStream(
      raw: InputStream): Iterator[Option[WarcParsed]] = {
    val in = new Counting(raw)
    var idx = 0
    var done = false

    def nextRecord(): Option[Option[WarcParsed]] =
      try {
        val offset = in.pos
        val version = in.readLine()
        if (version == null) { done = true; return None } // clean EOF
        if (!version.startsWith("WARC/"))
          throw new WarcFormat(s"bad version line '$version'")
        // headers until the blank line
        var headers = Map.empty[String, String]
        var line = in.readLine()
        var n = 0
        while (line != null && line.nonEmpty) {
          val colon = line.indexOf(':')
          if (colon <= 0) throw new WarcFormat(s"malformed header '$line'")
          headers += (line.substring(0, colon).trim.toLowerCase ->
            line.substring(colon + 1).trim)
          n += 1
          if (n > MaxHeaders) throw new WarcFormat("too many headers")
          line = in.readLine()
        }
        if (line == null) throw new WarcFormat("EOF before header end")
        val len = headers.getOrElse(
          "content-length", throw new WarcFormat("missing Content-Length"))
        val contentLength =
          try java.lang.Long.parseLong(len)
          catch {
            case _: NumberFormatException =>
              throw new WarcFormat(s"bad Content-Length '$len'")
          }
        if (contentLength < 0) throw new WarcFormat("negative Content-Length")
        val block = in.readN(contentLength)
        // the two record-terminating CRLFs
        var i = 0
        while (i < 4) {
          val want = if (i % 2 == 0) '\r' else '\n'
          val got = in.read()
          if (got != want) throw new WarcFormat("missing record terminator")
          i += 1
        }
        val ctype = headers.get("content-type")
        val isHttp = ctype.exists(_.toLowerCase.startsWith("application/http"))
        val (status, payload) =
          if (isHttp) splitHttp(block) else (None, block)
        val rec = WarcParsed(
          idx, offset,
          headers.get("warc-type"),
          headers.get("warc-target-uri"),
          ctype, contentLength, status, payload)
        idx += 1
        Some(Some(rec))
      } catch {
        // IOException covers EOFException AND mid-stream gzip damage
        // (ZipException from a corrupt member/CRC) — both are the same
        // salvage case: the prefix already emitted stands, one decline
        // row marks the damaged tail.
        case _: WarcFormat | _: java.io.IOException |
            _: IllegalArgumentException =>
          done = true
          Some(None)
      }

    new Iterator[Option[WarcParsed]] {
      private var nextVal: Option[Option[WarcParsed]] = null

      private def advance(): Unit =
        if (nextVal == null && !done) {
          nextVal = nextRecord()
          if (nextVal.isEmpty) nextVal = null
        }

      override def hasNext: Boolean = {
        if (done && nextVal == null) return false
        advance()
        nextVal != null
      }

      override def next(): Option[WarcParsed] = {
        advance()
        val v = nextVal
        nextVal = null
        v.get
      }
    }
  }

  /** Split an `application/http` response block into (status,
    * entity body). A malformed HTTP block keeps the whole block as
    * payload with no status — the record itself is still well-framed.
    */
  private[sources] def splitHttp(
      block: Array[Byte]): (Option[Int], Array[Byte]) = {
    // find the \r\n\r\n header/body boundary
    var i = 0
    var boundary = -1
    while (boundary < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
        block(i + 2) == '\r' && block(i + 3) == '\n') boundary = i
      i += 1
    }
    if (boundary < 0) return (None, block)
    val head = new String(block, 0, boundary, StandardCharsets.ISO_8859_1)
    val statusLine = head.takeWhile(_ != '\r')
    val parts = statusLine.split(" ", 3)
    val status =
      if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
        parts(1).toIntOption
      else None
    if (status.isEmpty) (None, block)
    else (status, java.util.Arrays.copyOfRange(block, boundary + 4, block.length))
  }

  /** Parse one in-memory WARC object (gzip-sniffed by magic bytes,
    * multi-member streams supported — the Common Crawl
    * record-per-member layout decompresses transparently).
    */
  private[sources] def parseBytes(
      bytes: Array[Byte]): Iterator[Option[WarcParsed]] = {
    val base = new ByteArrayInputStream(bytes)
    val in =
      if (isGzip(bytes))
        try new GZIPInputStream(new BufferedInputStream(base, 64 * 1024))
        catch { case _: java.io.IOException => return Iterator.single(None) }
      else base
    parseStream(in)
  }

  /** Read a directory of `.warc` / `.warc.gz` objects into one
    * record-grain DataFrame.
    *
    * Output: (file_id, rec_idx, offset, warc_type, target_uri,
    * content_type, http_status, payload_len, payload). The decline
    * row for a truncated/corrupt tail carries nulls in every column
    * but `file_id`.
    *
    * `offset` is the record's position in the UNCOMPRESSED stream —
    * together with `rec_idx` it lets a downstream auditor re-seek
    * any record (CDX-style indexing is `SELECT file_id, offset,
    * target_uri FROM this`).
    */
  def readDir(
      spark: SparkSession,
      dir: String,
      glob: String = "*",
      idFromPath: Column => Column = p => xxhash64(p)): DataFrame = {
    import spark.implicits._
    recordsOf(spark, spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        idFromPath(col("path")).cast("long").as("file_id"),
        col("path"))
      .as[(Long, String)])
  }

  /** Streaming twin of [[readDir]] — the continuous crawl-intake
    * shape: new `.warc(.gz)` objects landing in `dir` parse into
    * record rows per micro-batch through the SAME parser (one code
    * path, so every [[readDir]] exactness/decline guarantee holds).
    * Parsing is stateless, so any downstream stateful op (dedup sink,
    * windowed agg) owns its own watermarks.
    */
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
    recordsOf(spark, spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        idFromPath(col("path")).cast("long").as("file_id"),
        col("path"))
      .as[(Long, String)])
  }

  /** The shared file→records transform of [[readDir]] /
    * [[readStreamDir]]: the scan carries only (file_id, path) — the
    * binaryFile lister prunes the content column away — and each task
    * opens its files through the Hadoop FS API and STREAMS the parse
    * ([[FileStreams]]), so there is no per-file size bound and task
    * heap holds one record payload at a time. An unopenable or
    * codec-header-damaged file is the whole-file decline row.
    */
  private def recordsOf(
      spark: SparkSession,
      files: org.apache.spark.sql.Dataset[(Long, String)])
      : DataFrame = {
    import spark.implicits._
    val confH = new graft.operators.HadoopConfHolder(
      spark.sessionState.newHadoopConf())
    def decline(fileId: Long) =
      (fileId, None: Option[Int], None: Option[Long],
        None: Option[String], None: Option[String],
        None: Option[String], None: Option[Int],
        None: Option[Long], None: Option[Array[Byte]])
    files.mapPartitions { it =>
      it.flatMap { case (fileId, path) =>
        FileStreams.openSniffed(confH.value, path) match {
          case None => Iterator.single(decline(fileId))
          case Some(in) =>
            FileStreams.closing(in, parseStream(in).map {
              case Some(r) =>
                (fileId, Some(r.rec_idx), Some(r.offset), r.warc_type,
                  r.target_uri, r.content_type, r.http_status,
                  Some(r.payload.length.toLong), Some(r.payload))
              case None => decline(fileId)
            })
        }
      }
    }.toDF("file_id", "rec_idx", "offset", "warc_type", "target_uri",
      "content_type", "http_status", "payload_len", "payload")
  }
}

/** Authoring twin for [[Warc]] — spec-exact WARC bytes for fixtures
  * and specs (same pattern as [[DeltaFixture]] for the Delta reader:
  * the query gates plant real containers at runtime and the DuckDB
  * oracle replays the planted content from the source tables).
  */
object WarcFixture {

  private val Crlf = "\r\n"

  private def latin1(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.ISO_8859_1)

  /** Frame one record: version line, caller headers + computed
    * Content-Length, blank line, content block, the two terminating
    * CRLFs.
    */
  def record(
      headers: Seq[(String, String)],
      content: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0").append(Crlf)
    (headers :+ ("Content-Length" -> content.length.toString)).foreach {
      case (k, v) => head.append(k).append(": ").append(v).append(Crlf)
    }
    head.append(Crlf)
    val out = new ByteArrayOutputStream(head.length + content.length + 4)
    out.write(latin1(head.toString))
    out.write(content)
    out.write(latin1(Crlf + Crlf))
    out.toByteArray
  }

  /** An `application/http; msgtype=response` record: HTTP/1.1 status
    * line + minimal entity headers, then `body`.
    */
  def response(
      uri: String,
      status: Int,
      body: Array[Byte],
      bodyType: String = "text/plain"): Array[Byte] = {
    val http = s"HTTP/1.1 $status OK$Crlf" +
      s"Content-Type: $bodyType$Crlf" +
      s"Content-Length: ${body.length}$Crlf$Crlf"
    val block = new ByteArrayOutputStream(http.length + body.length)
    block.write(latin1(http))
    block.write(body)
    record(
      Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
      block.toByteArray)
  }

  /** A `warcinfo` file-header record (application/warc-fields). */
  def warcinfo(payload: Array[Byte]): Array[Byte] =
    record(
      Seq(
        "WARC-Type" -> "warcinfo",
        "Content-Type" -> "application/warc-fields"),
      payload)

  /** Plain (uncompressed) `.warc`: records concatenated. */
  def plain(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(out.write)
    out.toByteArray
  }

  /** Common Crawl `.warc.gz` layout: ONE gzip member per record,
    * members concatenated — the layout that makes per-record seeks
    * possible and that [[Warc.parseBytes]]'s multi-member
    * GZIPInputStream decompresses transparently.
    */
  def gzMembers(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r)
      gz.finish()
    }
    out.toByteArray
  }
}
