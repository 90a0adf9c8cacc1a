package graft.sources

import java.io.InputStream

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro Object Container File ingestion — the fourth record-container
  * after WARC/tar/zip ([[Warc]]/[[Tar]]/[[Zip]]) and the JSONL family:
  * event exports, Kafka dumps, and Hive-era datasets ship as `.avro`
  * OCF objects. Decoding rides the Apache Avro core library on every
  * Spark classpath (the same dependency [[IcebergRead]] uses for
  * manifests); [[DataFileStream]] reads the block-framed container
  * STREAMING — one record in memory at a time — so the reader plugs
  * into the [[FileStreams]] per-file shape with no per-file size
  * bound.
  *
  * Contract (mirrors [[Jsonl]]): the caller declares an EXPLICIT
  * schema (no inference pass); fields resolve from each record BY
  * NAME with null-union unwrapping and numeric widening; a value a
  * field cannot coerce to nulls (missing-field semantics — presence
  * rules belong to a downstream contract check). Container damage
  * follows prefix-salvage: records stream out until the first
  * unreadable block, then ONE quarantine row (all schema columns
  * null, [[Corrupt]] = ` avro-damage <path>: <why>`) ends the file —
  * countable and greppable like the JSONL marker. Supported target
  * types: boolean/int/long/float/double/string/binary.
  */
object AvroOcf {

  /** The quarantine column name (shared convention with [[Jsonl]]). */
  val Corrupt: String = Jsonl.Corrupt

  /** Read a directory of `.avro` OCF objects with an explicit schema;
    * `glob` filters like the other container readers. Output columns
    * are the schema's plus [[Corrupt]].
    */
  def readDir(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      glob: String = "*"): DataFrame = {
    validateSchema(schema)
    val files = listedPaths(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir))
    parseFiles(spark, files, schema)
  }

  /** Streaming twin of [[readDir]] — the binaryFile streaming lister
    * (content pruned, processed-file tracking intact) feeds the SAME
    * per-file parse, so quarantine semantics hold per micro-batch.
    */
  def readStreamDir(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      glob: String = "*"): DataFrame = {
    validateSchema(schema)
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val files = listedPaths(spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("pathGlobFilter", glob)
      .load(dir))
    parseFiles(spark, files, schema)
  }

  private def listedPaths(listing: DataFrame): DataFrame =
    listing.select(col("path"))

  /** Split a read into (good, quarantine) like [[Jsonl.split]]. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val good = df.where(col(Corrupt).isNull).drop(Corrupt)
    val bad = df.where(col(Corrupt).isNotNull).select(col(Corrupt))
    (good, bad)
  }

  private def validateSchema(schema: StructType): Unit = {
    require(!schema.fieldNames.contains(Corrupt),
      s"schema already contains reserved column '$Corrupt'")
    schema.foreach { f =>
      f.dataType match {
        case BooleanType | IntegerType | LongType | FloatType |
            DoubleType | StringType | BinaryType => ()
        case other =>
          throw new IllegalArgumentException(
            s"AvroOcf: unsupported target type $other for '${f.name}' " +
              "(boolean/int/long/float/double/string/binary)")
      }
    }
  }

  private def parseFiles(
      spark: SparkSession,
      files: DataFrame,
      schema: StructType): DataFrame = {
    val outSchema = schema.add(Corrupt, StringType)
    val confH = new graft.operators.HadoopConfHolder(
      spark.sessionState.newHadoopConf())
    val fieldNames = schema.fieldNames
    val fieldTypes = schema.fields.map(_.dataType)
    import spark.implicits._
    files.as[String].mapPartitions { it =>
      it.flatMap { path =>
        parseOne(confH.value, path, fieldNames, fieldTypes)
      }
    }(Encoders.row(outSchema))
  }

  /** One file's rows: records until the first unreadable block, then
    * the quarantine marker row on damage.
    *
    * TRUNCATION is detected OUTSIDE the reference reader: Avro's
    * DataFileStream treats EOF inside a block header/body as a CLEAN
    * end (it catches the EOFException), silently dropping the final
    * block — unacceptable data loss for a curation reader. A valid
    * OCF always ends exactly at a block boundary, i.e. its LAST 16
    * bytes are the header's sync marker — one ranged read proves it;
    * a mismatch appends the marker row after whatever records the
    * reference reader salvaged.
    */
  private def parseOne(
      conf: org.apache.hadoop.conf.Configuration,
      path: String,
      names: Array[String],
      types: Array[DataType]): Iterator[Row] = {
    def damage(msg: String): Row =
      Row.fromSeq(names.map(_ => null).toSeq :+
        s" avro-damage $path: $msg")
    val fs =
      try new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      catch {
        case e: java.io.IOException =>
          return Iterator.single(damage(
            Option(e.getMessage).getOrElse("unreadable")))
      }
    val truncated: Option[String] = tailSyncMismatch(fs, path)
    val stream: InputStream =
      try fs.open(new org.apache.hadoop.fs.Path(path))
      catch {
        case e: java.io.IOException =>
          return Iterator.single(damage(
            Option(e.getMessage).getOrElse("unreadable")))
      }
    val reader =
      try new DataFileStream[GenericRecord](
        stream, new GenericDatumReader[GenericRecord]())
      catch {
        case e: Exception =>
          try stream.close() catch { case _: java.io.IOException => () }
          return Iterator.single(damage(
            Option(e.getMessage).getOrElse("bad container header")))
      }
    var done = false
    var markerEmitted = false
    val base = new Iterator[Row] {
      private var nextRow: Row = null
      private def advance(): Unit =
        if (nextRow == null && !done) {
          try {
            if (reader.hasNext) {
              val rec = reader.next()
              nextRow = Row.fromSeq(
                names.indices.map(i =>
                  coerce(rec, names(i), types(i))).toSeq :+ null)
            } else {
              done = true
              if (!markerEmitted) truncated.foreach { why =>
                markerEmitted = true
                nextRow = damage(why)
              }
            }
          } catch {
            case e: Exception =>
              done = true
              markerEmitted = true
              nextRow = damage(
                Option(e.getMessage).getOrElse("block damage"))
          }
        }
      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): Row = {
        advance()
        val r = nextRow
        nextRow = null
        r
      }
    }
    FileStreams.closing(stream, base)
  }

  /** Some(reason) when the file's trailing 16 bytes are NOT the OCF
    * header's sync marker — the truncation/garbage-tail proof the
    * reference reader's silent-EOF behavior needs. Header layout per
    * the Avro spec: 4-byte magic `Obj\1`, metadata map (zigzag-varint
    * counts, length-prefixed byte strings), 16-byte sync.
    */
  private def tailSyncMismatch(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[String] =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val len = fs.getFileStatus(p).getLen
      val in = fs.open(p)
      try {
        def u8(): Int = {
          val b = in.read()
          if (b < 0) throw new java.io.EOFException("EOF in header")
          b
        }
        def varLong(): Long = {
          var shift = 0
          var acc = 0L
          var b = u8()
          while ((b & 0x80) != 0) {
            acc |= (b & 0x7FL) << shift
            shift += 7
            b = u8()
          }
          acc |= (b & 0x7FL) << shift
          (acc >>> 1) ^ -(acc & 1) // zigzag
        }
        def skipFully(n: Long): Unit = {
          var left = n
          while (left > 0) {
            val s = in.skip(left)
            if (s <= 0) throw new java.io.EOFException("EOF in header")
            left -= s
          }
        }
        val magic = new Array[Byte](4)
        in.readFully(magic)
        if (!(magic(0) == 'O' && magic(1) == 'b' && magic(2) == 'j' &&
          magic(3) == 1))
          return Some("bad OCF magic")
        var count = varLong()
        while (count != 0L) {
          val n = math.abs(count)
          if (count < 0) varLong(): Unit // negative form carries a byte size
          var i = 0L
          while (i < n) {
            skipFully(varLong()) // key bytes
            skipFully(varLong()) // value bytes
            i += 1
          }
          count = varLong()
        }
        val sync = new Array[Byte](16)
        in.readFully(sync)
        if (len < 16) return Some("file shorter than a sync marker")
        val tail = new Array[Byte](16)
        in.readFully(len - 16, tail)
        if (!java.util.Arrays.equals(sync, tail))
          Some("trailing sync marker mismatch — truncated or " +
            "garbage-appended container")
        else None
      } finally in.close()
    } catch {
      case e: Exception =>
        Some(Option(e.getMessage).getOrElse("unreadable header"))
    }

  /** Name-resolved, null-union-unwrapped, numerics-widened value — or
    * null when the record lacks the field or the value cannot coerce.
    */
  private def coerce(
      rec: GenericRecord,
      name: String,
      dt: DataType): Any = {
    if (rec.getSchema.getField(name) == null) return null
    rec.get(name) match {
      case null => null
      case v => (v, dt) match {
        // numeric coercion follows the Avro schema-resolution
        // promotion directions ONLY (int→long/float/double,
        // long→float/double, float→double): a narrowing read (e.g.
        // Avro long into an int target) nulls rather than silently
        // wrapping or truncating
        case (b: java.lang.Boolean, BooleanType) => b
        case (n: java.lang.Integer, IntegerType) => n
        case (n: java.lang.Integer, LongType) => n.longValue()
        case (n: java.lang.Long, LongType) => n
        case (n: java.lang.Integer, FloatType) => n.floatValue()
        case (n: java.lang.Long, FloatType) => n.floatValue()
        case (n: java.lang.Float, FloatType) => n
        case (n: java.lang.Integer, DoubleType) => n.doubleValue()
        case (n: java.lang.Long, DoubleType) => n.doubleValue()
        case (n: java.lang.Float, DoubleType) => n.doubleValue()
        case (n: java.lang.Double, DoubleType) => n
        case (s: CharSequence, StringType) => s.toString
        case (b: java.nio.ByteBuffer, BinaryType) =>
          val out = new Array[Byte](b.remaining())
          b.duplicate().get(out)
          out
        case (b: Array[Byte], BinaryType) => b
        case _ => null
      }
    }
  }
}

/** Authoring twin for [[AvroOcf]] — spec-exact OCF bytes through the
  * Avro reference writer (null and deflate codecs), for fixtures and
  * the q257 gate.
  */
object AvroOcfFixture {

  import org.apache.avro.Schema
  import org.apache.avro.file.{CodecFactory, DataFileWriter}
  import org.apache.avro.generic.{GenericData, GenericDatumWriter}

  /** Avro writer schema for a flat Spark schema (nullable unions). */
  def avroSchema(schema: StructType, name: String = "rec"): Schema = {
    val fields = schema.map { f =>
      val t = f.dataType match {
        case BooleanType => "boolean"
        case IntegerType => "int"
        case LongType => "long"
        case FloatType => "float"
        case DoubleType => "double"
        case StringType => "string"
        case BinaryType => "bytes"
        case other =>
          throw new IllegalArgumentException(s"fixture type $other")
      }
      s"""{"name":"${f.name}","type":["null","$t"],"default":null}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"$name","fields":[$fields]}""")
  }

  /** Write one OCF file of `rows` (aligned with `schema`); deflate
    * when `deflate` is set. Returns nothing — the reader's gate
    * replays content from the source tables.
    */
  def write(
      spark: SparkSession,
      dir: String,
      fileName: String,
      schema: StructType,
      rows: Seq[Seq[Any]],
      deflate: Boolean = false,
      recordName: String = "rec"): Unit = {
    val avro = avroSchema(schema, recordName)
    val p = new org.apache.hadoop.fs.Path(dir, fileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avro))
    if (deflate) w.setCodec(CodecFactory.deflateCodec(6)): Unit
    w.create(avro, out)
    rows.foreach { r =>
      val rec = new GenericData.Record(avro)
      schema.fieldNames.zip(r).foreach { case (n, v) =>
        rec.put(n, v match {
          case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
          case other => other
        })
      }
      w.append(rec)
    }
    w.close()
  }
}
