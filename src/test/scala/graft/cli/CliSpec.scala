package graft.cli

import java.nio.file.{Files, Path => JPath}

import graft.SparkTestBase
import graft.sources.DenyFileSystem

/** Drives [[Main.run]] for all four blueprint verbs and all three
  * reference exit codes (exit_codes.py:1-3), against `file:` bucket
  * URIs — same code path as `s3a://`, minus the network.
  */
class CliSpec extends SparkTestBase {

  private def tmpDir(prefix: String): JPath = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def plant(dir: JPath, files: (String, String)*): Unit =
    files.foreach { case (name, content) =>
      val f = dir.resolve(name)
      Files.createDirectories(f.getParent)
      Files.write(f, content.getBytes("UTF-8")): Unit
    }

  private def runCli(args: String*): (Int, Seq[String]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val rc = Main.run(args.toArray, out.append(_), out.append(_))
    (rc, out.toSeq)
  }

  test("download: exact match copies one object to the destination folder") {
    val bucket = tmpDir("cli_bucket_")
    val dest = tmpDir("cli_dest_")
    plant(bucket, "data/report.csv" -> "id\n1\n", "data/other.csv" -> "x\n")
    val (rc, out) = runCli("download",
      "--bucket-name", s"file:$bucket",
      "--source-folder-name", "data",
      "--source-file-name-match-type", "exact_match",
      "--source-file-name", "report.csv",
      "--destination-folder-name", dest.toString)
    assert(rc == 0, out.mkString("; "))
    assert(new String(Files.readAllBytes(dest.resolve("report.csv"))) == "id\n1\n")
    assert(!Files.exists(dest.resolve("other.csv")))
    assert(Files.exists(bucket.resolve("data/report.csv"))) // source kept
  }

  test("download: regex multi-match enumerates the destination name") {
    val bucket = tmpDir("cli_bucket_")
    val dest = tmpDir("cli_dest_")
    plant(bucket, "a.csv" -> "a", "sub/b.csv" -> "b", "c.txt" -> "c")
    val (rc, _) = runCli("download",
      "--bucket-name", s"file:$bucket",
      "--source-file-name-match-type", "regex_match",
      "--source-file-name", "\\.csv$",
      "--destination-file-name", "data.csv",
      "--destination-folder-name", dest.toString)
    assert(rc == 0)
    // recursive key-space match (a.csv + sub/b.csv), flattened + enumerated
    assert(new String(Files.readAllBytes(dest.resolve("data_1.csv"))) == "a")
    assert(new String(Files.readAllBytes(dest.resolve("data_2.csv"))) == "b")
    assert(!Files.exists(dest.resolve("c.txt")))
  }

  test("upload: regex match sends local tree files into the bucket folder") {
    val local = tmpDir("cli_local_")
    val bucket = tmpDir("cli_bucket_")
    plant(local, "x.json" -> "{}", "deep/y.json" -> "[]", "skip.csv" -> "no")
    val (rc, _) = runCli("upload",
      "--bucket-name", s"file:$bucket",
      "--source-folder-name", local.toString,
      "--source-file-name-match-type", "regex_match",
      "--source-file-name", "\\.json$",
      "--destination-folder-name", "landing")
    assert(rc == 0)
    // flattened into the destination folder, source base names kept
    assert(new String(Files.readAllBytes(bucket.resolve("landing/x.json"))) == "{}")
    assert(new String(Files.readAllBytes(bucket.resolve("landing/y.json"))) == "[]")
    assert(!Files.exists(bucket.resolve("landing/skip.csv")))
  }

  test("move: renames into the destination bucket and deletes the source") {
    val src = tmpDir("cli_src_")
    val dst = tmpDir("cli_dst_")
    plant(src, "keep.txt" -> "k", "old/log.txt" -> "l")
    val (rc, _) = runCli("move",
      "--source-bucket-name", s"file:$src",
      "--destination-bucket-name", s"file:$dst",
      "--source-folder-name", "old",
      "--source-file-name-match-type", "exact_match",
      "--source-file-name", "log.txt",
      "--destination-file-name", "archived.txt")
    assert(rc == 0)
    assert(new String(Files.readAllBytes(dst.resolve("archived.txt"))) == "l")
    assert(!Files.exists(src.resolve("old/log.txt"))) // moved, not copied
    assert(Files.exists(src.resolve("keep.txt")))
  }

  test("remove: deletes only the regex-matched keys") {
    val bucket = tmpDir("cli_bucket_")
    plant(bucket, "t/a.tmp" -> "1", "t/b.tmp" -> "2", "t/keep.csv" -> "3")
    val (rc, _) = runCli("remove",
      "--bucket-name", s"file:$bucket",
      "--source-folder-name", "t",
      "--source-file-name-match-type", "regex_match",
      "--source-file-name", "\\.tmp$")
    assert(rc == 0)
    assert(!Files.exists(bucket.resolve("t/a.tmp")))
    assert(!Files.exists(bucket.resolve("t/b.tmp")))
    assert(Files.exists(bucket.resolve("t/keep.csv")))
  }

  test("compact: merges a fragmented dataset through the manifest commit") {
    val bucket = tmpDir("cli_bucket_")
    // plant a fragmented parquet dataset under data/frag
    val ds = spark.range(0, 1000).toDF("id").repartition(8)
    ds.write.mode("overwrite").parquet(s"file:$bucket/data/frag")
    val (rc, out) = runCli("compact",
      "--bucket-name", s"file:$bucket",
      "--source-folder-name", "data/frag",
      "--target-file-size-mb", "64")
    assert(rc == 0, out.mkString("; "))
    assert(out.exists(_.contains("successfully compacted")), out)
    // committed view intact, fewer files, manifest layout present
    val io = new graft.sources.DatasetIO(spark)
    assert(io.readCommitted(s"file:$bucket/data/frag").count() == 1000L)
    assert(Files.exists(bucket.resolve("data/frag/_manifests")))
    // flag validation
    assert(runCli("compact")._1 == 2)
    assert(runCli("compact", "--bucket-name", s"file:$bucket",
      "--target-file-size-mb", "zero")._1 == 2)
  }

  test("exit 201 when nothing matches") {
    val bucket = tmpDir("cli_bucket_")
    plant(bucket, "a.csv" -> "a")
    val (rc, out) = runCli("download",
      "--bucket-name", s"file:$bucket",
      "--source-file-name-match-type", "exact_match",
      "--source-file-name", "missing.csv")
    assert(rc == 201, out.mkString("; "))
  }

  test("exit 202 on filesystem auth failure") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.deny.impl", classOf[DenyFileSystem].getName)
    val (rc, _) = runCli("remove",
      "--bucket-name", "deny://bucket",
      "--source-file-name-match-type", "exact_match",
      "--source-file-name", "x.csv")
    assert(rc == 202)
  }

  test("exit 203 on an invalid regex") {
    val bucket = tmpDir("cli_bucket_")
    plant(bucket, "a.csv" -> "a")
    val (rc, _) = runCli("download",
      "--bucket-name", s"file:$bucket",
      "--source-file-name-match-type", "regex_match",
      "--source-file-name", "[unclosed")
    assert(rc == 203)
  }

  test("usage errors exit 2: bad verb, missing flag, bad choice") {
    assert(runCli("explode")._1 == 2)
    assert(runCli("download",
      "--source-file-name", "x")._1 == 2) // no bucket / match type
    assert(runCli("download",
      "--bucket-name", "b",
      "--source-file-name-match-type", "fuzzy_match",
      "--source-file-name", "x")._1 == 2)
    assert(runCli("download", "--bucket-name")._1 == 2) // dangling flag
  }

  test("bare bucket names address s3a; URIs pass through") {
    assert(Main.bucketUri("my-bucket") == "s3a://my-bucket")
    assert(Main.bucketUri("file:/tmp/x/") == "file:/tmp/x")
    assert(Main.bucketUri("hdfs://nn:8020/warehouse")
      == "hdfs://nn:8020/warehouse")
  }

  test("extra-args dict literal parses to object-write settings") {
    assert(Main.parseExtraArgs(
      "{'ACL': 'public-read', 'ServerSideEncryption': 'AES256'}")
      == Map("ACL" -> "public-read", "ServerSideEncryption" -> "AES256"))
    assert(Main.parseExtraArgs("{}") == Map.empty[String, String])
    // strict-JSON quoting is equally valid (round 10)
    assert(Main.parseExtraArgs(
      """{"ACL": "private", "SSEKMSKeyId": "k-1"}""")
      == Map("ACL" -> "private", "SSEKMSKeyId" -> "k-1"))
    // trailing comma is a valid Python literal
    assert(Main.parseExtraArgs("{'ACL': 'private',}")
      == Map("ACL" -> "private"))
  }

  test("malformed --extra-args throws instead of part-parsing") {
    // the reference literal_eval's the argument: malformed input is an
    // error, never a silent partial parse (upload_file.py:231)
    for (bad <- Seq("ACL=private", "{'ACL': private}", "{'ACL' 'private'}",
        "{'ACL': 'private' 'X': 'y'}", "{'ACL': 'private")) {
      intercept[IllegalArgumentException](Main.parseExtraArgs(bad))
    }
  }

  test("strict-JSON --extra-args upload lands SSE/ACL in the Hadoop conf") {
    val src = tmpDir("cli_src_")
    val bucket = tmpDir("cli_bucket_")
    plant(src, "a.csv" -> "a")
    val outs = scala.collection.mutable.ArrayBuffer.empty[String]
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val rc = Main.run(Array("upload",
      "--bucket-name", s"file:$bucket",
      "--source-folder-name", src.toString,
      "--source-file-name-match-type", "exact_match",
      "--source-file-name", "a.csv",
      "--extra-args",
      """{"ACL": "bucket-owner-full-control", "ServerSideEncryption": "aws:kms", "SSEKMSKeyId": "key-42"}"""),
      outs.append(_), errs.append(_))
    assert(rc == 0, (outs ++ errs).mkString("; "))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.acl.default") == "bucket-owner-full-control")
    assert(hc.get("fs.s3a.server-side-encryption-algorithm") == "aws:kms")
    assert(errs.isEmpty, s"no warnings expected: $errs")
  }

  test("unsupported --extra-args keys warn instead of silently dropping") {
    // the reference forwards ANY dict key to boto3 (upload_file.py:231);
    // keys this engine can't map must be called out, not eaten
    val src = tmpDir("cli_src_")
    val bucket = tmpDir("cli_bucket_")
    plant(src, "a.csv" -> "a")
    val outs = scala.collection.mutable.ArrayBuffer.empty[String]
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val rc = Main.run(Array("upload",
      "--bucket-name", s"file:$bucket",
      "--source-folder-name", src.toString,
      "--source-file-name-match-type", "exact_match",
      "--source-file-name", "a.csv",
      "--extra-args", "{'ACL': 'private', 'Metadata': 'k=v'}"),
      outs.append(_), errs.append(_))
    assert(rc == 0, (outs ++ errs).mkString("; "))
    assert(errs.exists(e => e.contains("warning") && e.contains("Metadata")),
      s"expected a Metadata warning, got: $errs")
    assert(!errs.exists(_.contains("ACL' is not supported")),
      s"supported key must not warn: $errs")
  }

  test("credential flags and --s3-config land in the Hadoop conf") {
    val bucket = tmpDir("cli_bucket_")
    plant(bucket, "a.csv" -> "a")
    val dest = tmpDir("cli_dest_")
    val (rc, _) = runCli("download",
      "--bucket-name", s"file:$bucket",
      "--source-file-name-match-type", "exact_match",
      "--source-file-name", "a.csv",
      "--destination-folder-name", dest.toString,
      "--aws-access-key-id", "AKIACLI",
      "--aws-default-region", "ap-south-1",
      "--s3-config", "fs.s3a.multipart.size=67108864,fs.s3a.fast.upload=true")
    assert(rc == 0)
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") == "AKIACLI")
    assert(hc.get("fs.s3a.endpoint.region") == "ap-south-1")
    assert(hc.get("fs.s3a.multipart.size") == "67108864")
    assert(hc.get("fs.s3a.fast.upload") == "true")
  }
}
