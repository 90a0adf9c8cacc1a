package graft.sources

import graft.SparkTestBase

class S3ConfigSpec extends SparkTestBase {

  test("fromEnv reads the reference's environment variables") {
    val cfg = S3Config.fromEnv(Map(
      "AWS_ACCESS_KEY_ID" -> "AKIATEST",
      "AWS_SECRET_ACCESS_KEY" -> "secret",
      "AWS_SESSION_TOKEN" -> "tok",
      "AWS_DEFAULT_REGION" -> "eu-west-1"))
    assert(cfg.accessKeyId.contains("AKIATEST"))
    assert(cfg.secretAccessKey.contains("secret"))
    assert(cfg.sessionToken.contains("tok"))
    assert(cfg.region.contains("eu-west-1"))
    assert(S3Config.fromEnv(Map.empty) == S3Config())
  }

  test("apply lands credentials and object-write settings in Hadoop conf") {
    S3Config.apply(spark, S3Config(
      accessKeyId = Some("AKIATEST"),
      secretAccessKey = Some("secret"),
      sessionToken = Some("tok"),
      region = Some("us-east-2"),
      endpoint = Some("https://minio.local:9000"),
      pathStyleAccess = true,
      sseAlgorithm = Some("SSE-KMS"),
      sseKey = Some("arn:aws:kms:us-east-2:111:key/abc"),
      cannedAcl = Some("BucketOwnerFullControl"),
      multipartSizeBytes = Some(64L * 1024 * 1024),
      fastUpload = Some(true),
      maxConnections = Some(96)))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") == "AKIATEST")
    assert(hc.get("fs.s3a.secret.key") == "secret")
    assert(hc.get("fs.s3a.session.token") == "tok")
    assert(hc.get("fs.s3a.endpoint.region") == "us-east-2")
    assert(hc.get("fs.s3a.endpoint") == "https://minio.local:9000")
    assert(hc.get("fs.s3a.path.style.access") == "true")
    // the upload blueprint's extra_args analog (SSE/ACL,
    // upload_file.py:197-214) as public S3A keys
    assert(hc.get("fs.s3a.server-side-encryption-algorithm") == "SSE-KMS")
    assert(hc.get("fs.s3a.server-side-encryption.key")
      == "arn:aws:kms:us-east-2:111:key/abc")
    assert(hc.get("fs.s3a.acl.default") == "BucketOwnerFullControl")
    // the TransferConfig analog (upload_file.py:209): multipart part
    // size, buffered upload, connection pool
    assert(hc.get("fs.s3a.multipart.size") == (64L * 1024 * 1024).toString)
    assert(hc.get("fs.s3a.fast.upload") == "true")
    assert(hc.get("fs.s3a.connection.maximum") == "96")
    // the session's derived conf (what executors' S3A clients read)
    // sees the same values
    assert(spark.sessionState.newHadoopConf()
      .get("fs.s3a.server-side-encryption-algorithm") == "SSE-KMS")
  }
}
