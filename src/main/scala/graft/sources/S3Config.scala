package graft.sources

import org.apache.spark.sql.SparkSession

/** Credential/config injection — the Spark-native analog of the
  * reference's env-var seeding (`set_environment_variables`,
  * download_file.py:60-71), client config (`connect_to_s3`,
  * download_file.py:74-85), and the upload blueprint's object-level
  * `extra_args` (SSE/ACL, upload_file.py:197-214).
  *
  * On a cluster the same DataFrame code drives `s3a://` URIs; locally it
  * drives `file://`. Everything lands in the Hadoop configuration that
  * every executor's S3A filesystem client reads, so nothing here is
  * driver-local state. Object-write settings map to the public S3A
  * keys: `fs.s3a.server-side-encryption-algorithm` /
  * `fs.s3a.server-side-encryption.key` (SSE-S3 "AES256" or "SSE-KMS" +
  * key ARN) and `fs.s3a.acl.default` (canned ACL applied to every
  * object the connector writes).
  */
final case class S3Config(
    accessKeyId: Option[String] = None,
    secretAccessKey: Option[String] = None,
    sessionToken: Option[String] = None,
    region: Option[String] = None,
    endpoint: Option[String] = None,
    pathStyleAccess: Boolean = false,
    sseAlgorithm: Option[String] = None,
    sseKey: Option[String] = None,
    cannedAcl: Option[String] = None,
    // Transfer tuning — the `boto3.s3.transfer.TransferConfig` analog
    // (upload_file.py:209). These govern real S3 write throughput:
    // part size for multipart uploads, buffered (async) upload, and the
    // HTTP connection pool each executor's S3A client may open.
    multipartSizeBytes: Option[Long] = None,
    fastUpload: Option[Boolean] = None,
    maxConnections: Option[Int] = None)

object S3Config {

  /** Read the same environment variables the reference honors. */
  def fromEnv(env: Map[String, String] = sys.env): S3Config =
    S3Config(
      accessKeyId = env.get("AWS_ACCESS_KEY_ID"),
      secretAccessKey = env.get("AWS_SECRET_ACCESS_KEY"),
      sessionToken = env.get("AWS_SESSION_TOKEN"),
      region = env.get("AWS_DEFAULT_REGION"))

  /** Apply the config to the session's Hadoop conf (the S3A client's
    * config source on every executor). Explicit values override
    * whatever the environment seeded, matching the reference's
    * "override system defaults" behavior.
    */
  def apply(spark: SparkSession, cfg: S3Config): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    cfg.accessKeyId.foreach(hc.set("fs.s3a.access.key", _))
    cfg.secretAccessKey.foreach(hc.set("fs.s3a.secret.key", _))
    cfg.sessionToken.foreach(hc.set("fs.s3a.session.token", _))
    cfg.region.foreach(hc.set("fs.s3a.endpoint.region", _))
    cfg.endpoint.foreach(hc.set("fs.s3a.endpoint", _))
    if (cfg.pathStyleAccess) hc.set("fs.s3a.path.style.access", "true")
    cfg.sseAlgorithm.foreach(
      hc.set("fs.s3a.server-side-encryption-algorithm", _))
    cfg.sseKey.foreach(hc.set("fs.s3a.server-side-encryption.key", _))
    cfg.cannedAcl.foreach(hc.set("fs.s3a.acl.default", _))
    cfg.multipartSizeBytes.foreach(v =>
      hc.set("fs.s3a.multipart.size", v.toString))
    cfg.fastUpload.foreach(v => hc.set("fs.s3a.fast.upload", v.toString))
    cfg.maxConnections.foreach(v =>
      hc.set("fs.s3a.connection.maximum", v.toString))
  }
}
