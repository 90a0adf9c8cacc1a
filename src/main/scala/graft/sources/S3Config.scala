package graft.sources

import org.apache.spark.sql.SparkSession

/** Credential/config injection — the Spark-native analog of the
  * reference's env-var seeding (`set_environment_variables`,
  * download_file.py:60-71) and client config
  * (`connect_to_s3`, download_file.py:74-85).
  *
  * On a cluster the same DataFrame code drives `s3a://` URIs; locally it
  * drives `file://`. Credentials land in the Hadoop configuration that
  * every executor's S3A filesystem client reads, so nothing here is
  * driver-local state.
  */
final case class S3Config(
    accessKeyId: Option[String] = None,
    secretAccessKey: Option[String] = None,
    region: Option[String] = None,
    endpoint: Option[String] = None,
    pathStyleAccess: Boolean = false)

object S3Config {

  /** Read the same environment variables the reference honors. */
  def fromEnv(env: Map[String, String] = sys.env): S3Config =
    S3Config(
      accessKeyId = env.get("AWS_ACCESS_KEY_ID"),
      secretAccessKey = env.get("AWS_SECRET_ACCESS_KEY"),
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
    cfg.region.foreach(hc.set("fs.s3a.endpoint.region", _))
    cfg.endpoint.foreach(hc.set("fs.s3a.endpoint", _))
    if (cfg.pathStyleAccess) hc.set("fs.s3a.path.style.access", "true")
  }
}
