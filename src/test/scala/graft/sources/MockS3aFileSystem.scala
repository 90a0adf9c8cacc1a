package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Mock object-store filesystem: serves `s3a://<bucket>/<key>` URIs
  * from a local directory (`fs.s3a.mock.dir/<bucket>/<key>`), with
  * every returned FileStatus path translated BACK to the s3a scheme —
  * so catalog listing, glob matching, read/write/move/remove and the
  * error translation all run against object-store-shaped URIs without
  * a network (reference behavior anchor: download_file.py:60-85 always
  * addresses `s3://bucket/key`). Registered per-test via
  * `fs.s3a.impl`; no real S3A connector is on the classpath.
  */
class MockS3aFileSystem extends FileSystem {
  private var uri: URI = URI.create("s3a:///")
  private var rootDir: String = _
  private val local = new RawLocalFileSystem()

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
    rootDir = conf.get("fs.s3a.mock.dir")
    require(rootDir != null, "fs.s3a.mock.dir must point at a local dir")
    local.initialize(URI.create("file:///"), conf)
    setConf(conf)
  }

  override def getScheme: String = "s3a"
  override def getUri: URI = uri

  private def bucket: String = uri.getAuthority

  private def toLocal(p: Path): Path = {
    val key = p.toUri.getPath
    new Path(s"file:$rootDir/$bucket$key")
  }

  private def toRemote(lp: Path): Path = {
    val full = lp.toUri.getPath
    val prefix = s"$rootDir/$bucket"
    new Path(uri.toString + full.stripPrefix(prefix))
  }

  private def translate(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      st.getPermission, st.getOwner, st.getGroup, toRemote(st.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)
  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    local.create(toLocal(f), permission, overwrite, bufferSize,
      replication, blockSize, progress)
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    local.append(toLocal(f), bufferSize, progress)
  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))
  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)
  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(translate)
  override def setWorkingDirectory(newDir: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(uri.toString + "/")
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)
  override def getFileStatus(f: Path): FileStatus =
    translate(local.getFileStatus(toLocal(f)))
}
