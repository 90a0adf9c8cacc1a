package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test filesystem rejecting every operation with the auth failure S3A
  * raises on HTTP 403 — exercises the exit-202 translation.
  */
class DenyFileSystem extends FileSystem {
  private var uri: URI = URI.create("deny:///")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(name.getScheme + "://" +
      Option(name.getAuthority).getOrElse(""))
    setConf(conf)
  }

  override def getScheme: String = "deny"
  override def getUri: URI = uri

  private def deny(p: Path): Nothing =
    throw new java.nio.file.AccessDeniedException(p.toString)

  override def open(f: Path, bufferSize: Int): FSDataInputStream = deny(f)
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = deny(f)
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = deny(f)
  override def rename(src: Path, dst: Path): Boolean = deny(src)
  override def delete(f: Path, recursive: Boolean): Boolean = deny(f)
  override def listStatus(f: Path): Array[FileStatus] = deny(f)
  override def setWorkingDirectory(newDir: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(uri.toString + "/")
  override def mkdirs(f: Path, permission: FsPermission): Boolean = deny(f)
  override def getFileStatus(f: Path): FileStatus = deny(f)
}
