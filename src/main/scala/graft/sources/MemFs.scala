package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-process Hadoop FileSystem (`memfs://bucket/...`) — the testable
  * half of the object-store seam (SURVEY §2.5 48n). Object stores
  * reach graft operators ONLY through the Hadoop FileSystem API
  * (`s3a://`, `gs://`, `abfs://` are path schemes, not operators —
  * sources/Io.scala header), so a complete in-JVM FileSystem proves
  * every read/write path is genuinely scheme-agnostic: the exact
  * create/rename/list/seek contract the real connectors implement,
  * minus the network this sandbox doesn't have. Register with
  * `conf.set("fs.memfs.impl", classOf[MemFs].getName)` and any
  * `spark.read/write` or AvroIo call works against `memfs://` paths —
  * including Spark's commit protocol (task-temp rename dance) and
  * parquet's seek-driven footer reads.
  *
  * Store is JVM-global (one "region" per process), keyed by
  * `bucket + path`; fine for local[n] where driver and executors share
  * the JVM. Not a production FS — a contract-exercising stub.
  */
class MemFs extends FileSystem {
  import MemFs._

  private var uri: URI = _
  private var workingDir: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
  }

  override def getScheme: String = "memfs"
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = workingDir
  override def setWorkingDirectory(dir: Path): Unit = workingDir = dir

  /** bucket-qualified key, normalized without trailing slash */
  private def key(f: Path): String = {
    val p = makeQualified(f).toUri
    val raw = Option(p.getAuthority).getOrElse("") + p.getPath
    if (raw.length > 1 && raw.endsWith("/")) raw.dropRight(1) else raw
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = key(f)
    val bytes = files.get(k)
    if (bytes == null) throw new FileNotFoundException(s"memfs: $k")
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (!overwrite && files.containsKey(k))
      throw new IOException(s"memfs: $k already exists")
    if (dirs.containsKey(k))
      throw new IOException(s"memfs: $k is a directory")
    // parent directories materialize implicitly, like an object store
    markDirs(k)
    val buf = new ByteArrayOutputStream() {
      override def close(): Unit = { super.close(); files.put(k, toByteArray) }
    }
    new FSDataOutputStream(buf, statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("memfs: append not supported (object-store semantics)")

  override def rename(src: Path, dst: Path): Boolean = {
    val (s, d) = (key(src), key(dst))
    if (files.containsKey(s)) { // file rename
      val moved = files.remove(s)
      if (moved == null) return false
      markDirs(d)
      files.put(d, moved)
      true
    } else if (dirs.containsKey(s)) { // directory rename: move the subtree
      val prefix = s + "/"
      val fileKeys = files.keySet().asScala.filter(k => k.startsWith(prefix)).toList
      val dirKeys = dirs.keySet().asScala.filter(k => k == s || k.startsWith(prefix)).toList
      dirs.put(d, java.lang.Boolean.TRUE)
      markDirs(d + "/x") // ensure d's parents exist
      dirKeys.foreach { k => dirs.remove(k); dirs.put(d + k.stripPrefix(s), java.lang.Boolean.TRUE) }
      fileKeys.foreach { k =>
        val moved = files.remove(k)
        if (moved != null) files.put(d + k.stripPrefix(s), moved)
      }
      true
    } else false
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (files.remove(k) != null) true
    else if (dirs.containsKey(k)) {
      val prefix = k + "/"
      val children = files.keySet().asScala.exists(_.startsWith(prefix)) ||
        dirs.keySet().asScala.exists(_.startsWith(prefix))
      if (children && !recursive)
        throw new IOException(s"memfs: $k is a non-empty directory")
      files.keySet().asScala.filter(_.startsWith(prefix)).toList.foreach(files.remove)
      dirs.keySet().asScala.filter(x => x == k || x.startsWith(prefix)).toList.foreach(dirs.remove)
      true
    } else false
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (files.containsKey(k)) return Array(getFileStatus(f))
    if (!dirs.containsKey(k) && k.nonEmpty) throw new FileNotFoundException(s"memfs: $k")
    val prefix = if (k.isEmpty) "/" else k + "/"
    def directChild(c: String): Boolean =
      c.startsWith(prefix) && !c.substring(prefix.length).contains('/')
    val childFiles = files.keySet().asScala.filter(directChild).toSeq
    val childDirs = dirs.keySet().asScala.filter(directChild).toSeq
    (childFiles ++ childDirs).sorted.map(c => statusFor(c)).toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    markDirs(key(f) + "/x")
    true
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    if (!files.containsKey(k) && !dirs.containsKey(k) && k.nonEmpty)
      throw new FileNotFoundException(s"memfs: $k")
    statusFor(if (k.isEmpty) "/" else k)
  }

  private def statusFor(k: String): FileStatus = {
    val bytes = files.get(k)
    val p = new Path(uri.getScheme + ":/" + (if (k.startsWith("/")) "" else "/") + k)
    if (bytes != null)
      new FileStatus(bytes.length.toLong, false, 1, 64L << 20, 0L, p)
    else
      new FileStatus(0L, true, 1, 0L, 0L, p)
  }

  /** register every ancestor of a file key as a directory */
  private def markDirs(fileKey: String): Unit = {
    var slash = fileKey.lastIndexOf('/')
    while (slash > 0) {
      dirs.put(fileKey.substring(0, slash), java.lang.Boolean.TRUE)
      slash = fileKey.lastIndexOf('/', slash - 1)
    }
  }
}

object MemFs {
  /** JVM-global object store: key = bucket + absolute path. */
  private val files = new ConcurrentHashMap[String, Array[Byte]]()
  private val dirs = new ConcurrentHashMap[String, java.lang.Boolean]()

  /** Test/lifecycle helper: drop everything (all buckets). */
  def clear(): Unit = { files.clear(); dirs.clear() }

  /** Seekable+PositionedReadable view over a byte array — the read
    * contract parquet needs (footer seeks, positioned column reads). */
  private final class SeekableBytes(bytes: Array[Byte])
      extends ByteArrayInputStream(bytes) with Seekable with PositionedReadable {
    override def seek(pos: Long): Unit = {
      if (pos < 0 || pos > bytes.length) throw new IOException(s"seek $pos out of range")
      this.pos = pos.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new IOException("memfs: EOF before readFully satisfied")
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
