package graft.sources

import java.io.File
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, FSDataInputStream,
  FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import graft.cache.{CacheStats, LruLoadingCache}

/** Read-path file cache over any backing FileSystem — the Spark-side analog
  * of the reference's cache layer on the executor read path
  * (core/src/cache_layer/object_store/file.rs: an ObjectStore wrapper whose
  * `get` serves whole files from a fast local medium, loading them through
  * the single-flight LRU loading cache; medium/local_disk.rs is the
  * disk-medium this class mirrors).
  *
  * Deployment shape: bind a scheme to this class and name the backing
  * scheme —
  * {{{
  *   fs.gs.impl                 = graft.sources.CachingFs
  *   fs.gs.cache.backing.scheme = <the real connector's scheme binding>
  *   fs.gs.cache.dir            = /fast/local/ssd/graft-cache
  *   fs.gs.cache.maxBytes       = 107374182400
  * }}}
  * Every `open()` then serves a local copy: the first reader of a file
  * copies it down once (single-flight across concurrent tasks — parquet
  * footer + row-group reads race to open the same object), later readers
  * hit local disk, and the LRU budget bounds the medium by MEASURED file
  * bytes, deleting cold copies (an already-open stream on a deleted file
  * keeps reading its unlinked inode on POSIX — eviction never breaks an
  * in-flight scan).
  *
  * Cache keys include the backing file's (mtime, length), so a rewritten
  * object misses naturally and stale copies age out by LRU — the same
  * freshness contract as the reference's `ObjectMeta`-keyed cache entries.
  * Metadata ops (list/status/exists) always consult the backing store;
  * writes pass through untouched. Only whole-file read locality is cached,
  * like the reference's whole-file policy (`policy/file.rs`).
  *
  * 100-TB note: the cache state is per-JVM (each executor caches what it
  * reads — locality follows the task schedule, like the reference's
  * per-executor cache), and the budget is enforced in bytes actually
  * copied, so a hot 2-TB working set on a 100-GB NVMe budget degrades to
  * LRU churn, never to disk-full.
  */
class CachingFs extends FileSystem {
  private var schemeUri: URI = _
  private var backing: FileSystem = _
  private var backingScheme: String = _
  private var local: RawLocalFileSystem = _
  private var state: CachingFs.State = _
  private var workDir: Path = _

  override def getScheme: String =
    if (schemeUri == null) "cachefs" else schemeUri.getScheme

  override def getUri: URI =
    if (schemeUri == null) URI.create("cachefs:///") else schemeUri

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    val scheme = name.getScheme
    schemeUri = URI.create(s"$scheme:///")
    backingScheme = conf.get(s"fs.$scheme.cache.backing.scheme", "file")
    require(backingScheme != scheme,
      s"fs.$scheme.cache.backing.scheme must name a different scheme binding")
    backing = FileSystem.newInstance(URI.create(s"$backingScheme:///"), conf)
    local = new RawLocalFileSystem
    local.initialize(URI.create("file:///"), conf)
    val dir = conf.get(s"fs.$scheme.cache.dir",
      new File(System.getProperty("java.io.tmpdir"), "graft-fs-cache").getPath)
    val maxBytes = conf.getLong(s"fs.$scheme.cache.maxBytes", 1L << 30)
    state = CachingFs.stateFor(scheme, dir, maxBytes)
    workDir = new Path(schemeUri.toString)
  }

  // ---- path translation (authority-less, like the stand-in store) ---------

  private def toBacking(f: Path): Path =
    new Path(s"$backingScheme://${f.toUri.getPath}")

  private def fromBacking(p: Path): Path =
    new Path(s"${schemeUri.getScheme}://${p.toUri.getPath}")

  private def rewrap(s: FileStatus): FileStatus = {
    s.setPath(fromBacking(s.getPath))
    s
  }

  // ---- the cached read path ----------------------------------------------

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bp = toBacking(f)
    val st = backing.getFileStatus(bp)
    val key = s"$bp@${st.getModificationTime}:${st.getLen}"
    // a concurrent capacity eviction can unlink the copy between get() and
    // open() (once open, deletion is harmless — POSIX unlinked-inode reads);
    // the retry re-loads through the single-flight cache
    var attempt = 0
    while (true) {
      val copy = state.cache.get(key, () => copyDown(bp, key, st.getLen))
      try {
        return local.open(new Path(copy.getPath), bufferSize)
      } catch {
        case e: java.io.FileNotFoundException =>
          state.cache.invalidate(key)
          attempt += 1
          if (attempt >= 3) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Loader: one whole-file copy into the cache dir (the reference's
    * `CacheLoader` writing through the medium, policy/file.rs:139-170).
    * Staged to a temp name then renamed, so a crashed copy never serves. */
  private def copyDown(bp: Path, key: String, len: Long): File = {
    val dir = new File(state.dir)
    dir.mkdirs()
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val target = new File(dir, digest)
    val tmp = new File(dir, s"$digest.${java.util.UUID.randomUUID()}.tmp")
    val in = backing.open(bp)
    try {
      val out = new java.io.FileOutputStream(tmp)
      try {
        val buf = new Array[Byte](1 << 20)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
    if (!tmp.renameTo(target)) {
      // another JVM landed the same key first; its copy is equivalent
      tmp.delete()
      require(target.length() == len, s"cache copy for $bp is truncated")
    }
    target
  }

  // ---- metadata + writes: straight through to the backing store ----------

  override def getFileStatus(f: Path): FileStatus =
    rewrap(backing.getFileStatus(toBacking(f)))

  override def listStatus(f: Path): Array[FileStatus] =
    backing.listStatus(toBacking(f)).map(rewrap)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    backing.create(toBacking(f), permission, overwrite, bufferSize,
      replication, blockSize, progress)

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    backing.append(toBacking(f), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean =
    backing.rename(toBacking(src), toBacking(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    backing.delete(toBacking(f), recursive)

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    backing.mkdirs(toBacking(f), permission)

  override def getWorkingDirectory: Path =
    if (workDir == null) new Path("cachefs:///") else workDir

  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  override def close(): Unit = {
    try backing.close() finally super.close()
  }
}

object CachingFs {

  final class State(val dir: String, maxBytes: Long) {
    val cache = new LruLoadingCache[String, File, () => File](
      loader = (_, copy) => copy(),
      maxWeight = maxBytes,
      weigher = (_, f) => f.length(),
      onEvict = (_, f, _) => { f.delete(); () })
  }

  // one shared policy state per (scheme, cache dir) across the many
  // FileSystem instances Hadoop creates — the budget is per medium, not
  // per handle (the reference holds one FileCacheLayer per executor)
  private val states = new ConcurrentHashMap[String, State]

  private[sources] def stateFor(scheme: String, dir: String,
      maxBytes: Long): State =
    states.computeIfAbsent(s"$scheme@$dir", _ => new State(dir, maxBytes))

  /** Metrics for the medium bound to (scheme, dir) — hit/miss/load/evict
    * counters plus resident bytes (the reference's cache metrics surface).
    */
  def stats(scheme: String, dir: String): Option[CacheStats] =
    Option(states.get(s"$scheme@$dir")).map(_.cache.stats)

  /** Drop every cached copy for (scheme, dir) and forget the state — lets a
    * new budget take effect and returns the disk. */
  def purge(scheme: String, dir: String): Unit = {
    val s = states.remove(s"$scheme@$dir")
    if (s != null) s.cache.invalidateAll()
  }

  /** Scan-scoped options (the [[ObjectStores.standInOptions]] pattern):
    * `spark.read.options(cachingOptions(...)).parquet("gs:///…")` caches
    * that relation's reads without touching the session conf. */
  def cachingOptions(scheme: String, backingScheme: String, dir: String,
      maxBytes: Long = 1L << 30): Map[String, String] = Map(
    s"fs.$scheme.impl" -> classOf[CachingFs].getName,
    s"fs.$scheme.impl.disable.cache" -> "true",
    s"fs.$scheme.cache.backing.scheme" -> backingScheme,
    s"fs.$scheme.cache.dir" -> dir,
    s"fs.$scheme.cache.maxBytes" -> maxBytes.toString)
}
