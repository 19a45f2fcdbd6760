package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.sources.{CachingFs, LocalStandInFs, ObjectStores}

/** The read-path file cache (reference core/src/cache_layer: ObjectStore
  * wrapper serving whole files from a local medium through the LRU loading
  * cache). Driven both directly through the Hadoop FileSystem API and
  * end-to-end through a Spark parquet scan composed over the object-store
  * scheme registry.
  */
class CachingFsSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-fscache-$tag").toFile
    d.deleteOnExit()
    d.getPath
  }

  private def newFs(scheme: String, dir: String, maxBytes: Long,
      extra: Map[String, String] = Map.empty): FileSystem = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    (CachingFs.cachingOptions(scheme, "file", dir, maxBytes) ++ extra)
      .foreach { case (k, v) => conf.set(k, v) }
    FileSystem.newInstance(java.net.URI.create(s"$scheme:///"), conf)
  }

  test("fs cache: first open copies down, second open is a local hit") {
    val dir = freshDir("hit")
    val fs = newFs("gs", dir, 1L << 20)
    try {
      val p = new Path(s"gs://$sfDir/nation.parquet")
      val len = fs.getFileStatus(p).getLen
      assert(len == 2738)
      def readAll(): Int = {
        val in = fs.open(p)
        try { val buf = new Array[Byte](8192); var t = 0; var n = in.read(buf)
          while (n >= 0) { t += n; n = in.read(buf) }; t }
        finally in.close()
      }
      assert(readAll() == len)
      assert(readAll() == len)
      val s = CachingFs.stats("gs", dir).get
      assert(s.loads == 1, "one copy-down for two opens")
      assert(s.hits == 1)
      assert(s.weightUsed == len, "LRU weight is the measured file size")
      // the local medium holds exactly the one copy
      assert(new File(dir).listFiles().count(!_.getName.endsWith(".tmp")) == 1)
    } finally { fs.close(); CachingFs.purge("gs", dir) }
  }

  test("fs cache: LRU budget evicts the cold copy and deletes it from disk") {
    val dir = freshDir("evict")
    val fs = newFs("gs", dir, maxBytes = 3000) // nation (2738) xor region (1885)
    try {
      def slurp(name: String): Unit = {
        val in = fs.open(new Path(s"gs://$sfDir/$name"))
        try { val buf = new Array[Byte](8192); while (in.read(buf) >= 0) () }
        finally in.close()
      }
      slurp("nation.parquet")
      slurp("region.parquet") // 2738+1885 > 3000: nation must go
      val s = CachingFs.stats("gs", dir).get
      assert(s.evictions == 1)
      assert(s.weightUsed == 1885)
      assert(new File(dir).listFiles().length == 1, "evicted copy deleted")
      slurp("nation.parquet") // re-load after eviction
      assert(CachingFs.stats("gs", dir).get.loads == 3)
    } finally { fs.close(); CachingFs.purge("gs", dir) }
  }

  test("fs cache: a rewritten backing file misses on its (mtime,len) key") {
    val dir = freshDir("fresh")
    val src = Files.createTempFile("graft-fscache-src", ".txt")
    Files.write(src, "one".getBytes)
    val fs = newFs("gs", dir, 1L << 20)
    try {
      val p = new Path(s"gs://$src")
      def content(): String = {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in).mkString finally in.close()
      }
      assert(content() == "one")
      Files.write(src, "two-longer".getBytes) // new length -> new key
      assert(content() == "two-longer", "stale copy must not serve")
      assert(CachingFs.stats("gs", dir).get.loads == 2)
    } finally { fs.close(); CachingFs.purge("gs", dir); Files.delete(src) }
  }

  test("fs cache: open survives a copy deleted behind the cache (eviction race)") {
    val dir = freshDir("race")
    val fs = newFs("gs", dir, 1L << 20)
    try {
      val p = new Path(s"gs://$sfDir/nation.parquet")
      fs.open(p).close() // copy down
      // simulate the get()->open() race: the LRU deletes the copy while the
      // stale File handle is still what the cache returns
      new File(dir).listFiles().filterNot(_.getName.endsWith(".tmp"))
        .foreach(f => assert(f.delete()))
      val in = fs.open(p) // must invalidate + re-load, not throw
      try {
        val buf = new Array[Byte](8192); var t = 0; var n = in.read(buf)
        while (n >= 0) { t += n; n = in.read(buf) }
        assert(t == fs.getFileStatus(p).getLen)
      } finally in.close()
      assert(CachingFs.stats("gs", dir).get.loads == 2, "retry re-loaded once")
    } finally { fs.close(); CachingFs.purge("gs", dir) }
  }

  test("fs cache: metadata and writes pass through to the backing store") {
    val dir = freshDir("meta")
    val out = freshDir("meta-data")
    val fs = newFs("gs", dir, 1L << 20)
    try {
      val p = new Path(s"gs://$out/written.txt")
      val os = fs.create(p)
      os.write("pass-through".getBytes); os.close()
      assert(Files.exists(Paths.get(s"$out/written.txt")), "create writes the backing store")
      val st = fs.getFileStatus(p)
      assert(st.getPath.toUri.getScheme == "gs", "statuses carry the cached scheme")
      assert(fs.listStatus(new Path(s"gs://$out")).length == 1)
      assert(fs.delete(p, false))
      assert(!Files.exists(Paths.get(s"$out/written.txt")))
      assert(CachingFs.stats("gs", dir).get.loads == 0, "metadata never copies")
    } finally { fs.close(); CachingFs.purge("gs", dir) }
  }

  test("fs cache: spark parquet scan composes cache scheme over object-store scheme") {
    val dir = freshDir("spark")
    // s3:// resolves to the cache, whose backing is gs://, which resolves to
    // the registry's local stand-in — the full cache-over-object-store stack
    val opts = CachingFs.cachingOptions("s3", "gs", dir, 1L << 20) ++
      ObjectStores.standInOptions("gs")
    try {
      def scan() = spark.read.options(opts)
        .parquet(s"s3://$sfDir/nation.parquet")
        .select("n_nationkey", "n_name")
      val direct = spark.read.parquet(s"$sfDir/nation.parquet")
        .select("n_nationkey", "n_name")
      assert(scan().collect().sortBy(_.getInt(0)).toSeq ==
        direct.collect().sortBy(_.getInt(0)).toSeq)
      val afterFirst = CachingFs.stats("s3", dir).get
      assert(afterFirst.loads == 1, "footer + row-group opens share one copy-down")
      scan().collect()
      val afterSecond = CachingFs.stats("s3", dir).get
      assert(afterSecond.loads == 1, "second scan serves entirely from the medium")
      assert(afterSecond.hits > afterFirst.hits)
    } finally CachingFs.purge("s3", dir)
  }
}
