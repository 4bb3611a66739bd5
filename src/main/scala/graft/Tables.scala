package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped catalog of the test-data parquet tables.
  *
  * `spark.read.parquet` re-lists the directory and re-reads footers for
  * schema on every call — a driver job per query. A long-lived engine
  * resolves tables through a catalog once; this memoizes the analyzed
  * DataFrame per (session, path, file fingerprint) to the same effect.
  *
  * The outer map is a `WeakHashMap` keyed by the `SparkSession` object
  * itself (reference identity, not hashCode — two live sessions can
  * never collide, and a dropped session's entries are GC-reclaimed
  * rather than pinned forever). The inner key fingerprints the source
  * (total size + max mtime over the path's files), so a parquet dir
  * rewritten in place during a session's lifetime is re-resolved, never
  * served stale.
  */
object Tables {
  private val cache =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, DataFrame]]()

  /** Size+mtime fingerprint of a parquet file or directory (top-level
    * entries only — parquet writers touch the dir's own files). */
  private def fingerprint(path: String): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return "na"
    if (Files.isRegularFile(p))
      return s"${Files.size(p)}_${Files.getLastModifiedTime(p).toMillis}"
    var size = 0L
    var mtime = 0L
    val s = Files.list(p)
    try s.forEach { f =>
      if (Files.isRegularFile(f)) {
        size += Files.size(f)
        mtime = math.max(mtime, Files.getLastModifiedTime(f).toMillis)
      }
    } finally s.close()
    s"${size}_$mtime"
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = s"${path}@${fingerprint(path)}"
    cache.synchronized {
      var m = cache.get(spark)
      if (m == null) { m = new java.util.HashMap[String, DataFrame](); cache.put(spark, m) }
      var df = m.get(key)
      if (df == null) { df = spark.read.parquet(path); m.put(key, df) }
      df
    }
  }
}
