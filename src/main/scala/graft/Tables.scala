package graft

import java.lang.ref.SoftReference
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped catalog of the test-data parquet tables.
  *
  * `spark.read.parquet` re-lists the directory and re-reads footers for
  * schema on every call — a driver job per query. A long-lived engine
  * resolves tables through a catalog once; this memoizes the analyzed
  * DataFrame per (session, path) to the same effect, invalidating on a
  * source-fingerprint change.
  *
  * The outer map is a `WeakHashMap` keyed by the `SparkSession` object
  * (reference identity — two live sessions never collide). A Dataset
  * strongly references its session, so the cached value must NOT hold
  * the DataFrame strongly or the weak key could never be reclaimed
  * (the documented WeakHashMap value→key self-reference pitfall);
  * values go through a `SoftReference` instead, and a cleared ref is
  * simply re-resolved. The inner map keeps exactly one entry per path
  * (replaced when the fingerprint changes — no growth under repeated
  * rewrites), and the `spark.read` itself runs outside any global lock
  * so table resolution never serializes across sessions or threads.
  */
object Tables {
  private final case class Entry(fp: String, df: SoftReference[DataFrame])

  private val cache =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, Entry]]()

  /** Size+mtime fingerprint over the whole tree under `path`, so a
    * partial partition overwrite deep in a partitioned dataset (which
    * may leave top-level files untouched) still invalidates. */
  private def fingerprint(path: String): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return "na"
    var size = 0L
    var mtime = 0L
    var n = 0L
    val s = Files.walk(p)
    try s.forEach { f =>
      if (Files.isRegularFile(f)) {
        n += 1
        size += Files.size(f)
        mtime = math.max(mtime, Files.getLastModifiedTime(f).toMillis)
      }
    } finally s.close()
    s"${n}_${size}_$mtime"
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val fp = fingerprint(path)
    val m = cache.synchronized {
      var mm = cache.get(spark)
      if (mm == null) { mm = new ConcurrentHashMap[String, Entry](); cache.put(spark, mm) }
      mm
    }
    val cur = m.get(path)
    if (cur != null && cur.fp == fp) {
      val df = cur.df.get()
      if (df != null) return df
    }
    // Double-checked per key: concurrent first resolutions of the same
    // path may both read; last write wins — correct either way.
    val df = spark.read.parquet(path)
    m.put(path, Entry(fp, new SoftReference(df)))
    df
  }
}
