package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped catalog of the test-data parquet tables.
  *
  * `spark.read.parquet` re-lists the directory and re-reads footers for
  * schema on every call — a driver job per query. A long-lived engine
  * resolves tables through a catalog once; this memoizes the analyzed
  * DataFrame per (session, path) to the same effect. Entries die with
  * the session (keyed by identity), so tests that rebuild sessions are
  * unaffected.
  */
object Tables {
  private val cache = new ConcurrentHashMap[(Int, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (System.identityHashCode(spark), s"$dir/$name.parquet")
    var df = cache.get(key)
    if (df == null) {
      df = spark.read.parquet(s"$dir/$name.parquet")
      cache.put(key, df)
    }
    df
  }
}
