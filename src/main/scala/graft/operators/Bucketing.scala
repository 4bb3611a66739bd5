package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-layout helpers: the storage-side answer to repeated
  * fact-fact joins. Two tables bucketed (and sorted) by the same key
  * into the same bucket count join with NO exchange on either side —
  * the sort-merge join reads co-located buckets directly. At 100 TB
  * this converts every recurring join on the bucket key from a full
  * shuffle of both fact tables into a metadata decision made at write
  * time; the price is one clustered write per table, paid once.
  *
  * (The SFC-blocked point layout in [[PointCloud]] is the same idea
  * specialized to 2D space — clustering chosen at import time so
  * queries never pay a redistribution.)
  */
object Bucketing {

  /** Persist `df` as a bucketed + in-bucket-sorted managed table.
    * `nBuckets` should be sized so a bucket of the LARGER table fits an
    * executor's memory comfortably (buckets are the parallelism floor:
    * a join reads one bucket per task). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. The plan this
    * produces is the point: SortMergeJoin whose children are bare scans
    * (no Exchange, no Sort beyond the bucket-local order already on
    * disk). Callers assert/inspect via `.explain`. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
