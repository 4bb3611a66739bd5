package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.sfc

/** Generic Z-order (Morton) clustering for any two numeric columns —
  * the table-layout generalization of the point-cloud blocked store:
  * rows sorted by the interleaved key cluster BOTH dimensions, so
  * parquet row-group min/max stats stay tight on each column and a
  * conjunctive 2D range predicate prunes row groups that either
  * single-column sort order would have to read.
  *
  * The quantization domain comes from one min/max aggregate; the key
  * is written alongside the data (`__z`) as the clustering index
  * column. One range shuffle + in-partition sort per write — the same
  * cost as any clustered write, paid once at layout time.
  */
object ZOrder {

  private val Bits = 16 // 2^16 cells per dimension — plenty for skipping

  /** Write `df` clustered by the Z-order of (colA, colB). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int): Unit = {
    require(nFiles > 0)
    val r = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val (aMin, aMax, bMin, bMax) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    def cell(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, 1e-12)
      least(lit((1 << Bits) - 1),
        floor((col(c).cast("double") - lo) / span * (1 << Bits)).cast("long"))
    }
    df.withColumn("__z", sfc.morton_encode(
        cell(colA, aMin, aMax), cell(colB, bMin, bMax)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .write.mode("overwrite").parquet(path)
  }

  /** Read back a Z-ordered table (drops the index column). */
  def readZOrdered(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__z")
}
