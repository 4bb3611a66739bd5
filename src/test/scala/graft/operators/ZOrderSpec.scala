package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout must cut the rows the scan READER emits for a
  * conjunctive 2D range predicate (row-group stats pruning), versus the
  * same data written in arrival order. Asserted on scan metrics, not
  * wall time. */
class ZOrderSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // small row groups so sf0.01 data spans many prunable groups
    .config("spark.hadoop.parquet.block.size", (64 * 1024).toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    // metrics live on the FINAL adaptive plan, not the initial copy
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups a naive layout must read") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val zPath = s"/tmp/graft_zorder_${System.nanoTime()}"
    val nPath = s"/tmp/graft_naive_${System.nanoTime()}"
    ZOrder.writeZOrdered(li, zPath, "l_partkey", "l_suppkey", nFiles = 8)
    li.write.mode("overwrite").parquet(nPath)

    def filtered(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("l_partkey").between(500, 700) &&
          col("l_suppkey").between(20, 40))

    val matches = filtered(zPath).count()
    assert(matches == filtered(nPath).count()) // same answer either way

    val zRows = scanOutputRows(filtered(zPath))
    val nRows = scanOutputRows(filtered(nPath))
    // both readers push the predicate; only the clustered layout gives
    // row-group stats tight enough to skip most groups on BOTH columns
    assert(zRows < nRows / 2,
      s"expected z-order to prune: scanner emitted $zRows vs naive $nRows")
  }
}
