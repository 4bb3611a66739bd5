package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scan-pruning meter: executes each named query, then walks the
  * EXECUTED physical plan and sums the runtime `numOutputRows` metric
  * of every parquet scan node — the rows that actually left the scans
  * after pushed-filter + row-group pruning — against the total row
  * count of the tables the query touched. This is the direct evidence
  * for the "selection queries read the selected region, not the
  * corpus" claim: an un-pruned scan reports scan_rows ~ total_rows, a
  * pruned one reports a small fraction.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.PruneStats <sfDir> <q1,q2,...>'
  * Prints one line per query: name, scan_rows, wall seconds.
  */
object PruneStats {
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case s: FileSourceScanExec => Seq(s)
    case other =>
      other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PruneStats <sfDir> <q1,q2,...>")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    // 32 to match the bench protocol — a silent local[4] fallback
    // would print secs that look comparable to committed numbers
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      // execute THIS QueryExecution (a .write would wrap the plan in a
      // fresh one and leave these metrics untouched); toRdd rows are
      // fully materialized UnsafeRows, so kernels run like the bench
      qe.toRdd.foreachPartition(it => it.foreach(_ => ()))
      val secs = (System.nanoTime() - t0) / 1e9
      val sc = scans(qe.executedPlan)
      val scanRows = sc.map(s => s.metrics.get("numOutputRows")
        .map(_.value).getOrElse(0L)).sum
      val files = sc.map(s => s.metrics.get("numFiles")
        .map(_.value).getOrElse(0L)).sum
      println(f"$n%-22s scan_rows=$scanRows%12d files=$files%5d secs=$secs%8.2f")
    }
    spark.stop()
  }
}
