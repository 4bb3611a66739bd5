package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: the write-once / join-shuffle-free layout
  * lever. Asserts on the PHYSICAL plan — zero Exchange nodes — not just
  * on result correctness. */
class BucketingSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // force the SMJ path: a broadcast would hide the bucketing effect
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.warehouse.dir", "/tmp/graft_bucket_wh")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("same-bucketed tables join without any exchange; result matches plain join") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("okey"), col("o_totalprice"))
    // the in-memory catalog dies with the JVM but the managed-table
    // files don't — clear them or the next run hits LOCATION_ALREADY_EXISTS
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(s"/tmp/graft_bucket_wh/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Bucketing.writeBucketed(li, "b_lineitem", "okey", 8)
    Bucketing.writeBucketed(ord, "b_orders", "okey", 8)

    val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "okey")
    val n = joined.count()

    // plan shape: no Exchange anywhere under the join (bucket layout
    // satisfies the join's distribution requirement on both sides)
    val plan = joined.queryExecution.executedPlan
    val exchanges = collectWithSubqueries(plan) { case e: Exchange => e }
    assert(exchanges.isEmpty, s"expected shuffle-free bucketed join, got:\n$plan")

    // and the answer is the plain join's answer
    val plain = li.join(ord, "okey").count()
    assert(n == plain && n > 0)
  }

  test("differently-bucketed or unbucketed inputs do shuffle (the control)") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("okey"), col("o_totalprice"))
    val joined = li.join(ord, "okey")
    joined.count()
    val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case e: Exchange => e
    }
    assert(exchanges.nonEmpty)
  }
}
