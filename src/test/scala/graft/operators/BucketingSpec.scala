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

  // the suite shares one JVM session (getOrCreate) — builder configs
  // would be silently ignored if another spec created it first, so
  // everything this spec needs is set at RUNTIME inside the test
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Drop the tables and scrub their files under the ACTIVE warehouse
    * dir (a fresh in-memory catalog forgets managed tables but their
    * files survive the JVM -> LOCATION_ALREADY_EXISTS on rewrite). */
  private def scrub(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val p = java.nio.file.Paths.get(s"$wh/$t")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("same-bucketed tables join without any exchange; result matches plain join") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("okey"), col("o_totalprice"))
    scrub("b_lineitem", "b_orders")
    Bucketing.writeBucketed(li, "b_lineitem", "okey", 8)
    Bucketing.writeBucketed(ord, "b_orders", "okey", 8)

    // force the SMJ path: a broadcast would hide the bucketing effect
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
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
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
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
