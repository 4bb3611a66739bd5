package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kmv is exact below k and within 5% in the estimator regime") {
    // estimator regime: 20k distinct over k = 1024 -> ~3% expected error
    val n = 20000L
    val big = spark.range(n).select(hashes.hash62(col("id")).as("h"))
    val est = big.agg(sketch.kmv_distinct(col("h"), 1024)).head().getLong(0)
    assert(math.abs(est - n) < 0.05 * n, s"estimate $est vs exact $n")

    // below k distinct hashes the state IS the distinct set
    val small = spark.range(500).select(hashes.hash62(col("id")).as("h"))
    assert(small.agg(sketch.kmv_distinct(col("h"), 1024)).head().getLong(0) == 500L)

    // duplicates never inflate the state
    val dup = spark.range(5000).select(hashes.hash62(col("id") % 100).as("h"))
    assert(dup.agg(sketch.kmv_distinct(col("h"), 1024)).head().getLong(0) == 100L)
  }

  test("kmv merge across many partitions equals single-partition result") {
    val n = 30000L
    def est(parts: Int): Long =
      spark.range(0, n, 1, parts).select(hashes.hash62(col("id")).as("h"))
        .agg(sketch.kmv_distinct(col("h"), 512)).head().getLong(0)
    assert(est(1) == est(32)) // set-union merge is order/partitioning-free
  }
}
