package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("saltedJoin ≡ plain join, with the salt spreading the hot key") {
    // hot key 1 carries 90% of the fact rows
    val fact = ((1 to 90).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (2L, i.toLong))).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unused")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted

    val salted = Skew.saltedJoin(fact, dim, "k", col("v"), saltFactor = 4)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted

    assert(salted.toSeq == plain.toSeq)

    // the hot key's rows actually land in multiple salt buckets
    val buckets = fact.withColumn("__salt", pmod(xxhash64(col("v")), lit(4)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(buckets > 1)
  }

  test("left join keeps unmatched large-side rows") {
    val fact = Seq((1L, 10L), (9L, 20L)).toDF("k", "v")
    val dim = Seq((1L, "a")).toDF("k", "name")
    val got = Skew.saltedJoin(fact, dim, "k", col("v"), 3, "left")
      .collect().map(r => (r.getLong(0), r.isNullAt(2)))
    assert(got.toSet == Set((1L, false), (9L, true)))
  }
}
