package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("no false negatives; FP rate near theory; merge across partitions") {
    val members = (1L to 2000L).map(i => i * 2654435761L)
    // 8 partitions force partial-buffer OR-merging
    val bits = members.toDF("h").repartition(8)
      .agg(bloom.bloom_build(col("h"), numBits = 1 << 16, numHashes = 5))
      .head().getSeq[Long](0).toArray
    val bitsLit = typedlit(bits)
    // every member must probe true (no false negatives, merge included)
    val fn = members.toDF("h")
      .filter(!bloom.bloom_might_contain(bitsLit, col("h"), 5)).count()
    assert(fn == 0)
    // non-members: FP rate ~ (1 - e^(-kn/m))^k ~ 0.22% here; allow 4x
    val probes = (1L to 20000L).map(i => -i * 99991L)
    val fp = probes.toDF("h")
      .filter(bloom.bloom_might_contain(bitsLit, col("h"), 5)).count()
    assert(fp < 20000 * 0.01, s"fp=$fp")
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = graft.operators.TextStats
      .decontaminate(docs, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = graft.operators.TextStats
      .decontaminateBloom(docs, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed == exact && exact.nonEmpty)
  }
}
