package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def emb(rows: (Long, Array[Float], Int)*): DataFrame =
    rows.toDF("vec_id", "embedding", "label")

  private val e1 = Array(1f, 0f, 0f, 0f)
  private val e2 = Array(0f, 1f, 0f, 0f)
  private val e12 = Array(1f, 1f, 0f, 0f)
  private val ne1 = Array(-1f, 0f, 0f, 0f)

  test("cosine of unit/orthogonal/opposite vectors") {
    val d = emb((1L, e1, 0)).select(
      Similarity.cosine(typedlit(e1), typedlit(e1)).as("same"),
      Similarity.cosine(typedlit(e1), typedlit(e2)).as("orth"),
      Similarity.cosine(typedlit(e1), typedlit(ne1)).as("opp"),
      Similarity.cosine(typedlit(e1), typedlit(e12)).as("half")).head()
    assert(math.abs(d.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(d.getDouble(1)) < 1e-12)
    assert(math.abs(d.getDouble(2) + 1.0) < 1e-12)
    assert(math.abs(d.getDouble(3) - 1.0 / math.sqrt(2)) < 1e-9)
  }

  test("cosineTopK exact order") {
    val d = emb((1L, e1, 0), (2L, e12, 0), (3L, e2, 0), (4L, ne1, 0))
    val got = Similarity.cosineTopK(d, "vec_id", "embedding", e1, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("annTopK finds the exact match (same bucket) and never a worse set than its probe") {
    val d = emb((1L, e1, 0), (2L, e12, 0), (3L, e2, 0), (4L, ne1, 0))
    val got = Similarity.annTopK(d, "vec_id", "embedding", e1, 1,
      nBits = 8, maxHamming = 2).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L)) // identical vector shares every hyperplane sign
  }

  test("ivfTopK probes the query's own list (exact match always found)") {
    val d = emb((1L, e1, 0), (2L, e12, 0), (3L, e2, 0), (4L, ne1, 0))
    val got = Similarity.ivfTopK(d, "vec_id", "embedding", e1, 1,
      nLists = 2, nProbe = 1).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("cosineNearDupPairs respects blocking and threshold") {
    val d = emb((1L, e1, 0), (2L, e1, 0), (3L, e1, 1), (4L, e2, 0))
    val got = Similarity.cosineNearDupPairs(d, "vec_id", "embedding", "label", 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // 3 is identical but in another block; 4 orthogonal
  }

  test("cosineNearDupPairsLsh finds identical vectors without a block key") {
    val d = emb((1L, e1, 0), (2L, e1, 1), (3L, e2, 2))
    val got = Similarity.cosineNearDupPairsLsh(d, "vec_id", "embedding", 0.99, nBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
