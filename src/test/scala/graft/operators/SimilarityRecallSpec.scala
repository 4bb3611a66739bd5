package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Approximation QUALITY floors on the real embeddings table: the
  * replication oracles prove the approximate paths compute what they
  * claim, and these pin that what they claim is close to the exact
  * answer — recall@k against the brute-force result, at the
  * registered-query parameters and along the probe dial. Floors sit
  * just below the measured values (ann 0.6 / 0.7 at hamming 4 / 6,
  * ivf 0.45 / 0.65 at 4 / 8 probes, banded-lsh pair recall ~0.95 —
  * all at sf0.001, whose "near-dup" pairs top out at cosine 0.48, a
  * deliberately hard LSH regime) and above what broken bucketing
  * would produce (uniform-random recall ~ probe fraction). */
class SimilarityRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val qv = emb.filter("vec_id = 0").select("embedding").head()
    .getSeq[Float](0).toArray

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  test("annTopK recall@20: floor at query params, rising with the probe dial") {
    val exact = ids(Similarity.cosineTopK(emb, "vec_id", "embedding", qv, 20))
    def recall(maxHamming: Int): Double =
      (exact & ids(Similarity.annTopK(emb, "vec_id", "embedding", qv, 20,
        nBits = 12, maxHamming = maxHamming))).size.toDouble / exact.size
    val atQuery = recall(4)
    val widened = recall(6)
    assert(atQuery >= 0.5, s"ann recall at (12, 4): $atQuery")
    assert(widened >= 0.65, s"ann recall at (12, 6): $widened")
    assert(widened >= atQuery, "widening the probe radius must not lose recall")
    // radius 12 probes every bucket -> must equal the exact top-k
    assert(recall(12) == 1.0, "full probe radius must reduce to exact")
  }

  test("ivfTopK recall@20: floor at query params, rising with more probes") {
    val exact = ids(Similarity.cosineTopK(emb, "vec_id", "embedding", qv, 20))
    def recall(nProbe: Int): Double =
      (exact & ids(Similarity.ivfTopK(emb, "vec_id", "embedding", qv, 20,
        nLists = 16, nProbe = nProbe))).size.toDouble / exact.size
    val atQuery = recall(4)
    val widened = recall(8)
    assert(atQuery >= 0.35, s"ivf recall at 4 probes: $atQuery")
    assert(widened >= 0.6, s"ivf recall at 8 probes: $widened")
    assert(widened >= atQuery, "more probes must not lose recall")
  }

  test("semantic dedup: precision 1.0, recall rises as clusters coarsen") {
    val truth = Similarity.cosineNearDupPairs(
        emb.withColumn("__one", org.apache.spark.sql.functions.lit(1)),
        "vec_id", "embedding", "__one", 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def pairs(nLists: Int): Set[(Long, Long)] =
      Similarity.semanticDedupPairs(emb, "vec_id", "embedding", 0.35, nLists)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fine = pairs(16)
    val coarse = pairs(4)
    assert(fine.subsetOf(truth) && coarse.subsetOf(truth),
      "every emitted pair is exactly verified")
    val rFine = (truth & fine).size.toDouble / truth.size
    val rCoarse = (truth & coarse).size.toDouble / truth.size
    assert(rFine >= 0.15, s"16-cluster recall $rFine")
    assert(rCoarse >= rFine, s"coarser clusters must not lose pairs " +
      s"on this data ($rCoarse < $rFine)")
  }

  test("banded LSH pair recall >= 0.8 vs exhaustive pairs at 0.35") {
    // ground truth: all-pairs cosine >= 0.35 via a constant block key
    val truth = Similarity.cosineNearDupPairs(
        emb.withColumn("__one", org.apache.spark.sql.functions.lit(1)),
        "vec_id", "embedding", "__one", 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // guard off: this spec deliberately measures the low-threshold
    // regime the candidate-volume guard exists to veto
    val lsh = Similarity.cosineNearDupPairsLsh(emb, "vec_id", "embedding", 0.35,
        bitsPerBand = 3, bands = 12, maxAvgCandidatesPerRow = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(truth), "LSH pairs must be exact-verified (precision 1)")
    val recall = (truth & lsh).size.toDouble / math.max(truth.size, 1)
    assert(recall >= 0.8, s"lsh pair recall $recall (truth ${truth.size})")
  }
}
