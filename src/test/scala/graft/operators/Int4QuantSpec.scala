package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The int4 tier contract ([[Similarity.quantizeInt4]] /
  * [[Similarity.int4CosineTopK]] / [[Similarity.int4CosineRecall]]):
  * hand-case codes and scale, the nibble-packed byte layout incl. the
  * odd-tail pad, zero-vector safety, clamp edges, and a brute-force
  * cross-check of retrieval + recall on a deterministic store. */
class Int4QuantSpec extends AnyFunSuite {

  lazy val spark = SparkSession.builder()
    .master("local[2]").appName("int4-quant-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  private def embOf(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def codesOf(v: Seq[Float]): Seq[Long] = {
    val raw = v.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max) / 7.0
    val s = if (raw == 0.0) 1.0 else raw
    v.map(x => math.max(-7L, math.min(7L,
      math.floor(x.toDouble / s + 0.5).toLong)))
  }

  test("hand case: scale, codes, sums, and the packed nibble layout") {
    // max|v| = 14 -> scale 2; codes: 14->7, -14->-7, 3->2 (3/2+0.5=2),
    // -3->-1 (floor(-1.0)= -1), 0->0
    val v = Seq(14f, -14f, 3f, -3f, 0f)
    val r = Similarity.quantizeInt4(embOf(Seq((1L, v))),
      "vec_id", "embedding").collect().head
    assert(r.getAs[Long]("n_dims") == 5)
    assert(math.abs(r.getAs[Double]("scale") - 2.0) < 1e-12)
    val q = Seq(7L, -7L, 2L, -1L, 0L)
    assert(codesOf(v) == q)
    assert(r.getAs[Long]("q_sum") == q.sum)
    assert(r.getAs[Long]("q_cksum") ==
      q.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum)
    // packed: nib = q+8 -> [15,1,10,7,8]; bytes (lo|hi<<4):
    // [15+1*16, 10+7*16, 8+8*16] = [31, 122, 136]; cksum 1*31+2*122+3*136
    assert(r.getAs[Long]("packed_cksum") == 31L + 2 * 122 + 3 * 136)
  }

  test("zero vector: scale 0 handled, all evidence zero") {
    val r = Similarity.quantizeInt4(embOf(Seq((1L, Seq(0f, 0f, 0f)))),
      "vec_id", "embedding").collect().head
    assert(r.getAs[Long]("q_sum") == 0 && r.getAs[Long]("q_cksum") == 0)
    // nibbles all 8: bytes [8+128, 8+128] = [136, 136] -> 1*136+2*136
    assert(r.getAs[Long]("packed_cksum") == 3L * 136)
  }

  test("even-length vector packs with no pad nibble") {
    val v = Seq(7f, 7f) // codes [7,7] -> nib [15,15] -> byte 255
    val r = Similarity.quantizeInt4(embOf(Seq((1L, v))),
      "vec_id", "embedding").collect().head
    assert(r.getAs[Long]("packed_cksum") == 255L)
  }

  test("filtered retrieval: predicate binds, ranking matches brute force") {
    val s = spark
    import s.implicits._
    def vec(i: Int): Seq[Float] =
      (0 until 8).map(j => (((i * 13 + j * 7) % 17) - 8).toFloat)
    val store = (0 until 40).map(i => (i.toLong, vec(i), (i % 4).toLong))
    val query = vec(5).toArray
    val got = Similarity.filteredCosineTopK(
        store.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", 2L, query, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.forall(_._2 == 2L))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (n == 0) -2.0 else d / n
    }
    val expect = store.filter(_._3 == 2L)
      .map { case (id, v, _) => (id, cos(v.map(_.toDouble), query.toSeq.map(_.toDouble))) }
      .sortBy { case (id, sim) => (-sim, id) }.take(5).map(_._1)
    assert(got.map(_._1) == expect)
  }

  test("retrieval + recall match a plain-Scala brute force") {
    def vec(i: Int): Seq[Float] =
      (0 until 8).map(j => (((i * 31 + j * 17) % 19) - 9).toFloat)
    val store = (0 until 30).map(i => (i.toLong, vec(i)))
    val query = vec(3).toArray
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) -2.0 else d / (na * nb)
    }
    val qCodes = codesOf(query.toSeq).map(_.toDouble)
    val exactTop = store.map { case (id, v) =>
      (id, cos(v.map(_.toDouble), query.toSeq.map(_.toDouble))) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val i4Top = store.map { case (id, v) =>
      (id, cos(codesOf(v).map(_.toDouble), qCodes)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val gotTop = Similarity.int4CosineTopK(embOf(store), "vec_id",
      "embedding", query, 10).collect().map(_.getLong(0)).toSet
    assert(gotTop == i4Top)
    val r = Similarity.int4CosineRecall(embOf(store), "vec_id",
      "embedding", query, 10).collect().head
    assert(r.getAs[Long]("k") == 10)
    assert(r.getAs[Long]("n_overlap") == (exactTop & i4Top).size.toLong)
    assert(r.getAs[Long]("recall_milli") ==
      (exactTop & i4Top).size.toLong * 1000 / 10)
  }
}
