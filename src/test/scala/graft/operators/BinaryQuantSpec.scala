package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The binary (sign-bit) embedding tier: packing hand-pinned per bit
  * (strict `> 0` — zeros and negatives pack as 0), multi-lane packing
  * past 64 dims, Hamming retrieval ordering with id tie-break, and
  * the recall gauge's exact integer milli units. */
class BinaryQuantSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("binary-quant-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  test("sign packing: strict > 0, hand-pinned bits and halves") {
    import spark.implicits._
    // bits 0, 2 set; bit 1 (negative), 3 (zero) clear; bit 33 set
    val v = Array.fill(64)(0f)
    v(0) = 1.5f; v(1) = -2f; v(2) = 0.1f; v(33) = 3f
    val r = Similarity.binaryQuantize(
      Seq((7L, v)).toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().head
    assert(r.getAs[Long]("n_dims") == 64)
    assert(r.getAs[Long]("lo") == ((1L << 0) | (1L << 2)))
    assert(r.getAs[Long]("hi") == (1L << 1)) // bit 33 = hi bit 1
    assert(r.getAs[Long]("n_set") == 3)
  }

  test("multi-lane packing past 64 dims (bit 64 lands in word 2)") {
    import spark.implicits._
    val v = Array.fill(70)(0f)
    v(64) = 1f; v(69) = 1f; v(63) = 1f
    val words = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(Similarity.binarySignWords("embedding").as("w"))
      .collect().head.getSeq[Long](0)
    assert(words.length == 2)
    assert(words(0) == (1L << 63))
    assert(words(1) == ((1L << 0) | (1L << 5)))
  }

  test("Hamming top-k orders by distance then id; recall is exact milli") {
    import spark.implicits._
    def vec(bits: Int*): Array[Float] = {
      val v = Array.fill(64)(-1f); bits.foreach(b => v(b) = 1f); v
    }
    // query = id 0; id 1 differs in 1 bit, id 2 in 2, id 3 in 1 (tie
    // with 1 -> id order)
    val df = Seq(
      (0L, vec(1, 2, 3)), (1L, vec(1, 2)), (2L, vec(1)),
      (3L, vec(1, 2, 3, 9))).toDF("vec_id", "embedding")
    val q = vec(1, 2, 3)
    val top = Similarity.binaryHammingTopK(df, "vec_id", "embedding", q, 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("hamming"))).toSeq
    assert(top == Seq((0L, 0L), (1L, 1L), (3L, 1L), (2L, 2L)))
    val rec = Similarity.binaryHammingRecall(df, "vec_id", "embedding", q, 4)
      .collect().head
    assert(rec.getAs[Long]("k") == 4)
    assert(rec.getAs[Long]("recall_milli") ==
      rec.getAs[Long]("n_overlap") * 1000 / 4)
  }
}
