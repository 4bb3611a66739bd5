package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native word-gram kernels must be bit-identical to the SQL-lambda
  * forms they replace (the forms the DuckDB oracles mirror). */
class TextKernelsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one",
    "two words",
    "", // empty normalized text
    "unicode éè café 世界 ok",
    "a b a b a",
    "exactly three words")

  test("word_ngrams equals the transform/slice/concat_ws SQL form") {
    for (n <- Seq(1, 2, 3, 5)) {
      val df = samples.toDF("t")
      val sql = expr(
        s"transform(sequence(0, greatest(size(split(t, ' ')), $n) - $n), " +
          s"i -> concat_ws(' ', slice(split(t, ' '), i + 1, $n)))")
      val rows = df.select(text.word_ngrams(col("t"), n).as("k"), sql.as("s")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("word_hashes equals transform(split, xxhash64)") {
    val df = samples.toDF("t")
    val rows = df.select(text.word_hashes(col("t")).as("k"),
      expr("transform(split(t, ' '), w -> xxhash64(w))").as("s")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("word_portable_hashes: ASCII byte fast path == code-point definition") {
    import org.apache.spark.unsafe.types.UTF8String
    def viaGeneric(t: String): Seq[Long] =
      t.split(" ", -1).toSeq.map { word =>
        var h1 = 0L; var h2 = 0L
        var i = 0
        while (i < word.length) {
          val c = word.codePointAt(i)
          h1 = (h1 * 48271L + c) % 2147483647L
          h2 = (h2 * 16807L + c) % 2147483629L
          i += Character.charCount(c)
        }
        (HashKernels.lehmer3(h1) << 31) | HashKernels.lehmer3(h2)
      }
    val cases = Seq("hello world", "", "a", "  double  spaces ",
      "tréma café non ascii", "mixed ascii café")
    cases.foreach { t =>
      val got = TextKernels.wordPortableHashes(UTF8String.fromString(t))
      assert((0 until got.numElements()).map(got.getLong) == viaGeneric(t), t)
    }
  }

  test("idBucket stays in range and engine-safe for huge ids") {
    // ids past ~3.4e9 would overflow int64 in the naive id*K form on
    // DuckDB; the wrap-safe form must stay within [0, m) and not throw
    val ids = Seq(0L, 1L, 42L, 3400000000L, Long.MaxValue / 2, Long.MaxValue)
    val got = ids.toDF("id")
      .select(graft.operators.TextStats.idBucket(col("id"), 100L).as("b"))
      .collect().map(_.getLong(0))
    assert(got.forall(b => b >= 0 && b < 100))
    // max intermediate product is provably < 2^63
    assert(1000002L <= Long.MaxValue / 2654435761L)
  }
}
