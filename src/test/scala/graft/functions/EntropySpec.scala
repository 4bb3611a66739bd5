package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

class EntropySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def stats(s: String): Array[Long] =
    EntropyKernels.stats(UTF8String.fromString(s))
      .toLongArray()

  test("fixed-point milli-log2: exact at powers of two, floor-tight elsewhere") {
    for (k <- 0 to 40) assert(EntropyKernels.l(1L << k) === 1000L * k)
    // l underestimates the real 1000*log2 by < 2.45 milli-bits (one
    // 1/1024 mantissa quantization ~1.41 + one table floor ~1.0) and
    // never overestimates
    val xs = (1L to 3000L) ++ Seq(65535L, 1000000L, (1L << 40) - 1)
    xs.foreach { x =>
      val real = 1000.0 * math.log(x.toDouble) / math.log(2.0)
      val got = EntropyKernels.l(x)
      assert(got <= real + 1e-9, s"x=$x got=$got real=$real")
      assert(got >= real - 2.45, s"x=$x got=$got real=$real")
    }
  }

  test("kernel stats: closed-form cases") {
    // one repeated char: zero char entropy, single token
    assert(stats("z" * 50).toSeq === Seq(50L, 1L, 0L, 1L, 1L, 0L, 1000L))
    // empty text
    assert(stats("").toSeq === Seq(0L, 0L, 0L, 0L, 0L, 0L, 1000L))
    // two equiprobable chars: exactly 1 bit = 1000 milli
    assert(stats("ab").toSeq === Seq(2L, 2L, 1000L, 1L, 1L, 0L, 1000L))
    // "a b a b": tokens {a:2, b:2} -> token H = 1 bit, max = l(4) = 2
    // bits -> permille exactly 500; chars {a:2, b:2, ' ':3}
    val s = stats("a b a b")
    assert(s(3) === 4L && s(4) === 2L)
    assert(s(5) === 1000L && s(6) === 500L)
    val l7 = EntropyKernels.l(7L)
    val expectedChar =
      (2L * (l7 - 1000L) + 2L * (l7 - 1000L) + 3L * (l7 - EntropyKernels.l(3L))) / 7L
    assert(s(0) === 7L && s(1) === 3L && s(2) === expectedChar)
  }

  test("kernel stats: non-ASCII code points take the overflow-map path") {
    // 'é' twice, 'ß' once, two spaces, 'x' once: 6 code points
    val s = stats("é ß éx")
    assert(s(0) === 6L)          // code points, not UTF-8 bytes
    assert(s(1) === 4L)          // {é, ß, ' ', x}
    assert(s(3) === 3L && s(4) === 3L) // tokens é / ß / éx all distinct
    assert(s(6) === 1000L)
  }

  test("entropyGauge: planted degenerate rows fail exactly one rule each") {
    val df = Seq(
      (1L, "the cat sat on the mat and the dog ran off with it all day"),
      (2L, "z" * 45),                        // char-degenerate
      (3L, ("the quick brown fox " * 8).trim) // token-repetitive
    ).toDF("doc_id", "text")
    val g = graft.operators.TextStats.entropyGauge(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(g(0).getAs[Boolean]("keep"))
    assert(!g(1).getAs[Boolean]("keep"))
    assert(g(1).getAs[Long]("milli_char_entropy") === 0L)
    assert(g(1).getAs[Long]("token_entropy_permille") === 1000L) // vacuous
    assert(!g(2).getAs[Boolean]("keep"))
    assert(g(2).getAs[Long]("milli_char_entropy") >= 3200L) // char rule passes
    assert(g(2).getAs[Long]("token_entropy_permille") < 500L)
  }

  test("generator corpus clears both gates with margin (threshold floor)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val g = graft.operators.TextStats.entropyGauge(docs, "doc_id", "text")
    val m = g.agg(min(col("milli_char_entropy")),
      min(col("token_entropy_permille")),
      sum(when(col("keep"), 0L).otherwise(1L))).head()
    assert(m.getLong(0) >= 3600L, s"char floor ${m.getLong(0)}")
    assert(m.getLong(1) >= 650L, s"perm floor ${m.getLong(1)}")
    assert(m.getLong(2) === 0L) // every real doc keeps
  }
}
