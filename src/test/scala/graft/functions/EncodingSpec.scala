package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

class EncodingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def counts(s: String): Seq[Long] =
    EncodingKernels.artifacts(UTF8String.fromString(s)).toLongArray().toSeq

  test("kernel: clean text, whitelisted controls, each category") {
    assert(counts("plain ascii text.") === Seq(0L, 0L, 0L, 0L))
    assert(counts("tabs\tand\nnewlines\rok") === Seq(0L, 0L, 0L, 0L))
    assert(counts("x�y�") === Seq(2L, 0L, 0L, 0L))
    assert(counts("a\u0085b\u0092") === Seq(0L, 2L, 0L, 0L))
    assert(counts("bell\u0007soh\u0001") === Seq(0L, 0L, 0L, 2L))
    // the latin-1-misdecode pair: Ã(U+00C3)+© and Â(U+00C2)+·
    assert(counts("caf Ã© and Â·") === Seq(0L, 0L, 2L, 0L))
    // legitimate accented text (no continuation-range follower) is NOT
    // flagged: é alone, Ã at end of text
    assert(counts("café résumé Ã") === Seq(0L, 0L, 0L, 0L))
  }

  test("kernel: a continuation char counts as C1 AND completes a pair") {
    // Â followed by U+0083: one C1 control, one double-utf8 pair
    assert(counts("xÂ\u0083y") === Seq(0L, 1L, 1L, 0L))
    // lead ranges and continuation ranges are disjoint, so pair scans
    // can't overlap: C3 C2 B7 pairs only at (C2, B7)
    assert(counts("ÃÂ·") === Seq(0L, 0L, 1L, 0L))
  }

  test("operator: keep iff all categories zero; n_chars in code points") {
    val df = Seq(
      (1L, "clean text"),
      (2L, "bad � here"),
      (3L, "moji Ã©")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextStats
      .encodingArtifacts(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("keep"))
    assert(!out(1).getAs[Boolean]("keep"))
    assert(out(1).getAs[Long]("n_replacement") === 1L)
    assert(!out(2).getAs[Boolean]("keep"))
    assert(out(2).getAs[Long]("n_double_utf8") === 1L)
    assert(out(2).getAs[Long]("n_chars") === 7L) // code points, not bytes
  }
}
