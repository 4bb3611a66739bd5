package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ReadabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(rows: (Long, String)*) =
    TextStats.readability(rows.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("hand-computed Flesch milli scores") {
    val got = run(
      (1L, "The cat sat on the mat."),
      (2L, "zzz qqq"),                 // vowel-less words count 1 each
      (3L, "Go now! Stop. Yes?"))      // three sentence runs
    // W=6 S=1 Y=6: 206835 - 6090 - 84600
    assert(got(1L) == ((6L, 1L, 6L, 116145L)))
    // W=2 S=1 Y=0+2: 206835 - 2030 - 84600
    assert(got(2L) == ((2L, 1L, 2L, 120205L)))
    // W=4 S=3 Y=4: 206835 - (4060 div 3 = 1353) - 84600
    assert(got(3L) == ((4L, 3L, 4L, 120882L)))
  }

  test("token soup goes negative; polysyllabic text scores lower") {
    val soup = run((1L, ("antidisestablishmentarianism " * 40).trim))
    // Y/W ~ 11-12 syllables -> deeply negative, the gate signal
    assert(soup(1L)._4 < 0L, soup.toString)
    val simple = run((1L, ("go to the shop. " * 10).trim))
    assert(simple(1L)._4 > 80000L, simple.toString)
  }

  test("degenerate: empty text is defined, never a crash") {
    val got = run((1L, ""), (2L, "   "))
    // "" normalizes to one empty word with zero vowel runs -> Y = 1
    got.values.foreach { case (w, s, y, f) =>
      assert(w == 1L && s == 1L && y == 1L && f == 206835L - 1015L - 84600L)
    }
  }
}
