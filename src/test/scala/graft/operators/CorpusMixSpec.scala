package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class CorpusMixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("doc_id", "source", "lang", "text")

  test("sourceMix counts docs/tokens per cell and shares sum to ~1e6") {
    val d = docs(
      (1L, "a", "en", "one two three"),    // 3 tokens
      (2L, "a", "en", "four five"),        // 2
      (3L, "a", "fr", "un deux trois"),    // 3
      (4L, "b", "en", "x y"))              // 2
    val got = CorpusMix.sourceMix(d, "source", "lang", "text")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", "en")) == ((2L, 5L, 500000L)))
    assert(got(("a", "fr")) == ((1L, 3L, 300000L)))
    assert(got(("b", "en")) == ((1L, 2L, 200000L)))
    // floor keeps the total at or just under 1e6
    val totalPpm = got.values.map(_._3).sum
    assert(totalPpm <= 1000000L && totalPpm > 1000000L - got.size)
  }

  test("resampleBySource keeps exactly the ids whose bucket < source pct") {
    val rows = (1L to 400L).map { id =>
      (id, if (id % 2 == 0) "keep_half" else "keep_all", "en", s"doc $id")
    }
    val d = docs(rows: _*)
    val got = CorpusMix.resampleBySource(d, "doc_id", "source",
        Map("keep_half" -> 50), defaultPct = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bucket = (id: Long) =>
      java.lang.Math.floorMod(java.lang.Math.floorMod(id, 1000003L) * 2654435761L, 100L)
    val expect = rows.collect {
      case (id, src, _, _) if src == "keep_all" || bucket(id) < 50 => id
    }.toSet
    assert(got == expect)
    // determinism: a rerun keeps the identical set
    val again = CorpusMix.resampleBySource(d, "doc_id", "source",
        Map("keep_half" -> 50)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
    // and the half-kept source really was thinned
    val halfKept = got.count(_ % 2 == 0)
    assert(halfKept < 200 && halfKept > 50)
  }
}
