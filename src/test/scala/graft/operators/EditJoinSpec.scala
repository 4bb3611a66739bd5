package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EditJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Brute-force truth: full cross join + unbounded levenshtein. */
  private def brute(df: DataFrame, tau: Int): Set[(Long, Long, Int)] = {
    val s = df.select(col("id"), col("s"))
    val a = s.select(col("id").as("id_a"), col("s").as("sa"))
    val b = s.select(col("id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).as("d"))
      .filter(col("d") <= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def passJoin(df: DataFrame, tau: Int,
      budget: Double = 0): Set[(Long, Long, Int)] =
    EditJoin.editSelfJoin(df, "id", "s", tau, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Deterministic word-salad strings plus planted mutations at edit
    * distances 1..3 (substitute / delete / insert / transpose-ish),
    * varied lengths including boundary-of-segment edits. */
  private def corpus(n: Int): DataFrame = {
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    def base(i: Int): String = {
      val a = words(i % words.length)
      val b = words((i * 7 + 3) % words.length)
      val c = words((i * 13 + 5) % words.length)
      s"$a $b $c ${i % 10}"
    }
    val rows = (0 until n).flatMap { i =>
      val s = base(i)
      val mut = (i % 5) match {
        case 0 => s // exact duplicate planted under a second id
        case 1 => s.updated(2, 'Z') // substitution
        case 2 => s.substring(0, s.length - 1) // delete last char
        case 3 => "Q" + s // insert at front (shifts every segment)
        case 4 => s.substring(0, 4) + s.substring(5) // delete mid char
      }
      Seq((i.toLong, s), (100000L + i, mut))
    }
    rows.toDF("id", "s")
  }

  test("passJoin == brute force, tau = 1..3, mutated word corpus") {
    val d = corpus(60)
    for (tau <- 1 to 3) {
      assert(passJoin(d, tau) == brute(d, tau), s"tau=$tau")
    }
  }

  test("short strings (length <= tau, empty segments) stay exact") {
    val d = Seq((1L, ""), (2L, "a"), (3L, "b"), (4L, "ab"), (5L, "ba"),
      (6L, "abc"), (7L, "xyz"), (8L, "ax"), (9L, "a"), (10L, "abcd"))
      .toDF("id", "s")
    for (tau <- 1 to 3) {
      assert(passJoin(d, tau) == brute(d, tau), s"tau=$tau")
    }
  }

  test("length-difference > tau pairs are never candidates or results") {
    val d = Seq((1L, "abcdefgh"), (2L, "abc"), (3L, "abcdefghijkl"))
      .toDF("id", "s")
    assert(passJoin(d, 2) == brute(d, 2))
    assert(passJoin(d, 2).isEmpty)
  }

  test("dense cluster: all strings pairwise within tau") {
    val d = Seq((1L, "graft"), (2L, "craft"), (3L, "grafts"),
      (4L, "raft"), (5L, "grift")).toDF("id", "s")
    for (tau <- 1 to 2) {
      assert(passJoin(d, tau) == brute(d, tau), s"tau=$tau")
    }
  }

  test("unicode (multi-byte codepoints) counted per character") {
    val d = Seq((1L, "héllo wörld"), (2L, "hello wörld"),
      (3L, "héllo wörl"), (4L, "héllo wörld!")).toDF("id", "s")
    for (tau <- 1 to 2) {
      assert(passJoin(d, tau) == brute(d, tau), s"tau=$tau")
    }
  }

  test("supplementary codepoints: kernel segmentation matches levenshtein's units") {
    val d = Seq((1L, "a😀b c"), (2L, "a😀b d"),
      (3L, "a😀bc"), (4L, "axb c"), (5L, "😀😁😂"),
      (6L, "😀😁")).toDF("id", "s")
    for (tau <- 1 to 2) {
      assert(passJoin(d, tau) == brute(d, tau), s"tau=$tau")
    }
  }

  test("candidate-volume guard trips on a shared-prefix template corpus") {
    val d = (0 until 400)
      .map(i => (i.toLong, f"2026-08-14 INFO request ok id=$i%04d"))
      .toDF("id", "s")
    val e = intercept[GuardTrippedException] {
      EditJoin.editSelfJoin(d, "id", "s", 2, maxAvgCandidatesPerRow = 32)
        .count()
    }
    assert(e.getMessage.contains("candidate volume over budget"))
    // the uniform Guard contract: structured report with exact fields
    assert(e.report.guard == "edit-join candidate" &&
      e.report.rows == 400L && e.report.perRow && e.report.tripped &&
      e.report.budget == BigDecimal(32) &&
      e.report.avgPerRow > BigDecimal(32), e.report.toString)
    // and with the guard lifted the result is still the exact truth
    assert(passJoin(d, 2) == brute(d, 2))
  }

  test("guard passes on a diverse corpus and never changes results") {
    val d = corpus(40)
    val guarded = EditJoin.editSelfJoin(d, "id", "s", 2,
      maxAvgCandidatesPerRow = 1e9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(guarded == passJoin(d, 2))
  }
}
