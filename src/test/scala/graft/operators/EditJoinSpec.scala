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

  // ---- per-length-band adaptive tau ----

  private val bands3 = Seq((12, 1), (24, 2), (48, 3))

  /** Classic full-DP Levenshtein, driver-side (ASCII fixtures). */
  private def ed(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  /** The banded contract's truth: dist <= tau(max(|s|, |t|)), tau the
    * step function of `bands` (last band unbounded above). */
  private def bruteBanded(df: DataFrame,
      bands: Seq[(Int, Int)]): Set[(Long, Long, Int)] = {
    def tauOf(len: Int): Int =
      bands.find(_._1 >= len).map(_._2).getOrElse(bands.last._2)
    val rows = df.select(col("id"), col("s")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      tau = tauOf(math.max(sa.length, sb.length))
      d = ed(sa, sb)
      if d <= tau
    } yield (ia, ib, d)).toSet
  }

  private def banded(df: DataFrame, bands: Seq[(Int, Int)],
      budget: Double = 0): Set[(Long, Long, Int)] =
    EditJoin.editSelfJoinBanded(df, "id", "s", bands, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Mixed-length fixture the fixed-tau contract can't serve: word
    * salads truncated to lengths 6..50 plus 1-, 2- and 3-edit
    * mutations of each, so every band holds strings and every
    * mutation severity appears at every length class. */
  private def mixedCorpus(n: Int): DataFrame = {
    val words = Vector("meridian", "obsidian", "lantern", "quarry",
      "vesper", "cobalt", "harbor", "inlet", "juniper", "krill")
    val rows = (0 until n).flatMap { i =>
      val raw = (0 until 12)
        .map(j => words((i * 3 + j * 5 + 7) % words.length))
        .mkString(" ")
      val s = raw.substring(0, 6 + (i * 4) % 45)
      val mut = (i % 6) match {
        case 0 => s
        case 1 => s.updated(s.length / 2, '#')                   // 1 edit
        case 2 => "Q" + s.substring(0, s.length - 1) + "Z"       // <= 3
        case 3 => s.substring(1)                                 // 1 edit
        case 4 => s.updated(1, '@').updated(s.length - 2, '%')   // 2 edits
        case 5 => "XY" + s                                       // 2 edits
      }
      Seq((i.toLong, s), (100000L + i, mut))
    }
    rows.toDF("id", "s")
  }

  test("banded join == banded brute force on a mixed-length corpus") {
    val d = mixedCorpus(48)
    assert(banded(d, bands3) == bruteBanded(d, bands3))
  }

  test("banded: the longer side governs a band-straddling pair") {
    // |a| = 12 (band 1, tau 1), |b| = 14 (band 2, tau 2), ed = 2:
    // governed by the longer side -> tau 2 -> pair QUALIFIES, even
    // though band 1's tau alone would reject it; and a 2-edit pair
    // wholly inside band 1 stays rejected.
    val d = Seq((1L, "aaaabbbbccce"), (2L, "XYaaaabbbbccce"),
      (3L, "aaaabbbbccc#"), (4L, "aaaabbbbc##e")).toDF("id", "s")
    val got = banded(d, bands3)
    assert(got == bruteBanded(d, bands3))
    assert(got.contains((1L, 2L, 2)), got.toString)  // straddle, tau 2
    assert(!got.exists(p => p._1 == 1L && p._2 == 4L), got.toString)
  }

  test("banded: empty and tiny strings are governed by the first band") {
    // a pair of EMPTY strings (dist 0) belongs to the first band —
    // the review-caught floor case; tiny strings likewise
    val d = Seq((1L, ""), (2L, ""), (3L, "a"), (4L, "b"), (5L, "ab"))
      .toDF("id", "s")
    val got = banded(d, bands3)
    assert(got == bruteBanded(d, bands3), got.toString)
    assert(got.contains((1L, 2L, 0)), got.toString)
  }

  test("banded with one unbounded band == fixed-tau join") {
    val d = mixedCorpus(30)
    assert(banded(d, Seq((1, 2))) == passJoin(d, 2))
  }

  test("per-band guard: a template regime trips ITS band by name, diverse bands pass") {
    // band (0,20] gets 300 near-identical fixed-width template strings
    // (quadratic regime); band (20,)'s strings are diverse.
    val templ = (0 until 300)
      .map(i => (i.toLong, f"INFO ok id=$i%04d"))
    val diverse = (0 until 30).map(i =>
      (1000L + i, s"${('a' + i % 26).toChar}${i * 37} unique payload " +
        s"number ${i * i + 13} end$i"))
    val d = (templ ++ diverse).toDF("id", "s")
    val e = intercept[GuardTrippedException] {
      EditJoin.editSelfJoinBanded(d, "id", "s", Seq((20, 2), (64, 2)),
        maxAvgCandidatesPerRow = 32).count()
    }
    assert(e.report.guard.contains("band len (0,20]"), e.report.guard)
    // the diverse regime alone clears the same budget...
    EditJoin.editSelfJoin(diverse.toDF("id", "s"), "id", "s", 2,
      maxAvgCandidatesPerRow = 32).count()
    // ...and guard off: banded == brute, template pairs and all
    assert(banded(d, Seq((20, 2), (64, 2))) ==
      bruteBanded(d, Seq((20, 2), (64, 2))))
  }

  test("representative clustering == naive clustering on a replica corpus; guard prices distinct values") {
    // a heavily-replicated corpus: 3 near-dup string families x many
    // exact copies each (the GenScale web-crawl regime), one dup group
    // with NO other string within tau, one unique singleton, and null
    // strings (must join no cluster — levenshtein is null-eating)
    val rows = Seq.newBuilder[(Long, String)]
    var id = 0L
    for (copy <- 0 until 40) {
      rows += ((id, "the quick brown fox")); id += 1
      rows += ((id, "the quick brown fix")); id += 1   // ed 1 of family A
      rows += ((id, "zzz totally different")); id += 1 // dup group, no partner
    }
    rows += ((id, "unique one-off string")); id += 1
    rows += ((id, null)); id += 1
    rows += ((id, null)); id += 1
    val df = rows.result().toDF("id", "s")

    // naive truth: clusters over the RAW pair graph (quadratic in
    // replica count — fine at spec scale), distance-0 pairs included
    val naive = Dedup.duplicateClusters(
        EditJoin.editSelfJoin(df, "id", "s", tau = 2,
          maxAvgCandidatesPerRow = 0).select("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // the contracted form must reproduce it EXACTLY under a guard
    // budget the raw join could never meet on this corpus (120 copies
    // x ~quadratic pairs >> 16/row): the guard now prices 5 distinct
    // values, not 123 rows
    val contracted = EditJoin.editClustersByRepresentative(
        df, "id", "s", tau = 2, maxAvgCandidatesPerRow = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(contracted == naive)
    // sanity on the shape itself: fox/fix families merge into one
    // cluster labeled by the global min id, the partner-less dup group
    // still clusters, the singleton and the nulls don't
    assert(contracted.filter(_._2 == 0L).size == 80)
    assert(contracted.filter(_._2 == 2L).size == 40)
    assert(!contracted.exists(_._1 >= 120L))
    // and the raw join at that budget does trip — the corpus shape the
    // contraction exists for
    intercept[GuardTrippedException] {
      EditJoin.editSelfJoin(df, "id", "s", tau = 2,
        maxAvgCandidatesPerRow = 16).count()
    }
  }

  test("banded rejects unsorted or invalid bands") {
    val d = mixedCorpus(4)
    intercept[IllegalArgumentException] {
      EditJoin.editSelfJoinBanded(d, "id", "s", Seq((24, 2), (12, 1)))
    }
    intercept[IllegalArgumentException] {
      EditJoin.editSelfJoinBanded(d, "id", "s", Seq((12, 0)))
    }
    intercept[IllegalArgumentException] {
      EditJoin.editSelfJoinBanded(d, "id", "s", Seq.empty)
    }
  }
}
