package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TableProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("tableStats: rows, nulls, exact NDV, min/max per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None),
      (None, Some("a")), (Some(5L), Some("c")))
      .toDF("k", "s")
    val got = TableProfile.tableStats(df, Seq("k", "s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))))
      .toMap
    assert(got("k") == ((5L, 1L, 3L, "1", "5")), got.toString)
    assert(got("s") == ((5L, 1L, 3L, "a", "c")), got.toString)
  }

  test("tableStats: single pass produces one row per profiled column") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = TableProfile.tableStats(df, Seq("a", "b")).collect()
    assert(out.length == 2)
    assert(out.map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("integrityCheck: counts orphans per edge, nulls are not orphans") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(8L), None)
      .toDF("fk")
    val clean = Seq(Some(2L), Some(3L)).toDF("fk")
    val got = TableProfile.integrityCheck(Seq(
        ("bad", child, "fk", parent, "pk"),
        ("clean", clean, "fk", parent, "pk")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // bad: 5 child rows, 1 null key (not an orphan), 2 orphans (9, 8)
    assert(got("bad") == ((5L, 1L, 2L)), got.toString)
    assert(got("clean") == ((2L, 0L, 0L)), got.toString)
  }

  test("valueHistogram: integer-exact buckets partition the centi domain") {
    // centi values 100..1099 uniform -> lo=100, hi=1099, width 1000,
    // k=4 -> buckets of exactly 250 centi each
    val df = (100L to 1099L).map(v => v / 100.0).toDF("v")
    val got = TableProfile.valueHistogram(df, "v", k = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      0L -> ((100L, 349L, 250L)), 1L -> ((350L, 599L, 250L)),
      2L -> ((600L, 849L, 250L)), 3L -> ((850L, 1099L, 250L))), got.toString)
    // bounds tile the domain with no gap or overlap
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    sorted.sliding(2).foreach {
      case Seq((_, hi, _), (lo2, _, _)) => assert(lo2 == hi + 1)
      case _ => ()
    }
  }

  test("valueHistogram: non-divisible width keeps every row inside its " +
      "bucket's reported bounds") {
    // centi domain 0..9 (w=10), k=3: membership boundary is the
    // ceiling division — value 3 belongs to bucket 0 and bucket 0's
    // bounds must INCLUDE it
    val df = (0L to 9L).map(v => v / 100.0).toDF("v")
    val rows = TableProfile.valueHistogram(df, "v", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // buckets: (v*3) div 10 -> 0 for v in 0..3, 1 for 4..6, 2 for 7..9
    assert(rows.toSeq == Seq((0L, 0L, 3L, 4L), (1L, 4L, 6L, 3L),
      (2L, 7L, 9L, 3L)), rows.toSeq.toString)
    // tiling still holds in the non-divisible case
    rows.sliding(2).foreach {
      case Array((_, _, hi, _), (_, lo2, _, _)) => assert(lo2 == hi + 1)
      case _ => ()
    }
  }
}
