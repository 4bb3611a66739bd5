package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The span-decontamination contract
  * ([[TextStats.decontaminateSpans]]): wholesale leak = one chain the
  * length of the doc, a single 8-word quote = one 8-word span, two
  * separated quotes = two runs, a 7-word overlap = clean (below the
  * window), chains bridge only CONSECUTIVE positions. */
class DecontaminateSpansSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("decontam-spans-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  // ids whose idBucket(100) lands in the eval ([5,10)) vs train
  // ([10,100)) slices of the default split
  private lazy val (evalIds, trainIds): (Seq[Long], Seq[Long]) = {
    val s = spark
    import s.implicits._
    val rows = (0L until 4000L).toDF("id")
      .select(org.apache.spark.sql.functions.col("id"),
        TextStats.idBucket(org.apache.spark.sql.functions.col("id"), 100L)
          .as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (rows.filter(r => r._2 >= 5 && r._2 < 10).map(_._1).toSeq,
      rows.filter(_._2 >= 10).map(_._1).toSeq)
  }

  private def run(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    TextStats.decontaminateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", spanWords = 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_hit_positions"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("max_span_words")))
      .toMap
  }

  private def words(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("wholesale leak: the whole doc is one maximal chain") {
    val leaked = words("w", 20) // 20 words -> 13 hit positions, span 20
    val out = run(Seq(evalIds.head -> leaked, trainIds.head -> leaked))
    assert(out == Map(trainIds.head -> ((13L, 1L, 20L))))
  }

  test("a single 8-word quote: one hit, span exactly 8") {
    val quote = words("q", 8)
    val out = run(Seq(
      evalIds.head -> s"${words("e", 10)} $quote ${words("f", 5)}",
      trainIds.head -> s"${words("t", 6)} $quote ${words("u", 9)}"))
    assert(out == Map(trainIds.head -> ((1L, 1L, 8L))))
  }

  test("two separated quotes: two runs, max span = the longer one") {
    val q1 = words("q", 8)   // one window
    val q2 = words("z", 10)  // three windows -> 10-word span
    val out = run(Seq(
      evalIds.head -> s"$q1 ${words("e", 12)} $q2",
      trainIds.head -> s"$q1 ${words("t", 12)} $q2"))
    assert(out == Map(trainIds.head -> ((4L, 2L, 10L))))
  }

  test("a 7-word overlap is below the window: doc is clean") {
    val seven = words("s", 7)
    val out = run(Seq(
      evalIds.head -> s"${words("e", 9)} $seven",
      trainIds.head -> s"$seven ${words("t", 9)}"))
    assert(out.isEmpty)
  }

  test("eval docs never appear in the output (split is one-way)") {
    val leaked = words("w", 15)
    val out = run(Seq(
      evalIds.head -> leaked, evalIds(1) -> leaked,
      trainIds.head -> words("t", 30)))
    assert(out.isEmpty)
  }
}
