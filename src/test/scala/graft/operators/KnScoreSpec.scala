package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Hand-derived model. Train: "a b a c", "a b d" ->
    * c(a,b)=2 c(b,a)=1 c(a,c)=1 c(b,d)=1; c(a)=3 N1+(a·)=2;
    * c(b)=2 N1+(b·)=2; N1+(·a)=N1+(·b)=N1+(·c)=N1+(·d)=1;
    * N1+(··)=4, V=4 -> Pcont denom = 9. D = 3/4. */
  private val corpus = Seq(
    (1L, "a b a c", true),
    (2L, "a b d", true),
    (3L, "a b x", false),   // seen bigram + unseen word
    (4L, "z", false),       // no bigrams
    (5L, "c a b", false))   // unseen CONTEXT c, then a seen bigram

  private def run(rows: Seq[(Long, String, Boolean)]) =
    TextStats.knBigramScore(rows.toDF("id", "text", "train"),
        "id", "text", col("train"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap

  test("hand-computed KN probabilities, seen/backoff/unseen-context/OOV") {
    val got = run(corpus)
    // P(b|a) = (2-.75)/3 + (.75*2/3)*(2/9) -> floor 527777 micro
    // P(a|b) = (1-.75)/2 + (.75*2/2)*(2/9) -> 291666
    // P(c|a) = (1-.75)/3 + (.75*2/3)*(2/9) -> 194444
    assert(got(1L) == ((3L, 0L, (527777L + 291666L + 194444L) / 3)))
    // P(d|b) = (1-.75)/2 + (.75*2/2)*(2/9) -> 291666
    assert(got(2L) == ((2L, 0L, (527777L + 291666L) / 2)))
    // P(x|b): unseen w, seen context -> backoff only:
    //   (.75*2/2) * (0+1)/9 -> 83333; (a,b) not OOV, (b,x) OOV
    assert(got(3L) == ((2L, 1L, (527777L + 83333L) / 2)))
    // single word: no bigrams, NULL score
    assert(got(4L) == ((0L, 0L, -1L)))
    // unseen context c: P(a|c) = Pcont(a) = 2/9 -> 222222
    assert(got(5L) == ((2L, 1L, (222222L + 527777L) / 2)))
  }

  test("probabilities stay in [0, 1e6] and sum-per-context stays proper") {
    val got = run(corpus)
    got.values.foreach { case (_, _, s) =>
      assert(s <= 1000000L, s.toString)
    }
  }

  test("empty train slice: defined degenerate model, never a crash") {
    val got = run(corpus.map { case (i, t, _) => (i, t, false) })
    // ncc=0, V=0 -> Pcont denom 1 -> every bigram scores 1e6, all OOV
    assert(got(3L) == ((2L, 2L, 1000000L)))
    assert(got(4L) == ((0L, 0L, -1L)))
  }

  test("collected-table kernel path is bit-identical to the join path") {
    val df = corpus.toDF("id", "text", "train")
    val joined = TextStats.knBigramScore(df, "id", "text", col("train"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val model = TextStats.knTrain(df.filter(col("train")), "text")
    val table = TextStats.knTable(model)
    assert(table.types == 4)
    val kernel = TextStats.knScoreWithTable(df, "id", "text", table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(kernel == joined)
  }

  test("save -> load round-trips the model bit-for-bit") {
    val df = corpus.toDF("id", "text", "train")
    val model = TextStats.knTrain(df.filter(col("train")), "text")
    val dir = java.nio.file.Files
      .createTempDirectory("kn_model_spec").toString
    TextStats.saveKnModel(model, dir)
    val loaded = TextStats.loadKnModel(spark, dir)
    // derived totals rebuilt from the persisted sufficient statistic
    val t0 = model.tot.collect().head
    val t1 = loaded.tot.collect().head
    assert((t1.getLong(0), t1.getLong(1)) == ((t0.getLong(0), t0.getLong(1))))
    // and kernel scores from the reloaded table match the fresh one
    val fresh = TextStats.knScoreWithTable(df, "id", "text",
        TextStats.knTable(model))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val stored = TextStats.knScoreWithTable(df, "id", "text",
        TextStats.knTable(loaded))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(stored == fresh)
  }

  test("knTable collect is gated on model size") {
    val df = corpus.toDF("id", "text", "train")
    val model = TextStats.knTrain(df.filter(col("train")), "text")
    val e = intercept[IllegalArgumentException] {
      TextStats.knTable(model, maxTypes = 2)
    }
    assert(e.getMessage.contains("bigram types"), e.getMessage)
  }

  /** Trigram hand-derivation on the same train corpus. Trigram types:
    * (a,b,a), (b,a,c), (a,b,d) each c3=1; ctx (a,b): c2ctx=2 n1uv=2,
    * (b,a): 1/1; cont2 (b,a)=1 (a,c)=1 (b,d)=1; midv b: mid=2 fol=2,
    * a: mid=1 fol=1; bottom layer = the bigram model (pc seen=222222,
    * unseen=111111). Floor-composed micro:
    * p2(b,a) = (1e6 + 3*2*222222)/8 = 291666
    * p2(a,c) = (1e6 + 3*1*222222)/4 = 416666
    * p2(b,x) = (0 + 3*2*111111)/8 = 83333
    * p2(a,b) = (0 + 3*1*222222)/4 = 166666  (vw-type (a,b) unseen)
    * p3(a,b,a) = (1e6 + 3*2*291666)/8 = 343749
    * p3(b,a,c) = (1e6 + 3*1*416666)/4 = 562499
    * p3(a,b,x) = (0 + 3*2*83333)/8 = 62499
    * p3(c,a,b) = ctx unseen -> p2(a,b) = 166666
    * p3(z,q,r) = ctx + mid unseen -> pc(r unseen) = 111111 */
  test("trigram KN: hand-computed backoff chain") {
    val rows = corpus ++ Seq((6L, "z q r", false))
    val got = TextStats.knTrigramScore(rows.toDF("id", "text", "train"),
        "id", "text", col("train"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 0L, (343749L + 562499L) / 2)))  // a b a c
    assert(got(3L) == ((1L, 1L, 62499L)))                   // a b x
    assert(got(4L) == ((0L, 0L, -1L)))                      // 1 word
    assert(got(5L) == ((1L, 1L, 166666L)))                  // c a b
    assert(got(6L) == ((1L, 1L, 111111L)))                  // z q r
  }

  test("train == score corpus degenerates toward lmFluency's regime") {
    // every doc scored by a model trained on everything: no OOV
    val got = run(corpus.map { case (i, t, _) => (i, t, true) })
    assert(got.values.forall(_._2 == 0L))
    assert(got(4L) == ((0L, 0L, -1L)))
  }
}
