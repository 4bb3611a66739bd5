package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed corpus suffix array by prefix doubling (Manber–Myers
  * 1990 re-expressed over DataFrames), and the exact maximal
  * repeated-span report it powers — the ExactSubstr-dedup measurement
  * (Lee et al. 2022 find duplicated training-data spans with suffix
  * arrays) at ARBITRARY span length, where the fixed-n gram ops
  * ([[Dedup.dupSpanFraction]]) can only answer "some n-gram repeats".
  *
  * Model: suffixes are word sequences, one suffix per (doc, position),
  * never crossing document boundaries. Round t assigns every suffix a
  * rank ordering its first 2^t words: rank_t(p) = the COUNT of
  * positions whose (r_{t-1}(p), r_{t-1}(p + 2^{t-1})) key is strictly
  * smaller — so values stay < n forever and a class's rank IS its
  * first SA slot. The rank at pos + 2^{t-1} is lead() over the doc
  * partition (positions are dense in-doc — one exchange + sort, not a
  * self-join), and the counting never runs an unpartitioned window:
  * positions are range-bucketed by the (dense, in [0, n)) previous
  * rank, bucket offsets come from a window over the BUCKET frame
  * (<= 2^12 rows), and rank() runs within buckets — the
  * [[CorpusMix.globalShuffle]] bucket-offset composition. Round-1
  * buckets inherit the word-frequency skew (documented at the loop);
  * later rounds re-balance as classes split. The round count is fixed
  * after round 0: width doubles until it covers the longest document,
  * past which remaining ties are genuinely identical suffixes.
  *
  * The per-round rank frames are kept (lineage-truncated, released
  * when the loop ends — the graph-loop storage discipline) because
  * they are exactly the binary-lifting tables for LCP: for SA-adjacent
  * suffixes p, q, descend t and extend the agreed prefix by 2^t
  * whenever rank_t matches at the current offset. Equal-rank at round
  * t for in-range positions implies agreement on min(2^t, rest) words,
  * so the final cap against both suffix lengths makes the LCP exact.
  *
  * Scale shape: everything is (doc, pos, rank) rows — 12-24 bytes —
  * shuffled O(log maxDocLen) times; no suffix text ever shuffles, no
  * driver-side state beyond the one-row convergence probe.
  */
object SuffixArray {

  /** Telemetry from the doubling loop, the [[Graph]] report
    * convention: observable, not just correct. */
  case class SaRunReport(rounds: Int, converged: Boolean,
      positions: Long, classes: Long)

  private def materializeCut(df: DataFrame): DataFrame =
    Frames.materializeCut(df)

  private def freeFrame(df: DataFrame): Unit = Frames.free(df)

  /** (doc, pos 0-based, word) of the whitespace-normalized text. */
  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        split(Dedup.normalizeText(col(textCol)), " ").as("__w"))
      .select(col("doc"), posexplode(col("__w")).as(Seq("pos", "word")))

  /** Count-prefix rank of each distinct key: the number of rows whose
    * key is strictly smaller. `bucketOf` must be a monotone (order-
    * preserving) bucket id in [0, buckets) for the key columns.
    * Returns the distinct-key frame + `new_rank`. */
  private def prefixCountRanks(keyed: DataFrame, keyCols: Seq[String],
      bucketOf: Column): DataFrame = {
    val classes = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt")).withColumn("__b", bucketOf)
    val wOff = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = classes.groupBy(col("__b"))
      .agg(sum(col("__cnt")).as("__bn"))
      .withColumn("__off", coalesce(sum(col("__bn")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b"))
      .orderBy(keyCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    classes.join(offsets, "__b") // AQE broadcasts the bucket frame
      .withColumn("new_rank",
        col("__off") + coalesce(sum(col("__cnt")).over(wIn), lit(0L)))
      .drop("__b", "__off")
  }

  /** Prefix-doubling loop. Returns (final ranks (doc, pos, rank) with
    * rank = first SA slot of the position's class, the per-round
    * lifting tables rank_0..rank_{T-1}, report). Caller must
    * [[freeFrame]] the tables (or use [[repeatedSpans]]). */
  private[graft] def doublingRanks(df: DataFrame, idCol: String,
      textCol: String, maxRounds: Int = 40):
      (DataFrame, Seq[DataFrame], SaRunReport) = {
    val buckets = 1 << 12
    val tok = tokens(df, idCol, textCol)

    // round 0: rank by word. The ordering window runs over the
    // DISTINCT-WORD frame only — vocabulary-bounded, the same contract
    // as the BPE / vocab-coverage family; bucketing by word would not
    // be monotone without a global sample, and the frame is small.
    val wordRanks = prefixCountRanks(tok, Seq("word"), lit(0L))
      .select(col("word"), col("new_rank"))
    var ranks = materializeCut(tok.join(wordRanks, "word")
      .select(col("doc"), col("pos"), col("new_rank").as("rank")))
    val sizes = ranks.groupBy(col("doc")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")), max(col("n"))).head
    // both aggregates are null on an empty corpus
    val nPos = if (sizes.isNullAt(0)) 0L else sizes.getLong(0)
    val maxLen = if (sizes.isNullAt(1)) 0L else sizes.getLong(1)

    val tables = scala.collection.mutable.ArrayBuffer[DataFrame](ranks)
    var width = 1L // words already compared
    var round = 0
    // the round count is KNOWN after round 0 — width doubles until it
    // covers the longest document, at which point every suffix is
    // fully compared and remaining ties are genuinely identical
    // suffixes (duplicate doc tails) that will never split. No
    // per-round driver probe: at local fixed-job-latency 8 probe jobs
    // cost more than the rounds themselves (measured, PLANS.md); the
    // class count for the telemetry report is one end-of-loop agg.
    while (width < maxLen && round < maxRounds) {
      round += 1
      val prev = ranks
      // rank at pos + width via lead() over the doc partition:
      // positions are dense 0..len-1 within a doc, so the row `width`
      // ahead in pos order IS position pos + width — one exchange +
      // sort instead of a self-join (two exchange legs)
      val wDoc = Window.partitionBy(col("doc")).orderBy(col("pos").asc)
      val paired = prev
        .select(col("doc"), col("pos"), col("rank").as("r1"),
          coalesce(lead(col("rank"), width.toInt).over(wDoc), lit(-1L))
            .as("r2"))
      // rank positions DIRECTLY: new rank = count of strictly smaller
      // (r1, r2) rows = bucket offset + (rank() within bucket) - 1.
      // No distinct-class frame and no join-back — two fewer
      // exchanges per round than the class-keyed form (measured the
      // difference at ~40% of the loop, PLANS.md). r1 is a
      // prefix-count in [0, nPos): the proportional bucket id is
      // monotone, and bucket volume mirrors the r1-class sizes — a
      // corpus where one word is most of the corpus concentrates its
      // round-1 bucket (the window degrades to that bucket's size; it
      // does not break, and later rounds re-balance as classes split)
      val bucketOf = (col("r1") * buckets / lit(math.max(nPos, 1L)))
        .cast("long")
      val wOff = Window.orderBy(col("__b").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = paired.withColumn("__b", bucketOf)
        .groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
        .withColumn("__off", coalesce(sum(col("__bn")).over(wOff), lit(0L)))
        .select(col("__b"), col("__off"))
      val wIn = Window.partitionBy(col("__b"))
        .orderBy(col("r1").asc, col("r2").asc)
      ranks = materializeCut(paired.withColumn("__b", bucketOf)
        .join(offsets, "__b") // AQE broadcasts the bucket frame
        .select(col("doc"), col("pos"),
          (col("__off") + rank().over(wIn) - 1).as("rank")))
      tables += ranks
      width *= 2
    }
    val classes =
      ranks.select(countDistinct(col("rank"))).head.getLong(0)
    (ranks, tables.toSeq,
      SaRunReport(round, width >= maxLen || classes == nPos, nPos, classes))
  }

  /** Exact per-document maximal repeated-span report:
    * `max_repeat_words` = the longest word run in the doc that occurs
    * somewhere else in the corpus (another doc, or another position of
    * the same doc); `n_pos_repeat` = positions whose maximal repeated
    * run is >= `minLen`. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int): DataFrame = {
    val (finalRanks, tables, _) = doublingRanks(df, idCol, textCol)
    // per-doc lengths from the already-materialized rank frame — no
    // second normalize+split pass over the corpus text
    val lens = finalRanks.groupBy(col("doc")).agg(count(lit(1)).as("len"))

    // SA order: rank is the class's first slot; duplicate suffixes
    // (equal to end-of-doc) tie-break by (doc, pos). The within-class
    // window partitions by rank — class sizes are the duplicate
    // multiplicities, never corpus-sized.
    val wClass = Window.partitionBy(col("rank")).orderBy(col("doc"), col("pos"))
    val sa = finalRanks
      .withColumn("sa", col("rank") + row_number().over(wClass) - 1)
      .select(col("doc"), col("pos"), col("sa"))

    val a = sa.select(col("sa"), col("doc").as("doc_a"), col("pos").as("pos_a"))
    val b = sa.select((col("sa") - 1).as("sa"),
      col("doc").as("doc_b"), col("pos").as("pos_b"))
    var pairs = a.join(b, "sa")
      .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"))
      .withColumn("acc", lit(0L))

    // binary lifting, widest table first
    tables.zipWithIndex.reverse.foreach { case (t, i) =>
      val w = 1L << i
      val ra = t.select(col("doc").as("__da"), col("pos").as("__pa"),
        col("rank").as("__ra"))
      val rb = t.select(col("doc").as("__db"), col("pos").as("__pb"),
        col("rank").as("__rb"))
      pairs = pairs
        .join(ra, col("doc_a") === col("__da") &&
          (col("pos_a") + col("acc")) === col("__pa"), "left")
        .join(rb, col("doc_b") === col("__db") &&
          (col("pos_b") + col("acc")) === col("__pb"), "left")
        .withColumn("acc", col("acc") +
          when(col("__ra").isNotNull && col("__ra") === col("__rb"), lit(w))
            .otherwise(lit(0L)))
        .drop("__da", "__pa", "__ra", "__db", "__pb", "__rb")
    }

    val la = lens.select(col("doc").as("doc_a"), col("len").as("len_a"))
    val lb = lens.select(col("doc").as("doc_b"), col("len").as("len_b"))
    val lcps = pairs.join(la, "doc_a").join(lb, "doc_b")
      .withColumn("lcp", least(col("acc"),
        col("len_a") - col("pos_a"), col("len_b") - col("pos_b")))

    // maxrep(position) = max LCP with either SA neighbor; positions
    // with no neighbor at all (a single-suffix corpus) report 0, like
    // the oracle's NULL lag/lead branches
    val paired = lcps.select(col("doc_a").as("doc"), col("pos_a").as("pos"),
        col("lcp"))
      .unionByName(lcps.select(col("doc_b").as("doc"),
        col("pos_b").as("pos"), col("lcp")))
      .groupBy(col("doc"), col("pos")).agg(max(col("lcp")).as("maxrep"))
    val perPos = finalRanks.select(col("doc"), col("pos"))
      .join(paired, Seq("doc", "pos"), "left")
      .select(col("doc"), col("pos"),
        coalesce(col("maxrep"), lit(0L)).as("maxrep"))

    val out = perPos.groupBy(col("doc"))
      .agg(max(col("maxrep")).as("max_repeat_words"),
        sum(when(col("maxrep") >= minLen, 1L).otherwise(0L))
          .as("n_pos_repeat"))
      .select(col("doc").as(idCol), col("max_repeat_words"),
        col("n_pos_repeat"))
    val result = materializeCut(out)
    tables.foreach(freeFrame)
    result
  }
}
