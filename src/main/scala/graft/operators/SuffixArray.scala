package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed corpus suffix array by prefix quadrupling (Manber–Myers
  * 1990 prefix doubling re-expressed over DataFrames, radix 4), and
  * the exact maximal repeated-span report it powers — the
  * ExactSubstr-dedup measurement (Lee et al. 2022 find duplicated
  * training-data spans with suffix arrays) at ARBITRARY span length,
  * where the fixed-n gram ops ([[Dedup.dupSpanFraction]]) can only
  * answer "some n-gram repeats".
  *
  * Model: suffixes are word sequences, one suffix per (doc, position),
  * never crossing document boundaries. Round t assigns every suffix a
  * rank ordering its first 4^t words: rank_t(p) = the COUNT of
  * positions whose (r(p), r(p+w), r(p+2w), r(p+3w)) key — r the
  * previous rank, w its covering width — is strictly smaller, so
  * values stay < n forever and a class's rank IS its first SA slot.
  * Radix 4 over radix 2 halves the round count for one more lead()
  * column per round (measured win; local round latency dominates and
  * a cluster's per-round shuffle barrier costs even more). The ranks
  * at pos + w/2w/3w are lead() over the doc partition (positions are
  * dense in-doc — one exchange + sort for all three, not self-joins),
  * and the counting never runs an unpartitioned window: positions are
  * range-bucketed by the (dense, in [0, n)) previous rank, bucket
  * offsets come from a window over the BUCKET frame (<= 2^12 rows),
  * and rank() runs within buckets — the [[CorpusMix.globalShuffle]]
  * bucket-offset composition. Round-1 buckets inherit the
  * word-frequency skew (documented at the loop); later rounds
  * re-balance as classes split. The round count is fixed after round
  * 0: width quadruples until it covers the longest document, past
  * which remaining ties are genuinely identical suffixes.
  *
  * The per-round PAIRED frames (doc, pos, r, r@+w, r@+2w, r@+3w) are
  * kept (lineage-truncated, released when the loop ends — the
  * graph-loop storage discipline) because they are exactly the
  * radix-4 lifting tables for LCP: for SA-adjacent suffixes p, q,
  * descend the levels widest-first and extend the agreed prefix by
  * up to THREE w-blocks per level — one row fetch per side per level
  * yields all three block comparisons, so the descend is
  * 2·(rounds+1) joins where binary lifting needs 2·(2·rounds)+2.
  * Equal-rank at covering width w for in-range positions implies
  * agreement on min(w, rest) words, so the final cap against both
  * suffix lengths makes the LCP exact (the -1 padding for
  * out-of-range leads can only ever over-advance into the cap:
  * -1 = -1 on both sides means both suffixes already ended inside the
  * matched block, where equal rank forces identical remainders).
  *
  * Scale shape: everything is (doc, pos, rank...) rows — 12-48
  * bytes — shuffled O(log maxDocLen) times; no suffix text ever
  * shuffles, no driver-side state beyond the one-row convergence
  * probe.
  */
object SuffixArray {

  /** Position count at or below which [[maxrepPositions]] runs the
    * gated in-driver SA+LCP fast path (guide §5, the r20
    * graph/classifier gated-collect discipline): the whole
    * prefix-quadrupling loop plus the 2·(rounds+1)-join LCP descend —
    * ~10 shuffle-barrier jobs whose per-job scheduling cost dominates
    * any corpus that fits a single machine — collapse to one collect
    * of the tokenized corpus and O(n log n) driver arithmetic. Above
    * the gate the distributed loop runs unchanged (checked BEFORE
    * collect, the byteBpeTrainMergesLocal discipline). Gate placement
    * is MEASURED (r21, sf1 = 2.76 M positions, local[32]): the driver
    * path costs ~16 s there vs ~30-38 s distributed, so the crossover
    * sits well above the first 2^21 guess; 2^22 positions ≈ ~600 MB
    * peak driver transient (collected token strings + five int arrays
    * + the result rows), the most a default-sized driver should be
    * asked to hold — a larger driver can raise the dial per call. */
  val defaultDriverPosLimit: Long = 1L << 22

  /** Telemetry from the doubling loop, the [[Graph]] report
    * convention: observable, not just correct. */
  case class SaRunReport(rounds: Int, converged: Boolean,
      positions: Long, classes: Long)

  /** One radix-4 lifting level. When `packed` (corpora under 2^31
    * positions — ranks fit a 32-bit lane): `frame` = (doc, pos, rA,
    * rB), the ranks at pos + 0/1/2/3 widths packed pairwise
    * ([[packRanks]]) — rA = (r@pos, r@pos+w), rB = (r@pos+2w,
    * r@pos+3w), lanes shifted +1 so the out-of-range sentinel packs
    * as 0. Packing keeps the table at 24 bytes/row (the 6-column
    * long form of the sf0.1 table crossed the broadcast threshold
    * and demoted every descend join to sort-merge — measured 2.4 s
    * slower), and lexicographic (r1,r2,r3,r4) order IS numeric
    * (rA, rB) order, so the ranking sorts two longs instead of four.
    * Beyond 2^31 positions `frame` = (doc, pos, r1..r4) wide longs —
    * at that scale nothing broadcasts regardless and the ranking
    * sort keys just stay separate. */
  private[graft] case class SaTable(width: Long, frame: DataFrame,
      packed: Boolean)

  /** (x+1) · 2^32 + (y+1): x in [0, 2^31-2] (a rank), y in
    * [-1, 2^31-2] (a rank or the -1 out-of-range sentinel). Strictly
    * monotone in (x, y) lexicographic order; always positive. */
  private def packRanks(x: Column, y: Column): Column =
    (x + lit(1L)) * lit(4294967296L) + (y + lit(1L))

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

  /** Prefix-quadrupling loop. Returns (final ranks (doc, pos, rank)
    * with rank = first SA slot of the position's class and covering
    * width 4^rounds, the per-round lifting tables widths 4^0..4^{T-1},
    * report). Caller must [[freeFrame]] the table frames (or use
    * [[repeatedSpans]]). */
  private[graft] def doublingRanks(df: DataFrame, idCol: String,
      textCol: String, maxRounds: Int = 20):
      (DataFrame, Seq[SaTable], SaRunReport) = {
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

    val tables = scala.collection.mutable.ArrayBuffer[SaTable]()
    val packed = nPos < (Int.MaxValue.toLong - 1L)
    var width = 1L // words already compared
    var round = 0
    // ONE materialization per round: the paired frame (kept — it is
    // this level's lifting table). The ranking that produces the next
    // round's rank values stays LAZY and fuses into the next round's
    // paired job; lineage stays bounded because each paired frame is
    // truncated. The round count is KNOWN after round 0 — width
    // quadruples until it covers the longest document, at which point
    // every suffix is fully compared and remaining ties are genuinely
    // identical suffixes (duplicate doc tails) that will never split.
    // No per-round driver probe: at local fixed-job-latency probe
    // jobs cost more than the rounds themselves (measured, PLANS.md);
    // the class count for the telemetry report is one end-of-loop agg.
    while (width < maxLen && round < maxRounds) {
      round += 1
      val prev = ranks
      // ranks at pos + width/2w/3w via lead() over the doc partition:
      // positions are dense 0..len-1 within a doc, so the row `k`
      // ahead in pos order IS position pos + k·width — one exchange +
      // sort for all three offsets instead of three self-joins
      val wDoc = Window.partitionBy(col("doc")).orderBy(col("pos").asc)
      def ahead(k: Int): Column =
        coalesce(lead(col("rank"), k * width.toInt).over(wDoc), lit(-1L))
      // the bucket id rides along in the checkpointed frame, and the
      // checkpoint happens AFTER a repartition on it: the offsets
      // aggregation AND the ranking window then both consume the
      // preserved __b partitioning with no exchange of their own —
      // one exchange per round where the agg/window pair cost two
      val r1 = if (packed) shiftright(col("rA"), 32) - 1L else col("r1")
      val keyCols = if (packed) Seq(col("rA"), col("rB"))
        else Seq(col("r1"), col("r2"), col("r3"), col("r4"))
      val bucketOf = (r1 * buckets / lit(math.max(nPos, 1L))).cast("long")
      val paired = materializeCut(
        (if (packed) prev.select(col("doc"), col("pos"),
          packRanks(col("rank"), ahead(1)).as("rA"),
          packRanks(ahead(2), ahead(3)).as("rB"))
        else prev.select(col("doc"), col("pos"), col("rank").as("r1"),
          ahead(1).as("r2"), ahead(2).as("r3"), ahead(3).as("r4")))
          .withColumn("__b", bucketOf)
          .repartition(col("__b")))
      tables += SaTable(width, paired, packed)
      // the round-0 rank frame is folded into the first paired table —
      // release its storage. Later `prev`s are LAZY ranking plans
      // whose only storage leaves are kept paired tables: freeing
      // them would unpersist the lifting tables, so don't.
      if (round == 1) freeFrame(prev)
      // rank positions DIRECTLY: new rank = count of strictly smaller
      // key rows = bucket offset + (rank() within bucket) - 1.
      // No distinct-class frame and no join-back — two fewer
      // exchanges per round than the class-keyed form (measured the
      // difference at ~40% of the loop, PLANS.md). r1 is a
      // prefix-count in [0, nPos): the proportional bucket id is
      // monotone, and bucket volume mirrors the r1-class sizes — a
      // corpus where one word is most of the corpus concentrates its
      // round-1 bucket (the window degrades to that bucket's size; it
      // does not break, and later rounds re-balance as classes split)
      val wOff = Window.orderBy(col("__b").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = paired
        .groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
        .withColumn("__off", coalesce(sum(col("__bn")).over(wOff), lit(0L)))
        .select(col("__b"), col("__off"))
      val wIn = Window.partitionBy(col("__b"))
        .orderBy(keyCols.map(_.asc): _*)
      ranks = paired
        .join(offsets, "__b") // AQE broadcasts the bucket frame
        .select(col("doc"), col("pos"),
          (col("__off") + rank().over(wIn) - 1).as("rank"))
      width *= 4
    }
    if (round > 0) ranks = materializeCut(ranks) // round-0 frame already is
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
      minLen: Int, driverPosLimit: Long = defaultDriverPosLimit): DataFrame = {
    val (perPos, release) = maxrepPositions(df, idCol, textCol, driverPosLimit)
    val out = perPos.groupBy(col("doc"))
      .agg(max(col("maxrep")).as("max_repeat_words"),
        sum(when(col("maxrep") >= minLen, 1L).otherwise(0L))
          .as("n_pos_repeat"))
      .select(col("doc").as(idCol), col("max_repeat_words"),
        col("n_pos_repeat"))
    val result = materializeCut(out)
    release()
    result
  }

  /** Arbitrary-length repeated-span REMOVAL — the ExactSubstr-dedup
    * edit step (Lee et al. 2022): every word position covered by a
    * run of >= `minLen` words that occurs ANYWHERE else in the corpus
    * (another doc, or another position of the same doc) is excised;
    * output is (id, clean_text, n_tokens, n_removed), the
    * [[Dedup.removeDupSpans]] shape — that operator is the
    * cross-document fixed-n form, this one the exact any-length form.
    * Coverage is the per-doc interval-union sweep over the suffix
    * array's per-position maximal repeats: a running max of
    * `pos + maxrep` over positions with `maxrep >= minLen` marks
    * every covered position in one doc-partitioned window — no
    * per-interval explode. */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, driverPosLimit: Long = defaultDriverPosLimit): DataFrame = {
    val (perPos, release) = maxrepPositions(df, idCol, textCol, driverPosLimit)
    val result = exciseFromPerPos(df, idCol, textCol, perPos, minLen)
    release()
    result
  }

  /** The excision tail shared by the fresh and the indexed paths:
    * interval-union sweep over (doc, pos, maxrep) + position
    * excision over the normalized text. */
  private def exciseFromPerPos(df: DataFrame, idCol: String,
      textCol: String, perPos: DataFrame, minLen: Int): DataFrame = {
    val wS = Window.partitionBy(col("doc")).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val removedPos = perPos
      .withColumn("__re", max(when(col("maxrep") >= minLen,
        col("pos") + col("maxrep")).otherwise(lit(-1L))).over(wS))
      .filter(col("__re") > col("pos"))
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("pos"))).as("__rp"))
    val normed = df.select(col(idCol).as("doc"),
      Dedup.normalizeText(col(textCol)).as("__t"))
    val out = Dedup.exciseListedPositions(normed, "doc", "__t",
        removedPos, " ", " ", "n_tokens")
      .withColumnRenamed("doc", idCol)
    materializeCut(out)
  }

  /** Persist the corpus's repeated-span index: one row per word
    * position with its maximal-repeat length (doc, pos, maxrep) —
    * minLen-AGNOSTIC, so one index serves every excision threshold.
    * The ExactSubstr production shape: the suffix-array build runs
    * once when a corpus snapshot lands; every later excision (or
    * re-excision at a different threshold) reads the index. */
  def writeSpanIndex(df: DataFrame, idCol: String, textCol: String,
      dir: String, driverPosLimit: Long = defaultDriverPosLimit): Unit = {
    val (perPos, release) = maxrepPositions(df, idCol, textCol, driverPosLimit)
    perPos.write.mode("overwrite").parquet(s"$dir/perpos")
    release()
  }

  /** [[removeRepeatedSpans]] served from a persisted
    * [[writeSpanIndex]] — identical output to the fresh build by
    * construction (same perPos rows through the same sweep), so the
    * indexed query shares the fresh query's oracle. */
  def removeRepeatedSpansIndexed(spark: org.apache.spark.sql.SparkSession,
      dir: String, df: DataFrame, idCol: String, textCol: String,
      minLen: Int): DataFrame =
    exciseFromPerPos(df, idCol, textCol,
      spark.read.parquet(s"$dir/perpos"), minLen)

  /** The shared SA core: exact per-position maximal-repeat lengths
    * (doc, pos, maxrep), plus a release thunk the caller must invoke
    * once its consumer is materialized (frees the distributed path's
    * lifting tables; a no-op on the driver path).
    *
    * Gated driver fast path (r21, guide §5): below
    * `driverPosLimit` word positions — probed with ONE cheap
    * aggregation BEFORE any collect — the corpus tokens are collected
    * and the SA + LCP + neighbor-max run as in-driver primitive-array
    * arithmetic ([[driverMaxrep]]), replacing the O(log maxDocLen)
    * shuffle rounds plus the 2·(rounds+1)-join LCP descend whose
    * per-job scheduling floor dominates small-volume corpora. EXACT
    * by an order-independence argument, not replication: maxrep(p) is
    * the longest prefix of suffix p occurring at any other position —
    * for EVERY total order on the alphabet the max LCP over all other
    * suffixes is attained at an SA neighbor (LCP(p,q) = min of
    * adjacent LCPs between their ranks), and the LCP value itself
    * never depends on the order. So the driver path may rank words by
    * first-appearance instead of the distributed path's string order
    * and still produce identical (doc, pos, maxrep) rows. Pinned
    * driver-vs-distributed in SuffixArraySpec; `driverPosLimit = 0`
    * forces the distributed loop (the Graph convention). */
  private def maxrepPositions(df: DataFrame, idCol: String,
      textCol: String, driverPosLimit: Long): (DataFrame, () => Unit) = {
    if (driverPosLimit > 0) {
      // null/absent texts split to a null array = zero positions,
      // exactly like the distributed posexplode
      val probe = df.agg(sum(coalesce(size(split(
          Dedup.normalizeText(col(textCol)), " ")), lit(0)).cast("long")))
        .head()
      val nPos = if (probe.isNullAt(0)) 0L else probe.getLong(0)
      if (nPos <= driverPosLimit)
        return (driverMaxrep(df, idCol, textCol), () => ())
    }
    distributedMaxrep(df, idCol, textCol)
  }

  /** In-driver SA (Manber–Myers doubling with counting sort,
    * O(n log n)) + Kasai LCP + neighbor max over the corpus
    * concatenation with one DISTINCT separator id per document —
    * distinct separators mean no common prefix ever crosses a doc
    * boundary, which is precisely the distributed path's
    * `least(acc, len - pos)` cap, and a unique final sentinel makes
    * every global suffix distinct so the doubling always converges. */
  private def driverMaxrep(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val docType = df.schema(df.schema.fieldIndex(idCol)).dataType
    val collected = df.select(col(idCol).as("doc"),
      split(Dedup.normalizeText(col(textCol)), " ").as("__w")).collect()
    val docRows = collected.filter(!_.isNullAt(1))
    val nDocs = docRows.length
    val nPos = docRows.iterator.map(_.getSeq[String](1).length.toLong).sum
    val n = (nPos + nDocs).toInt
    // word ids start above the separator ids [0, nDocs); assignment
    // order is arbitrary (first appearance) — see the order-
    // independence argument above
    val wordIds = new java.util.HashMap[String, Integer]()
    val txt = new Array[Int](n)
    val docOf = new Array[Int](n)
    val posOf = new Array[Int](n)
    var g = 0
    var d = 0
    while (d < nDocs) {
      val ws = docRows(d).getSeq[String](1)
      var p = 0
      val it = ws.iterator
      while (it.hasNext) {
        val w = it.next()
        var id = wordIds.get(w)
        if (id == null) { id = nDocs + wordIds.size(); wordIds.put(w, id) }
        txt(g) = id; docOf(g) = d; posOf(g) = p
        g += 1; p += 1
      }
      txt(g) = d; docOf(g) = -1; posOf(g) = -1
      g += 1; d += 1
    }
    val maxrep = new Array[Int](n)
    if (n > 1) {
      // suffix array by rank doubling; all key values stay < n
      val sa = new Array[Int](n)
      var rank = new Array[Int](n)
      var next = new Array[Int](n)
      val ord = new Array[Int](n)
      val cnt = new Array[Int](n + 1)
      var i = 0
      while (i < n) { rank(i) = txt(i); i += 1 }
      java.util.Arrays.fill(cnt, 0)
      i = 0; while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
      i = 1; while (i <= n) { cnt(i) += cnt(i - 1); i += 1 }
      i = 0; while (i < n) { sa(cnt(rank(i))) = i; cnt(rank(i)) += 1; i += 1 }
      var classes = { // distinct initial ranks
        var c = 1; var j = 1
        while (j < n) { if (rank(sa(j)) != rank(sa(j - 1))) c += 1; j += 1 }
        c
      }
      var k = 1
      while (classes < n) {
        // ord = positions sorted by second key rank(i+k) (out-of-range
        // first), derived from sa without a sort; then one stable
        // counting sort by first key
        var p = 0
        i = n - k; while (i < n) { ord(p) = i; p += 1; i += 1 }
        i = 0; while (i < n) { if (sa(i) >= k) { ord(p) = sa(i) - k; p += 1 }; i += 1 }
        java.util.Arrays.fill(cnt, 0)
        i = 0; while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
        i = 1; while (i <= n) { cnt(i) += cnt(i - 1); i += 1 }
        i = 0
        while (i < n) {
          val s = ord(i); sa(cnt(rank(s))) = s; cnt(rank(s)) += 1; i += 1
        }
        next(sa(0)) = 0
        classes = 1
        i = 1
        while (i < n) {
          val cur = sa(i); val prev = sa(i - 1)
          val curK = if (cur + k < n) rank(cur + k) else -1
          val prevK = if (prev + k < n) rank(prev + k) else -1
          if (rank(cur) != rank(prev) || curK != prevK) classes += 1
          next(cur) = classes - 1
          i += 1
        }
        val t = rank; rank = next; next = t
        k <<= 1
      }
      // Kasai: lcp(r) = LCP(sa(r), sa(r+1)); distinct separators stop
      // every comparison at the doc boundary
      val lcp = new Array[Int](n)
      var h = 0
      i = 0
      while (i < n) {
        val r = rank(i)
        if (r + 1 < n) {
          val j = sa(r + 1)
          while (i + h < n && j + h < n && txt(i + h) == txt(j + h)) h += 1
          lcp(r) = h
          if (h > 0) h -= 1
        } else h = 0
        i += 1
      }
      i = 0
      while (i < n) {
        val r = rank(i)
        val left = if (r > 0) lcp(r - 1) else 0
        val right = if (r + 1 < n) lcp(r) else 0
        maxrep(i) = if (left > right) left else right
        i += 1
      }
    }
    val rows = new java.util.ArrayList[Row](nPos.toInt)
    g = 0
    while (g < n) {
      if (docOf(g) >= 0)
        rows.add(Row(docRows(docOf(g)).get(0), posOf(g), maxrep(g).toLong))
      g += 1
    }
    val schema = StructType(Seq(StructField("doc", docType),
      StructField("pos", IntegerType, nullable = false),
      StructField("maxrep", LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** The distributed SA core (unchanged above the gate): prefix
    * quadrupling + the radix-4 lifting-table LCP descend. */
  private def distributedMaxrep(df: DataFrame, idCol: String,
      textCol: String): (DataFrame, () => Unit) = {
    val (finalRanks, tables, rep) = doublingRanks(df, idCol, textCol)
    // per-doc lengths from the already-materialized rank frame — no
    // second normalize+split pass over the corpus text
    val lens = finalRanks.groupBy(col("doc")).agg(count(lit(1)).as("len"))

    // the lifting tables and rank frame are EXACTLY rep.positions
    // rows of <= 4 fixed-width fields: when that provably fits the
    // session's broadcast budget, hint it — the frames sit behind
    // lineage-truncation barriers whose size estimates Catalyst can't
    // see, so without the hint every descend join plans sort-merge
    // and each level becomes its own shuffle barrier (measured
    // ~0.75 s/level at sf0.1 vs a fused broadcast chain). Beyond the
    // budget the hint is withheld and the joins shuffle, which is the
    // correct large-corpus plan.
    val bcastBudget = org.apache.spark.sql.internal.SQLConf.get
      .autoBroadcastJoinThreshold
    // per-row data bytes mirror Catalyst's own sizeInBytes semantics:
    // (doc 8 + pos 4) + 8 per projected rank column
    def hinted(t: DataFrame, rankCols: Int): DataFrame =
      if (bcastBudget > 0 &&
        rep.positions * (12L + 8L * rankCols) < bcastBudget) broadcast(t)
      else t

    // SA order: rank is the class's first slot; duplicate suffixes
    // (equal to end-of-doc) tie-break by (doc, pos). The within-class
    // window partitions by rank — class sizes are the duplicate
    // multiplicities, never corpus-sized.
    val wClass = Window.partitionBy(col("rank")).orderBy(col("doc"), col("pos"))
    val sa = finalRanks
      .withColumn("sa", col("rank") + row_number().over(wClass) - 1)
      .select(col("doc"), col("pos"), col("sa"))

    val a = sa.select(col("sa"), col("doc").as("doc_a"), col("pos").as("pos_a"))
    val b = hinted(sa.select((col("sa") - 1).as("sa"),
      col("doc").as("doc_b"), col("pos").as("pos_b")), 1)
    var pairs = a.join(b, "sa")
      .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"))
      .withColumn("acc", lit(0L))

    // radix-4 lifting, widest level first. Top level = the final rank
    // frame (covering width 4^rounds >= maxLen): a match there means
    // identical suffix remainders, advanced past the end and truncated
    // by the length cap below. Each lower level fetches ONE row per
    // side carrying the ranks of the next THREE w-blocks and advances
    // by however many lead blocks agree — the level above guarantees
    // the remaining agreement is < 4w, so three blocks always suffice.
    val topW = if (tables.isEmpty) 1L else tables.last.width * 4L
    val ta0 = hinted(finalRanks.select(col("doc").as("__da"),
      col("pos").as("__pa"), col("rank").as("__ra")), 1)
    val tb0 = hinted(finalRanks.select(col("doc").as("__db"),
      col("pos").as("__pb"), col("rank").as("__rb")), 1)
    pairs = pairs
      .join(ta0, col("doc_a") === col("__da") &&
        (col("pos_a") + col("acc")) === col("__pa"), "left")
      .join(tb0, col("doc_b") === col("__db") &&
        (col("pos_b") + col("acc")) === col("__pb"), "left")
      .withColumn("acc", col("acc") +
        when(col("__ra").isNotNull && col("__ra") === col("__rb"),
          lit(topW)).otherwise(lit(0L)))
      .drop("__da", "__pa", "__ra", "__db", "__pb", "__rb")
    tables.reverse.foreach { case SaTable(w, t, packed) =>
      // per-side fetch columns: packed -> (rA, rB); wide -> r1..r3
      // (r4 is a ranking-only column, unused by the descend)
      val fetchCols =
        if (packed) Seq("rA", "rB") else Seq("r1", "r2", "r3")
      def side(s: String) = hinted(t.select(
        (col("doc").as(s"__d$s") +: col("pos").as(s"__p$s") +:
          fetchCols.zipWithIndex.map { case (c, i) =>
            col(c).as(s"__$s$i") }): _*), fetchCols.length)
      // block k matches only if every block before it matched; the -1
      // out-of-range padding can only "match" when both suffixes ended
      // inside an already-matched block, where the length cap is exact
      val (m1, m2, m3) = if (packed) {
        // rA = (r@pos, r@pos+w) lanes, rB = (r@pos+2w, r@pos+3w)
        val b1 = col("__a0").isNotNull &&
          shiftright(col("__a0"), 32) === shiftright(col("__b0"), 32)
        val b2 = b1 && col("__a0") === col("__b0")
        val b3 = b2 &&
          shiftright(col("__a1"), 32) === shiftright(col("__b1"), 32)
        (b1, b2, b3)
      } else {
        val b1 = col("__a0").isNotNull && col("__a0") === col("__b0")
        val b2 = b1 && col("__a1") === col("__b1")
        val b3 = b2 && col("__a2") === col("__b2")
        (b1, b2, b3)
      }
      pairs = pairs
        .join(side("a"), col("doc_a") === col("__da") &&
          (col("pos_a") + col("acc")) === col("__pa"), "left")
        .join(side("b"), col("doc_b") === col("__db") &&
          (col("pos_b") + col("acc")) === col("__pb"), "left")
        .withColumn("acc", col("acc") +
          when(m3, lit(3L * w)).when(m2, lit(2L * w))
            .when(m1, lit(w)).otherwise(lit(0L)))
        .drop(Seq("__da", "__pa", "__db", "__pb") ++
          fetchCols.indices.flatMap(i => Seq(s"__a$i", s"__b$i")): _*)
    }

    val la = lens.select(col("doc").as("doc_a"), col("len").as("len_a"))
    val lb = lens.select(col("doc").as("doc_b"), col("len").as("len_b"))
    val lcps = pairs.join(la, "doc_a").join(lb, "doc_b")
      .withColumn("lcp", least(col("acc"),
        col("len_a") - col("pos_a"), col("len_b") - col("pos_b")))

    // maxrep(position) = max LCP with either SA neighbor. With >= 2
    // suffixes, EVERY position has an SA neighbor (slots s and s+1
    // pair for s = 0..n-2, and the union takes both sides), so the
    // pair union already covers every (doc, pos) and no join back to
    // the position frame is needed; only a single-suffix corpus has
    // an uncovered position, which reports 0 like the oracle's NULL
    // lag/lead branches — served by the (tiny) left-join path.
    val paired = lcps.select(col("doc_a").as("doc"), col("pos_a").as("pos"),
        col("lcp"))
      .unionByName(lcps.select(col("doc_b").as("doc"),
        col("pos_b").as("pos"), col("lcp")))
      .groupBy(col("doc"), col("pos")).agg(max(col("lcp")).as("maxrep"))
    val perPos = if (rep.positions >= 2L) paired
      else finalRanks.select(col("doc"), col("pos"))
        .join(paired, Seq("doc", "pos"), "left")
        .select(col("doc"), col("pos"),
          coalesce(col("maxrep"), lit(0L)).as("maxrep"))
    (perPos, () => {
      tables.foreach(t => freeFrame(t.frame))
      freeFrame(finalRanks)
    })
  }
}
