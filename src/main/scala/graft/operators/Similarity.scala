package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an Array[Float] column.
  *
  * Cosine is computed in double via built-in higher-order functions
  * (zip_with + aggregate) — fully codegen'd, no UDF. Two search paths:
  * brute-force exact top-k (the correctness baseline — one scan, one
  * top-k reduction, no shuffle of the vectors) and a random-hyperplane
  * LSH bucketed path for scale (signature equi-blocking + exact rerank
  * of the candidate set only).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, in double — native
    * sequential-fold kernels (graft.functions.vectors), bit-identical
    * to the SQL `aggregate(zip_with(...))` form they replace. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.vectors.vector_dot(a, b) /
      (graft.functions.vectors.vector_norm(a) * graft.functions.vectors.vector_norm(b))

  /** Exact top-k by cosine against a literal query vector. The per-row
    * score is a narrow codegen stage; the top-k is Spark's
    * TakeOrderedAndProject (per-partition heap + driver merge of k) —
    * no global sort, no shuffle of the full table. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    emb.select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** BINARY (sign-bit) packing of an embedding into 64-bit lanes —
    * the 32x-below-int8 memory tier of a retrieval store: bit j of
    * word w is `v[w·64+j] > 0` (strict — zeros pack as 0 on every
    * engine, no negative-zero ambiguity). Returns an array<long> of
    * ceil(d/64) words. Entirely built-in transform/aggregate
    * expressions — codegen'd, no UDF. Hamming distance between two
    * packings approximates angular distance by the random-hyperplane
    * argument with coordinate hyperplanes — the cheap first-pass
    * filter whose recall [[binaryHammingRecall]] measures. */
  def binarySignWords(vecName: String): Column =
    expr(s"""transform(sequence(0, cast((size($vecName) + 63) div 64 - 1 as int)),
      w -> aggregate(sequence(0, 63), 0L, (acc, j) ->
        CASE WHEN w * 64 + j < size($vecName)
                  AND element_at($vecName, cast(w * 64 + j + 1 as int)) > 0.0D
             THEN acc + shiftleft(1L, cast(j as int)) ELSE acc END))""")

  /** Packed store view: one row per vector with the single d<=64 lane
    * split into unsigned 32-bit halves (portable across engines — the
    * dHash rendering convention) plus the set-bit count. For d > 64
    * use [[binarySignWords]] directly; the registered query's table
    * is 64-dim. */
  def binaryQuantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol).as("__vec"))
      .withColumn("__w", binarySignWords("__vec"))
      .select(col(idCol), size(col("__vec")).cast("long").as("n_dims"),
        shiftrightunsigned(element_at(col("__w"), 1), 32).as("hi"),
        element_at(col("__w"), 1).bitwiseAND(lit(0xffffffffL)).as("lo"),
        aggregate(col("__w"), lit(0L),
          (a, w) => a + bit_count(w).cast("long")).as("n_set"))

  /** Hamming retrieval over the binary tier: pack the store and the
    * query, distance = sum of per-lane bit_count(xor) — one narrow
    * codegen projection + TakeOrdered, no shuffle, no join; the
    * petabyte-store scan shape at 1/32 the bytes of int8. Ties break
    * by id (deterministic, oracle-replayable). */
  def binaryHammingTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    require(k > 0)
    val qWords: Array[Long] = {
      val n = (query.length + 63) / 64
      val w = new Array[Long](n)
      for (j <- query.indices if query(j) > 0f) w(j / 64) |= 1L << (j % 64)
      w
    }
    emb.select(col(idCol), col(vecCol).as("__bv"))
      .select(col(idCol), binarySignWords("__bv").as("__w"))
      .withColumn("hamming", aggregate(
        zip_with(col("__w"), typedlit(qWords),
          (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
        lit(0L), (a, v) => a + v))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .select(col(idCol), col("hamming"))
      .limit(k)
  }

  /** Recall@k of the binary Hamming shortlist against exact float
    * cosine — the gauge that prices the 32x compression (the ANN
    * analogue of [[Dedup.minhashJaccardGauge]]): one row
    * (k, n_overlap, recall_milli), recall in exact integer milli
    * units. Both rankings use the same deterministic tie-break. */
  def binaryHammingRecall(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val exact = cosineTopK(emb, idCol, vecCol, query, k).select(col(idCol))
    val approx = binaryHammingTopK(emb, idCol, vecCol, query, k).select(col(idCol))
    exact.intersect(approx)
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(k.toLong).as("k"), col("n_overlap"),
        expr(s"n_overlap * 1000L div ${k}L").as("recall_milli"))
  }

  /** The two-tier serving shape the binary tier exists for: Hamming
    * shortlist of `shortlist` candidates over the packed bits (cheap
    * scan), then EXACT float cosine rerank of only those — recall of
    * the composition approaches exact retrieval while the expensive
    * kernel touches `shortlist`/N of the store. Shortlist and rerank
    * both tie-break by id (oracle-replayable). */
  def binaryShortlistRerank(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k && k > 0)
    val ids = binaryHammingTopK(emb, idCol, vecCol, query, shortlist)
      .select(col(idCol))
    emb.join(ids, Seq(idCol), "left_semi")
      .select(col(idCol), cosine(col(vecCol), typedlit(query)).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Matryoshka truncation gauge: recall@k of cosine over only the
    * FIRST `m` dimensions against full-dimension cosine — the
    * measurement behind serving truncated MRL-style embeddings (store
    * m/d of the bytes, keep most of the ranking). One row
    * (m, k, n_overlap, recall_milli), exact integer milli units; both
    * rankings tie-break by id. */
  def truncationRecall(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], m: Int, k: Int): DataFrame = {
    require(m > 0 && k > 0)
    val qTrunc = query.take(m)
    val truncated = emb.select(col(idCol),
        slice(col(vecCol), 1, m).as("__tv"))
      .select(col(idCol), cosine(col("__tv"), typedlit(qTrunc)).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k).select(col(idCol))
    val exact = cosineTopK(emb, idCol, vecCol, query, k).select(col(idCol))
    exact.intersect(truncated)
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(m.toLong).as("m"), lit(k.toLong).as("k"), col("n_overlap"),
        expr(s"n_overlap * 1000L div ${k}L").as("recall_milli"))
  }

  /** Random-hyperplane (sign-of-dot-product) signature: `nBits`
    * deterministic pseudo-random +-1 hyperplanes derived from
    * xxhash64(bit, component) — reproducible across runs and engines,
    * no stored model. Returns the input plus a `bucket` int column. */
  def withLshBucket(emb: DataFrame, vecCol: String, nBits: Int): DataFrame = {
    require(nBits <= 30, "bucket must fit an int")
    emb.withColumn("bucket",
      graft.functions.vectors.rhp_bucket(col(vecCol), nBits))
  }

  /** Approximate top-k: probe buckets within `maxHamming` of the query's
    * bucket (multi-probe), exact-rerank candidates by true cosine. The
    * candidate filter is a cheap bit_count on the bucket int, so the
    * expensive cosine runs only on the probed fraction (~C(nBits,<=h)/2^nBits). */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nBits: Int = 12, maxHamming: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import scala.jdk.CollectionConverters._
    val qdf = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(query)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(vecCol,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val qBucket = withLshBucket(qdf, vecCol, nBits).select("bucket").head().getInt(0)
    withLshBucket(emb, vecCol, nBits)
      .filter(expr(s"bit_count(bucket ^ $qBucket) <= $maxHamming"))
      .select(col(idCol), cosine(col(vecCol), typedlit(query)).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF (inverted-file) coarse quantizer, built deterministically (no
    * RNG): seed lists = id-hash buckets, centroid = per-component mean
    * (map-side partial agg; the shuffle carries nLists x dims cells,
    * independent of vector count), one k-means refinement pass, then a
    * final nearest-centroid assignment. Centroids are tiny and ride
    * into the assignment expression as a broadcast-style reference
    * object — assignment is one narrow codegen map over the vectors. */
  def ivfCentroids(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int): Array[Array[Double]] = {
    val seeded = emb.withColumn("list_id",
      (graft.functions.hashes.lehmer3(col(idCol)) % nLists).cast("int"))
    val seed = meanByList(seeded, vecCol, nLists)
    val assigned1 = emb.withColumn("list_id",
      graft.functions.vectors.nearest_centroid(col(vecCol), seed))
    meanByList(assigned1, vecCol, nLists)
  }

  /** Per-component mean per list. Components are quantized to the
    * 2^-20 grid (`floor(v * 2^20 + 0.5)` — exact: a float times a
    * power of two is exact in double) and summed as integers, so the
    * mean is order-free and an oracle engine recomputes every centroid
    * bit-for-bit — a float avg() here would differ in final ulps per
    * reduction order and flip near-tie assignments downstream. Empty
    * lists densify to the zero vector. */
  private def meanByList(assigned: DataFrame, vecCol: String,
      nLists: Int): Array[Array[Double]] = {
    val rows = assigned
      .select(col("list_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("list_id"), col("pos"))
      .agg(sum(floor(col("v").cast("double") * lit(1048576.0) + lit(0.5)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val dims = rows.iterator.map(_.getInt(1)).max + 1
    val out = Array.fill(nLists)(new Array[Double](dims))
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) =
      r.getLong(2).toDouble / r.getLong(3) / 1048576.0)
    out
  }

  /** Full distributed k-means (Lloyd) training: deterministic id-hash
    * seeding, then `rounds` iterations of assign → exact-integer
    * centroid update, returning every row's final cluster — the
    * training loop itself as an oracle-checkable operator
    * ([[ivfCentroids]] is exactly this with rounds = 1; kmeans_assign
    * is the rounds = 0 inner step). Every round's centroids are the
    * 2^-20-grid integer means of [[meanByList]], so the whole
    * iteration — including which near-tie assignments flip between
    * rounds — replays bit-for-bit in an unrolled-CTE oracle; ties in
    * the argmax go to the smallest list id (the nearest_centroid
    * contract the existing IVF oracles already pin).
    *
    * Scale shape: per round, one narrow nearest-centroid map (k×dims
    * broadcast literal, codegen'd fold) + one (list, pos)-keyed
    * partial-combined aggregation whose reduced size is k×dims rows —
    * independent of corpus size; the driver holds only the k×dims
    * centroid grid. The classic Lloyd-on-MapReduce shape. */
  def kmeansTrain(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 0, s"need k >= 1, rounds >= 0: $k, $rounds")
    val seeded = emb.withColumn("list_id",
      (graft.functions.hashes.lehmer3(col(idCol)) % k).cast("int"))
    var cents = meanByList(seeded, vecCol, k)
    for (_ <- 1 to rounds) {
      val assigned = emb.withColumn("list_id",
        graft.functions.vectors.nearest_centroid(col(vecCol), cents))
      cents = meanByList(assigned, vecCol, k)
    }
    emb.select(col(idCol),
      graft.functions.vectors.nearest_centroid(col(vecCol), cents)
        .as("list_id"))
  }

  /** IVF approximate top-k: probe the nProbe lists whose centroids are
    * most query-similar, exact-rerank only their members. The scan
    * prunes on a small isin list (partition/row-group prunable when the
    * table is written bucketed by list_id). */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = ivfCentroids(emb, idCol, vecCol, nLists)
    val qd = query.map(_.toDouble)
    def cos(c: Array[Double]): Double = {
      var dot = 0.0; var nc = 0.0; var nq = 0.0
      var i = 0
      while (i < math.min(c.length, qd.length)) {
        dot += c(i) * qd(i); nc += c(i) * c(i); nq += qd(i) * qd(i); i += 1
      }
      if (nc == 0 || nq == 0) -2.0 else dot / (math.sqrt(nc) * math.sqrt(nq))
    }
    val probes = cents.zipWithIndex.map { case (c, i) => (cos(c), i) }
      .sortBy(-_._1).take(nProbe).map(_._2)
    emb.withColumn("list_id",
        graft.functions.vectors.nearest_centroid(col(vecCol), cents))
      .filter(col("list_id").isin(probes.toSeq: _*))
      .select(col(idCol), cosine(col(vecCol), typedlit(query)).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Recall@k of [[ivfTopK]] against the exact [[cosineTopK]] truth —
    * the standard ANN quality gauge, shipped as an operator so a
    * deployment can MEASURE its nLists/nProbe trade on its own data
    * instead of trusting rules of thumb. Both sides are deterministic
    * (integer-exact quantizer seeding, total (sim, id) orderings), so
    * the recall itself is oracle-replayable — unusual for an ANN
    * metric, and exactly why it can sit in the correctness gate.
    * Output: one row (k, n_hits, recall_milli = 1000*hits div k).
    *
    * Scale shape: the two top-k sides are each TakeOrderedAndProject
    * over their (pruned) scans; the join touches 2k rows. The exact
    * side is the cost — at true scale one runs it over a fixed
    * evaluation sample of queries, which is this operator applied
    * per query vector. */
  def ivfRecall(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nLists: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val exact = cosineTopK(emb, idCol, vecCol, query, k).select(col(idCol))
    val approx = ivfTopK(emb, idCol, vecCol, query, k, nLists, nProbe)
      .select(col(idCol))
    approx.join(exact, Seq(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .select(lit(k.toLong).as("k"), col("n_hits"),
        expr(s"(n_hits * 1000) div ${k}L").as("recall_milli"))
  }

  /** Persist an IVF index: vectors written PARTITIONED BY list_id (one
    * directory per inverted list) plus the centroid table. A probe then
    * reads only the probed lists' files — partition pruning at the
    * source, so a 4-of-64-list probe touches ~6% of the bytes however
    * large the store. This is the stored form of [[ivfTopK]]: same
    * deterministic coarse quantizer, but the assignment cost is paid
    * once at write time instead of per query. */
  def writeIvfIndex(emb: DataFrame, idCol: String, vecCol: String,
      dir: String, nLists: Int): Unit = {
    val spark = emb.sparkSession
    val cents = ivfCentroids(emb, idCol, vecCol, nLists)
    emb.withColumn("list_id",
        graft.functions.vectors.nearest_centroid(col(vecCol), cents))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/vectors")
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Incremental index maintenance: assign a delta batch to the STORED
    * centroids (the quantizer is never re-derived — every existing
    * vector keeps its partition, exactly like the blocked store's
    * grid-preserving append) and append into the same
    * `partitionBy(list_id)` layout. Probes keep pruning correctly
    * because partition values are unchanged; what drifts over many
    * appends is quantization quality (deltas from a shifted
    * distribution land in far centroids), which a periodic re-train +
    * rewrite restores — same cheap-append / periodic-maintenance
    * lifecycle as [[graft.operators.PointCloud.compact]]. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      delta: DataFrame, vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    delta.withColumn("list_id",
        graft.functions.vectors.nearest_centroid(col(vecCol), cents))
      .write.mode("append").partitionBy("list_id").parquet(s"$dir/vectors")
  }

  /** Query a stored IVF index: rank centroids driver-side (a tiny
    * table), scan ONLY the nProbe pruned partitions, exact-rerank. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, vecCol: String, query: Array[Float], k: Int,
      nProbe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val qd = query.map(_.toDouble)
    def cos(c: Array[Double]): Double = {
      var dot = 0.0; var nc = 0.0; var nq = 0.0
      var i = 0
      while (i < math.min(c.length, qd.length)) {
        dot += c(i) * qd(i); nc += c(i) * c(i); nq += qd(i) * qd(i); i += 1
      }
      if (nc == 0 || nq == 0) -2.0 else dot / (math.sqrt(nc) * math.sqrt(nq))
    }
    val probes = cents.toSeq.map { case (i, c) => (cos(c), i) }
      .sortBy(-_._1).take(nProbe).map(_._2)
    spark.read.parquet(s"$dir/vectors")
      .filter(col("list_id").isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), typedlit(query)).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Nearest-centroid assignment (the inner step of k-means / the IVF
    * coarse quantizer, exposed as its own operator): each vector maps to
    * the centroid with the highest cosine, ties to the smallest index.
    * Centroids ride in as literals (broadcast-sized by construction —
    * k x dims, independent of table size), so assignment is one narrow
    * codegen projection over the scan: no shuffle, no join. */
  def centroidAssign(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    require(centroids.nonEmpty)
    val sims = centroids.zipWithIndex.map { case (c, i) =>
      cosine(col(vecCol), typedlit(c)).as(s"__sim_$i")
    }
    val simCols = centroids.indices.map(i => col(s"__sim_$i"))
    // greatest() requires >= 2 args — k = 1 is its own (trivial) max
    val best = if (simCols.length == 1) simCols.head else greatest(simCols: _*)
    // first index attaining the max -> deterministic tie-break
    val cluster = centroids.indices.drop(1).foldLeft(
      when(simCols.head === best, 0)) { (acc, i) =>
        acc.when(simCols(i) === best, i)
      }
    emb.select((col(idCol) +: sims): _*)
      .select(col(idCol), cluster.cast("long").as("cluster"),
        best.as("best_sim"))
  }

  /** Per-dimension embedding health profile — the "dead/degenerate
    * dimension" QA check an embedding pipeline runs before trusting
    * cosine geometry: for every vector position, the count and the
    * exact integer sum / sum-of-squares / min / max of the 2^-20-grid
    * quantized component ([[meanByList]]'s exactness recipe applied
    * per dimension). A dimension with max = min is dead; one with a
    * tiny sumsq is near-constant; a shifted sum flags un-centered
    * output. All integers, so any engine replays the profile
    * bit-for-bit (at ~10^12-vector scale the sumsq sum outgrows
    * int64 — swap the two sums to decimal(38,0), same shape).
    *
    * Scale shape: posexplode → ONE partial-combined aggregation keyed
    * by dimension index (reduced size = dims rows, corpus-independent). */
  def dimStats(emb: DataFrame, vecCol: String): DataFrame = {
    val q = floor(col("v").cast("double") * lit(1048576.0) + lit(0.5))
      .cast("long")
    emb.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("pos").cast("long").as("pos"), q.as("__q"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("__q")).as("sum_q20"),
        sum(col("__q") * col("__q")).as("sumsq_q20"),
        min(col("__q")).as("min_q20"), max(col("__q")).as("max_q20"))
  }

  /** Scalar int8 quantization: per-vector scale = max|v| / 127, each
    * component q = floor(v/scale + 0.5) clamped to [-127, 127] (explicit
    * half-up — no engine-specific round() tie semantics). Emits compact
    * per-vector evidence (dims, scale, integer sum + position-weighted
    * checksum of the codes) rather than the code array itself, so the
    * result is hash-comparable; the codes column is the same expression
    * un-aggregated. One narrow projection — the shape that quantizes a
    * petabyte embedding store in a single map stage. */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = aggregate(col(vecCol), lit(0.0d),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 127.0
    // all-zero vector -> scale 0: divide by 1 instead so codes are 0,
    // not NaN (engine NaN clamp semantics differ)
    val q = expr("transform(__vec, v -> CAST(greatest(-127.0d, least(127.0d, " +
      "floor(CAST(v AS DOUBLE) / (CASE WHEN __scale = 0.0d THEN 1.0d ELSE __scale END) " +
      "+ 0.5d))) AS BIGINT))")
    emb.select(col(idCol), col(vecCol).as("__vec"), scale.as("__scale"))
      .select(col(idCol), size(col("__vec")).cast("long").as("n_dims"),
        col("__scale").as("scale"), q.as("__q"))
      .select(col(idCol), col("n_dims"), col("scale"),
        aggregate(col("__q"), lit(0L), (a, v) => a + v).as("q_sum"),
        // n_dims = 0 guard: sequence(1, 0) is the DESCENDING [1, 0], so
        // the zip_with would null-pad and the sum go null (and DuckDB's
        // list_sum([]) is NULL) — pin the empty vector to 0 explicitly
        when(col("n_dims") === 0, lit(0L))
          .otherwise(aggregate(zip_with(col("__q"),
              sequence(lit(1L), col("n_dims")), (qv, i) => qv * i),
            lit(0L), (a, v) => a + v)).as("q_cksum"))
  }

  /** Quantized retrieval: cosine top-k computed entirely on int8 codes
    * — the serving shape where the float store is dropped and queries
    * run against the quantized index ([[quantizeInt8]]'s scheme). The
    * per-vector scales CANCEL in the cosine (dot·sa·sv over
    * norms·sa·sv), so the score is pure integers + sqrt + one
    * multiply + one divide — every step correctly-rounded IEEE,
    * hash-exact on any engine, no sequential float folds needed.
    * Zero-norm codes score -2.0 (the cosine kernel's convention).
    * One narrow codegen projection + TakeOrdered — no shuffle, no
    * join, a petabyte-store scan shape. */
  def int8CosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    require(k > 0)
    val qScaleRaw = query.foldLeft(0.0)((m, v) => math.max(m, math.abs(v.toDouble))) / 127.0
    val qScale = if (qScaleRaw == 0.0) 1.0 else qScaleRaw
    val qCodes: Array[Long] = query.map(v =>
      math.max(-127L, math.min(127L, math.floor(v.toDouble / qScale + 0.5).toLong)))
    val q2 = qCodes.foldLeft(0L)((a, x) => a + x * x)
    val scale = aggregate(col("__vec"), lit(0.0d),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 127.0
    emb.select(col(idCol), col(vecCol).as("__vec"))
      .withColumn("__scale", scale)
      .withColumn("__q", expr("transform(__vec, v -> CAST(greatest(-127.0d, " +
        "least(127.0d, floor(CAST(v AS DOUBLE) / (CASE WHEN __scale = 0.0d " +
        "THEN 1.0d ELSE __scale END) + 0.5d))) AS BIGINT))"))
      .withColumn("__dot", aggregate(
        zip_with(col("__q"), typedlit(qCodes), (a, b) => a * b),
        lit(0L), (a, v) => a + v))
      .withColumn("__v2", aggregate(col("__q"), lit(0L), (a, v) => a + v * v))
      .withColumn("sim_q",
        when(col("__v2") === 0L || lit(q2) === 0L, lit(-2.0d))
          .otherwise(col("__dot").cast("double") /
            (sqrt(col("__v2").cast("double")) * sqrt(lit(q2.toDouble)))))
      .orderBy(col("sim_q").desc, col(idCol))
      .select(col(idCol), col("__dot").as("dot_q"), col("sim_q"))
      .limit(k)
  }

  /** Scalar int4 quantization — the 8x tier between int8 (4x) and the
    * sign bit (32x), completing the compression ladder one gauge
    * prices end to end: per-vector scale = max|v| / 7, codes
    * q = floor(v/scale + 0.5) clamped to [-7, 7] (the same explicit
    * half-up as [[quantizeInt8]] — no engine round() tie semantics),
    * and the PACKED layout that realizes the 8x: nibble = q + 8
    * (1..15 — 0 never occurs, so an all-zero byte is never a valid
    * pair), byte i = nib(2i) | nib(2i+1) << 4, an odd tail padded
    * with nibble 8 (code 0). Emits dims, scale, code sum +
    * position-weighted code checksum, and the position-weighted
    * checksum of the PACKED bytes — pinning the nibble layout itself,
    * not just the codes. One narrow codegen projection. */
  def quantizeInt4(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = aggregate(col(vecCol), lit(0.0d),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 7.0
    val q = expr("transform(__vec, v -> CAST(greatest(-7.0d, least(7.0d, " +
      "floor(CAST(v AS DOUBLE) / (CASE WHEN __scale = 0.0d THEN 1.0d ELSE __scale END) " +
      "+ 0.5d))) AS BIGINT))")
    val packedCksum = expr(
      "CASE WHEN n_dims = 0 THEN 0L ELSE aggregate(zip_with(" +
        "transform(sequence(0L, (n_dims + 1) div 2 - 1), i -> " +
        "(element_at(__q, CAST(2*i+1 AS INT)) + 8) + " +
        "(CASE WHEN 2*i+2 <= n_dims THEN element_at(__q, CAST(2*i+2 AS INT)) + 8 " +
        "ELSE 8 END) * 16), " +
        "sequence(1L, (n_dims + 1) div 2), (b, i) -> b * i), " +
        "0L, (a, v) -> a + v) END")
    emb.select(col(idCol), col(vecCol).as("__vec"), scale.as("__scale"))
      .select(col(idCol), size(col("__vec")).cast("long").as("n_dims"),
        col("__scale").as("scale"), q.as("__q"))
      .select(col(idCol), col("n_dims"), col("scale"), col("__q"),
        aggregate(col("__q"), lit(0L), (a, v) => a + v).as("q_sum"),
        when(col("n_dims") === 0, lit(0L))
          .otherwise(aggregate(zip_with(col("__q"),
              sequence(lit(1L), col("n_dims")), (qv, i) => qv * i),
            lit(0L), (a, v) => a + v)).as("q_cksum"))
      .withColumn("packed_cksum", packedCksum)
      .drop("__q")
  }

  /** Quantized retrieval on int4 codes — [[int8CosineTopK]]'s scheme
    * at half the bytes: scales cancel in the cosine, the score is
    * pure integers + sqrt + one divide, hash-exact anywhere;
    * zero-norm codes score -2.0. One narrow codegen projection +
    * TakeOrdered — no shuffle, the petabyte-store scan shape at 1/8
    * the float bytes. */
  def int4CosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    require(k > 0)
    val qScaleRaw = query.foldLeft(0.0)((m, v) => math.max(m, math.abs(v.toDouble))) / 7.0
    val qScale = if (qScaleRaw == 0.0) 1.0 else qScaleRaw
    val qCodes: Array[Long] = query.map(v =>
      math.max(-7L, math.min(7L, math.floor(v.toDouble / qScale + 0.5).toLong)))
    val q2 = qCodes.foldLeft(0L)((a, x) => a + x * x)
    val scale = aggregate(col("__vec"), lit(0.0d),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 7.0
    emb.select(col(idCol), col(vecCol).as("__vec"))
      .withColumn("__scale", scale)
      .withColumn("__q", expr("transform(__vec, v -> CAST(greatest(-7.0d, " +
        "least(7.0d, floor(CAST(v AS DOUBLE) / (CASE WHEN __scale = 0.0d " +
        "THEN 1.0d ELSE __scale END) + 0.5d))) AS BIGINT))"))
      .withColumn("__dot", aggregate(
        zip_with(col("__q"), typedlit(qCodes), (a, b) => a * b),
        lit(0L), (a, v) => a + v))
      .withColumn("__v2", aggregate(col("__q"), lit(0L), (a, v) => a + v * v))
      .withColumn("sim_q",
        when(col("__v2") === 0L || lit(q2) === 0L, lit(-2.0d))
          .otherwise(col("__dot").cast("double") /
            (sqrt(col("__v2").cast("double")) * sqrt(lit(q2.toDouble)))))
      .orderBy(col("sim_q").desc, col(idCol))
      .select(col(idCol), col("__dot").as("dot_q"), col("sim_q"))
      .limit(k)
  }

  /** Recall@k of int4 retrieval against exact float cosine — the 8x
    * point on the compression/recall curve the binary (32x) and
    * truncation gauges already price, same integer milli units and
    * tie-breaks. */
  def int4CosineRecall(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val exact = cosineTopK(emb, idCol, vecCol, query, k).select(col(idCol))
    val approx = int4CosineTopK(emb, idCol, vecCol, query, k).select(col(idCol))
    exact.intersect(approx)
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(k.toLong).as("k"), col("n_overlap"),
        expr(s"n_overlap * 1000L div ${k}L").as("recall_milli"))
  }

  /** Recall@k of int8 retrieval against exact float cosine — the 4x
    * point, completing the measured compression ladder (4x / 8x / 32x
    * / m-of-d truncation, all priced by the same gauge). */
  def int8CosineRecall(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val exact = cosineTopK(emb, idCol, vecCol, query, k).select(col(idCol))
    val approx = int8CosineTopK(emb, idCol, vecCol, query, k).select(col(idCol))
    exact.intersect(approx)
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(k.toLong).as("k"), col("n_overlap"),
        expr(s"n_overlap * 1000L div ${k}L").as("recall_milli"))
  }

  /** Metadata-FILTERED retrieval — the hybrid serving shape (every
    * production vector store takes a predicate with the query): exact
    * cosine top-k among only the rows whose `labelCol` matches. The
    * predicate applies BEFORE the kernel, so Catalyst pushes it to
    * the scan (explain shows PushedFilters) and the expensive cosine
    * touches only the matching slice; still scan + TakeOrdered, no
    * shuffle. Deterministic id tie-breaks. */
  def filteredCosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, labelValue: Long, query: Array[Float],
      k: Int): DataFrame = {
    require(k > 0)
    emb.filter(col(labelCol) === labelValue)
      .select(col(idCol), col(labelCol),
        cosine(col(vecCol), typedlit(query)).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Product quantization: each vector splits into `m` contiguous
    * subvectors and each subvector maps to its nearest codebook entry
    * (one code in [0, kSub) per segment). Codebooks are built
    * deterministically per segment with the [[ivfCentroids]] recipe
    * (id-hash seeding + one refinement pass — no RNG) over a
    * deterministic id-hash sample of `samplePct`% of the rows: codebook
    * training touches a bounded sample however large the store, while
    * the encoding itself is a narrow codegen projection over the full
    * scan (centroids ride along as literal-sized reference objects —
    * no shuffle, no join). Emits one `code_<s>` column per segment
    * plus the per-vector code checksum. */
  def pqCodes(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, kSub: Int = 16, samplePct: Int = 100): DataFrame = {
    require(m > 0 && kSub > 0 && samplePct > 0 && samplePct <= 100)
    val dims = emb.select(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(dims.getInt(0) == dims.getInt(1),
      s"pq needs uniform dims, got [${dims.getInt(0)}, ${dims.getInt(1)}]")
    val segLen = dims.getInt(0) / m
    require(segLen > 0, s"more segments ($m) than dims (${dims.getInt(0)})")
    val train =
      if (samplePct == 100) emb
      else emb.filter(graft.functions.hashes.lehmer3(col(idCol)) % 100 < samplePct)
    val segs = (0 until m).map(s => slice(col(vecCol), s * segLen + 1, segLen))
    val books = pqCodebooks(train, idCol, segs, kSub)
    val codeCols = (0 until m).map { s =>
      graft.functions.vectors.nearest_centroid(segs(s), books(s))
        .cast("long").as(s"code_$s")
    }
    val out = emb.select((col(idCol) +: codeCols): _*)
    val cksum = (0 until m).map(s => col(s"code_$s") * lit(s + 1L))
      .reduce(_ + _)
    out.withColumn("code_cksum", cksum)
  }

  /** All `m` segment codebooks in TWO data passes total — not 2·m:
    * every pass computes per-(segment, list, position) means in one
    * explode + partially-aggregated shuffle, whose reduced size is
    * m x kSub x segLen cells regardless of row count. Pass 1 seeds
    * lists from the id hash (identical across segments); pass 2
    * reassigns each segment to its nearest seed centroid and re-means —
    * the same hash-seed + one-refinement recipe as [[ivfCentroids]]. */
  private def pqCodebooks(train: DataFrame, idCol: String,
      segs: Seq[Column], kSub: Int): Array[Array[Array[Double]]] = {
    val m = segs.length
    val named = train.select(
      (col(idCol) +: segs.zipWithIndex.map { case (c, s) => c.as(s"__seg_$s") }): _*)
    def means(listOf: Int => Column): Array[Array[Array[Double]]] = {
      val entries = array((0 until m).map(s => struct(lit(s).as("seg"),
        listOf(s).as("list"), col(s"__seg_$s").as("v"))): _*)
      // exact 2^-20-grid integer means, same contract as [[meanByList]]
      val rows = named.select(explode(entries).as("e"))
        .select(col("e.seg").as("seg"), col("e.list").as("list"),
          posexplode(col("e.v")).as(Seq("pos", "x")))
        .groupBy(col("seg"), col("list"), col("pos"))
        .agg(sum(floor(col("x").cast("double") * lit(1048576.0) + lit(0.5)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val dims = rows.iterator.map(_.getInt(2)).max + 1
      val out = Array.fill(m, kSub)(new Array[Double](dims))
      rows.foreach(r => out(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
        r.getLong(3).toDouble / r.getLong(4) / 1048576.0)
      out
    }
    val hashList = (graft.functions.hashes.lehmer3(col(idCol)) % kSub).cast("int")
    val seed = means(_ => hashList)
    means(s => graft.functions.vectors.nearest_centroid(col(s"__seg_$s"), seed(s)))
  }

  /** Semantic dedup (the SemDeDup shape): block by the deterministic
    * IVF coarse cluster, then exact-verify cosine within each cluster —
    * near-duplicate semantics from the embedding geometry with no
    * all-pairs join; the pair space is bounded per cluster, and the
    * cluster count is the recall/cost dial (pairs straddling a cluster
    * boundary are the accepted miss, as in the published method).
    * Composes [[ivfCentroids]] (whose quantizer is oracle-replayable)
    * with [[cosineNearDupPairs]]. */
  def semanticDedupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nLists: Int = 16): DataFrame = {
    val cents = ivfCentroids(emb, idCol, vecCol, nLists)
    val assigned = emb.withColumn("__list",
      graft.functions.vectors.nearest_centroid(col(vecCol), cents))
    cosineNearDupPairs(assigned, idCol, vecCol, "__list", threshold)
  }

  /** Embedding-space benchmark decontamination: flag training vectors
    * whose cosine against ANY evaluation vector reaches `threshold` —
    * the semantic complement of the n-gram decontaminate (a paraphrased
    * eval item shares no n-grams but sits next to its source in
    * embedding space). The eval set is the deterministic id-hash bucket
    * ([[TextStats.idBucket]] < evalPct), matching the text-side split.
    *
    * Scale shape: an eval benchmark is small by construction
    * (thousands of items against a 100 TB corpus), so the eval side is
    * explicitly broadcast and the scan-side work is |train| x |eval|
    * narrow dot products with NO shuffle of the vectors; the only
    * exchange carries the already-reduced (id, n_hits, max_sim) hits.
    * If the eval side ever outgrew broadcast, [[semanticDedupPairs]]'
    * cluster blocking is the fallback shape. Aggregates (count, max)
    * are order-free, so results are engine-exact. */
  def decontaminateByEmbedding(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, evalPct: Int = 5): DataFrame = {
    val b = TextStats.idBucket(col(idCol), 100L)
    val withNorm = emb.select(col(idCol), col(vecCol),
      graft.functions.vectors.vector_norm(col(vecCol)).as("__n"))
    val eval = withNorm.filter(b < evalPct).select(
      col(idCol).as("__eid"), col(vecCol).as("__ev"), col("__n").as("__en"))
    withNorm.filter(b >= evalPct)
      .crossJoin(broadcast(eval))
      .withColumn("sim",
        graft.functions.vectors.vector_dot(col(vecCol), col("__ev")) /
          (col("__n") * col("__en")))
      .filter(col("sim") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), max(col("sim")).as("max_sim"))
  }

  /** Exact near-duplicate pairs (cosine >= threshold) within blocking
    * groups (e.g. a cluster/label/shard key): an equi-join on the block
    * key keeps the pair space bounded per group — the all-pairs form of
    * embedding dedup that survives scale when groups are bounded. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    // precompute each row's norm once — the pair join then evaluates
    // only the dot product per candidate, not three folds
    val withNorm = emb.select(col(blockCol).as("__blk"), col(idCol), col(vecCol),
      graft.functions.vectors.vector_norm(col(vecCol)).as("__n"))
    val a = withNorm.select(col("__blk"), col(idCol).as("id_a"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = withNorm.select(col("__blk"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    a.join(b, "__blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        graft.functions.vectors.vector_dot(col("__va"), col("__vb")) /
          (col("__na") * col("__nb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Banded-LSH near-duplicate pairs for when no natural blocking key
    * exists — the RHP analogue of minhash banding: a `bands *
    * bitsPerBand`-bit hyperplane fingerprint per vector, one candidate
    * bucket key per band, pair on agreement in ANY band, then
    * exact-verify cosine once per distinct candidate pair. Precision
    * is 1.0 (every emitted pair is exactly verified); recall is
    * 1-(1-p^r)^B with p = 1 - theta/pi — r short and B wide reaches
    * deep into the low-similarity regime (~0.95 at sim 0.35 with
    * r=3, B=12), where a single long bucket key has near-zero recall.
    *
    * Scale note: shorter band keys mean bigger buckets, so candidate
    * volume rises as the target threshold drops — at production dedup
    * thresholds (>= ~0.8) prefer longer bands (r >= 8), which keep
    * buckets small and candidates ~linear; the r/B dial trades
    * candidate volume for recall explicitly.
    *
    * The scale hazard above is ENFORCED, not just documented: before
    * the band equi-join, one reduced aggregation over the band keys
    * (ids and fingerprints only — no vectors) computes the EXACT
    * candidate-pair volume the join would produce (sum over buckets of
    * n*(n-1)/2). If it exceeds `maxAvgCandidatesPerRow` per input row,
    * the call fails loudly with the remediation options
    * (semanticDedupPairs for low thresholds, or longer bands) instead
    * of silently running a near-quadratic join — at 10x data below
    * cosine ~0.7, banded RHP admits ~80% of random pairs as candidates
    * (measured 76x runtime, BENCH_SF1.md). The probe costs one extra
    * narrow job; pass 0 to disable (results are identical either way —
    * the guard never alters the plan, only vetoes it). */
  def cosineNearDupPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bitsPerBand: Int = 3, bands: Int = 12,
      maxAvgCandidatesPerRow: Double = 256.0): DataFrame = {
    val nBits = bitsPerBand * bands
    require(nBits <= 62, s"bitsPerBand * bands must be <= 62, got $nBits")
    val mask = (1 << bitsPerBand) - 1
    val withFp = emb.select(col(idCol),
      graft.functions.vectors.rhp_fingerprint(col(vecCol), nBits).as("__fp"))
    if (maxAvgCandidatesPerRow > 0) {
      val (rows, pairs) = lshCandidatePairStats(withFp, "__fp", bitsPerBand, bands)
      Guard.verify(GuardReport("banded-LSH candidate", rows, pairs,
        BigDecimal(maxAvgCandidatesPerRow), perRow = true,
        "At thresholds below ~0.7 banded RHP-LSH degenerates toward " +
          "all-pairs; use Similarity.semanticDedupPairs (IVF-blocked) " +
          "instead, or raise bitsPerBand to shrink buckets, or raise " +
          "maxAvgCandidatesPerRow if this volume is intended."))
    }
    // the band join carries ONLY (id, fingerprint) — never the vectors;
    // a 64-dim float array through an exploded candidate join costs
    // more in row copies than the whole verify (measured 1.8x the
    // suite's old distinct() plan at sf0.1)
    def banded(side: String, fp: String) =
      withFp.select(col(idCol).as(side), col("__fp").as(fp),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> (__fp >> (b * $bitsPerBand)) & $mask)")).as(Seq("band", "key")))
    // each pair is emitted only from the SMALLEST band the two
    // fingerprints agree on — a row-local bit predicate on the join
    // output, so multi-band hits dedup without shuffling the candidate
    // pair table through a distinct() (the simhash firstAgreeingChunk
    // pattern). Unrolled over the (compile-time) band count: a forall
    // lambda here would drop the hot filter out of codegen into
    // interpreted per-row eval
    val firstAgreeingBand = (0 until bands - 1).map { bb =>
      (col("band") <= bb) ||
        (expr(s"(__fpa >> ${bb * bitsPerBand}) & $mask") =!=
          expr(s"(__fpb >> ${bb * bitsPerBand}) & $mask"))
    }.reduce(_ && _)
    val cand = banded("id_a", "__fpa").join(banded("id_b", "__fpb"), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .filter(firstAgreeingBand)
      .select("id_a", "id_b")
    // verify joins: the (id, vector, norm) side is table-sized (not
    // candidate-sized), so AQE broadcasts it at test scale and falls
    // back to shuffle joins when the table is genuinely large
    val withNorm = emb.select(col(idCol),
      col(vecCol), graft.functions.vectors.vector_norm(col(vecCol)).as("__n"))
    val a = withNorm.select(col(idCol).as("id_a"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = withNorm.select(col(idCol).as("id_b"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("sim",
        graft.functions.vectors.vector_dot(col("__va"), col("__vb")) /
          (col("__na") * col("__nb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b")
  }

  /** Exact candidate-pair volume of a banded equi-join over the given
    * fingerprint column: sum over (band, key) buckets of n*(n-1)/2,
    * plus the input row count — both from ONE reduced aggregation over
    * a narrow (fingerprint-only) projection. Decimal accumulation: a
    * single degenerate bucket of 10^9 rows yields ~5*10^17 pairs, and
    * several of them would overflow a Long sum. */
  def lshCandidatePairStats(withFp: DataFrame, fpCol: String,
      bitsPerBand: Int, bands: Int): (Long, BigDecimal) = {
    val mask = (1 << bitsPerBand) - 1
    // null fingerprints (null/empty vectors) never reach the band join
    // (posexplode drops them), so they must not be counted here either
    // — a null-heavy input would otherwise pool into one phantom
    // (band, NULL) bucket and falsely trip the guard
    val sizes = withFp
      .filter(col(fpCol).isNotNull)
      .select(posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> ($fpCol >> (b * $bitsPerBand)) & $mask)")).as(Seq("band", "key")))
      .groupBy("band", "key").agg(count(lit(1)).as("n"))
    val row = sizes.agg(
      coalesce(sum(col("n")), lit(0L)).as("slots"),
      coalesce(sum((col("n").cast("decimal(38,0)") * (col("n") - 1))),
        lit(java.math.BigDecimal.ZERO)).as("pairs2x")).first()
    val rows = row.getLong(0) / bands
    val pairs = BigDecimal(row.getDecimal(1)) / 2
    (rows, pairs)
  }

  /** Hard-negative mining for contrastive training: per anchor, the
    * highest-cosine SAME-label peer (the positive) and the
    * highest-cosine DIFFERENT-label vector within the anchor's IVF
    * list (the hard negative) — the ANN-shortlist practice: exact
    * all-pairs hard negatives are n² and nobody mines them that way
    * at scale; restricting negatives to the anchor's quantizer cell
    * is the deterministic form of "mine from the ANN shortlist".
    *
    * Scale shape: both joins are blocked (label / IVF list), so pair
    * volume is bounded by block sizes, never n²; the argmax windows
    * partition by anchor (no single-partition stage). Anchors lacking
    * a same-label peer or an in-list negative drop out (inner joins).
    * Ties break by (sim desc, id asc) — deterministic on any engine
    * since the cosine fold is IEEE-identical. */
  def hardNegativeMine(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, nLists: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = ivfCentroids(emb, idCol, vecCol, nLists)
    val v = emb.select(col(idCol), col(labelCol), col(vecCol))
      .withColumn("__list",
        graft.functions.vectors.nearest_centroid(col(vecCol), cents))
    val x = v.select(col(idCol).as("__aid"), col(labelCol).as("__alab"),
      col(vecCol).as("__avec"), col("__list").as("__alist"))
    val y = v.select(col(idCol).as("__bid"), col(labelCol).as("__blab"),
      col(vecCol).as("__bvec"), col("__list").as("__blist"))
    def top1(pairs: DataFrame, simCol: String, outId: String): DataFrame = {
      val w = Window.partitionBy(col("__aid"))
        .orderBy(col(simCol).desc, col("__bid").asc)
      pairs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__aid"), col("__bid").as(outId), col(simCol))
    }
    val pos = top1(
      x.join(y, col("__alab") === col("__blab") && col("__aid") =!= col("__bid"))
        .select(col("__aid"), col("__bid"),
          cosine(col("__avec"), col("__bvec")).as("pos_sim")),
      "pos_sim", "pos_id")
    val neg = top1(
      x.join(y, col("__alist") === col("__blist") && col("__alab") =!= col("__blab"))
        .select(col("__aid"), col("__bid"),
          cosine(col("__avec"), col("__bvec")).as("neg_sim")),
      "neg_sim", "neg_id")
    pos.join(neg, "__aid")
      .select(col("__aid").as(idCol), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"))
  }

  /** IVF + PQ search — the memory-scale ANN form: coarse-quantize to
    * prune the corpus to nProbe inverted lists, then rank candidates by
    * ASYMMETRIC DISTANCE (ADC): each vector is represented only by its
    * m product-quantizer codes, and a candidate's score is the sum of
    * m table lookups — table[s][j] = dot(query-segment s, codebook
    * entry j), built once per query on the driver (m x kSub doubles).
    * At 100 TB this is the path where the vectors themselves never
    * need to be read at query time: the scan touches (code_0..m,
    * list_id) columns only — 4 bytes/vector instead of 256.
    *
    * Everything is deterministic (hash-seeded quantizers, exact
    * integer-grid centroid means, fixed-order lookup-table sums), so a
    * DuckDB oracle replays scores bit-for-bit. Scoring is approximate
    * RELATIVE TO exact cosine by construction (that is the PQ trade);
    * the returned adc_score is itself exact. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nLists: Int = 16, nProbe: Int = 4,
      m: Int = 4, kSub: Int = 16, samplePct: Int = 50): DataFrame = {
    val dims = emb.select(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(dims.getInt(0) == dims.getInt(1), "ivfpq needs uniform dims")
    val segLen = dims.getInt(0) / m
    require(segLen > 0, s"more segments ($m) than dims (${dims.getInt(0)})")

    val cents = ivfCentroids(emb, idCol, vecCol, nLists)
    val qd = query.map(_.toDouble)
    def cos(c: Array[Double]): Double = {
      var dot = 0.0; var nc = 0.0; var nq = 0.0
      var i = 0
      while (i < math.min(c.length, qd.length)) {
        dot += c(i) * qd(i); nc += c(i) * c(i); nq += qd(i) * qd(i); i += 1
      }
      if (nc == 0 || nq == 0) -2.0 else dot / (math.sqrt(nc) * math.sqrt(nq))
    }
    val probes = cents.zipWithIndex.map { case (c, i) => (cos(c), i) }
      .sortBy(-_._1).take(nProbe).map(_._2)

    val train =
      if (samplePct == 100) emb
      else emb.filter(graft.functions.hashes.lehmer3(col(idCol)) % 100 < samplePct)
    val segs = (0 until m).map(s => slice(col(vecCol), s * segLen + 1, segLen))
    val books = pqCodebooks(train, idCol, segs, kSub)
    // ADC lookup tables: sequential-fold dot of each query segment with
    // each codebook entry — the only place the full query vector is used
    val tables = (0 until m).map { s =>
      val qs = query.slice(s * segLen, (s + 1) * segLen)
      books(s).map { c =>
        var acc = 0.0; var i = 0
        while (i < math.min(qs.length, c.length)) {
          acc += qs(i).toDouble * c(i); i += 1
        }
        acc
      }
    }
    val codeCols = (0 until m).map(s =>
      graft.functions.vectors.nearest_centroid(segs(s), books(s))
        .cast("int").as(s"__code_$s"))
    val adc = (0 until m).map(s =>
        element_at(lit(tables(s)), col(s"__code_$s") + 1))
      .reduce(_ + _) // fixed left-assoc order: ((t0+t1)+t2)+t3
    emb.withColumn("list_id",
        graft.functions.vectors.nearest_centroid(col(vecCol), cents))
      .filter(col("list_id").isin(probes.toSeq: _*))
      .select((col(idCol) +: codeCols): _*)
      .withColumn("adc_score", adc)
      .select(col(idCol), col("adc_score"))
      .orderBy(col("adc_score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Maximal-marginal-relevance re-rank: greedily pick k results that
    * balance query relevance against redundancy with what is already
    * picked — score(c) = (sim(q,c) - max_{s in picked} sim(c,s)) / 2,
    * i.e. lambda = 1/2, the one lambda whose scaling is an EXACT
    * power-of-two multiply (bit-reproducible across engines). The
    * standard diversified-retrieval pass after any ANN shortlist.
    *
    * Scale shape: relevance scoring + top-poolSize shortlist is the
    * distributed part (TakeOrdered, no shuffle of the vectors); the
    * greedy selection is inherently sequential and runs on the driver
    * over the BOUNDED pool (poolSize rows — the same bounded-collect
    * contract as the IVF centroids), at O(k * poolSize) pairwise
    * kernels. Pairwise cosine uses the same sequential-fold arithmetic
    * as the distributed kernel, so a DuckDB recursive-CTE oracle
    * replays every pick and score bit-for-bit. Ties (same score) break
    * to the lower id, first pick is the relevance top-1. */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, poolSize: Int = 32): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = typedlit(query)
    val pool = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        // try_divide: a zero-norm vector has no direction — its cosine
        // nulls out here (ANSI double division would THROW on /0)
        // instead of hijacking the pool and poisoning every pairwise
        // penalty downstream
        try_divide(graft.functions.vectors.vector_dot(col(vecCol), q),
          graft.functions.vectors.vector_norm(col(vecCol)) *
            graft.functions.vectors.vector_norm(q)).as("sim"))
      .filter(col("sim").isNotNull && !isnan(col("sim")))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(poolSize)
      .collect() // bounded: poolSize rows, the rerank shortlist
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1
      }
      acc
    }
    def cosAB(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val chosen = scala.collection.mutable.Set.empty[Long]
    if (pool.nonEmpty) { // pool is (sim desc, id asc): top-1 leads
      picked += ((pool(0)._1, pool(0)._3))
      pickedVecs += pool(0)._2
      chosen += pool(0)._1
    }
    var exhausted = false
    while (!exhausted && picked.size < math.min(k, pool.length)) {
      var bestId = -1L; var bestVec: Array[Float] = null
      var bestScore = Double.NegativeInfinity
      pool.foreach { case (id, v, sim) =>
        if (!chosen.contains(id)) {
          var penalty = Double.NegativeInfinity
          pickedVecs.foreach { pv =>
            val s = cosAB(v, pv); if (s > penalty) penalty = s
          }
          val score = (sim - penalty) * 0.5
          if (score > bestScore || (score == bestScore && id < bestId)) {
            bestScore = score; bestId = id; bestVec = v
          }
        }
      }
      // every remaining candidate scored NaN (defensive — the pool is
      // already NaN-filtered): stop rather than pick a sentinel
      if (bestId == -1L) exhausted = true
      else {
        picked += ((bestId, bestScore))
        pickedVecs += bestVec
        chosen += bestId
      }
    }
    picked.zipWithIndex
      .map { case ((id, score), i) => (i + 1L, id, score) }
      .toSeq.toDF("rank", "vec_id", "mmr_score")
  }
}
