package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity

/** Embedding similarity surface over the `embeddings` test table
  * (vec_id BIGINT, embedding ARRAY<FLOAT> dim 64, label INT).
  *
  * Float determinism: Spark computes cosine as a strictly sequential
  * left fold in double ([[Similarity.cosine]]); the DuckDB oracles
  * mirror that with list_reduce over a 0.0-seeded prepend — the same
  * IEEE op sequence, so sims are bit-identical and thresholds / top-k
  * cuts are hash-safe without rounding. The ANN/LSH/IVF/PQ paths are
  * approximate with respect to the exact top-k but fully deterministic
  * — every pseudo-random choice is [[PortableSql]]-portable (lehmer3)
  * and every centroid mean is an exact integer mean — so even they
  * carry full replication oracles rather than rows-only checks.
  */
object EmbeddingQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    graft.Tables.table(s, dir, "embeddings")

  /** The deterministic probe vector: embedding of vec_id 0. */
  private def queryVec(s: SparkSession, dir: String): Array[Float] =
    emb(s, dir).filter("vec_id = 0").select("embedding").head()
      .getSeq[Float](0).toArray

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_cosine_topk" -> ((s, d) =>
      Similarity.cosineTopK(emb(s, d), "vec_id", "embedding", queryVec(s, d), 20)),
    // diversified retrieval: MMR greedy re-rank of the cosine top-32
    // shortlist (query vector itself excluded — it would zero every
    // marginal score); lambda = 1/2 keeps the scoring arithmetic exact,
    // so the DuckDB recursive-CTE oracle replays each pick bit-for-bit
    "emb_mmr_rerank" -> ((s, d) =>
      Similarity.mmrRerank(emb(s, d).filter("vec_id != 0"), "vec_id",
        "embedding", queryVec(s, d), k = 8, poolSize = 32)),
    "emb_ann_topk" -> ((s, d) =>
      Similarity.annTopK(emb(s, d), "vec_id", "embedding", queryVec(s, d), 20,
        nBits = 12, maxHamming = 4)),
    "emb_neardup_label" -> ((s, d) =>
      Similarity.cosineNearDupPairs(emb(s, d), "vec_id", "embedding", "label", 0.35)
        .orderBy("id_a", "id_b")),
    // guard off (maxAvgCandidatesPerRow = 0): this fixture INTENDS the
    // low-threshold/near-all-pairs regime so the exact unrolled oracle
    // can replay every candidate; production callers get the default
    // candidate-volume guard, which vetoes this configuration at scale
    // (spec-pinned in SimilaritySpec)
    // guard default 0 here = the documented opt-out (this fixture
    // INTENDS the low-threshold regime so the oracle can replay every
    // candidate); a deployment arms it via session config
    // spark.graft.guard.lshMaxAvgCandidatesPerRow
    "emb_neardup_lsh" -> ((s, d) =>
      Similarity.cosineNearDupPairsLsh(emb(s, d), "vec_id", "embedding", 0.35,
        bitsPerBand = 3, bands = 12, maxAvgCandidatesPerRow =
          graft.operators.Guard.budget(s, "lshMaxAvgCandidatesPerRow", 0.0))),
    "emb_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(emb(s, d), "vec_id", "embedding", queryVec(s, d), 20,
        nLists = 16, nProbe = 4)),
    // ANN quality gauge: recall@20 of the IVF probe against the exact
    // cosine truth — deterministic on both sides, so even the recall
    // number is oracle-replayable
    "emb_ivf_recall" -> ((s, d) =>
      Similarity.ivfRecall(emb(s, d), "vec_id", "embedding", queryVec(s, d),
        20, nLists = 16, nProbe = 4)),
    // full Lloyd training loop: lehmer3 seed, 3 rounds of assign ->
    // exact-integer centroid update, final membership for every row —
    // the whole iteration oracle-replayed
    "emb_kmeans_train" -> ((s, d) =>
      Similarity.kmeansTrain(emb(s, d), "vec_id", "embedding",
        k = 8, rounds = 3)),
    // nearest-centroid assignment with k = 4 fixed centroids (the
    // embeddings of vec_id 0..3 — deterministic, collectable by both
    // engines); the k-means inner loop as an oracle-checkable operator
    "emb_kmeans_assign" -> ((s, d) => {
      val cents = emb(s, d).filter("vec_id < 4").orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      Similarity.centroidAssign(emb(s, d), "vec_id", "embedding", cents)
    }),
    // per-dimension embedding health profile: exact integer
    // sum/sumsq/min/max of the 2^-20-quantized component per position
    "emb_dim_stats" -> ((s, d) =>
      Similarity.dimStats(emb(s, d), "embedding")),
    "emb_quantize_int8" -> ((s, d) =>
      Similarity.quantizeInt8(emb(s, d), "vec_id", "embedding")),
    // the 8x tier between int8 and the sign bit: [-7,7] codes plus the
    // nibble-packed byte layout (pinned by the packed checksum)
    "emb_quantize_int4" -> ((s, d) =>
      Similarity.quantizeInt4(emb(s, d), "vec_id", "embedding")),
    // retrieval on int4 codes — scales cancel, integer-exact score
    "emb_int4_topk" -> ((s, d) =>
      Similarity.int4CosineTopK(emb(s, d), "vec_id", "embedding",
        queryVec(s, d), 20)),
    // the 8x point on the compression/recall curve (32x = binary,
    // 4x = int8-without-gauge, m/d = truncation)
    "emb_int4_recall" -> ((s, d) =>
      Similarity.int4CosineRecall(emb(s, d), "vec_id", "embedding",
        queryVec(s, d), 20)),
    // the 32x tier below int8: sign-bit packing into 64-bit lanes,
    // exposed as unsigned 32-bit halves (the dHash rendering)
    "emb_binary_quant" -> ((s, d) =>
      Similarity.binaryQuantize(emb(s, d), "vec_id", "embedding")),
    // Hamming retrieval over the binary tier — scan shape, no shuffle
    "emb_binary_topk" -> ((s, d) =>
      Similarity.binaryHammingTopK(emb(s, d), "vec_id", "embedding",
        queryVec(s, d), 20)),
    // the gauge that prices the compression: binary-shortlist recall
    // against exact float cosine, integer milli units
    "emb_binary_recall" -> ((s, d) =>
      Similarity.binaryHammingRecall(emb(s, d), "vec_id", "embedding",
        queryVec(s, d), 20)),
    // the two-tier serving shape: 100-candidate Hamming shortlist,
    // exact cosine rerank of only those to top-20
    "emb_binary_rerank" -> ((s, d) =>
      Similarity.binaryShortlistRerank(emb(s, d), "vec_id", "embedding",
        queryVec(s, d), k = 20, shortlist = 100)),
    // Matryoshka gauge: top-20 by the FIRST 16 dims vs full 64 dims
    "emb_trunc_recall" -> ((s, d) =>
      Similarity.truncationRecall(emb(s, d), "vec_id", "embedding",
        queryVec(s, d), m = 16, k = 20)),
    // retrieval over the quantized store: scales cancel in the cosine,
    // so the int8 score is integer-exact on any engine
    "emb_int8_topk" -> ((s, d) =>
      Similarity.int8CosineTopK(emb(s, d), "vec_id", "embedding", queryVec(s, d), 20)),
    // the 4x point of the ladder's recall curve (int4 = 850, binary
    // = 250; int8 measures its own spot with the same gauge)
    "emb_int8_recall" -> ((s, d) =>
      Similarity.int8CosineRecall(emb(s, d), "vec_id", "embedding",
        queryVec(s, d), 20)),
    // hybrid (metadata-filtered) retrieval: predicate BEFORE the
    // kernel so it reaches the scan; cosine touches only label=3 rows
    "emb_filtered_topk" -> ((s, d) =>
      Similarity.filteredCosineTopK(emb(s, d), "vec_id", "embedding",
        "label", 3L, queryVec(s, d), 10)),
    // SemDeDup shape: IVF-cluster blocking + exact within-cluster
    // cosine — embedding-space near-dup pairs with no all-pairs join
    "emb_semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedupPairs(emb(s, d), "vec_id", "embedding", 0.35)
        .orderBy("id_a", "id_b")),
    // product quantization: the codebooks derive from lehmer3 seeding
    // and exact integer means, so the oracle replays the full double
    // k-means; the spec additionally pins reconstruction quality
    "emb_pq_codes" -> ((s, d) =>
      Similarity.pqCodes(emb(s, d), "vec_id", "embedding",
        m = 4, kSub = 16, samplePct = 50)),
    // stored IVF index: probes read only the probed list_id partitions
    // (partition pruning at the source). Same quantizer recipe as
    // emb_ivf_topk -> identical result, so it shares that oracle; the
    // dir carries a recipe version so a stale index from an older
    // quantizer recipe is never served
    "emb_ivf_indexed" -> ((s, d) => {
      val fp = DatasetFingerprint.of(s"$d/embeddings.parquet")
      val dir = s"/tmp/graft_ivf2_${d.replaceAll("[^A-Za-z0-9.]", "_")}_$fp"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/centroids/_SUCCESS")))
        Similarity.writeIvfIndex(emb(s, d), "vec_id", "embedding", dir, nLists = 16)
      Similarity.ivfTopKIndexed(s, dir, "vec_id", "embedding",
        queryVec(s, d), 20, nProbe = 4)
    }),
    // memory-scale ANN: IVF probe pruning + product-quantization ADC
    // scoring — candidates are ranked by m table lookups over their
    // 4 codes, the vectors themselves untouched at query time
    "emb_ivfpq_topk" -> ((s, d) =>
      Similarity.ivfPqTopK(emb(s, d), "vec_id", "embedding", queryVec(s, d), 20)),
    // embedding-space benchmark decontamination: train vectors within
    // cosine 0.3 of any eval vector (eval = id-hash bucket < 5, the
    // text-side split), eval side broadcast — no vector shuffle
    "emb_decontaminate" -> ((s, d) =>
      Similarity.decontaminateByEmbedding(emb(s, d), "vec_id", "embedding",
        threshold = 0.3)),
    // contrastive-training pair mining: per anchor the best same-label
    // positive + the hardest different-label negative from the
    // anchor's IVF list (the deterministic ANN-shortlist form)
    "emb_hard_negatives" -> ((s, d) =>
      Similarity.hardNegativeMine(emb(s, d), "vec_id", "embedding", "label")))

  /** Sequential-fold dot product of two DuckDB float lists, in double —
    * op-for-op the plan Spark's aggregate(zip_with(...)) produces. */
  private def foldDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)),
       (acc, v) -> acc + v)"""

  private def foldNorm(a: String): String =
    s"""sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       list_transform($a, v -> v::DOUBLE * v::DOUBLE)),
       (acc, v) -> acc + v))"""

  private[queries] def cosineSql(a: String, b: String): String =
    s"${foldDot(a, b)} / (${foldNorm(a)} * ${foldNorm(b)})"

  /** Densified (list 0..n-1, pos 0..dims-1) centroid grid from a
    * (list_id, pos, s, n) sum CTE — [[PortableSql.meanFromQ20]] means,
    * zero vector for empty lists, mirroring Similarity.meanByList. */
  private def centGrid(sumCte: String, nLists: Int, dims: Int): String =
    s"""SELECT g.l AS list_id,
       list(COALESCE(CAST(ss.s AS DOUBLE) / ss.n / 1048576.0, 0.0) ORDER BY g.p) AS cv
       FROM (SELECT a.range AS l, b.range AS p
             FROM range(0, $nLists) a, range(0, $dims) b) g
       LEFT JOIN $sumCte ss ON ss.list_id = g.l AND ss.pos = g.p
       GROUP BY 1"""

  /** Unrolled-CTE replication of the full Lloyd loop
    * (Similarity.kmeansTrain): a0 = lehmer3 seed, then per round r the
    * exact 2^-20-grid integer means (cent_r from a_r) and the
    * min-list-tie argmax reassignment (a_{r+1} from cent_r); the
    * final assignment a_{rounds+1} is the operator's output. Every
    * round replays bit-for-bit — including which near-tie memberships
    * flip between rounds. */
  private def kmeansCtes(k: Int, dims: Int, rounds: Int): String = {
    import PortableSql.{centroidCosine => cc, lehmer3, q20}
    val head =
      s"""e AS (SELECT vec_id, embedding FROM embeddings),
         a0 AS (SELECT vec_id, (${lehmer3("vec_id")} % $k) AS list_id FROM e)"""
    val roundCtes = (0 to rounds).map { r =>
      s"""sum$r AS (SELECT a$r.list_id, t.i AS pos,
             sum(${q20("e.embedding[t.i + 1]")}) AS s, count(*) AS n
           FROM e JOIN a$r USING (vec_id),
             LATERAL unnest(range(0, len(e.embedding))) AS t(i)
           GROUP BY 1, 2),
         cent$r AS (${centGrid(s"sum$r", k, dims)}),
         s${r + 1} AS (SELECT e.vec_id, c.list_id,
             ${cc("e.embedding", "c.cv")} AS sim
           FROM e CROSS JOIN cent$r c),
         b${r + 1} AS (SELECT vec_id, max(sim) AS bs FROM s${r + 1} GROUP BY 1),
         a${r + 1} AS (SELECT s.vec_id, min(s.list_id) AS list_id
           FROM s${r + 1} s JOIN b${r + 1} b
             ON s.vec_id = b.vec_id AND s.sim = b.bs
           GROUP BY 1)"""
    }
    (head +: roundCtes).mkString(",\n         ")
  }

  /** CTE chain replicating the deterministic IVF quantizer
    * (Similarity.ivfCentroids + final nearest-centroid assignment):
    * lehmer3 seeding, exact 2^-20-grid integer centroid means, one
    * refinement pass; `a2` holds every row's final list_id and `fcent`
    * the refined centroids. Shared by the IVF top-k oracles and the
    * semantic-dedup oracle. */
  private val ivfQuantizerCtes: String = {
    import PortableSql.{centroidCosine => cc, lehmer3, q20}
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       sa AS (SELECT vec_id, (${lehmer3("vec_id")} % 16) AS list_id, embedding FROM e),
       ssum AS (SELECT list_id, t.i AS pos, sum(${q20("embedding[t.i + 1]")}) AS s,
                count(*) AS n
              FROM sa, LATERAL unnest(range(0, len(embedding))) AS t(i)
              GROUP BY 1, 2),
       scent AS (${centGrid("ssum", 16, 64)}),
       s1 AS (SELECT e.vec_id, c.list_id, ${cc("e.embedding", "c.cv")} AS sim
              FROM e CROSS JOIN scent c),
       b1 AS (SELECT vec_id, max(sim) AS bs FROM s1 GROUP BY 1),
       a1 AS (SELECT s1.vec_id, min(s1.list_id) AS list_id
              FROM s1 JOIN b1 ON s1.vec_id = b1.vec_id AND s1.sim = b1.bs
              GROUP BY 1),
       fsum AS (SELECT a1.list_id, t.i AS pos, sum(${q20("e.embedding[t.i + 1]")}) AS s,
                count(*) AS n
              FROM e JOIN a1 USING (vec_id),
                LATERAL unnest(range(0, len(e.embedding))) AS t(i)
              GROUP BY 1, 2),
       fcent AS (${centGrid("fsum", 16, 64)}),
       s2 AS (SELECT e.vec_id, c.list_id, ${cc("e.embedding", "c.cv")} AS sim
              FROM e CROSS JOIN fcent c),
       b2 AS (SELECT vec_id, max(sim) AS bs FROM s2 GROUP BY 1),
       a2 AS (SELECT s2.vec_id, min(s2.list_id) AS list_id
              FROM s2 JOIN b2 ON s2.vec_id = b2.vec_id AND s2.sim = b2.bs
              GROUP BY 1)"""
  }

  /** Full SQL replication of the deterministic IVF pipeline: the
    * quantizer CTEs plus probe selection and exact rerank. Shared by
    * emb_ivf_topk and emb_ivf_indexed (the stored index provably
    * returns the same result — same quantizer, lossless double parquet
    * roundtrip). */
  private val ivfOracle: String = {
    import PortableSql.{centroidCosine => cc}
    s"""WITH $ivfQuantizerCtes,
       q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       probes AS (SELECT c.list_id FROM fcent c, q
                  ORDER BY ${cc("qe", "c.cv")} DESC, c.list_id LIMIT 4)
       SELECT e.vec_id, ${cosineSql("e.embedding", "qe")} AS sim
       FROM e JOIN a2 USING (vec_id), q
       WHERE a2.list_id IN (SELECT list_id FROM probes)
       ORDER BY sim DESC, e.vec_id LIMIT 20"""
  }

  /** Semantic-dedup oracle: same-quantizer-cluster pairs with exact
    * cosine >= threshold (Similarity.semanticDedupPairs). */
  private val semanticDedupOracle: String =
    s"""WITH $ivfQuantizerCtes
       SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         ${cosineSql("x.embedding", "y.embedding")} AS sim
       FROM e x JOIN a2 ax ON x.vec_id = ax.vec_id
         JOIN a2 ay ON ax.list_id = ay.list_id
         JOIN e y ON y.vec_id = ay.vec_id AND x.vec_id < y.vec_id
       WHERE sim >= 0.35"""

  /** Full SQL replication of Similarity.pqCodes (m=4, kSub=16,
    * samplePct=50 over 64 dims): per-segment codebooks trained on the
    * lehmer3 id sample with the same exact-integer-mean recipe, then
    * every row's segments coded against the refined books. */
  private val pqOracle: String = {
    import PortableSql.{centroidCosine => cc, lehmer3, q20}
    def segGrid(sumCte: String) =
      s"""SELECT g.sg AS seg, g.l AS list_id,
         list(COALESCE(CAST(ss.s AS DOUBLE) / ss.n / 1048576.0, 0.0) ORDER BY g.p) AS cv
         FROM (SELECT a.range AS sg, b.range AS l, c.range AS p
               FROM range(0, 4) a, range(0, 16) b, range(0, 16) c) g
         LEFT JOIN $sumCte ss ON ss.seg = g.sg AND ss.list_id = g.l AND ss.pos = g.p
         GROUP BY 1, 2"""
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       seg AS (SELECT e.vec_id, t.range AS seg,
                 e.embedding[t.range * 16 + 1 : t.range * 16 + 16] AS sv
               FROM e CROSS JOIN range(0, 4) t),
       samp AS (SELECT * FROM seg WHERE (${lehmer3("vec_id")} % 100) < 50),
       sa AS (SELECT vec_id, seg, (${lehmer3("vec_id")} % 16) AS list_id, sv FROM samp),
       ssum AS (SELECT seg, list_id, t.i AS pos, sum(${q20("sv[t.i + 1]")}) AS s,
                count(*) AS n
              FROM sa, LATERAL unnest(range(0, len(sv))) AS t(i)
              GROUP BY 1, 2, 3),
       scent AS (${segGrid("ssum")}),
       s1 AS (SELECT sa.vec_id, sa.seg, c.list_id, ${cc("sa.sv", "c.cv")} AS sim
              FROM sa JOIN scent c ON c.seg = sa.seg),
       b1 AS (SELECT vec_id, seg, max(sim) AS bs FROM s1 GROUP BY 1, 2),
       a1 AS (SELECT s1.vec_id, s1.seg, min(s1.list_id) AS list_id
              FROM s1 JOIN b1 ON s1.vec_id = b1.vec_id AND s1.seg = b1.seg
                AND s1.sim = b1.bs
              GROUP BY 1, 2),
       fsum AS (SELECT a1.seg, a1.list_id, t.i AS pos, sum(${q20("sm.sv[t.i + 1]")}) AS s,
                count(*) AS n
              FROM samp sm JOIN a1 ON sm.vec_id = a1.vec_id AND sm.seg = a1.seg,
                LATERAL unnest(range(0, len(sm.sv))) AS t(i)
              GROUP BY 1, 2, 3),
       fcent AS (${segGrid("fsum")}),
       s2 AS (SELECT sg.vec_id, sg.seg, c.list_id, ${cc("sg.sv", "c.cv")} AS sim
              FROM seg sg JOIN fcent c ON c.seg = sg.seg),
       b2 AS (SELECT vec_id, seg, max(sim) AS bs FROM s2 GROUP BY 1, 2),
       a2 AS (SELECT s2.vec_id, s2.seg, min(s2.list_id) AS code
              FROM s2 JOIN b2 ON s2.vec_id = b2.vec_id AND s2.seg = b2.seg
                AND s2.sim = b2.bs
              GROUP BY 1, 2),
       codes AS (SELECT vec_id,
                 CAST(max(CASE WHEN seg = 0 THEN code END) AS BIGINT) AS code_0,
                 CAST(max(CASE WHEN seg = 1 THEN code END) AS BIGINT) AS code_1,
                 CAST(max(CASE WHEN seg = 2 THEN code END) AS BIGINT) AS code_2,
                 CAST(max(CASE WHEN seg = 3 THEN code END) AS BIGINT) AS code_3
               FROM a2 GROUP BY 1)
       SELECT vec_id, code_0, code_1, code_2, code_3,
         code_0 * 1 + code_1 * 2 + code_2 * 3 + code_3 * 4 AS code_cksum
       FROM codes"""
  }

  /** [[pqOracle]]'s codebook/coding chain with p-prefixed CTE names so
    * it composes with [[ivfQuantizerCtes]] (whose sa/ssum/scent/...
    * names it would otherwise shadow). Ends at pfcent (seg codebooks)
    * and pcodes (per-vector segment codes). */
  private val pqCtesPrefixed: String = {
    import PortableSql.{centroidCosine => cc, lehmer3, q20}
    def segGrid(sumCte: String) =
      s"""SELECT g.sg AS seg, g.l AS list_id,
         list(COALESCE(CAST(ss.s AS DOUBLE) / ss.n / 1048576.0, 0.0) ORDER BY g.p) AS cv
         FROM (SELECT a.range AS sg, b.range AS l, c.range AS p
               FROM range(0, 4) a, range(0, 16) b, range(0, 16) c) g
         LEFT JOIN $sumCte ss ON ss.seg = g.sg AND ss.list_id = g.l AND ss.pos = g.p
         GROUP BY 1, 2"""
    s"""pseg AS (SELECT e.vec_id, t.range AS seg,
                 e.embedding[t.range * 16 + 1 : t.range * 16 + 16] AS sv
               FROM e CROSS JOIN range(0, 4) t),
       psamp AS (SELECT * FROM pseg WHERE (${lehmer3("vec_id")} % 100) < 50),
       psa AS (SELECT vec_id, seg, (${lehmer3("vec_id")} % 16) AS list_id, sv FROM psamp),
       pssum AS (SELECT seg, list_id, t.i AS pos, sum(${q20("sv[t.i + 1]")}) AS s,
                count(*) AS n
              FROM psa, LATERAL unnest(range(0, len(sv))) AS t(i)
              GROUP BY 1, 2, 3),
       pscent AS (${segGrid("pssum")}),
       ps1 AS (SELECT psa.vec_id, psa.seg, c.list_id, ${cc("psa.sv", "c.cv")} AS sim
              FROM psa JOIN pscent c ON c.seg = psa.seg),
       pb1 AS (SELECT vec_id, seg, max(sim) AS bs FROM ps1 GROUP BY 1, 2),
       pa1 AS (SELECT ps1.vec_id, ps1.seg, min(ps1.list_id) AS list_id
              FROM ps1 JOIN pb1 ON ps1.vec_id = pb1.vec_id AND ps1.seg = pb1.seg
                AND ps1.sim = pb1.bs
              GROUP BY 1, 2),
       pfsum AS (SELECT pa1.seg, pa1.list_id, t.i AS pos, sum(${q20("sm.sv[t.i + 1]")}) AS s,
                count(*) AS n
              FROM psamp sm JOIN pa1 ON sm.vec_id = pa1.vec_id AND sm.seg = pa1.seg,
                LATERAL unnest(range(0, len(sm.sv))) AS t(i)
              GROUP BY 1, 2, 3),
       pfcent AS (${segGrid("pfsum")}),
       ps2 AS (SELECT sg.vec_id, sg.seg, c.list_id, ${cc("sg.sv", "c.cv")} AS sim
              FROM pseg sg JOIN pfcent c ON c.seg = sg.seg),
       pb2 AS (SELECT vec_id, seg, max(sim) AS bs FROM ps2 GROUP BY 1, 2),
       pa2 AS (SELECT ps2.vec_id, ps2.seg, min(ps2.list_id) AS code
              FROM ps2 JOIN pb2 ON ps2.vec_id = pb2.vec_id AND ps2.seg = pb2.seg
                AND ps2.sim = pb2.bs
              GROUP BY 1, 2),
       pcodes AS (SELECT vec_id,
                 max(CASE WHEN seg = 0 THEN code END) AS code_0,
                 max(CASE WHEN seg = 1 THEN code END) AS code_1,
                 max(CASE WHEN seg = 2 THEN code END) AS code_2,
                 max(CASE WHEN seg = 3 THEN code END) AS code_3
               FROM pa2 GROUP BY 1)"""
  }

  /** IVF + PQ ADC replication: IVF probes + assignments from the
    * shared quantizer CTEs, PQ codes/codebooks from the p-prefixed
    * chain, and each candidate's score the same fixed-order sum of
    * four query-segment x codebook-entry fold dots. */
  private val ivfPqOracle: String = {
    import PortableSql.{centroidCosine => cc}
    def qseg(s: Int) = s"(qe[${s * 16 + 1} : ${s * 16 + 16}])"
    def term(s: Int) = foldDot(qseg(s), s"c$s.cv")
    s"""WITH $ivfQuantizerCtes,
       $pqCtesPrefixed,
       q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       probes AS (SELECT c.list_id FROM fcent c, q
                  ORDER BY ${cc("qe", "c.cv")} DESC, c.list_id LIMIT 4)
       SELECT pc.vec_id,
         ${term(0)} + ${term(1)} + ${term(2)} + ${term(3)} AS adc_score
       FROM pcodes pc
       JOIN a2 ON a2.vec_id = pc.vec_id
       JOIN pfcent c0 ON c0.seg = 0 AND c0.list_id = pc.code_0
       JOIN pfcent c1 ON c1.seg = 1 AND c1.list_id = pc.code_1
       JOIN pfcent c2 ON c2.seg = 2 AND c2.list_id = pc.code_2
       JOIN pfcent c3 ON c3.seg = 3 AND c3.list_id = pc.code_3
       CROSS JOIN q
       WHERE a2.list_id IN (SELECT list_id FROM probes)
       ORDER BY adc_score DESC, pc.vec_id LIMIT 20"""
  }

  val oracleSql: Map[String, String] = Map(
    "emb_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id, ${cosineSql("e.embedding", "qe")} AS sim
         FROM embeddings e, q
         ORDER BY sim DESC, e.vec_id LIMIT 20""",
    // MMR replication: one recursive-CTE row per greedy step carrying
    // the picked-id and score lists; each step's argmax is the same
    // (score DESC, vec_id ASC) rule, each score the same
    // (sim - max-pairwise-cosine) * 0.5 arithmetic
    "emb_mmr_rerank" ->
      s"""WITH RECURSIVE
         q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         cand AS (SELECT e.vec_id, e.embedding,
             ${cosineSql("e.embedding", "qe")} AS sim
           FROM embeddings e, q WHERE e.vec_id != 0
           ORDER BY sim DESC, e.vec_id LIMIT 32),
         sel AS (
           SELECT 1 AS step,
             [(SELECT vec_id FROM cand ORDER BY sim DESC, vec_id LIMIT 1)] AS ids,
             [(SELECT sim FROM cand ORDER BY sim DESC, vec_id LIMIT 1)] AS scores
           UNION ALL
           SELECT t.step + 1, list_append(t.ids, t.pick.v),
             list_append(t.scores, t.pick.sc)
           FROM (
             SELECT s.step, s.ids, s.scores,
               (SELECT {'v': c.vec_id,
                   'sc': (c.sim - (SELECT max(${cosineSql("c.embedding", "c2.embedding")})
                          FROM cand c2 WHERE list_contains(s.ids, c2.vec_id))) * 0.5}
                FROM cand c WHERE NOT list_contains(s.ids, c.vec_id)
                ORDER BY (c.sim - (SELECT max(${cosineSql("c.embedding", "c2.embedding")})
                          FROM cand c2 WHERE list_contains(s.ids, c2.vec_id))) DESC,
                  c.vec_id
                LIMIT 1) AS pick
             FROM sel s WHERE s.step < 8) t
         )
         SELECT r.rank AS rank, s.ids[r.rank] AS vec_id,
           s.scores[r.rank] AS mmr_score
         FROM sel s CROSS JOIN range(1, 9) r(rank)
         WHERE s.step = 8""",
    // full replication: portable-hash hyperplane signs make the bucket
    // computation engine-exact, so the multi-probe candidate set and
    // the exact rerank replay bit-for-bit
    "emb_ann_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         qb AS (SELECT ${PortableSql.rhpBucket("qe", 12)} AS qbucket FROM q)
         SELECT e.vec_id, ${cosineSql("e.embedding", "qe")} AS sim
         FROM embeddings e, q, qb
         WHERE bit_count(xor(CAST(${PortableSql.rhpBucket("e.embedding", 12)} AS BIGINT),
           CAST(qbucket AS BIGINT))) <= 4
         ORDER BY sim DESC, e.vec_id LIMIT 20""",
    "emb_neardup_label" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ${cosineSql("a.embedding", "b.embedding")} AS sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE sim >= 0.35""",
    // banded candidates = any of the 12 3-bit fingerprint bands agrees
    "emb_neardup_lsh" ->
      s"""WITH f AS (SELECT vec_id, embedding,
             ${PortableSql.rhpFingerprint("embedding", 36)} AS fp FROM embeddings)
         SELECT a.vec_id AS id_a, c.vec_id AS id_b
         FROM f a JOIN f c ON a.vec_id < c.vec_id
         WHERE len(list_filter(range(0, 12),
             b -> ((a.fp >> (b * 3)) & 7) = ((c.fp >> (b * 3)) & 7))) > 0
           AND ${cosineSql("a.embedding", "c.embedding")} >= 0.35""",
    "emb_ivf_topk" -> ivfOracle,
    "emb_ivf_indexed" -> ivfOracle,
    // recall replication: the IVF oracle joined against the exact
    // top-20, both as subqueries — hits/k in integer milli
    "emb_ivf_recall" ->
      s"""SELECT CAST(20 AS BIGINT) AS k, count(*)::BIGINT AS n_hits,
         CAST((count(*) * 1000) // 20 AS BIGINT) AS recall_milli
         FROM ($ivfOracle) a JOIN (
           WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
           SELECT e.vec_id, ${cosineSql("e.embedding", "qe")} AS sim
           FROM embeddings e, q
           ORDER BY sim DESC, e.vec_id LIMIT 20) x
         ON a.vec_id = x.vec_id""",
    "emb_semantic_dedup" -> semanticDedupOracle,
    "emb_pq_codes" -> pqOracle,
    "emb_ivfpq_topk" -> ivfPqOracle,
    "emb_kmeans_train" ->
      s"""WITH ${kmeansCtes(k = 8, dims = 64, rounds = 3)}
         SELECT vec_id, CAST(list_id AS INT) AS list_id FROM a4""",
    "emb_kmeans_assign" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 4),
         s AS (SELECT e.vec_id, c.cid, ${cosineSql("e.embedding", "c.ce")} AS sim
               FROM embeddings e CROSS JOIN c),
         b AS (SELECT vec_id, max(sim) AS best_sim FROM s GROUP BY 1)
         SELECT s.vec_id, CAST(min(s.cid) AS BIGINT) AS cluster, b.best_sim
         FROM s JOIN b ON s.vec_id = b.vec_id AND s.sim = b.best_sim
         GROUP BY s.vec_id, b.best_sim""",
    "emb_dim_stats" ->
      s"""SELECT t.i AS pos, count(*)::BIGINT AS n_vecs,
         sum(${PortableSql.q20("embedding[t.i + 1]")})::BIGINT AS sum_q20,
         sum(${PortableSql.q20("embedding[t.i + 1]")} * ${PortableSql.q20("embedding[t.i + 1]")})::BIGINT AS sumsq_q20,
         min(${PortableSql.q20("embedding[t.i + 1]")})::BIGINT AS min_q20,
         max(${PortableSql.q20("embedding[t.i + 1]")})::BIGINT AS max_q20
         FROM embeddings, LATERAL unnest(range(0, len(embedding))) AS t(i)
         GROUP BY 1""",
    // bit j = embedding[j+1] > 0; hi/lo are the unsigned 32-bit halves
    "emb_binary_quant" ->
      s"""SELECT vec_id, CAST(64 AS BIGINT) AS n_dims,
           CAST(sum(CASE WHEN j.j >= 32 AND embedding[(j.j + 1)::INT] > 0
                         THEN (1::BIGINT << (j.j - 32)::INT) ELSE 0 END) AS BIGINT) AS hi,
           CAST(sum(CASE WHEN j.j < 32 AND embedding[(j.j + 1)::INT] > 0
                         THEN (1::BIGINT << j.j::INT) ELSE 0 END) AS BIGINT) AS lo,
           CAST(sum(CASE WHEN embedding[(j.j + 1)::INT] > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_set
         FROM embeddings, LATERAL unnest(range(0, 64)) AS j(j)
         GROUP BY vec_id""",
    "emb_binary_topk" ->
      s"""WITH b AS (SELECT vec_id,
             CAST(sum(CASE WHEN j.j >= 32 AND embedding[(j.j + 1)::INT] > 0
                           THEN (1::BIGINT << (j.j - 32)::INT) ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN j.j < 32 AND embedding[(j.j + 1)::INT] > 0
                           THEN (1::BIGINT << j.j::INT) ELSE 0 END) AS BIGINT) AS lo
           FROM embeddings, LATERAL unnest(range(0, 64)) AS j(j)
           GROUP BY vec_id),
         q AS (SELECT hi AS qhi, lo AS qlo FROM b WHERE vec_id = 0)
         SELECT vec_id,
           (bit_count(xor(hi, qhi)) + bit_count(xor(lo, qlo)))::BIGINT AS hamming
         FROM b, q ORDER BY hamming, vec_id LIMIT 20""",
    "emb_binary_recall" ->
      s"""WITH b AS (SELECT vec_id,
             CAST(sum(CASE WHEN j.j >= 32 AND embedding[(j.j + 1)::INT] > 0
                           THEN (1::BIGINT << (j.j - 32)::INT) ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN j.j < 32 AND embedding[(j.j + 1)::INT] > 0
                           THEN (1::BIGINT << j.j::INT) ELSE 0 END) AS BIGINT) AS lo
           FROM embeddings, LATERAL unnest(range(0, 64)) AS j(j)
           GROUP BY vec_id),
         q AS (SELECT hi AS qhi, lo AS qlo FROM b WHERE vec_id = 0),
         ham AS (SELECT vec_id FROM b, q
           ORDER BY bit_count(xor(hi, qhi)) + bit_count(xor(lo, qlo)), vec_id
           LIMIT 20),
         qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         ex AS (SELECT e.vec_id FROM embeddings e, qe
           ORDER BY ${cosineSql("e.embedding", "qe")} DESC, e.vec_id LIMIT 20)
         SELECT CAST(20 AS BIGINT) AS k, count(*)::BIGINT AS n_overlap,
           (count(*) * 1000 // 20)::BIGINT AS recall_milli
         FROM ham JOIN ex USING (vec_id)""",
    "emb_binary_rerank" ->
      s"""WITH b AS (SELECT vec_id,
             CAST(sum(CASE WHEN j.j >= 32 AND embedding[(j.j + 1)::INT] > 0
                           THEN (1::BIGINT << (j.j - 32)::INT) ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN j.j < 32 AND embedding[(j.j + 1)::INT] > 0
                           THEN (1::BIGINT << j.j::INT) ELSE 0 END) AS BIGINT) AS lo
           FROM embeddings, LATERAL unnest(range(0, 64)) AS j(j)
           GROUP BY vec_id),
         q AS (SELECT hi AS qhi, lo AS qlo FROM b WHERE vec_id = 0),
         short AS (SELECT vec_id FROM b, q
           ORDER BY bit_count(xor(hi, qhi)) + bit_count(xor(lo, qlo)), vec_id
           LIMIT 100),
         qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id, ${cosineSql("e.embedding", "qe")} AS sim
         FROM embeddings e JOIN short USING (vec_id), qe
         ORDER BY sim DESC, e.vec_id LIMIT 20""",
    "emb_trunc_recall" ->
      s"""WITH qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         tr AS (SELECT e.vec_id FROM embeddings e, qe
           ORDER BY ${cosineSql("e.embedding[1:16]", "qe[1:16]")} DESC,
             e.vec_id LIMIT 20),
         ex AS (SELECT e.vec_id FROM embeddings e, qe
           ORDER BY ${cosineSql("e.embedding", "qe")} DESC, e.vec_id LIMIT 20)
         SELECT CAST(16 AS BIGINT) AS m, CAST(20 AS BIGINT) AS k,
           count(*)::BIGINT AS n_overlap,
           (count(*) * 1000 // 20)::BIGINT AS recall_milli
         FROM tr JOIN ex USING (vec_id)""",
    "emb_quantize_int8" ->
      s"""WITH q AS (
           SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
             COALESCE(list_max(list_transform(embedding, v -> abs(v::DOUBLE))), 0.0) / 127.0
               AS scale,
             list_transform(embedding, v -> CAST(greatest(-127.0, least(127.0,
               floor(v::DOUBLE / (CASE WHEN scale = 0.0 THEN 1.0 ELSE scale END) + 0.5)))
               AS BIGINT)) AS qc
           FROM embeddings)
         SELECT vec_id, n_dims, scale,
           CAST(COALESCE(list_sum(qc), 0) AS BIGINT) AS q_sum,
           CAST(COALESCE(list_sum(list_transform(range(1, len(qc) + 1), i -> qc[i] * i)), 0)
             AS BIGINT) AS q_cksum
         FROM q""",
    "emb_quantize_int4" ->
      s"""WITH q AS (
           SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
             COALESCE(list_max(list_transform(embedding, v -> abs(v::DOUBLE))), 0.0) / 7.0
               AS scale,
             list_transform(embedding, v -> CAST(greatest(-7.0, least(7.0,
               floor(v::DOUBLE / (CASE WHEN scale = 0.0 THEN 1.0 ELSE scale END) + 0.5)))
               AS BIGINT)) AS qc
           FROM embeddings)
         SELECT vec_id, n_dims, scale,
           CAST(COALESCE(list_sum(qc), 0) AS BIGINT) AS q_sum,
           CAST(COALESCE(list_sum(list_transform(range(1, len(qc) + 1), i -> qc[i] * i)), 0)
             AS BIGINT) AS q_cksum,
           CAST(COALESCE(list_sum(list_transform(range(0, (n_dims + 1) // 2), i ->
             ((qc[(2 * i + 1)::INT] + 8) +
              (CASE WHEN 2 * i + 2 <= n_dims THEN qc[(2 * i + 2)::INT] + 8
                    ELSE 8 END) * 16) * (i + 1))), 0) AS BIGINT) AS packed_cksum
         FROM q""",
    "emb_int4_topk" ->
      s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         qs AS (SELECT qe,
             COALESCE(list_max(list_transform(qe, v -> abs(v::DOUBLE))), 0.0) / 7.0 AS s
           FROM qv),
         qc AS (SELECT list_transform(qe, v -> CAST(greatest(-7.0, least(7.0,
             floor(v::DOUBLE / (CASE WHEN s = 0.0 THEN 1.0 ELSE s END) + 0.5)))
             AS BIGINT)) AS qq FROM qs),
         q2 AS (SELECT qq,
             CAST(COALESCE(list_sum(list_transform(qq, x -> x * x)), 0) AS BIGINT) AS qq2
           FROM qc),
         v AS (SELECT vec_id,
             COALESCE(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 0.0) / 7.0
               AS s,
             list_transform(embedding, x -> CAST(greatest(-7.0, least(7.0,
               floor(x::DOUBLE / (CASE WHEN s = 0.0 THEN 1.0 ELSE s END) + 0.5)))
               AS BIGINT)) AS vc
           FROM embeddings),
         d AS (SELECT vec_id,
             CAST(COALESCE(list_sum(list_transform(range(1, len(vc) + 1),
               i -> vc[i] * qq[i])), 0) AS BIGINT) AS dotq,
             CAST(COALESCE(list_sum(list_transform(vc, x -> x * x)), 0) AS BIGINT) AS v2,
             qq2
           FROM v CROSS JOIN q2)
         SELECT vec_id, dotq AS dot_q,
           CASE WHEN v2 = 0 OR qq2 = 0 THEN -2.0
                ELSE CAST(dotq AS DOUBLE) / (sqrt(CAST(v2 AS DOUBLE)) * sqrt(CAST(qq2 AS DOUBLE)))
           END AS sim_q
         FROM d ORDER BY sim_q DESC, vec_id LIMIT 20""",
    "emb_int4_recall" ->
      s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         qs AS (SELECT qe,
             COALESCE(list_max(list_transform(qe, v -> abs(v::DOUBLE))), 0.0) / 7.0 AS s
           FROM qv),
         qc AS (SELECT list_transform(qe, v -> CAST(greatest(-7.0, least(7.0,
             floor(v::DOUBLE / (CASE WHEN s = 0.0 THEN 1.0 ELSE s END) + 0.5)))
             AS BIGINT)) AS qq FROM qs),
         q2 AS (SELECT qq,
             CAST(COALESCE(list_sum(list_transform(qq, x -> x * x)), 0) AS BIGINT) AS qq2
           FROM qc),
         v AS (SELECT vec_id,
             COALESCE(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 0.0) / 7.0
               AS s,
             list_transform(embedding, x -> CAST(greatest(-7.0, least(7.0,
               floor(x::DOUBLE / (CASE WHEN s = 0.0 THEN 1.0 ELSE s END) + 0.5)))
               AS BIGINT)) AS vc
           FROM embeddings),
         d AS (SELECT vec_id,
             CAST(COALESCE(list_sum(list_transform(range(1, len(vc) + 1),
               i -> vc[i] * qq[i])), 0) AS BIGINT) AS dotq,
             CAST(COALESCE(list_sum(list_transform(vc, x -> x * x)), 0) AS BIGINT) AS v2,
             qq2
           FROM v CROSS JOIN q2),
         i4 AS (SELECT vec_id FROM d
           ORDER BY CASE WHEN v2 = 0 OR qq2 = 0 THEN -2.0
               ELSE CAST(dotq AS DOUBLE) / (sqrt(CAST(v2 AS DOUBLE)) * sqrt(CAST(qq2 AS DOUBLE)))
             END DESC, vec_id LIMIT 20),
         qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         ex AS (SELECT e.vec_id FROM embeddings e, qe
           ORDER BY ${cosineSql("e.embedding", "qe")} DESC, e.vec_id LIMIT 20)
         SELECT CAST(20 AS BIGINT) AS k, count(*)::BIGINT AS n_overlap,
           (count(*) * 1000 // 20)::BIGINT AS recall_milli
         FROM i4 JOIN ex USING (vec_id)""",
    "emb_int8_recall" ->
      s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         qs AS (SELECT qe,
             COALESCE(list_max(list_transform(qe, v -> abs(v::DOUBLE))), 0.0) / 127.0 AS s
           FROM qv),
         qc AS (SELECT list_transform(qe, v -> CAST(greatest(-127.0, least(127.0,
             floor(v::DOUBLE / (CASE WHEN s = 0.0 THEN 1.0 ELSE s END) + 0.5)))
             AS BIGINT)) AS qq FROM qs),
         q2 AS (SELECT qq,
             CAST(COALESCE(list_sum(list_transform(qq, x -> x * x)), 0) AS BIGINT) AS qq2
           FROM qc),
         v AS (SELECT vec_id,
             COALESCE(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 0.0) / 127.0
               AS s,
             list_transform(embedding, x -> CAST(greatest(-127.0, least(127.0,
               floor(x::DOUBLE / (CASE WHEN s = 0.0 THEN 1.0 ELSE s END) + 0.5)))
               AS BIGINT)) AS vc
           FROM embeddings),
         d AS (SELECT vec_id,
             CAST(COALESCE(list_sum(list_transform(range(1, len(vc) + 1),
               i -> vc[i] * qq[i])), 0) AS BIGINT) AS dotq,
             CAST(COALESCE(list_sum(list_transform(vc, x -> x * x)), 0) AS BIGINT) AS v2,
             qq2
           FROM v CROSS JOIN q2),
         i8 AS (SELECT vec_id FROM d
           ORDER BY CASE WHEN v2 = 0 OR qq2 = 0 THEN -2.0
               ELSE CAST(dotq AS DOUBLE) / (sqrt(CAST(v2 AS DOUBLE)) * sqrt(CAST(qq2 AS DOUBLE)))
             END DESC, vec_id LIMIT 20),
         qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         ex AS (SELECT e.vec_id FROM embeddings e, qe
           ORDER BY ${cosineSql("e.embedding", "qe")} DESC, e.vec_id LIMIT 20)
         SELECT CAST(20 AS BIGINT) AS k, count(*)::BIGINT AS n_overlap,
           (count(*) * 1000 // 20)::BIGINT AS recall_milli
         FROM i8 JOIN ex USING (vec_id)""",
    "emb_filtered_topk" ->
      s"""WITH qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id, e.label,
           ${cosineSql("e.embedding", "qe")} AS sim
         FROM embeddings e, qe WHERE e.label = 3
         ORDER BY sim DESC, e.vec_id LIMIT 10""",
    "emb_int8_topk" ->
      s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         qs AS (SELECT qe,
             COALESCE(list_max(list_transform(qe, v -> abs(v::DOUBLE))), 0.0) / 127.0 AS s
           FROM qv),
         qc AS (SELECT list_transform(qe, v -> CAST(greatest(-127.0, least(127.0,
             floor(v::DOUBLE / (CASE WHEN s = 0.0 THEN 1.0 ELSE s END) + 0.5)))
             AS BIGINT)) AS qq FROM qs),
         q2 AS (SELECT qq,
             CAST(COALESCE(list_sum(list_transform(qq, x -> x * x)), 0) AS BIGINT) AS qq2
           FROM qc),
         v AS (SELECT vec_id,
             COALESCE(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 0.0) / 127.0
               AS s,
             list_transform(embedding, x -> CAST(greatest(-127.0, least(127.0,
               floor(x::DOUBLE / (CASE WHEN s = 0.0 THEN 1.0 ELSE s END) + 0.5)))
               AS BIGINT)) AS vc
           FROM embeddings),
         d AS (SELECT vec_id,
             CAST(COALESCE(list_sum(list_transform(range(1, len(vc) + 1),
               i -> vc[i] * qq[i])), 0) AS BIGINT) AS dotq,
             CAST(COALESCE(list_sum(list_transform(vc, x -> x * x)), 0) AS BIGINT) AS v2,
             qq2
           FROM v CROSS JOIN q2)
         SELECT vec_id, dotq AS dot_q,
           CASE WHEN v2 = 0 OR qq2 = 0 THEN -2.0
                ELSE CAST(dotq AS DOUBLE) / (sqrt(CAST(v2 AS DOUBLE)) * sqrt(CAST(qq2 AS DOUBLE)))
           END AS sim_q
         FROM d ORDER BY sim_q DESC, vec_id LIMIT 20""",
    // positives: exact label-blocked argmax; negatives: argmax within
    // the anchor's quantizer cell (a2 from the shared IVF CTEs)
    "emb_hard_negatives" ->
      s"""WITH $ivfQuantizerCtes,
         v AS (SELECT e.vec_id, emb.label, e.embedding, a2.list_id
               FROM e JOIN a2 USING (vec_id)
               JOIN embeddings emb ON emb.vec_id = e.vec_id),
         pos AS (
           SELECT x.vec_id, y.vec_id AS pos_id,
             ${cosineSql("x.embedding", "y.embedding")} AS pos_sim
           FROM v x JOIN v y
             ON x.label = y.label AND x.vec_id <> y.vec_id
           QUALIFY row_number() OVER (PARTITION BY x.vec_id
             ORDER BY pos_sim DESC, y.vec_id ASC) = 1),
         neg AS (
           SELECT x.vec_id, y.vec_id AS neg_id,
             ${cosineSql("x.embedding", "y.embedding")} AS neg_sim
           FROM v x JOIN v y
             ON x.list_id = y.list_id AND x.label <> y.label
           QUALIFY row_number() OVER (PARTITION BY x.vec_id
             ORDER BY neg_sim DESC, y.vec_id ASC) = 1)
         SELECT vec_id, pos_id, pos_sim, neg_id, neg_sim
         FROM pos JOIN neg USING (vec_id)""",
    "emb_decontaminate" ->
      s"""WITH n AS (SELECT vec_id, embedding,
             ${graft.operators.TextStats.idBucketSql("vec_id", 100)} AS b FROM embeddings),
         e AS (SELECT vec_id AS eid, embedding AS ev FROM n WHERE b < 5),
         t AS (SELECT vec_id, embedding FROM n WHERE b >= 5)
         SELECT t.vec_id, count(*) AS n_hits,
           max(${cosineSql("t.embedding", "e.ev")}) AS max_sim
         FROM t JOIN e ON ${cosineSql("t.embedding", "e.ev")} >= 0.3
         GROUP BY 1""")
}
