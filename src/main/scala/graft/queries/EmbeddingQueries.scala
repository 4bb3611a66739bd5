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
  * cuts are hash-safe without rounding. ANN/LSH paths are approximate
  * by construction → rows-only checks (no oracle).
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
    "emb_ann_topk" -> ((s, d) =>
      Similarity.annTopK(emb(s, d), "vec_id", "embedding", queryVec(s, d), 20,
        nBits = 12, maxHamming = 4)),
    "emb_neardup_label" -> ((s, d) =>
      Similarity.cosineNearDupPairs(emb(s, d), "vec_id", "embedding", "label", 0.35)
        .orderBy("id_a", "id_b")),
    "emb_neardup_lsh" -> ((s, d) =>
      Similarity.cosineNearDupPairsLsh(emb(s, d), "vec_id", "embedding", 0.35, nBits = 8)),
    "emb_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(emb(s, d), "vec_id", "embedding", queryVec(s, d), 20,
        nLists = 16, nProbe = 4)),
    // nearest-centroid assignment with k = 4 fixed centroids (the
    // embeddings of vec_id 0..3 — deterministic, collectable by both
    // engines); the k-means inner loop as an oracle-checkable operator
    "emb_kmeans_assign" -> ((s, d) => {
      val cents = emb(s, d).filter("vec_id < 4").orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      Similarity.centroidAssign(emb(s, d), "vec_id", "embedding", cents)
    }),
    "emb_quantize_int8" -> ((s, d) =>
      Similarity.quantizeInt8(emb(s, d), "vec_id", "embedding")),
    // product quantization: data-derived codebooks (double k-means on a
    // deterministic sample) can't be replayed in SQL -> rows-only; the
    // spec pins determinism, code range, and reconstruction quality
    "emb_pq_codes" -> ((s, d) =>
      Similarity.pqCodes(emb(s, d), "vec_id", "embedding",
        m = 4, kSub = 16, samplePct = 50)),
    // stored IVF index: probes read only the probed list_id partitions
    // (partition pruning at the source). Same quantizer recipe as
    // emb_ivf_topk -> identical result, asserted in the spec; approx by
    // construction -> rows-only here
    "emb_ivf_indexed" -> ((s, d) => {
      val src = java.nio.file.Paths.get(s"$d/embeddings.parquet")
      val fp = if (java.nio.file.Files.exists(src))
        s"${java.nio.file.Files.size(src)}_${java.nio.file.Files.getLastModifiedTime(src).toMillis}"
      else "na"
      val dir = s"/tmp/graft_ivf_${d.replaceAll("[^A-Za-z0-9.]", "_")}_$fp"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/centroids/_SUCCESS")))
        Similarity.writeIvfIndex(emb(s, d), "vec_id", "embedding", dir, nLists = 16)
      Similarity.ivfTopKIndexed(s, dir, "vec_id", "embedding",
        queryVec(s, d), 20, nProbe = 4)
    }))

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

  private def cosineSql(a: String, b: String): String =
    s"${foldDot(a, b)} / (${foldNorm(a)} * ${foldNorm(b)})"

  val oracleSql: Map[String, String] = Map(
    "emb_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id, ${cosineSql("e.embedding", "qe")} AS sim
         FROM embeddings e, q
         ORDER BY sim DESC, e.vec_id LIMIT 20""",
    // emb_ann_topk: approximate -> rows-only
    "emb_neardup_label" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ${cosineSql("a.embedding", "b.embedding")} AS sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE sim >= 0.35""",
    // emb_neardup_lsh: approximate recall -> rows-only
    // emb_pq_codes: data-derived double codebooks -> rows-only
    // emb_ivf_indexed: approximate (same probes as emb_ivf_topk) -> rows-only
    "emb_kmeans_assign" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 4),
         s AS (SELECT e.vec_id, c.cid, ${cosineSql("e.embedding", "c.ce")} AS sim
               FROM embeddings e CROSS JOIN c),
         b AS (SELECT vec_id, max(sim) AS best_sim FROM s GROUP BY 1)
         SELECT s.vec_id, CAST(min(s.cid) AS BIGINT) AS cluster, b.best_sim
         FROM s JOIN b ON s.vec_id = b.vec_id AND s.sim = b.best_sim
         GROUP BY s.vec_id, b.best_sim""",
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
         FROM q""")
}
