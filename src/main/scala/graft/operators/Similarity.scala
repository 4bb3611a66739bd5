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

  /** Cosine similarity of two float-array columns, in double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

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

  /** Random-hyperplane (sign-of-dot-product) signature: `nBits`
    * deterministic pseudo-random +-1 hyperplanes derived from
    * xxhash64(bit, component) — reproducible across runs and engines,
    * no stored model. Returns the input plus a `bucket` int column. */
  def withLshBucket(emb: DataFrame, vecCol: String, nBits: Int): DataFrame = {
    require(nBits <= 30, "bucket must fit an int")
    emb.withColumn("bucket", expr(
      s"""aggregate(sequence(0, ${nBits - 1}), 0,
         (acc, bit) -> acc | CASE WHEN
            aggregate(sequence(0, size($vecCol) - 1), 0D,
              (s, j) -> s + $vecCol[j] * (CASE WHEN (xxhash64(bit * 4096 + j) & 1) = 1 THEN 1.0 ELSE -1.0 END))
            > 0D THEN shiftleft(1, bit) ELSE 0 END)"""))
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

  /** Exact near-duplicate pairs (cosine >= threshold) within blocking
    * groups (e.g. a cluster/label/shard key): an equi-join on the block
    * key keeps the pair space bounded per group — the all-pairs form of
    * embedding dedup that survives scale when groups are bounded. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(blockCol).as("__blk"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = emb.select(col(blockCol).as("__blk"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, "__blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** LSH-blocked near-duplicate pairs for when no natural blocking key
    * exists: bucket signatures, pair within bucket, exact-verify cosine.
    * Approximate-recall (tunable via nBits), precision 1.0. */
  def cosineNearDupPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8): DataFrame = {
    val bucketed = withLshBucket(emb, vecCol, nBits)
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b").distinct()
  }
}
