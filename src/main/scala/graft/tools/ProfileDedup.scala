package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage timing of the minhash pipeline (scratch diagnostics). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($n)")
    }

    time("scan")(docs.count())
    val sh = Dedup.withShingles(docs, "doc_id", "text", 3, word = true)
    time("shingles")(sh.select(sum(size(col("shingles")))).head().getLong(0))
    val hashed = sh.select(col("doc_id"),
      array_distinct(expr("transform(shingles, s -> xxhash64(s))")).as("shingles"))
    time("shingles+hash")(hashed.select(sum(size(col("shingles")))).head().getLong(0))
    val sigs = Dedup.minHashSignatures(hashed, 64)
    time("signatures")(sigs.select(sum(size(col("sig")))).head().getLong(0))
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", 64, 16)
    time("pairs")(pairs.count())
    time("verified")(Dedup.verifyJaccard(pairs, hashed, "doc_id", 0.8).count())
    time("end-to-end")(Dedup.minhashNearDups(docs, "doc_id", "text",
      3, true, 64, 16, 0.8).count())
    spark.stop()
  }
}
