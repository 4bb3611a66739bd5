package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r10 stretch experiment: does run-length folding over
  * 64-bit word HASHES (cheap long comparisons in array_sort) beat the
  * shipped string-sort fold in TextStats.repetitionScore? Times both
  * kernels over the sf0.1 documents fixture, noop-materialized,
  * two-pass min — ship only on a win (pair-once lesson, PLANS.md).
  *
  * Usage: runMain graft.tools.ProfileRepetition [sfDir]
  */
object ProfileRepetition {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.selectExpr("count(text)").collect() // warm the cacheable scan

    def norm(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

    def current(): DataFrame =
      graft.operators.TextStats.repetitionScore(docs, "doc_id", "text")

    def hashed(): DataFrame = {
      val words = split(norm(col("text")), " ")
      val hashes = transform(words, w => xxhash64(w))
      val topCount = aggregate(
        array_sort(hashes),
        struct(lit(0L).as("prev"), lit(0).as("run"), lit(0).as("best")),
        (acc, w) => {
          val run = when(w === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1))
          struct(w.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      docs.select(col("doc_id"),
        topCount.cast("long").as("top_token_count"),
        size(words).cast("long").as("n_tokens"),
        (topCount.cast("double") / size(words)).as("repetition_ratio"))
    }

    def time(label: String, mk: () => DataFrame): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"$label%-12s ${best}%6.3fs  (passes: ${runs.map(r => f"$r%.3f").mkString(", ")})")
      best
    }

    val a = time("string-sort", current)
    val b = time("hash-sort", hashed)
    println(f"hash/string ratio = ${b / a}%.2f")
    // sanity: identical counts barring 2^-64 collisions
    val diff = current().alias("a")
      .join(hashed().alias("b"), Seq("doc_id"))
      .filter(col("a.top_token_count") =!= col("b.top_token_count")).count()
    println(s"count mismatches: $diff")
    spark.stop()
  }
}
