package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Over-gate fallback pricing (VERDICT r20 item 4): every sf0.1 bench
  * fixture falls below the driver gates the r20/r21 fast paths added
  * (graph 2^20 distinct edges, classifier 2^16 types, suffix array
  * 2^21 positions), so the distributed loops — the paths that carry
  * the 100 TB contract — had zero measured cost. This tool runs each
  * gated operator at the given scale dirs TWICE: once with the default
  * gate (whichever side it selects) and once with the gate forced off
  * (`*Limit = 0` — the spec-pinned distributed loop), printing both
  * times plus the gate inputs, so the crossover placement is a
  * measured fact instead of a guess.
  *
  * Usage: sbt 'runMain graft.tools.ProfileOverGate <sfDir> [sfDir...]'
  */
object ProfileOverGate {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[overgate] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      out
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    for (dir <- args) {
      println(s"[overgate] === $dir ===")
      val docs = graft.Tables.table(spark, dir, "documents")
      noop(docs) // warm

      // graph family: default gate = 2^20 distinct edges
      val pairs = graft.queries.EventQueries.coactivityPairs(spark, dir)
        .localCheckpoint(true)
      val nE = pairs.select(col("user_a").cast("long"),
        col("user_b").cast("long")).distinct().count()
      println(s"[overgate] graph distinct edges = $nE (gate 2^20 = 1048576)")
      for (i <- 1 to 2) {
        time(s"connectedComponents default #$i") {
          noop(graft.operators.Graph.connectedComponents(
            pairs, "user_a", "user_b"))
        }
        time(s"connectedComponents distributed #$i") {
          noop(graft.operators.Graph.connectedComponents(
            pairs, "user_a", "user_b", driverEdgeLimit = 0))
        }
        time(s"pageRank default #$i") {
          noop(graft.operators.Graph.pageRankFixedPoint(
            pairs, "user_a", "user_b", iterations = 5))
        }
        time(s"pageRank distributed #$i") {
          noop(graft.operators.Graph.pageRankFixedPoint(
            pairs, "user_a", "user_b", iterations = 5, driverEdgeLimit = 0))
        }
        time(s"labelPropagation default #$i") {
          noop(graft.operators.Graph.labelPropagation(
            pairs, "user_a", "user_b", iterations = 3))
        }
        time(s"labelPropagation distributed #$i") {
          noop(graft.operators.Graph.labelPropagation(
            pairs, "user_a", "user_b", iterations = 3, driverEdgeLimit = 0))
        }
      }

      // classifier: default gate = 2^16 types / 2^21 entries; the
      // label mirrors the doc_classifier_train fixture rule
      val ws = split(graft.operators.TextStats.norm(col("text")), " ")
      val labeled = docs.withColumn("label",
        (size(filter(ws, w => w === "the")) >
          size(filter(ws, w => w === "spark"))).cast("int"))
      for (i <- 1 to 2) {
        time(s"classifierTrain default #$i") {
          graft.operators.TextStats.classifierTrain(
            labeled, "doc_id", "text", "label")
        }
        time(s"classifierTrain distributed #$i") {
          graft.operators.TextStats.classifierTrain(
            labeled, "doc_id", "text", "label", driverTypeLimit = 0)
        }
      }

      // suffix array: default gate = 2^21 positions
      val nPos = docs.agg(sum(coalesce(size(split(
          graft.operators.Dedup.normalizeText(col("text")), " ")),
        lit(0)).cast("long"))).head().getLong(0)
      println(s"[overgate] SA positions = $nPos (gate 2^21 = 2097152)")
      for (i <- 1 to 2) {
        time(s"repeatedSpans default #$i") {
          noop(graft.operators.SuffixArray.repeatedSpans(
            docs, "doc_id", "text", 8))
        }
        time(s"repeatedSpans distributed #$i") {
          noop(graft.operators.SuffixArray.repeatedSpans(
            docs, "doc_id", "text", 8, driverPosLimit = 0))
        }
        // the forced-driver side prices the crossover from the other
        // direction when the default already selects distributed
        if (nPos > (1L << 21) && nPos <= (1L << 23))
          time(s"repeatedSpans forced-driver #$i") {
            noop(graft.operators.SuffixArray.repeatedSpans(
              docs, "doc_id", "text", 8, driverPosLimit = 1L << 23))
          }
      }
    }
    spark.stop()
  }
}
