package graft.tools

import org.apache.spark.sql.SparkSession

/** Dissect doc_edit_neardup cost at sf0.1: fixture scan, guard job,
  * unguarded join, full operator. Two-pass min like Bench. */
object ProfileEditJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fixture = graft.queries.DocQueries.queries // warm class init
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-24s ${ts.min}%6.2f s  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, EditJoin, TextStats}
    val docs = graft.Tables.table(spark, sfDir, "documents")
    val base = docs.select(col("doc_id").as("id"),
      substring(Dedup.normalizeText(col("text")), 1, 24).as("s"))
    val b = TextStats.idBucket(col("id"), 4L)
    val mut = base.select((col("id") + 1000000L).as("id"),
      when(b === 0, col("s"))
        .when(b === 1, concat(lit("q"), col("s")))
        .when(b === 2, expr("substring(s, 1, greatest(length(s) - 1, 0))"))
        .otherwise(concat(substring(col("s"), 1, 2), lit("z"),
          expr("substring(s, 4)"))).as("s"))
    val fix = base.unionByName(mut)

    time("fixture noop") {
      fix.write.mode("overwrite").format("noop").save()
    }
    println("n strings = " + fix.count())
    println("result pairs = " +
      EditJoin.editSelfJoin(fix, "id", "s", 2, 0).count())
    time("unguarded join") {
      EditJoin.editSelfJoin(fix, "id", "s", 2, maxAvgCandidatesPerRow = 0)
        .write.mode("overwrite").format("noop").save()
    }
    try {
      time("full (guard on)") {
        EditJoin.editSelfJoin(fix, "id", "s", 2)
          .write.mode("overwrite").format("noop").save()
      }
    } catch {
      case e: IllegalArgumentException =>
        println("guard tripped: " + e.getMessage.take(200))
    }
    spark.stop()
  }
}
