package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage profiler for the WARC curation pipelines (VERDICT r16 item 2):
  * where do doc_warc_{html_,}pipeline{_e2e,_funnel} spend their walls —
  * the crawl parse, the curation chain, the BPE training rounds, or
  * the encode/cap tail? Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.ProfileWarc'
  */
object ProfileWarc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[warcprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // NOTE post-rework semantics: curateStages now materializes every
    // stage frame eagerly, so "curateStages_staged" carries the WHOLE
    // chain's execution and the later labels measure only their own
    // incremental work off the cuts. Stage cuts are freed per rep
    // (the freeStages contract) so later reps measure a clean cache.
    for (_ <- 1 to reps) {
      val crawl = graft.queries.DocQueries.warcCrawlForProfile(spark, sfDir)
      t("crawl_parse")(crawl.write.mode("overwrite").format("noop").save())
      val stages = t("curateStages_staged")(
        graft.operators.CorpusMix.curateStages(crawl, "doc_id", "url",
          "status", "text", minWords = 40, jaccard = 0.8))
      val survivors = stages.last._2
      val merges = t("bpe_train_8rounds")(
        graft.operators.TextStats.bpeTrainMerges(survivors, "__t", 8))
      val table = graft.operators.TextStats.bpeTable(merges)
      t("bpe_encode_and_count")(
        graft.operators.TextStats.bpeEncodeApply(survivors, "doc_id", "__t", table)
          .write.mode("overwrite").format("noop").save())
      t("funnel_each_stage_agg") {
        stages.foreach { case (_, sdf) =>
          sdf.agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1))).collect()
        }
      }
      graft.operators.CorpusMix.freeStages(stages)
      println("[warcprof] ---")
    }
    spark.stop()
  }
}
