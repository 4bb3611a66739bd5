package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{LangProfiles, TextStats}

/** Regenerates the [[LangProfiles.profiles]] literals from
  * [[LangProfiles.derivationSample]] using the engine's own
  * distributed derivation ([[TextStats.langProfilesTrain]], k = 60) —
  * the committed, reproducible form of the "offline differential
  * frequency" step: run this main and paste its output over the
  * `profiles` block whenever the derivation corpus changes. Keeping
  * the derivation in-repo means the model, its training data, and its
  * evaluation fixture (`doc_lang_id_eval`) are all auditable together.
  */
object DeriveLangProfiles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = LangProfiles.langs.zip(LangProfiles.derivationSample)
      .flatMap { case (lang, sents) => sents.map(s => (lang, s)) }
      .zipWithIndex.map { case ((lang, s), i) => (i.toLong, lang, s) }
    val df = rows.toDF("doc_id", "lang", "text")
    val prof = TextStats.langProfilesTrain(df, "doc_id", "text", "lang", k = 60)
      .select("lang", "gram", "prof_rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (l, gs) => l -> gs.sortBy(_._3).map(_._2).toSeq }
    def lit(g: String) = "\"" + g.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    } + "\""
    LangProfiles.langs.foreach { l =>
      val gs = prof.getOrElse(l, Seq.empty)
      println(s"    /* $l */ ${gs.map(lit).mkString("Seq(", ", ", "),")}")
    }
    spark.stop()
  }
}
