package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition ("data mixing") operators for training-data
  * pipelines: measure what a corpus is made of, then deterministically
  * rebalance it. Neither exists in the reference (it has no document
  * surface); both are first-class operators of the extended engine
  * (SURVEY.md §2.7b).
  */
object CorpusMix {

  /** Composition by (source, language): doc count, token count, and the
    * cell's share of all corpus tokens in parts-per-million. One
    * shuffle reduces the corpus to the tiny (sources × languages) group
    * frame; the grand total is a windowed sum over that reduced frame —
    * the single-partition exchange it implies moves only the group
    * rows, never the corpus. `floor` (not `round`) for the ppm: no
    * half-way ties, so every engine agrees bit-for-bit. */
  def sourceMix(df: DataFrame, srcCol: String, langCol: String,
      textCol: String): DataFrame = {
    val toks = size(split(Dedup.normalizeText(col(textCol)), " ")).cast("long")
    df.select(col(srcCol), col(langCol), toks.as("__t"))
      .groupBy(col(srcCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("sum_tokens"))
      .withColumn("token_ppm",
        floor(col("sum_tokens").cast("double") * 1000000.0 /
          sum(col("sum_tokens")).over(Window.partitionBy())).cast("long"))
  }

  /** Deterministic per-source downsampling to hit a target mix: keep a
    * document iff its stable id-hash bucket ([[TextStats.idBucket]])
    * falls below the source's keep-percentage. No RNG — the same
    * document survives at any parallelism and in every rerun, which is
    * what makes incremental corpus rebuilds diffable; and the predicate
    * is a pure row-local filter, so it pushes to the scan and never
    * shuffles. */
  def resampleBySource(df: DataFrame, idCol: String, srcCol: String,
      keepPct: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require((keepPct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      s"keep percentages must be in [0, 100]: $keepPct / $defaultPct")
    val pct = keepPct.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(srcCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(TextStats.idBucket(col(idCol), 100L) < pct)
  }
}
