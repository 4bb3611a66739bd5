package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the benchmark fixtures: writes
  * `<dst>` = `<src>` replicated `reps` times with every key domain
  * shifted per replica (offset = max key + 1, computed from the data),
  * so referential integrity (lineitem->orders/part/supplier,
  * orders->customer, events->users) holds at the larger scale and no
  * row collides with another replica's.
  *
  * Content columns are perturbed where exact copies would distort the
  * workload's character rather than scale it: document text gets a
  * per-replica prefix token (replicas are near-duplicates — the
  * realistic web-corpus regime — not exact ones), embeddings get a
  * small per-(replica, component) additive offset (cosine
  * neighborhoods survive, bitwise duplicates don't), event timestamps
  * shift by `replica` seconds (per-user series keep their shape).
  * Dimension tables nation/region are invariant by design, like TPC-H.
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <dstDir> <reps>
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GenScale <srcDir> <dstDir> <reps>")
    val (src, dst, reps) = (args(0), args(1), args(2).toInt)
    require(reps >= 1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def off(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L
    val okOff = off(t("orders"), "o_orderkey")
    val ckOff = off(t("customer"), "c_custkey")
    val pkOff = off(t("part"), "p_partkey")
    val skOff = off(t("supplier"), "s_suppkey")
    val docOff = off(t("documents"), "doc_id")
    val vecOff = off(t("embeddings"), "vec_id")
    val evOff = off(t("events"), "event_id")
    val uOff = off(t("events"), "user_id")

    /** Cross the table with replica ids 0..reps-1 and apply per-replica
      * shifts; `__r` is in scope for the transform expressions. */
    def scale(name: String)(cols: (String, String)*): Unit = {
      val base = t(name)
      val reshaped = base
        .crossJoin(spark.range(reps).toDF("__r"))
        .select(base.columns.map { c =>
          cols.toMap.get(c) match {
            case Some(e) => expr(e).cast(base.schema(c).dataType).as(c)
            case None => col(c)
          }
        }: _*)
      reshaped.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      System.err.println(s"[genscale] $name x$reps -> $dst")
    }

    scale("lineitem")(
      "l_orderkey" -> s"l_orderkey + __r * ${okOff}L",
      "l_partkey" -> s"l_partkey + __r * ${pkOff}L",
      "l_suppkey" -> s"l_suppkey + __r * ${skOff}L")
    scale("orders")(
      "o_orderkey" -> s"o_orderkey + __r * ${okOff}L",
      "o_custkey" -> s"o_custkey + __r * ${ckOff}L")
    scale("customer")("c_custkey" -> s"c_custkey + __r * ${ckOff}L")
    scale("supplier")(
      "s_suppkey" -> s"s_suppkey + __r * ${skOff}L",
      "s_name" -> "concat(s_name, '_', __r)")
    scale("part")("p_partkey" -> s"p_partkey + __r * ${pkOff}L")
    scale("documents")(
      "doc_id" -> s"doc_id + __r * ${docOff}L",
      "text" -> "concat('r', __r, ' ', text)",
      "n_chars" -> "length(concat('r', __r, ' ', text))")
    scale("embeddings")(
      "vec_id" -> s"vec_id + __r * ${vecOff}L",
      "embedding" ->
        "transform(embedding, (v, i) -> v + cast(((__r * 7 + i) % 11 - 5) as float) * 0.002f)")
    // ts encoding varies across fixture generations: nanos-as-long
    // (shift in raw ns) vs timestamp[us]/[ns] proper (interval add).
    val tsShift = t("events").schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "ts + __r * 1000000000L"
      case _ => "timestampadd(SECOND, __r, ts)"
    }
    scale("events")(
      "event_id" -> s"event_id + __r * ${evOff}L",
      "user_id" -> s"user_id + __r * ${uOff}L",
      "ts" -> tsShift)
    Seq("nation", "region").foreach { n =>
      t(n).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      System.err.println(s"[genscale] $n copied")
    }
    spark.stop()
  }
}
