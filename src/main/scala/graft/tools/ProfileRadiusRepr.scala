package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A/B the collided-identity representative aggregation in
  * radiusOutlierRemoval: per-axis max(x),max(y),max(z) (r10 form,
  * chimera on collision) vs single struct-max (r11 form, real triple)
  * vs first-in-group. Times ONLY the identity aggregation stage over
  * the sf0.1 point multiset, noop-materialized, two-pass min.
  *
  * Usage: runMain graft.tools.ProfileRadiusRepr [sfDir]
  */
object ProfileRadiusRepr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val pts = li.select(
      ((col("l_orderkey") * 17 + col("l_linenumber") * 131) % 8192).cast("double").as("x"),
      ((col("l_partkey") * 29 + col("l_suppkey") * 197) % 8192).cast("double").as("y"),
      (col("l_quantity") % 64).cast("double").as("z"))
    pts.write.mode("overwrite").format("noop").save() // warm scan

    val id = xxhash64(col("x") + lit(0.0), col("y") + lit(0.0), col("z") + lit(0.0))

    def perAxis(): DataFrame = pts.withColumn("__id", id)
      .groupBy(col("__id"))
      .agg(max(col("x")).as("x"), max(col("y")).as("y"),
        max(col("z")).as("z"), count(lit(1)).as("__m"))

    def structMax(): DataFrame = pts.withColumn("__id", id)
      .groupBy(col("__id"))
      .agg(max(struct(col("x"), col("y"), col("z"))).as("__p"),
        count(lit(1)).as("__m"))
      .select(col("__id"), col("__p.x").as("x"), col("__p.y").as("y"),
        col("__p.z").as("z"), col("__m"))

    def time(label: String, mk: () => DataFrame): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-10s ${runs.min}%6.3fs  (${runs.map(r => f"$r%.3f").mkString(", ")})")
      runs.min
    }
    val a = time("per-axis", perAxis)
    val b = time("struct", structMax)
    println(f"struct/per-axis = ${b / a}%.2f")
    structMax().explain("formatted")
    spark.stop()
  }
}
