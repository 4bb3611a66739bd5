package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Morton

class ExplodeBlockSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("fused generator ≡ composed zip+explode+decode") {
    val tailLen = 4
    val blocks = Seq(
      (3L, Seq(0L, 5L, 15L), Seq(1.0, 2.0, 3.0)),
      (9L, Seq(7L), Seq(4.5)))
      .toDF("sfc_head", "sfc_tail", "z")

    val fused = blocks.select(generators.explode_block(
        col("sfc_head"), col("sfc_tail"), col("z"), tailLen))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val key = shiftleft(col("sfc_head"), tailLen).bitwiseOR(col("p.sfc_tail"))
    val composed = blocks
      .select(col("sfc_head"), explode(arrays_zip(col("sfc_tail"), col("z"))).as("p"))
      .select(sfc.morton_x(key), sfc.morton_y(key), col("p.z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(fused == composed)
    // spot-check one decode by hand
    val k = (3L << tailLen) | 5L
    assert(fused.contains((Morton.decodeX(k), Morton.decodeY(k), 2.0)))
  }

  test("empty arrays produce no rows") {
    val blocks = Seq((1L, Seq.empty[Long], Seq.empty[Double]))
      .toDF("sfc_head", "sfc_tail", "z")
    assert(blocks.select(generators.explode_block(
      col("sfc_head"), col("sfc_tail"), col("z"), 4)).count() == 0)
  }
}
