package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin, on by default) is the first line of
  * defense; explicit salting remains the tool when one side must be
  * replicated deterministically — e.g. a dimension joined on a key
  * where a handful of values carry most of the fact rows.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a deterministic
    * salt derived from existing row values (no RNG — plans stay
    * reproducible); the small side is exploded `saltFactor` times so
    * every (key, salt) bucket finds its match. One shuffle, keys spread
    * over `saltFactor` more partitions.
    *
    * `saltSource` should be a column spreading rows of equal join key
    * (an id, a hash of the payload...). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltSource: Column, saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
