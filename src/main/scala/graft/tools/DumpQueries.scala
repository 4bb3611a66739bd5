package graft.tools

/** Print the live query registry as one JSON line:
  * `{"<name>": true|false}` per registered query, value = has a DuckDB
  * oracle in SparkEntry.oracleSql. No Spark session — the lambdas stay
  * unevaluated. Consumed by tools/gen_coverage.py, which cross-checks
  * SURVEY's hand-written index against this machine truth.
  */
object DumpQueries {
  def main(args: Array[String]): Unit = {
    val oracles = graft.SparkEntry.oracleSql.keySet
    val line = graft.SparkEntry.queries.keys.toSeq.sorted
      .map(n => s""""$n":${oracles.contains(n)}""")
      .mkString("{", ",", "}")
    println(line)
  }
}
