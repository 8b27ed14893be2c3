package graft

/** Prints the query-surface counters from the code itself — the single
  * source of truth behind COVERAGE.md's numbers (hand-maintained counters
  * drifted in round 2: "55 tests" vs 59 in the reports). Run via
  * tools/update_counters.sh, which also counts executed tests from the
  * ScalaTest report XMLs and rewrites the COVERAGE.md counters line. */
object Counters {
  def main(args: Array[String]): Unit = {
    println(s"declared_queries=${SparkEntry.queries.size}")
    println(s"oracle_sql=${SparkEntry.oracleSql.size}")
  }
}
