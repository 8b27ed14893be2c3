package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's exact query shape: count per key per 1h tumbling
    * event-time window (`/root/reference/.../Main.scala:24-26`). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_window_count_hourly")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ WindowQueries.queries ++
      StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ RelationalQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++ WindowQueries.oracles ++
      StreamQueries.oracles
}
