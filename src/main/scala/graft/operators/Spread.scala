package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan spreading for CPU-heavy map stages.
  *
  * The sf testdata tables are SINGLE row-group parquet files, so a bare
  * scan yields one working partition no matter how Spark splits byte
  * ranges — and every expensive pre-exchange map stage (shingling, span
  * hashing, tokenization, codec work) ran on one core of a 32-core host
  * (guide §2.5 "input skew: one huge unsplittable file — repartition
  * immediately after the read"). At production scale the same tables
  * arrive as thousands of files/row groups and the scan is already wider
  * than the cluster, so the repartition must be CONDITIONAL: it fires
  * only when the planned scan has materially fewer partitions than the
  * cluster has cores, and is a no-op otherwise. Partitioning is by a
  * deterministic hash of the caller's id column — stable under task
  * retries (guide §2.5 warns against rand-derived keys) and unique per
  * row, so it spreads evenly.
  */
object Spread {

  /** `df` hash-partitioned on `key` across `defaultParallelism` when the
    * planned scan is narrower than half the cluster; `df` unchanged
    * otherwise. The planned-width probe (`rdd.getNumPartitions`) is
    * plan-only — no job runs. */
  def byKey(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target, col(key))
    else df
  }

  /** [[byKey]] without a key column: round-robin spread. Spark's
    * sort-before-repartition (on by default, SPARK-23207) keeps the
    * row-to-partition assignment deterministic under task retries; use
    * only above order-insensitive consumers (exact-decimal aggregates,
    * per-row maps) all the same. */
  def any(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target)
    else df
  }
}
