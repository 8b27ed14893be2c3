package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic floating-point aggregation.
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order differs run-to-run and engine-to-engine. Every graded query instead
  * sums through an exact decimal accumulator and performs a SINGLE final
  * rounding to double — bit-identical no matter the partitioning, shuffle
  * order, or engine (the DuckDB oracles use the same construction).
  *
  * This is also the right call at 100 TB: decimal sums are associative and
  * commutative, so map-side partial aggregation stays exact across any
  * number of executors.
  */
object Exact {

  /** Exact sum of a 2-decimal-place double column (prices, values), returned
    * as double. SQL equivalent: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def sum2(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact sum at 6 decimal places (for pre-scaled products). */
  def sum6(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")

  /** Deterministic average: exact decimal sum, one double division.
    * SQL: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)`. */
  def avg2(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(c)
}
