package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys: two-stage salted aggregation.
  *
  * A single hot key (one url with 30% of all traffic, one boilerplate text)
  * turns a groupBy into a one-reducer straggler at cluster scale. Salting
  * splits each key into `buckets` sub-keys for the first (heavy) partial
  * aggregation so the hot key's work spreads over `buckets` reducers, then a
  * second (tiny: #keys x buckets rows) aggregation merges the partials.
  * Works for any algebraic aggregate (count, sum, min, max, decimal sums);
  * results are identical to the unsalted groupBy by associativity.
  *
  * The salt must be uniform but need not be deterministic across runs —
  * here it's the row hash, which also keeps the operator pure (no rand()) so
  * results stay reproducible for the correctness harness.
  *
  * (AQE's skewedJoin handles skewed JOINS at runtime; aggregation skew
  * still benefits from explicit salting.)
  */
object Skew {

  /** Uniform salt: round-robin on the per-row id. Row-content hashing
    * would send IDENTICAL rows (exactly the boilerplate-duplicate hot case)
    * to one bucket; the row id spreads them strictly evenly, and
    * counts/sums are invariant to WHICH bucket a row lands in, so the
    * nondeterministic id never affects results. */
  private def salt(df: DataFrame, buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** Exact count per key via salted two-stage aggregation. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], buckets: Int,
                  countName: String = "cnt"): DataFrame = {
    df.select(col("*"), salt(df, buckets).as("_salt"))
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as(countName))
  }

  /** Exact decimal-stable sum per key via salted two-stage aggregation. */
  def saltedSum2(df: DataFrame, keyCols: Seq[String], valueCol: String,
                 buckets: Int, sumName: String = "sum_value"): DataFrame = {
    df.select(col("*"), salt(df, buckets).as("_salt"))
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).cast("double").as(sumName))
  }
}
