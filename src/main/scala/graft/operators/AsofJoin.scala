package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: attach to each probe row the payload of the
  * build row with the greatest build time <= probe time within the same key
  * — "the last known value as of this moment", the canonical enrichment
  * join for event streams (Spark has no built-in as-of join; composing
  * existing operators is preference (a) of the custom-operator ladder).
  *
  * Formulation: tag and union the two sides, then one window pass per key
  * ordered by (time, side, build-order) taking the last non-null build
  * payload up to the current row. Build rows sort BEFORE probe rows at
  * equal time, so "at or before" is inclusive; among equal-time build rows
  * the highest `ordCol` wins — fully deterministic, which is what makes the
  * query oracle-checkable (a range-join formulation with an arbitrary
  * survivor would not be).
  *
  * Scale: ONE hash shuffle on the key + a per-partition sort; running state
  * is a single value per key. The naive alternative — an inequality
  * (range) join probe.ts >= build.ts then a max-per-probe aggregation —
  * materializes O(|probe| x avg builds per key) intermediate rows; this
  * materializes |probe| + |build| rows, full stop. Skewed keys shard like
  * any other window (salt or AQE); no broadcast needed on either side.
  */
object AsofJoin {

  /** For each `probe` row: the `valueCol` of the `build` row with the
    * greatest `timeCol` <= the probe's `timeCol` and equal `keyCol`
    * (ties on time broken toward the greatest `ordCol`), as `outCol`;
    * null where no build row precedes the probe. Probe columns pass
    * through unchanged. */
  def lastValueAsOf(probe: DataFrame, build: DataFrame,
                    keyCol: String, timeCol: String, ordCol: String,
                    valueCol: String, outCol: String): DataFrame =
    lastValuesAsOf(probe, build, keyCol, timeCol, ordCol,
      Map(valueCol -> outCol))

  /** Multi-payload form: every `(buildCol -> outCol)` in `payload` is
    * attached from the same as-of build row (one union, one sort, one
    * Window operator — the cost does not grow with the payload width
    * beyond the bytes carried).
    *
    * The payload travels as ONE struct: `last(ignoreNulls)` must skip
    * probe rows (null payload by construction) but must NOT skip a build
    * row just because one of its payload FIELDS is null — per-column
    * last() calls would tear the result across different build rows in
    * that case. The struct is non-null for every build row regardless of
    * its fields, so the whole payload always comes from the single
    * correct as-of row. */
  def lastValuesAsOf(probe: DataFrame, build: DataFrame,
                     keyCol: String, timeCol: String, ordCol: String,
                     payload: Map[String, String]): DataFrame = {
    // fail fast instead of corrupting: withColumn would silently OVERWRITE
    // a same-named input column and the final drop would remove it
    val reserved = (probe.columns ++ build.columns).filter(_.startsWith("_asof_")).distinct
    require(reserved.isEmpty,
      s"AsofJoin: input columns [${reserved.mkString(", ")}] collide with the " +
        "reserved _asof_* working names; rename them before joining")
    val valCols = payload.keys.toSeq
    val b = build.select(
      col(keyCol), col(timeCol),
      col(ordCol).cast("long").as("_asof_ord"),
      lit(0).as("_asof_side"),
      struct(valCols.map(col): _*).as("_asof_val"))
    val p = probe.withColumn("_asof_side", lit(1))
    val u = p.unionByName(b, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("_asof_side").asc, col("_asof_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = u.withColumn("_asof_last",
      last(col("_asof_val"), ignoreNulls = true).over(w))
    valCols.foldLeft(attached) { (df, c) =>
        df.withColumn(payload(c), col("_asof_last").getField(c))
      }
      .filter(col("_asof_side") === 1)
      .drop("_asof_side", "_asof_ord", "_asof_val", "_asof_last")
  }
}
