package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot fingerprinting shared by the persisted-index family
  * ([[ComponentIndex]], [[BpeVocab]]): a cheap (row count, id sum)
  * fingerprint of the source fixture, stamped into a 1-row companion
  * meta table at build time, so a REGENERATED fixture at the same path
  * — which `tableExists` cannot see — is detectable by an explicit
  * staleness check on the pipeline's own cadence (per snapshot
  * promotion, not per query construction).
  *
  * Collision-proof enough for the failure it guards (different rows
  * under the same table name), one narrow aggregate over the 8-byte id
  * column to compute. */
object SnapshotMeta {

  /** THE table-naming rule of the persisted-index family: sanitized dir
    * (every non-alphanumeric → '_') plus a short hash of the RAW path —
    * the sanitizer alone would collide distinct paths differing only in
    * punctuation, and ensure() would serve the wrong snapshot's table
    * (the round-10 review finding). One definition so a future change to
    * the collision rule lands everywhere at once. ([[IvfIndex]] predates
    * the hash suffix and keeps its unsuffixed names — renaming would
    * orphan existing warehouse tables.) */
  def indexStem(prefix: String, dir: String): String = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    prefix + dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + h
  }

  /** (row count, id sum) of the fixture relation's `idCol`. */
  def fingerprint(df: DataFrame, idCol: String): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(col(idCol))).head()
    (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
  }

  /** Write the fingerprint into `metaTable` (overwriting any previous
    * stamp). */
  def stamp(spark: SparkSession, metaTable: String, fp: (Long, Long)): Unit = {
    import spark.implicits._
    IvfIndex.dropOrphanLocation(spark, metaTable)
    Seq(fp).toDF("n_rows", "id_sum").write.mode("overwrite").saveAsTable(metaTable)
  }

  /** True when no stamp exists (an unverifiable index is treated as
    * stale) or the stamp differs from `current`. */
  def stale(spark: SparkSession, metaTable: String,
            current: (Long, Long)): Boolean =
    if (!spark.catalog.tableExists(metaTable)) true
    else {
      val r = spark.table(metaTable).head()
      (r.getLong(0), r.getLong(1)) != current
    }
}
