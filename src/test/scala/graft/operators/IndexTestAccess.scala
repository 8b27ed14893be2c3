package graft.operators

import org.apache.spark.sql.SparkSession

/** Test-only bridge for specs outside `graft.operators` that need the
  * families' package-private ledger tables as observables (e.g. the
  * streaming auto-compaction specs asserting the post-fold stamp
  * count). Logic-free by design. */
object IndexTestAccess {
  def invLedgerCount(s: SparkSession, dir: String): Long =
    s.table(InvertedIndex.metaTable(dir)).count()
  def invLedgerBatchIds(s: SparkSession, dir: String): Seq[Long] =
    s.table(InvertedIndex.metaTable(dir)).select("batch_id")
      .collect().map(_.getLong(0)).toSeq.sorted
  def invTombstoneBatchIds(s: SparkSession, dir: String): Seq[Long] =
    s.table(InvertedIndex.tombTable(dir)).select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
  def ivfLedgerCount(s: SparkSession, dir: String): Long =
    s.table(IvfIndex.metaTable(dir)).count()
}
