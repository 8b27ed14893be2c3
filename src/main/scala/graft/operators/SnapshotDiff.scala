package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Corpus SNAPSHOT DIFF — the ingest-ops primitive behind every "what
  * changed between yesterday's crawl and today's" question: classify
  * each doc_id across two snapshots as `added` (only in current),
  * `removed` (only in previous) or `changed` (present in both with
  * different content). Unchanged documents are dropped — the delta is
  * the deliverable, and at 100 TB with a ~1% daily churn the output is
  * ~1% of the corpus, not a copy of it.
  *
  * Shape: ONE full-outer join on the id, both sides reduced to (id,
  * content hash) BEFORE the shuffle — 16-byte rows cross the exchange
  * regardless of document length (the q_dedup_exact_hash economics),
  * and both sides hash-partition on the same key, so the join is a
  * single co-partitioned exchange pair with no skew surface (ids are
  * unique per side). Content equality via the 60-bit portable hash:
  * a collision would misclass a changed doc as unchanged —
  * astronomically unlikely, and the same trade every content-hash diff
  * (rsync, git) makes.
  */
object SnapshotDiff {

  def diff(prev: DataFrame, cur: DataFrame, idCol: String = "doc_id",
           contentCol: String = "text"): DataFrame = {
    // presence classifies on ID, via marker columns that survive the
    // full-outer join — NOT on hash nullity: hash60(NULL text) is NULL,
    // and a doc present with NULL content would otherwise misread as
    // absent (the oracle's id-based FULL OUTER semantics)
    val p = prev.select(col(idCol).as("doc_id"),
      PortableHash.hash60(col(contentCol)).as("h_prev"),
      lit(true).as("in_prev"))
    val c = cur.select(col(idCol).as("doc_id"),
      PortableHash.hash60(col(contentCol)).as("h_cur"),
      lit(true).as("in_cur"))
    p.join(c, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("in_prev").isNull, lit("added"))
          .when(col("in_cur").isNull, lit("removed"))
          .when(not(col("h_prev") <=> col("h_cur")), lit("changed")))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
  }
}
