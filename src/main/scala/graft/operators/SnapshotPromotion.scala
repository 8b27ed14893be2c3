package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ONE-CALL promotion of a crawl snapshot that changes BOTH corpus
  * tables — the shape a real pipeline promotes in: a new crawl lands
  * documents AND their embeddings together, and every persisted index
  * family must advance to serve it. The caller lands the new
  * `documents.parquet` and `embeddings.parquet` into `dir`, pins the
  * previous snapshots, and [[promote]] runs
  *
  *   - the DOCUMENT-side composition ([[SnapshotMaintenance.maintain]]:
  *     inverted index + positions + BM25 stats + component map), and
  *   - the EMBEDDINGS-side composition ([[AnnMaintenance.maintain]]:
  *     IVF cells + PQ codes + shared tombstones)
  *
  * under ONE durable batch id, returning one combined status
  * (`"docs=<action> ann=<action>"`). Each side diffs its own table —
  * the two churn sets are independent (a rewritten document does not
  * imply a re-embedded vector and vice versa), so the promotion is two
  * diffs, never a joined one.
  *
  * CRASH CONTRACT: the sides commit through their own ledgers, in this
  * fixed order (documents first). A crash anywhere leaves a prefix of
  * the per-table maintenance sequences, each of which is individually
  * crash-idempotent; the replay with the same batch id no-ops every
  * committed side and completes every torn one — the same convergence
  * the family-torn case has INSIDE the document side (inverted vs
  * component ledgers). One batch id across all ledgers means one
  * replay key per promotion: the foreachBatch loop retries the whole
  * promotion, never half of one. */
object SnapshotPromotion {

  /** Promote the snapshot now resident in `dir` against the pinned
    * previous snapshots. Returns `"docs=<action> ann=<action>"` where
    * each action is its side's maintain() status ("no_change" /
    * "appended" / "edited" / "rebuilt", "+compacted" when the
    * post-commit housekeeping folded that side's families). */
  def promote(spark: SparkSession, dir: String, prevDocs: DataFrame,
              prevEmbeddings: DataFrame, batchId: Long): String = {
    val docs = SnapshotMaintenance.maintain(spark, dir, prevDocs, batchId)
    val ann = AnnMaintenance.maintain(spark, dir, prevEmbeddings, batchId)
    s"docs=$docs ann=$ann"
  }
}
