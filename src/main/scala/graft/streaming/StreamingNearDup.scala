package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MinHashLSH

/** Watermark-bounded NEAR-duplicate dedup for a document stream — the
  * streaming member of the MinHash family (the batch members produce
  * candidate pairs / clusters; a stream needs a keep/drop decision per
  * arriving document with bounded state).
  *
  * Key choice: the FULL MinHash signature (all numBands*rowsPerBand
  * minima), not a single LSH band. Batch LSH can afford band-level
  * candidates because exact Jaccard verification follows; in a streaming
  * drop decision there is no verification step, and a one-band collision
  * (probability J^rowsPerBand) would silently discard non-duplicates.
  * A full-signature collision has probability ~J^k (k=12: only
  * near-identical documents collide), making the drop decision
  * precision-safe — the streaming analog of "verify before you drop".
  *
  * State/scale: dropDuplicatesWithinWatermark keys state by the signature
  * (12 longs, constant size per retained document) and evicts every entry
  * once the watermark passes its horizon — state is bounded by the stream
  * rate times the horizon, never by corpus size. The signature itself is
  * computed narrowly per row ([[MinHashLSH.rowSignature]]): no shuffle,
  * no stateful aggregate, legal in append mode.
  */
object StreamingNearDup {

  /** Drop every document whose MinHash signature was already seen within
    * the watermark horizon. Pass-through columns survive unchanged.
    * Documents too short to shingle dedup on exact content identity
    * (see [[MinHashLSH.rowSignature]]), never against each other. */
  def dedupBySignature(df: DataFrame, textCol: String, tsCol: String,
                       horizon: String, n: Int = 3): DataFrame = {
    // fail fast instead of corrupting: withColumn would silently OVERWRITE
    // a same-named input column and the final drop would remove it (same
    // guard as AsofJoin's _asof_* names)
    require(!df.columns.contains("_minhash_sig"),
      "StreamingNearDup: input column _minhash_sig collides with the " +
        "reserved working name; rename it before deduplicating")
    df.withColumn("_minhash_sig", MinHashLSH.rowSignature(col(textCol), n))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("_minhash_sig")
      .drop("_minhash_sig")
  }
}
