package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The materialized MinHash signature store, in its durable form: the
  * BANDED signatures written once as a table bucketed by the band `key`.
  * The incremental-dedup join every new batch runs (batch band keys vs
  * the stored corpus) must then read the store's buckets in place — the
  * corpus side is never re-shuffled, which at 100 TB is the difference
  * between shuffling the whole signature store per batch and shuffling
  * only the (small) incoming batch. */
class SignatureStoreSpec extends SparkSpec {

  test("banded store bucketed by key joins a new batch without re-shuffling the store") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val docs = Tables.documents(s, sfDir)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)

      // bucketed by the FULL join key set: Spark only accepts an existing
      // partitioning for a co-partitioned join when it covers all cluster
      // keys (spark.sql.requireAllClusterKeysForCoPartition, default on)
      MinHashLSH.banded(MinHashLSH.signatures(
          corpus, "doc_id", "text", "lang", n = 3, numBands = 6, rowsPerBand = 2))
        .write.mode("overwrite")
        .bucketBy(4, "band", "key", "block").sortBy("band", "key", "block")
        .saveAsTable("sig_store")

      val store = s.table("sig_store")
      val batchBanded = MinHashLSH.banded(MinHashLSH.signatures(
        batch, "doc_id", "text", "lang", n = 3, numBands = 6, rowsPerBand = 2))
      val incremental = store.as("a")
        .join(batchBanded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.block") === col("b.block"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()

      // plan shape: the bucketed scan feeds the join with NO Exchange on
      // the store side; the batch side shuffles (its signature groupBy
      // keys by (doc_id, block), so the band-key join needs one more),
      // the store never does — count the Exchanges BELOW the join and
      // assert none sits on the bucketed-scan branch
      val plan = incremental.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      val joinKeyExchanges = "Exchange hashpartitioning\\(band#".r.findAllIn(plan).size
      assert(joinKeyExchanges == 1,
        s"expected exactly one join-key shuffle (batch side only), got $joinKeyExchanges:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"store scan is not bucket-aware:\n$plan")

      // and the incremental candidates are exactly the cross-set subset of
      // the full-corpus candidate pairs
      val all = MinHashLSH.candidatePairs(docs, "doc_id", "text", "lang")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val inc = incremental.collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
                   math.max(r.getLong(0), r.getLong(1))))
        .filter { case (a, b) => a != b }.toSet
      val expected = all.filter { case (a, b) => (a % 10 == 0) ^ (b % 10 == 0) }
      assert(inc == expected,
        s"incremental candidates diverge: missing=${expected -- inc} extra=${inc -- expected}")
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS sig_store")
    }
  }
}
