package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted INVERTED INDEX over the corpus — term → (doc_id, tf) postings
  * as a first-class table, the [[IvfIndex]]/[[ComponentIndex]] economics
  * applied to corpus SEARCH: the inspection/debugging workload every
  * training-data pipeline runs ("which documents contain this eval term /
  * contaminated phrase / tokenizer artifact, ranked") without paying a
  * full-corpus scan + explode per question.
  *
  * Index layout: `<stem>_postings` = (term, doc_id, tf), BUCKETED BY
  * `term` — an equality or IN filter on the bucket column prunes the scan
  * to the matching buckets (plan-visible as `SelectedBucketsCount`,
  * pinned in InvertedIndexSpec), so a k-term lookup reads ~k/16 of the
  * index instead of all of it, with zero shuffle on the index side. At
  * 100 TB the postings relation is a few percent of corpus bytes (terms
  * repeat; tf collapses occurrences to one row), and a search touches
  * only the probed buckets — the difference between an interactive
  * debugging query and a batch job.
  *
  * MAINTENANCE: unlike components (a transitive property), postings are
  * per-(term, doc) local — a crawl append whose doc_ids are new cannot
  * change any existing row, so a bucketed APPEND of the batch's postings
  * is exact ([[append]]; spec pins append == rebuild). Per-term document
  * frequency is deliberately NOT materialized: it changes with every
  * append, and deriving it from the pruned postings at query time costs
  * one tiny aggregate over exactly the rows the search already reads.
  *
  * Scoring: tf × the integer-exact idf proxy floor(N·2^20/df) — the
  * q_text_tfidf currency, bit-portable across engines, so the declared
  * search query is exact-oracle-checkable. Ties break on doc_id.
  */
object InvertedIndex {

  private def table(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_postings"
  private def metaTable(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_meta"

  val Buckets = 16

  /** THE single definition of the postings relation — the persisted build
    * and any live replay derive from this one function. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).cast("long").as("tf"))

  /** Build the postings table for the fixture if absent; returns the
    * table name. Stamps the snapshot fingerprint (the SnapshotMeta
    * staleness contract shared with ComponentIndex/BpeVocab). */
  def ensure(spark: SparkSession, dir: String): String = {
    val t = table(dir)
    if (!spark.catalog.tableExists(t)) {
      IvfIndex.dropOrphanLocation(spark, t)
      val docs = graft.sources.Tables.documents(spark, dir)
      postings(docs)
        .write.mode("overwrite")
        .bucketBy(Buckets, "term").sortBy("term", "doc_id")
        .saveAsTable(t)
      SnapshotMeta.stamp(spark, metaTable(dir),
        SnapshotMeta.fingerprint(docs, "doc_id"))
    }
    t
  }

  /** Incremental maintenance for a crawl append (new doc_ids only): the
    * batch's postings rows are disjoint from every existing row — tf is
    * (term, doc)-local, not transitive — so a bucketed append IS the
    * updated index. The restamp is ADDITIVE: SnapshotMeta's (count, sum)
    * fingerprint over disjoint doc_id sets is a sum, so the new stamp is
    * old stamp + fingerprint(batch) — O(batch), never a scan of the
    * stored index (the family's ingest-cost contract). refreshTable
    * guards the cross-session relation cache, the sibling-index rule. */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val t = ensure(spark, dir)
    val old = spark.table(metaTable(dir)).head()
    postings(batch)
      .write.mode("append")
      .bucketBy(Buckets, "term").sortBy("term", "doc_id")
      .saveAsTable(t)
    spark.catalog.refreshTable(t)
    val bfp = SnapshotMeta.fingerprint(
      batch.select(col("doc_id")).distinct(), "doc_id")
    SnapshotMeta.stamp(spark, metaTable(dir),
      (old.getLong(0) + bfp._1, old.getLong(1) + bfp._2))
  }

  /** Staleness check vs the CURRENT fixture content (explicit, on the
    * pipeline's snapshot-promotion cadence — the ComponentIndex rule).
    * NOTE: after [[append]] the stamp covers the stored corpus (base ∪
    * batch), so a fixture regenerated to equal exactly that union reads
    * fresh — the intended append contract. */
  def snapshotStale(spark: SparkSession, dir: String): Boolean =
    SnapshotMeta.stale(spark, metaTable(dir),
      SnapshotMeta.fingerprint(
        graft.sources.Tables.documents(spark, dir), "doc_id"))

  def drop(spark: SparkSession, dir: String): Unit =
    Seq(table(dir), metaTable(dir)).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      IvfIndex.dropOrphanLocation(spark, t)
    }

  /** Top-k documents per query term by the exact tf-idf proxy, served
    * from the pruned postings scan: the IN filter on the bucket column
    * prunes to the matching buckets; per-term df is the count of exactly
    * those rows; ranking windows over tiny per-term groups. The 1-row N
    * aggregate cross-joins as a scalar (the whitelisted pattern). */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
             k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    rankedFromPostings(
      spark.table(ensure(spark, dir)).filter(col("term").isin(terms: _*)),
      graft.sources.Tables.documents(spark, dir).agg(count(lit(1)).as("n")),
      k)
  }

  /** THE scoring/ranking tail — one definition shared by [[search]] and
    * any index-free replay (the ScaleProbe A/B times the identical
    * computation on both sides by construction): per-term df from the
    * given postings rows, score = tf × floor(N·2^20/df), top-k per term
    * with doc_id ties. `nDocs` is a 1-row (n BIGINT) scalar frame. */
  def rankedFromPostings(post: DataFrame, nDocs: DataFrame, k: Int): DataFrame = {
    val dfq = post.groupBy("term").agg(count(lit(1)).as("df_"))
    val w = Window.partitionBy("term")
      .orderBy(col("score").desc, col("doc_id").asc)
    post.join(dfq, "term").crossJoin(nDocs)
      .withColumn("score",
        col("tf") * floor((col("n").cast("double") * 1048576.0) / col("df_"))
          .cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("term", "doc_id", "tf", "score", "rank")
  }
}
