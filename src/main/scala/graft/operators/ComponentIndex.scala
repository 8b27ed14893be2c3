package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED form of the near-dup COMPONENT MAP — the corpus family's
  * shared artifact made a first-class index, the same economics as
  * [[IvfIndex]] for ANN serving: derive once, serve every consumer from
  * the stored table.
  *
  * Motivation (round-9 verdict item 3, measured by the x1/x100 probe
  * rows in SCALE.md): the corpus-family composites — leakage-safe split,
  * curation report, quality-aware survivor selection — each re-derive
  * the banded candidate set + exact verification-free clustering inside
  * their own plan, and CONSTRUCTION (the eager iterative clustering)
  * dominates their cost at every probed scale while the composite's own
  * tail is a cheap projection or aggregate. The component map over a
  * given corpus snapshot is one immutable relation; at 100 TB a pipeline
  * derives it once per snapshot and every downstream consumer — split
  * assignment, reports, survivor selection, decontamination joins —
  * reads the stored table. The live re-deriving composites remain
  * declared (honest per-query cost, the q_sim_ivf A/B device); the
  * `_indexed` twins are the serving shape.
  *
  * Index layout: `<stem>_components` = (doc_id, component_id), CLUSTER
  * MEMBERS ONLY (singletons are absent, exactly like the live
  * [[ConnectedComponents]] output — consumers coalesce to doc_id),
  * BUCKETED BY doc_id so every downstream join on the 8-byte id reads
  * the index side with no shuffle. Maintenance: components are a
  * TRANSITIVE property, so appending a batch can merge existing
  * clusters — unlike [[IvfIndex.append]] there is no sound
  * index-side-constant append; the maintenance path is [[rebuild]] per
  * corpus snapshot (the incremental-dedup economics for the batch
  * itself are proved by q_corpus_dedup_incremental's signature store).
  */
object ComponentIndex {

  /** Sanitized dir plus a short hash of the RAW path: the sanitizer maps
    * every non-alphanumeric to '_', so distinct fixture paths differing
    * only in punctuation would collide onto one table and ensure() would
    * serve the wrong snapshot's component map (review finding) — the
    * hash disambiguates them. */
  private def stem(dir: String): String = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    "comp_index_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + h
  }

  private def table(dir: String): String = stem(dir) + "_components"

  /** The corpus family's LIVE derivation — THE single definition of
    * "the component map" (banded candidate set -> min-label components
    * -> (doc_id, component_id), cluster members only): the persisted
    * build below and every live composite in [[graft.DedupQueries]]
    * call this one function, so the banding knobs and column contract
    * cannot drift between the A/B'd twins. */
  def bandedComponentMap(docs: DataFrame): DataFrame =
    ConnectedComponents.components(
        MinHashLSH.candidatePairs(docs, "doc_id", "text", "lang",
          numBands = MinHashLSH.BandedBands,
          rowsPerBand = MinHashLSH.BandedRows),
        "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component_id"))

  /** Build the component table for the fixture unless already present;
    * returns the table name. One eager clustering per (JVM session,
    * fixture); later sessions with the same warehouse re-attach via
    * the catalog. */
  def ensure(spark: SparkSession, dir: String): String = {
    val t = table(dir)
    if (!spark.catalog.tableExists(t)) {
      IvfIndex.dropOrphanLocation(spark, t)
      CacheScope.withOperatorCaches {
        bandedComponentMap(graft.sources.Tables.documents(spark, dir))
          .write.mode("overwrite")
          .bucketBy(8, "doc_id").sortBy("doc_id")
          .saveAsTable(t)
      }
    }
    t
  }

  /** The stored (doc_id, component_id) map — cluster members only. */
  def componentsFor(spark: SparkSession, dir: String): DataFrame =
    spark.table(ensure(spark, dir))

  /** Drop and re-derive — the maintenance path for a new corpus
    * snapshot (see scaladoc: no sound in-place append exists for a
    * transitive property). */
  def rebuild(spark: SparkSession, dir: String): String = {
    val t = table(dir)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    ensure(spark, dir)
  }

  /** Drop the fixture's index table without rebuilding — retirement of
    * a snapshot (and test hygiene: a temp-fixture build would otherwise
    * orphan its uniquely-named warehouse directory forever). */
  def drop(spark: SparkSession, dir: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${table(dir)}")
}
