package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * frequency for a TERM LOOKUP is derived from the pruned postings at
  * query time (one tiny aggregate over exactly the rows the search
  * already reads); the corpus-wide df RANKING that prefix/fuzzy
  * expansion needs is materialized in the `_vocab` companion
  * ([[vocab]]/[[vocabFor]]) — per-batch additive rows, the `_stats`
  * lifecycle — because deriving it live would scan the whole postings
  * store per query (the round-14 weak plan). The `_deletes` companion
  * ([[deletes]]/[[deletesFor]]) extends the same lifecycle to the
  * SymSpell deletion-variant vocabulary, so batched fuzzy queries read
  * a pruned persisted store instead of re-exploding the vocabulary
  * per call (the round-15 deferred item).
  *
  * Scoring: tf × the integer-exact idf proxy floor(N·2^20/df) — the
  * q_text_tfidf currency, bit-portable across engines, so the declared
  * search query is exact-oracle-checkable. Ties break on doc_id.
  *
  * BM25 ([[searchBm25]]): postings DENORMALIZE the per-doc whitespace
  * token count `dl` (the classic doc-length-in-postings forward-index
  * trick — one long per row buys length normalization without a join
  * back to the corpus), and a 1-row `_stats` companion table holds
  * (n_docs, total_tokens) so N and avgdl are index-build-time constants,
  * never a query-time corpus scan. Both stay exact under [[append]]:
  * dl is doc-local and the stats update is additive. The score is the
  * RATIONAL BM25 — k1 = 6/5, b = 3/4 as exact fractions and the idf
  * ratio (N − df + ½)/(df + ½) WITHOUT the ln — in ×2^20 fixed point:
  * every factor is a ratio of integer-valued doubles, so the value is
  * bit-portable across engines (ln is libm-dependent; IEEE ×,/ are
  * exactly rounded) and the declared query stays exact-oracle-checkable.
  * Unlike ln-idf it is also strictly positive even at df > N/2.
  * Per-term ranking is order-identical to classic BM25 (the idf ratio
  * is monotone in df, saturation monotone in tf, dl); multi-term doc
  * scores weight rare terms more steeply than the ln form — documented
  * currency, same trade the tf-idf proxy already makes.
  */
object InvertedIndex {

  // private[operators] so the kill-between-writes spec can author a TORN
  // maintenance state (a partial partition, no commit stamp) directly
  private[operators] def table(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_postings"
  private[operators] def metaTable(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_meta"
  private[operators] def statsTable(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_stats"
  private[operators] def posTable(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_positions"
  private[operators] def tombTable(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_tombstones"
  private[operators] def vocabTable(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_vocab"
  private[operators] def deletesTable(dir: String): String =
    SnapshotMeta.indexStem("inv_index_", dir) + "_deletes"

  /** Index-side file parallelism: every pruned lookup reads ~k/buckets
    * of the postings, and every bucket is one file per table partition.
    * The count is CHOSEN AT BUILD TIME from measured bytes (round-16
    * verdict item 5 — a constant was wrong in both directions: the
    * 256-bucket fixture rerun measured SLOWER because tiny buckets pay
    * per-file open cost, and 16 buckets at 100 TB would make 100+ GB
    * bucket files): [[bucketCountForBytes]] applies the round-13 sizing
    * formula — next power of two of bytes / 256 MB target bucket-file
    * size, floored at 16 — to the build input's scan bytes
    * ([[chooseBuckets]]). The choice is PERSISTED in the table's own
    * catalog bucket spec — the one place it is both recorded and
    * ENFORCED (every later partition overwrite must and does conform;
    * a ledger copy could desync from what the table actually has) — and
    * read back via [[bucketsOf]] wherever the family adds a table or
    * folds ([[ensurePositions]], [[compact]]). Override with
    * -Dgraft.index.invBuckets=N BEFORE the first build (the bucket spec
    * is fixed at table creation; [[compact]] re-evaluates). */
  private def forcedBuckets: Option[Int] = sys.props.get("graft.index.invBuckets")
    .map { raw =>
      val n = raw.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"-Dgraft.index.invBuckets must be an integer, got '$raw'"))
      require(n > 0, s"-Dgraft.index.invBuckets must be positive, got $n " +
        "(note: the bucket spec is fixed at table creation; changing the " +
        "property later is ignored for existing tables)")
      n
    }

  /** The sizing formula, pure: bucket count = next power of two of
    * ceil(bytes / targetBytes), floored at `minBuckets` (capped at 2^20
    * — a backstop, never a real configuration). Power of two so probe
    * hashing stays well-distributed under doubling, min 16 so fixture
    * scale keeps the measured-faster small-count layout. At 100 TB:
    * ~1 TB of postings → 4096 buckets of ~256 MB each. */
  private[operators] def bucketCountForBytes(bytes: Long,
                                             targetBytes: Long = 256L << 20,
                                             minBuckets: Int = 16): Int = {
    require(targetBytes > 0 && minBuckets > 0,
      s"need positive targetBytes/minBuckets, got $targetBytes/$minBuckets")
    // ceil-div WITHOUT the +target-1 trick: bytes near Long.MaxValue
    // would wrap negative and silently return the floor for the hugest
    // possible store (review finding)
    val b = math.max(0L, bytes)
    val need = math.max(1L, b / targetBytes + (if (b % targetBytes > 0) 1L else 0L))
    val pow = java.lang.Long.highestOneBit(need)
    val np = if (pow == need) need else pow * 2
    math.max(minBuckets.toLong, math.min(np, 1L << 20)).toInt
  }

  /** The build-time choice: the forced override, else
    * [[bucketCountForBytes]] over the build input's optimizer scan bytes
    * (for a parquet corpus: the file bytes — a same-order proxy for the
    * postings store's bytes, which cannot be known before writing; the
    * formula only moves in power-of-two steps, so same-order is
    * enough). */
  private[operators] def chooseBuckets(docs: DataFrame): Int =
    forcedBuckets.getOrElse(bucketCountForBytes(statsBytes(docs)))

  /** The optimizer's size estimate, refused when it is the
    * no-estimate sentinel (`defaultSizeInBytes` = Long.MaxValue, which
    * a stats-less relation reports): sizing a bucket spec from a
    * made-up number would persist either the floor or the 2^20 cap
    * forever — force a count instead. File scans (every production
    * build input) always carry real file-size stats. NOTE: a
    * PARTITIONED catalog table without ANALYZE stats also reports the
    * sentinel (CatalogFileIndex falls back to defaultSizeInBytes) —
    * compaction sizes from [[tableFileBytes]], never from here. */
  private[operators] def statsBytes(input: DataFrame): Long = {
    val sz = input.queryExecution.optimizedPlan.stats.sizeInBytes
    require(sz < BigInt(Long.MaxValue),
      "build input has no size estimate (stats sizeInBytes is the " +
        "Long.MaxValue sentinel) — build from a file-backed relation or " +
        "force a bucket count via the family's -Dgraft.index.*Buckets " +
        "property")
    sz.toLong
  }

  /** A catalog table's ACTUAL stored bytes, summed from the filesystem
    * (getContentSummary over the table location) — the compact-time
    * sizing input. Plan stats are useless here: the family's tables are
    * partitioned and carry no ANALYZE stats, so their relations report
    * the Long.MaxValue sentinel (which the pre-guard formula silently
    * overflowed to the floor — review finding, spec-pinned). One
    * metadata round-trip, no data read. */
  private[operators] def tableFileBytes(spark: SparkSession, t: String): Long = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    loc.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(loc).getLength
  }

  /** The PERSISTED choice, read back from the table's catalog bucket
    * spec — [[chooseBuckets]]' durable record. */
  private[operators] def bucketsOf(spark: SparkSession, t: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$t exists but carries no bucket spec — not a graft-built index table"))

  /** The base build's ledger partition ([[SnapshotMeta.BaseBatchId]]). */
  val BaseBatchId: Long = SnapshotMeta.BaseBatchId

  /** THE tokenization currency of the index family (round-11 verdict
    * item: "Hash" must find "hash"): [[Dedup.canonicalText]] — lower,
    * strip non-alphanumerics, collapse whitespace — then whitespace
    * split. The SAME canonical rule exact dedup applies
    * (q_dedup_canonical), so the index and the dedup family agree on
    * what "the same token" means; query terms pass through
    * [[canonicalTerm]], the scala mirror. Three codegen string ops at
    * the scan — map-side, no extra pass. */
  def tokens(text: Column): Column =
    split(Dedup.canonicalText(text), " ")

  /** The query-side mirror of [[tokens]]' canonicalization, applied to
    * each search term (a tiny driver-side constant). */
  def canonicalTerm(t: String): String =
    t.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim

  /** THE single definition of the postings relation — the persisted build
    * and any live replay derive from this one function. `dl` (the doc's
    * CANONICAL token count — the [[tokens]] currency, which equals the
    * whitespace count on already-canonical text) rides along
    * denormalized: constant within the (term, doc) group, so max() is
    * exact. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"),
        size(tokens(col("text"))).cast("long").as("dl"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("long").as("tf"), max("dl").as("dl"))

  /** THE single definition of the POSITIONAL postings relation —
    * (term, doc_id, pos), pos 1-BASED (the SQL list-index convention, so
    * the oracle's zip-unnest replay needs no off-by-one shim), positions
    * in the CANONICAL token stream ([[tokens]]). Unlike [[postings]]
    * nothing aggregates: every token occurrence is a row, which is what
    * phrase matching needs. */
  def positions(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("p0", "term")))
      .select(col("term"), col("doc_id"), (col("p0") + 1).cast("long").as("pos"))

  /** THE single definition of a batch's VOCABULARY contribution —
    * (term, df): the per-term count of distinct documents in `docs`
    * containing the term ([[postings]] holds one row per (term, doc),
    * so a plain count IS the distinct-doc count). Persisted per batch
    * in the `_vocab` companion table (round-14 verdict item 1) so the
    * prefix/fuzzy EXPANSIONS read vocabulary-sized input — ~10⁶ rows at
    * 100 TB — instead of the TB-scale postings store, whose only
    * pushable predicate (term equality/IN) a fuzzy query cannot
    * supply. Additive under [[append]] (disjoint doc sets), NET rows
    * under [[edit]] (added − removed per term; negatives legal inside a
    * batch row, the live df is the SUM), folded by [[compact]] — the
    * `_stats` lifecycle discipline, per term. */
  def vocab(docs: DataFrame): DataFrame =
    postings(docs).groupBy("term").agg(count(lit(1)).as("df"))

  /** The persisted SymSpell neighborhood depth: `_deletes` holds every
    * ≤[[DeleteDepth]]-deletion variant of every vocabulary term, so a
    * batched fuzzy query at `maxDistance <= DeleteDepth` reads a pruned
    * store instead of re-deriving the variant vocabulary inline (the
    * round-15 deferred item; SCALE.md's declared 100 TB shape). Depth 1
    * is the SymSpell production default: 1 + len(term) variants per
    * term (~11× vocab rows at English lengths), serving d ∈ {0, 1} —
    * the typo case. Depth 2 would square the blowup (O(len²) variants)
    * for the rare d=2 query, which instead falls back to the inline
    * depth-2 derivation over `_vocab` ([[searchFuzzyBatch]]). */
  val DeleteDepth: Int = 1

  /** THE single definition of a batch's DELETION-VARIANT contribution —
    * (variant, term, df): each `_vocab` row ([[vocab]] shape) exploded
    * over its ≤[[DeleteDepth]]-deletion neighborhood
    * ([[deletionVariants]]), CARRYING the row's df. Because the variant
    * set is a deterministic function of the term alone, every batch's
    * rows for one term explode to the SAME variants — so the per-batch
    * net-df discipline of `_vocab` telescopes identically per
    * (variant, term): additive under [[append]], net rows under
    * [[edit]] (negatives legal; the live df is the SUM), folded by
    * [[compact]], torn partitions replayed by the same
    * partition-overwrite. Liveness needs no join back to `_vocab`:
    * sum(df) > 0 per (variant, term) IS the live vocabulary test. */
  def deletes(vocabRows: DataFrame): DataFrame =
    vocabRows.select(
      explode(deletionVariants(col("term"), DeleteDepth)).as("variant"),
      col("term"), col("df"))

  /** THE single definition of the corpus-level BM25 constants:
    * (n BIGINT, dltot BIGINT) — document count and total canonical
    * token count — as a 1-row frame. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n"),
      coalesce(sum(size(tokens(col("text"))).cast("long")), lit(0L))
        .as("dltot"))

  /** Build the postings/stats/meta family for the fixture if absent;
    * returns the postings table name. The THREE tables are one unit: a
    * partial family (crash between the creates, or a pre-batch-ledger
    * layout) is rebuilt WHOLESALE from the corpus dir — with the batched
    * ledger, per-table repair would desync the commit record from the
    * data, so the only sound repairs are "all present" or "re-derive
    * all". Every table carries a `batch_id` partition column (base build
    * = [[BaseBatchId]]); maintenance writes are per-batch partition
    * overwrites, which is what makes [[append]] safe to re-run after a
    * crash anywhere in its sequence. */
  def ensure(spark: SparkSession, dir: String): String = {
    val t = table(dir)
    val family = Seq(t, statsTable(dir), vocabTable(dir), deletesTable(dir),
      metaTable(dir))
    // "present" means present IN THE BATCHED-LEDGER SCHEMA: a complete
    // pre-ledger family (all three tables, no batch_id column) would pass
    // a bare tableExists check and then fail the first append with an
    // unresolved-column error instead of triggering the rebuild
    def current(x: String): Boolean =
      spark.catalog.tableExists(x) &&
        spark.table(x).columns.contains("batch_id")
    if (!family.forall(current)) {
      // tombstones drop with the family: a wholesale rebuild covers the
      // edited corpus, and a leftover tombstone (batch id > the base's
      // -1) would wrongly hide rebuilt rows of a re-added doc
      (family :+ posTable(dir) :+ tombTable(dir)).foreach { x =>
        spark.sql(s"DROP TABLE IF EXISTS $x")
        IvfIndex.dropOrphanLocation(spark, x)
      }
      val docs = graft.sources.Tables.documents(spark, dir)
      // ONE bytes-sized bucket count for the whole family at this build
      // (chooseBuckets scaladoc); vocab/deletes are vocabulary-sized and
      // would floor at 16 on their own — family-uniform keeps the layout
      // legible and the compact fold consistent
      val nb = chooseBuckets(docs)
      postings(docs).withColumn("batch_id", lit(BaseBatchId))
        .write.partitionBy("batch_id")
        .bucketBy(nb, "term").sortBy("term", "doc_id")
        .saveAsTable(t)
      corpusStats(docs).withColumn("batch_id", lit(BaseBatchId))
        .write.partitionBy("batch_id").saveAsTable(statsTable(dir))
      val v = vocab(docs).localCheckpoint(true)
      v.withColumn("batch_id", lit(BaseBatchId))
        .write.partitionBy("batch_id")
        .bucketBy(nb, "term").sortBy("term")
        .saveAsTable(vocabTable(dir))
      // bucketed by VARIANT: the live view groups by (variant, term),
      // which the variant bucketing satisfies shuffle-free, and the
      // batched-fuzzy probe joins on the variant string
      deletes(v).withColumn("batch_id", lit(BaseBatchId))
        .write.partitionBy("batch_id")
        .bucketBy(nb, "variant").sortBy("variant", "term")
        .saveAsTable(deletesTable(dir))
      SnapshotMeta.stampBatch(spark, metaTable(dir), BaseBatchId,
        SnapshotMeta.fingerprint(docs, "doc_id"))
    }
    t
  }

  /** The live BM25 constants — (n, dltot) summed over the per-batch
    * stats rows (additive over disjoint doc sets; [[edit]] batches
    * contribute NET rows, added minus removed, so the sum stays the live
    * corpus), as a 1-row frame. O(#batches) rows, never a corpus scan. */
  def statsFor(spark: SparkSession, dir: String): DataFrame =
    spark.table(statsTable(dir))
      .agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("dltot"), lit(0L)).as("dltot"))

  /** The LIVE vocabulary — (term, df) with df the number of live
    * documents containing the term: the per-batch `_vocab` rows summed
    * per term ([[edit]] batches contribute net rows, so the sum
    * telescopes to the surviving content's dfs; terms whose docs all
    * died sum to 0 and drop out). THE expansion input for
    * [[searchPrefix]]/[[searchFuzzy]]/[[searchFuzzyBatch]]:
    * vocabulary-sized — ~10⁶ rows where the postings store is TBs —
    * which is what makes a predicate the parquet scan cannot push
    * (levenshtein) affordable as a full read of this relation. */
  def vocabFor(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    spark.table(vocabTable(dir))
      .groupBy("term").agg(sum("df").as("df_"))
      .filter(col("df_") > 0)
  }

  /** The LIVE deletion-variant vocabulary — (variant, term, df_) with
    * df_ the live document frequency of `term`: the per-batch
    * `_deletes` rows summed per (variant, term). Terms whose docs all
    * died sum to 0 and drop out — liveness is SELF-CONTAINED (no join
    * back to `_vocab`), because every batch row of a term carries that
    * batch's net df on every variant. THE candidate input for
    * [[searchFuzzyBatch]] at `maxDistance <= DeleteDepth`: the probe is
    * an equi-join on `variant` against the query terms' neighborhoods,
    * so the store is read through its variant bucketing instead of the
    * whole vocabulary exploding its variants per call. The groupBy
    * runs shuffle-free over the variant-bucketed scan (grouping keys
    * contain the bucket column). */
  def deletesFor(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    spark.table(deletesTable(dir))
      .groupBy("variant", "term").agg(sum("df").as("df_"))
      .filter(col("df_") > 0)
  }

  /** The LIVE postings relation — stored rows minus tombstoned docs:
    * a row dies when some tombstone for its doc sits in a LATER batch
    * (strict `<`, so an [[edit]] that rewrites a doc re-admits the
    * rewrite's own rows). The tombstone side is ~churn-sized and
    * broadcast; with no tombstone table the read is the bare scan. All
    * serving paths read through here (and [[positionsFor]]), so a
    * delete is visible to every query the moment its batch commits. */
  def postingsFor(spark: SparkSession, dir: String): DataFrame =
    withoutTombstones(spark, dir, spark.table(ensure(spark, dir)))

  /** The live positional relation ([[postingsFor]]'s twin). */
  def positionsFor(spark: SparkSession, dir: String): DataFrame =
    withoutTombstones(spark, dir, spark.table(ensurePositions(spark, dir)))

  private def withoutTombstones(spark: SparkSession, dir: String,
                                rows: DataFrame): DataFrame =
    if (!spark.catalog.tableExists(tombTable(dir))) rows
    else {
      val t = broadcast(spark.table(tombTable(dir))
        .select(col("doc_id").as("t_doc"), col("batch_id").as("t_batch")))
      rows.join(t,
        rows("doc_id") === t("t_doc") && rows("batch_id") < t("t_batch"),
        "left_anti")
    }

  /** Tombstone HYGIENE for the search family's stored tables
    * ([[IvfIndex.hygiene]]'s search twin): one row per store (postings,
    * positions) with resident/live/tombstoned counts and the dead
    * fraction — the signal that schedules compaction in production
    * beside the fixed ledger-count trigger. Two narrow aggregates per
    * store, nothing collected. */
  def hygiene(spark: SparkSession, dir: String): DataFrame = {
    def row(store: String, t: String): DataFrame =
      SnapshotMeta.hygieneRow(store, spark.table(t),
        withoutTombstones(spark, dir, spark.table(t)))
    row("postings", ensure(spark, dir))
      .unionByName(row("positions", ensurePositions(spark, dir)))
  }

  /** See [[SnapshotMeta.derivedBatchId]] — the id space for the no-arg
    * [[append]] overload (callers without a durable batch identity). */
  private[operators] def derivedBatchId(fp: (Long, Long)): Long =
    SnapshotMeta.derivedBatchId(fp)

  /** See [[SnapshotMeta.contentFingerprint]]. */
  private[operators] def contentFingerprint(batch: DataFrame): (Long, Long) =
    SnapshotMeta.contentFingerprint(batch)

  /** Incremental maintenance for a crawl append (new doc_ids only),
    * CRASH-IDEMPOTENT (round-11 verdict): the batch's postings rows are
    * disjoint from every existing row — tf is (term, doc)-local, not
    * transitive — and all three writes key on `batchId`:
    *
    *   1. postings → partition overwrite `batch_id = batchId`
    *   2. stats    → partition overwrite (the batch's own (n, dltot) row;
    *                 readers SUM the rows, which is additive over
    *                 disjoint doc sets)
    *   3. ledger stamp (partition overwrite) — the COMMIT POINT
    *
    * Recovery contract: a committed batch replays as a no-op (the ledger
    * check); a crash ANYWHERE before step 3 leaves no commit record, and
    * the re-run REPLACES each partial partition instead of appending
    * beside it — so re-run == clean single application, bit-exact
    * (spec-pinned by the kill-between-writes test). This is the
    * exactly-once-effect bar the streaming specs hold the query path to
    * (reference README.md:19-24), applied to index maintenance. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             batchId: Long): Unit = {
    require(batchId != BaseBatchId, s"batch_id $BaseBatchId is the base build")
    val t = ensure(spark, dir)
    if (SnapshotMeta.appliedBatch(spark, metaTable(dir), batchId)) return
    SnapshotMeta.overwritePartition(spark, t, batchId, postings(batch))
    // null-safe on an empty batch (sum over zero rows) via corpusStats'
    // coalesce, so an unconditional foreachBatch append stays a no-op
    SnapshotMeta.overwritePartition(spark, statsTable(dir), batchId,
      corpusStats(batch))
    // the batch's df contributions — additive over disjoint doc sets,
    // same partition-overwrite idempotence as the other writes
    val v = vocab(batch).localCheckpoint(true)
    SnapshotMeta.overwritePartition(spark, vocabTable(dir), batchId, v)
    SnapshotMeta.overwritePartition(spark, deletesTable(dir), batchId,
      deletes(v))
    SnapshotMeta.stampBatch(spark, metaTable(dir), batchId,
      SnapshotMeta.fingerprint(batch.select(col("doc_id")).distinct(), "doc_id"))
  }

  /** [[append]] with a content-derived batch id — for callers without a
    * durable external batch identity. Derived ids land at `<= -2`,
    * strictly below every tombstone, so a GENUINELY NEW batch naming a
    * tombstoned id would leave its rows permanently hidden from
    * [[postingsFor]]/[[positionsFor]] despite a "successful" append —
    * refused ([[SnapshotMeta.requireNoTombstonedIds]]); brand-new ids
    * append fine on an edited family. The committed-batch replay check
    * runs FIRST, so a batch that already committed replays as a silent
    * no-op even when a later edit tombstoned its ids (the crash-replay
    * contract wins over the refusal). Consequence: RE-ADDING previously
    * deleted content that is byte-identical to the original batch hashes
    * to the same derived id, reads as applied, and no-ops — the docs
    * never serve again. Re-ingest deleted content through the durable
    * non-negative-id overload (a fresh id above the tombstones). */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val id = derivedBatchId(contentFingerprint(batch))
    // committed-batch check BEFORE the tombstone guard: a replay of an
    // already-committed content batch whose ids a LATER edit tombstoned
    // must no-op (the documented replay contract) — the guard vets only
    // genuinely new batches
    if (SnapshotMeta.appliedBatch(spark, metaTable(dir), id)) return
    SnapshotMeta.requireNoTombstonedIds(spark, tombTable(dir), batch, "doc_id")
    append(spark, dir, batch, id)
  }

  /** Incremental maintenance for an EDITED snapshot — the diff classes
    * that previously forced a full rebuild (removals and rewrites),
    * handled at churn cost. `removed` is the outgoing content — the
    * (doc_id, text) rows of the PREVIOUS snapshot being dropped or
    * rewritten (the caller has them: they are the prev frame's rows at
    * the diff's removed/changed ids) — and `added` is the incoming
    * content (new docs plus rewritten docs' new text, same ids). Four
    * idempotent writes keyed on `batchId`, stamp last (the [[append]]
    * discipline):
    *
    *   1. tombstones → partition overwrite: the removed ids. Serving
    *      reads ([[postingsFor]]/[[positionsFor]]) anti-join them with
    *      `row.batch_id < tombstone.batch_id`, so every OLDER row of a
    *      tombstoned doc dies while this batch's own rewrite rows live
    *   2. postings → partition overwrite with `postings(added)`
    *   3. stats → partition overwrite with the NET row,
    *      corpusStats(added) − corpusStats(removed) — readers sum, so
    *      the live (n, dltot) stays exact without touching old batches
    *   4. ledger stamp with the net fingerprint (added − removed) — the
    *      COMMIT POINT; the summed ledger still equals the edited dir
    *
    * The compensation derives from the REMOVED CONTENT, not from an
    * index scan — symmetric with append, exact even for docs with no
    * postings rows (token-less text), and independent of the current
    * tombstone state, which is what makes a torn run replay clean.
    *
    * Contracts: `batchId` must be explicit, non-negative, and greater
    * than every batch id previously applied at this dir (tombstone
    * visibility orders on batch id — content-derived ids sit below the
    * base partition and cannot order an edit); `removed` rows must be
    * live index content (double-deleting a doc breaks the stats
    * compensation); `added` ids must be new or among `removed`. Old
    * positions die through the same tombstones — callers maintaining
    * the positional table run [[appendPositions]] with the `added` docs
    * BEFORE this (the commit owner runs last). At 100 TB the cost is
    * O(churn): tombstones are id-rows, and no resident partition is
    * read or rewritten. */
  def edit(spark: SparkSession, dir: String, removed: DataFrame,
           added: DataFrame, batchId: Long): Unit = {
    require(batchId >= 0,
      "edit/delete need an explicit non-negative batch id: tombstone " +
        "visibility orders on batch id, and derived ids sit below the " +
        "base partition")
    val t = ensure(spark, dir)
    if (SnapshotMeta.appliedBatch(spark, metaTable(dir), batchId)) return
    val tombs = removed.select(col("doc_id")).distinct()
    val tt = tombTable(dir)
    if (!spark.catalog.tableExists(tt)) {
      IvfIndex.dropOrphanLocation(spark, tt)
      tombs.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id").saveAsTable(tt)
    } else SnapshotMeta.overwritePartition(spark, tt, batchId, tombs)
    SnapshotMeta.overwritePartition(spark, t, batchId, postings(added))
    val net = corpusStats(added)
      .crossJoin(corpusStats(removed)
        .select(col("n").as("rn"), col("dltot").as("rdl")))
      .select((col("n") - col("rn")).as("n"),
        (col("dltot") - col("rdl")).as("dltot"))
    SnapshotMeta.overwritePartition(spark, statsTable(dir), batchId, net)
    // vocab NET rows per term: added dfs minus removed dfs — negatives
    // legal (the live df is the per-term SUM, which telescopes to the
    // surviving content because `removed` is exactly the live rows the
    // tombstone hides); zero-net terms drop (no information)
    val netVocab = vocab(added).select(col("term"), col("df"))
      .unionByName(vocab(removed).select(col("term"), (-col("df")).as("df")))
      .groupBy("term").agg(sum("df").as("df"))
      .filter(col("df") =!= 0)
      .localCheckpoint(true)
    SnapshotMeta.overwritePartition(spark, vocabTable(dir), batchId, netVocab)
    // the same net rows exploded over each term's (deterministic)
    // variant set — sums per (variant, term) telescope exactly like the
    // per-term vocab sums
    SnapshotMeta.overwritePartition(spark, deletesTable(dir), batchId,
      deletes(netVocab))
    val fa = SnapshotMeta.fingerprint(added.select(col("doc_id")), "doc_id")
    val fr = SnapshotMeta.fingerprint(tombs, "doc_id")
    SnapshotMeta.stampBatch(spark, metaTable(dir), batchId,
      (fa._1 - fr._1, fa._2 - fr._2))
  }

  /** Pure removal — [[edit]] with no incoming content. */
  def delete(spark: SparkSession, dir: String, removed: DataFrame,
             batchId: Long): Unit =
    edit(spark, dir, removed, removed.limit(0), batchId)

  /** Staleness check vs the CURRENT fixture content (explicit, on the
    * pipeline's snapshot-promotion cadence — the ComponentIndex rule):
    * the ledger's SUMMED per-batch fingerprints vs the dir's. After
    * [[append]] the sum covers the stored corpus (base ∪ batches), so a
    * fixture dir holding exactly that union reads fresh — the intended
    * append contract (the caller lands batch files into the dir). */
  def snapshotStale(spark: SparkSession, dir: String): Boolean =
    SnapshotMeta.staleBatched(spark, metaTable(dir),
      SnapshotMeta.fingerprint(
        graft.sources.Tables.documents(spark, dir), "doc_id"))

  /** Build the positional table if absent (bucketed by term like the
    * postings — a phrase lookup prunes to the phrase terms' buckets).
    * Builds on top of [[ensure]] so the snapshot stamp and stats exist:
    * one staleness contract governs the whole index family at this dir. */
  def ensurePositions(spark: SparkSession, dir: String): String = {
    ensure(spark, dir)
    val t = posTable(dir)
    if (!spark.catalog.tableExists(t)) {
      IvfIndex.dropOrphanLocation(spark, t)
      positions(graft.sources.Tables.documents(spark, dir))
        .withColumn("batch_id", lit(BaseBatchId))
        .write.partitionBy("batch_id")
        // the family's persisted choice (the postings table's spec), so
        // a positions table added later matches the build-time sizing
        .bucketBy(bucketsOf(spark, table(dir)), "term").sortBy("term", "doc_id")
        .saveAsTable(t)
    }
    t
  }

  /** Positional rows are (term, doc, pos)-local like tf rows, so the
    * per-batch partition overwrite is exact for a new-doc batch AND
    * idempotent on its own (re-running replaces the partition) — no
    * ledger needed here: [[append]] (which callers run for the same
    * batch) owns the commit record, and whichever order the two run in,
    * a replay converges on the same state. */
  def appendPositions(spark: SparkSession, dir: String, batch: DataFrame,
                      batchId: Long): Unit = {
    require(batchId != BaseBatchId, s"batch_id $BaseBatchId is the base build")
    val t = ensurePositions(spark, dir)
    SnapshotMeta.overwritePartition(spark, t, batchId, positions(batch))
  }

  /** [[appendPositions]] with the content-derived batch id (matches the
    * 3-arg [[append]]'s slot for the same batch — and the same
    * tombstoned-id refusal, so the torn state where positions land but
    * the paired [[append]] refuses cannot arise). */
  def appendPositions(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val id = derivedBatchId(contentFingerprint(batch))
    // positions have no ledger of their own and the write is an
    // idempotent partition overwrite — ALWAYS run it (direct callers may
    // legally run append() in either order around this); but skip the
    // tombstone guard once the paired append() committed this id: a
    // replay of a committed batch whose ids a LATER edit tombstoned must
    // re-land identical rows quietly, not throw (round-14 ADVICE)
    if (!SnapshotMeta.appliedBatch(spark, metaTable(dir), id))
      SnapshotMeta.requireNoTombstonedIds(spark, tombTable(dir), batch, "doc_id")
    appendPositions(spark, dir, batch, id)
  }

  def drop(spark: SparkSession, dir: String): Unit =
    Seq(table(dir), metaTable(dir), statsTable(dir), vocabTable(dir),
        deletesTable(dir), posTable(dir), tombTable(dir)).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      IvfIndex.dropOrphanLocation(spark, t)
    }

  /** COMPACTION — the operational response to per-batch partition
    * accretion (SCALE.md "Sizing the index bucket counts": every
    * committed append adds one file per bucket per table, so a year of
    * daily crawls turns each pruned lookup into #batches file opens per
    * selected bucket). Folds every batch partition of the whole family
    * (postings, stats, positions if present) into the base partition and
    * resets the ledger to one summed stamp — serving results are
    * BIT-IDENTICAL before and after (the fold is a partition relayout of
    * the same rows; stats re-sum to the same totals; spec-pinned), and
    * the per-lookup file count drops back to one per selected bucket.
    * Because the bucket spec is re-declared at the rewrite, compaction is
    * also the sanctioned path to a NEW bucket count — re-evaluated ONCE
    * from the family's largest member's stored bytes and applied
    * family-uniform (see the inline sizing comment below).
    *
    * NOT crash-atomic, by contract: each table fold is a drop-and-
    * recreate, so a kill mid-compact can leave a table absent — the
    * family detects that as a partial family and [[ensure]] rebuilds
    * WHOLESALE from the corpus dir, which is why compaction REQUIRES a
    * fresh index (ledger == dir): recovery-by-rebuild then reproduces
    * the identical index. Run it in the maintenance window, like any
    * offline compaction. */
  def compact(spark: SparkSession, dir: String): Unit = {
    require(!snapshotStale(spark, dir),
      "compact requires a fresh index (ledger == corpus dir): a crash " +
        "mid-compact recovers by wholesale rebuild from the dir, which " +
        "must reproduce the same index. Run append or rebuild first.")
    SnapshotMeta.requireNoDerivedBatches(spark, metaTable(dir))
    val fp = SnapshotMeta.summedFingerprint(spark, metaTable(dir))
    // fold INTO the highest committed batch id, not the base partition:
    // tombstones hide rows with batch_id strictly BELOW their own, so
    // rows folded to the maximum id are never hidden — every
    // crash-intermediate state (one table folded, tombstones still
    // present) keeps serving correct, and a leftover tombstone after a
    // torn run is inert (future appends use still-higher ids). Folding
    // to -1 instead would let a surviving tombstone hide the very
    // rewrite rows an edit admitted.
    val foldId = spark.table(metaTable(dir))
      .agg(max("batch_id")).head().getLong(0)
    // the bucket spec is re-declared at the rewrites, so compaction
    // RE-EVALUATES the sizing formula — ONCE, and the single count
    // applies to every bucketed fold in the family: the build's
    // family-uniform rule (round-17 ADVICE — a per-table recount could
    // desync postings from vocab/deletes/positions and reintroduce
    // shuffles in the term-bucketed joins the uniform count exists to
    // avoid). Sized from the LARGEST member's stored bytes (now known
    // exactly, unlike at build time): positions carries per-OCCURRENCE
    // rows and typically outweighs the per-(term, doc) postings severalfold
    // (review finding — postings-only sizing would leave positions
    // bucket files far past the 256 MB target at scale); the uniform
    // count at the max keeps every member's files at-or-under target,
    // smaller members just run more, smaller files.
    val nb = forcedBuckets.getOrElse(bucketCountForBytes(
      (Seq(table(dir)) ++
        (if (spark.catalog.tableExists(posTable(dir))) Seq(posTable(dir))
         else Nil))
        .map(tableFileBytes(spark, _)).max))
    def fold(t: String, bucketCols: Seq[String], sortCols: Seq[String],
             agg: DataFrame => DataFrame = identity,
             live: Boolean = false): Unit = {
      // localCheckpoint truncates lineage, so nothing reads `t` when the
      // overwrite drops it (the ComponentIndex.merge device)
      val src = if (live) withoutTombstones(spark, dir, spark.table(t))
                else spark.table(t)
      val rows = agg(src.drop("batch_id")).localCheckpoint(true)
      val w = rows.withColumn("batch_id", lit(foldId))
        .write.mode("overwrite").partitionBy("batch_id")
      (if (bucketCols.nonEmpty)
         w.bucketBy(nb, bucketCols.head, bucketCols.tail: _*)
           .sortBy(sortCols.head, sortCols.tail: _*)
       else w).saveAsTable(t)
    }
    // tombstones apply PHYSICALLY at the fold (dead rows dropped), so
    // the tombstone table retires with the batch partitions
    fold(table(dir), Seq("term"), Seq("term", "doc_id"), live = true)
    // stats re-aggregate to ONE row (the additive sum readers take;
    // edit batches' net rows fold into the same exact total)
    fold(statsTable(dir), Seq.empty, Seq.empty,
      _.agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("dltot"), lit(0L)).as("dltot")))
    // vocab folds to the live per-term sums (net rows telescope; dead
    // terms drop) — exactly what vocabFor computes at read time
    fold(vocabTable(dir), Seq("term"), Seq("term"),
      _.groupBy("term").agg(sum("df").as("df")).filter(col("df") > 0))
    // deletes fold to the live per-(variant, term) sums — the same
    // telescoping as vocab, one more narrow projection
    fold(deletesTable(dir), Seq("variant"), Seq("variant", "term"),
      _.groupBy("variant", "term").agg(sum("df").as("df"))
        .filter(col("df") > 0))
    if (spark.catalog.tableExists(posTable(dir)))
      fold(posTable(dir), Seq("term"), Seq("term", "doc_id"), live = true)
    spark.sql(s"DROP TABLE IF EXISTS ${tombTable(dir)}")
    IvfIndex.dropOrphanLocation(spark, tombTable(dir))
    // ledger last: one stamp at the fold partition carrying the summed
    // fingerprint — the dir still fingerprints to the same sum, so
    // freshness is preserved
    import spark.implicits._
    Seq((fp._1, fp._2, foldId)).toDF("n_rows", "id_sum", "batch_id")
      .write.mode("overwrite").partitionBy("batch_id")
      .saveAsTable(metaTable(dir))
    spark.catalog.refreshTable(table(dir))
  }

  /** Top-k documents per query term by the exact tf-idf proxy, served
    * from the pruned postings scan: the IN filter on the bucket column
    * prunes to the matching buckets; per-term df is the count of exactly
    * those rows; ranking windows over tiny per-term groups. N comes from
    * the ledger-backed [[statsFor]] — O(#batches) rows, never a
    * query-time corpus scan, and always in step with the stored postings
    * (a live corpus count could diverge after an append). The 1-row N
    * aggregate cross-joins as a scalar (the whitelisted pattern). */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
             k: Int = 10): DataFrame = {
    val canon = terms.map(canonicalTerm).filter(_.nonEmpty)
    require(canon.nonEmpty, "search needs at least one non-empty term")
    rankedFromPostings(
      postingsFor(spark, dir).filter(col("term").isin(canon: _*)),
      statsFor(spark, dir).select("n"),
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

  /** Top-k DOCUMENTS for a multi-term query under rational fixed-point
    * BM25, served from the pruned postings scan: dl rides in the hit
    * rows (no corpus join), N and total token count come from
    * [[statsFor]] — the per-batch `_stats` rows summed, O(#batches), no
    * corpus scan — per-term df from exactly the pruned rows. The doc-level top-k is an orderBy+limit —
    * TakeOrderedAndProject, the distributed per-partition-heap top-k —
    * NOT a single-partition rank window; the rank column is attached
    * after the limit, over ≤ k rows. */
  def searchBm25(spark: SparkSession, dir: String, terms: Seq[String],
                 k: Int = 10): DataFrame = {
    val canon = terms.map(canonicalTerm).filter(_.nonEmpty)
    require(canon.nonEmpty, "searchBm25 needs at least one non-empty term")
    bm25FromPostings(
      postingsFor(spark, dir).filter(col("term").isin(canon: _*)),
      statsFor(spark, dir), k)
  }

  /** Top-k documents for a PREFIX query (`pre*`), served from the
    * persisted index in two bounded phases — the standard multi-term
    * rewrite shape (cap the expansion, then run the boolean query):
    *
    *   1. EXPAND: the live VOCABULARY ([[vocabFor]] — the `_vocab`
    *      companion table's per-term sums, vocabulary-sized input, ~10⁶
    *      rows at 100 TB where the postings store is TBs) filters on
    *      the prefix; the StartsWith predicate pushes through the sum
    *      (a grouping-key filter) into the parquet scan, and the vocab
    *      files are term-sorted within buckets, so row-group min/max
    *      stats prune the read. The top `maxExpansions` terms by
    *      (df DESC, term ASC) are collected — a bounded driver-side
    *      list (the expansion cap every production engine applies;
    *      ≤ m tiny rows).
    *   2. SERVE: the expanded terms run the standard disjunctive BM25
    *      funnel ([[searchBm25]]) — pruned bucket reads, doc score =
    *      the sum over matched expansion terms, TakeOrderedAndProject
    *      top-k.
    *
    * An empty expansion yields an empty frame of the served schema. */
  def searchPrefix(spark: SparkSession, dir: String, prefix: String,
                   k: Int = 10, maxExpansions: Int = 16): DataFrame = {
    require(maxExpansions > 0, "maxExpansions must be positive")
    val canon = canonicalTerm(prefix)
    require(canon.nonEmpty, "searchPrefix needs a non-empty prefix")
    val expanded = vocabFor(spark, dir)
      .filter(col("term").startsWith(canon))
      .orderBy(col("df_").desc, col("term").asc)
      .limit(maxExpansions)
      .collect().map(_.getString(0)).toSeq
    if (expanded.isEmpty)
      spark.range(0).select(col("id").as("doc_id"),
        col("id").as("n_terms"), col("id").as("score"), col("id").as("rank"))
    else searchBm25(spark, dir, expanded, k)
  }

  /** Top-k documents for a FUZZY term query (edit distance ≤
    * `maxDistance`) — the typo-tolerant lookup every corpus browser
    * grows: the query term expands against the LIVE VOCABULARY
    * ([[vocabFor]] — the persisted `_vocab` table's per-term sums, a
    * vocabulary-sized read, ~10⁶ rows at 100 TB; round-14 verdict
    * item 1 retired the full-postings expansion read this replaced),
    * keeping terms within the distance bound under the codegen
    * `levenshtein`, with a length prefilter (|len(term) − len(q)| ≤ d
    * implies nothing is lost: a larger gap already exceeds the bound)
    * so most terms skip the DP entirely. The expansion caps at
    * `maxExpansions` by (df DESC, term ASC) like [[searchPrefix]] and
    * serves through the same disjunctive BM25 funnel. A single query
    * term makes the vocabulary scan the scale-right plan; BATCHED
    * fuzzy queries amortize further through the deletion-neighborhood
    * join ([[searchFuzzyBatch]] — SymSpell). */
  def searchFuzzy(spark: SparkSession, dir: String, term: String,
                  maxDistance: Int = 1, k: Int = 10,
                  maxExpansions: Int = 16): DataFrame = {
    require(maxDistance >= 0 && maxDistance <= 2,
      s"maxDistance must be in [0, 2], got $maxDistance (wider bounds " +
        "match most of the vocabulary and stop meaning 'typo')")
    require(maxExpansions > 0, "maxExpansions must be positive")
    val canon = canonicalTerm(term)
    require(canon.nonEmpty, "searchFuzzy needs a non-empty term")
    val expanded = vocabFor(spark, dir)
      .filter(abs(length(col("term")) - lit(canon.length)) <= maxDistance &&
        levenshtein(col("term"), lit(canon)) <= maxDistance)
      .orderBy(col("df_").desc, col("term").asc)
      .limit(maxExpansions)
      .collect().map(_.getString(0)).toSeq
    if (expanded.isEmpty)
      spark.range(0).select(col("id").as("doc_id"),
        col("id").as("n_terms"), col("id").as("score"), col("id").as("rank"))
    else searchBm25(spark, dir, expanded, k)
  }

  /** The ≤`d`-deletion neighborhood of `term` as a distinct array
    * column, INCLUDING the term itself (0 deletions) — the SymSpell
    * device: lev(a, b) ≤ d implies the two neighborhoods intersect
    * (every edit op consumes at most one deletion on each side), so an
    * equi-join on variants finds every within-distance pair and a
    * `levenshtein` verify removes the false positives. Sizes: 1 + L
    * variants at d = 1, O(L²) at d = 2 — per term, constants. */
  private[graft] def deletionVariants(term: Column, d: Int): Column = {
    def dels(t: Column): Column =
      when(length(t) > 0,
        transform(sequence(lit(1), length(t)),
          i => concat(t.substr(lit(1), i - lit(1)),
            t.substr(i + lit(1), length(t)))))
        .otherwise(expr("CAST(array() AS array<string>)"))
    if (d <= 0) array(term)
    else if (d == 1) array_union(array(term), dels(term))
    else array_distinct(concat(array_union(array(term), dels(term)),
      flatten(transform(dels(term), v => dels(v)))))
  }

  /** The driver-side mirror of [[deletionVariants]] — the query terms
    * are plain Strings, so their neighborhoods are computable as plan
    * CONSTANTS: that is what turns the `_deletes` probe into a
    * bucket-pruned literal-IN read ([[fuzzyCandidates]]) instead of a
    * full-store join. Equality with the Column form is spec-pinned on
    * random terms. */
  private[graft] def deletionVariantsLocal(term: String, d: Int): Set[String] = {
    def dels(t: String): Set[String] =
      (0 until t.length).map(i => t.substring(0, i) + t.substring(i + 1)).toSet
    if (d <= 0) Set(term)
    else if (d == 1) dels(term) + term
    else { val d1 = dels(term); d1 ++ d1.flatMap(dels) + term }
  }

  /** The verified (qterm, term, df_) candidate set of a batched fuzzy
    * query — [[searchFuzzyBatch]]'s expansion input, factored out so the
    * plan is pinnable on its own. At `maxDistance <= DeleteDepth` the
    * vocabulary side is the persisted `_deletes` store ([[deletesFor]]),
    * and because the query neighborhoods are driver-side constants
    * ([[deletionVariantsLocal]] — ≤ #q × (L+1) literals at d=1), the
    * probe is a literal IN on the store's BUCKET column: the scan reads
    * only the matching variant buckets (`SelectedBucketsCount`,
    * spec-pinned), so the candidate read costs O(query), independent of
    * the vocabulary size — the 100 TB argument for persisting the
    * table at all. Above the stored depth, the inline
    * depth-`maxDistance` derivation over `_vocab` (vocabulary-sized by
    * necessity). Either way the query side broadcasts (it also carries
    * the qterm label) and the length band prunes before the
    * levenshtein verify. */
  private[graft] def fuzzyCandidates(spark: SparkSession, dir: String,
                                     canon: Seq[String],
                                     maxDistance: Int): DataFrame = {
    import spark.implicits._
    val qs = canon.toDF("qterm")
      .select(col("qterm"),
        explode(deletionVariants(col("qterm"), maxDistance)).as("variant"))
      .distinct()
    val lens = canon.map(_.length)
    val vocabSide =
      if (maxDistance <= DeleteDepth) {
        val lits = canon.flatMap(deletionVariantsLocal(_, maxDistance)).distinct
        // the IN is semantically implied by the equi-join below, but as
        // a LITERAL predicate on the bucket column it statically prunes
        // the bucketed scan — the join alone cannot
        deletesFor(spark, dir).filter(col("variant").isin(lits: _*))
      } else vocabFor(spark, dir)
        .select(col("term"), col("df_"),
          explode(deletionVariants(col("term"), maxDistance)).as("variant"))
    vocabSide
      .filter(length(col("term"))
        .between(lens.min - maxDistance, lens.max + maxDistance))
      .join(broadcast(qs), Seq("variant"))
      .select("qterm", "term", "df_").distinct()
      .filter(levenshtein(col("term"), col("qterm")) <= maxDistance)
  }

  /** Top-k documents PER QUERY TERM for a batch of fuzzy queries — the
    * deletion-neighborhood join (SymSpell) the single-query
    * [[searchFuzzy]] scaladoc promises for batched workloads: instead
    * of one vocabulary `levenshtein` pass per query, BOTH sides
    * generate their ≤d-deletion variants and candidates arrive through
    * one EQUI-join on the variant string — the vocabulary side is
    * generated once for the whole batch (and length-banded to the
    * query terms' ±d range, lossless), the DP verify runs only on the
    * joined candidates, per-query expansions cap at `maxExpansions` by
    * (df DESC, term ASC) over tiny candidate groups, and ONE pruned
    * postings read (literal IN over the union of expansions — the
    * bounded driver-side collect of the single path, ≤ #queries × m
    * rows) serves every query's BM25 tail. Output adds a `qterm`
    * column; per-query results equal [[searchFuzzy]] run in a loop
    * (spec-pinned).
    *
    * At `maxDistance <= DeleteDepth` the vocabulary side is the
    * PERSISTED `_deletes` companion ([[deletesFor]] — the round-15
    * deferred item landed): no per-call variant derivation at all; the
    * probe equi-joins the broadcast query neighborhoods against the
    * variant-bucketed store. The store's depth-[[DeleteDepth]]
    * neighborhood is a superset of any shallower query neighborhood
    * (extra candidates die at the levenshtein verify), so d=0 serves
    * from the same store. d=2 (> DeleteDepth) falls back to the inline
    * depth-2 derivation over `_vocab` — the rare completeness-heavy
    * configuration, not worth the O(len²) storage blowup. */
  def searchFuzzyBatch(spark: SparkSession, dir: String, terms: Seq[String],
                       maxDistance: Int = 1, k: Int = 10,
                       maxExpansions: Int = 16): DataFrame = {
    require(maxDistance >= 0 && maxDistance <= 2,
      s"maxDistance must be in [0, 2], got $maxDistance (wider bounds " +
        "match most of the vocabulary and stop meaning 'typo')")
    require(maxExpansions > 0, "maxExpansions must be positive")
    val canon = terms.map(canonicalTerm).filter(_.nonEmpty).distinct
    require(canon.nonEmpty, "searchFuzzyBatch needs at least one non-empty term")
    import spark.implicits._
    val cand = fuzzyCandidates(spark, dir, canon, maxDistance)
    val wExp = Window.partitionBy("qterm")
      .orderBy(col("df_").desc, col("term").asc)
    val exp = cand.withColumn("r", row_number().over(wExp))
      .filter(col("r") <= maxExpansions)
      .select("qterm", "term")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    if (exp.isEmpty)
      spark.range(0).select(col("id").cast("string").as("qterm"),
        col("id").as("doc_id"), col("id").as("n_terms"),
        col("id").as("score"), col("id").as("rank"))
    else {
      val allTerms = exp.map(_._2).distinct
      val mapping = broadcast(exp.toDF("qterm", "term"))
      bm25PerQueryFromPostings(
        postingsFor(spark, dir).filter(col("term").isin(allTerms: _*)),
        mapping, statsFor(spark, dir), k)
    }
  }

  /** The PER-QUERY BM25 tail — [[bm25FromPostings]] keyed by `qterm`:
    * per-term df comes from the (query-agnostic) pruned postings rows,
    * the tiny (qterm, term) `mapping` fans each hit row out to the
    * queries whose expansion contains its term, scores group per
    * (qterm, doc), and ranking windows per qterm — partitions
    * multiply with the batch size, which is exactly when the batch
    * path is chosen. */
  def bm25PerQueryFromPostings(post: DataFrame, mapping: DataFrame,
                               stats: DataFrame, k: Int): DataFrame = {
    val dfq = post.groupBy("term").agg(count(lit(1)).as("df_"))
    val num = (lit(2.0) * col("n") - lit(2.0) * col("df_") + lit(1.0)) *
      (lit(22.0) * col("tf") * col("dltot"))
    val den = (lit(2.0) * col("df_") + lit(1.0)) *
      (lit(10.0) * col("tf") * col("dltot") + lit(3.0) * col("dltot") +
        lit(9.0) * col("dl") * col("n"))
    val w = Window.partitionBy("qterm")
      .orderBy(col("score").desc, col("doc_id").asc)
    post.join(dfq, "term").join(mapping, Seq("term")).crossJoin(stats)
      .withColumn("s", floor(lit(1048576.0) * num / den).cast("long"))
      .groupBy("qterm", "doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"), sum("s").as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qterm", "doc_id", "n_terms", "score", "rank")
  }

  /** THE BM25 scoring/ranking tail — shared by [[searchBm25]] and the
    * index-free replay. `stats` is a 1-row (n, dltot) frame
    * ([[corpusStats]] shape). Per-(term, doc) score, ×2^20 fixed point,
    * k1 = 6/5, b = 3/4 (see the object doc for the exact-rational
    * derivation; `22·tf·dltot / (10·tf·dltot + 3·dltot + 9·dl·n)` IS
    * tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with avgdl = dltot/n):
    *
    *   floor(2^20 · (2n−2df+1)·(22·tf·dltot)
    *               / ((2df+1)·(10·tf·dltot + 3·dltot + 9·dl·n)))
    *
    * evaluated in doubles with this exact association on both engines —
    * every input is an integer-valued double, ×,/ are IEEE
    * exactly-rounded, so the floor is bit-portable. Doc score = sum of
    * per-term longs (sum-of-floors, not floor-of-sum — exact in int64). */
  def bm25FromPostings(post: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    val dfq = post.groupBy("term").agg(count(lit(1)).as("df_"))
    val num = (lit(2.0) * col("n") - lit(2.0) * col("df_") + lit(1.0)) *
      (lit(22.0) * col("tf") * col("dltot"))
    val den = (lit(2.0) * col("df_") + lit(1.0)) *
      (lit(10.0) * col("tf") * col("dltot") + lit(3.0) * col("dltot") +
        lit(9.0) * col("dl") * col("n"))
    val ranked = post.join(dfq, "term").crossJoin(stats)
      .withColumn("s", floor(lit(1048576.0) * num / den).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"), sum("s").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    ranked.withColumn("rank", row_number().over(w).cast("long"))
      .select("doc_id", "n_terms", "score", "rank")
  }

  /** Top-k documents containing ALL query terms (conjunctive / boolean-
    * AND search — round-11 verdict item 6), served from the pruned
    * postings scan: the IN filter prunes to the query terms' buckets,
    * then one aggregate per doc counts matched terms ([[postings]] holds
    * exactly one row per (term, doc), so a plain count IS the distinct
    * term count) and keeps docs matching all of them. Ranked by total
    * term frequency (doc_id ties); doc-level top-k is orderBy+limit —
    * TakeOrderedAndProject, never a single-partition rank window. */
  def searchAll(spark: SparkSession, dir: String, terms: Seq[String],
                k: Int = 10): DataFrame = {
    val canon = terms.map(canonicalTerm).filter(_.nonEmpty).distinct
    require(canon.nonEmpty, "searchAll needs at least one non-empty term")
    conjunctiveFromPostings(
      postingsFor(spark, dir).filter(col("term").isin(canon: _*)),
      canon.size, k)
  }

  /** THE conjunctive-match tail — shared by [[searchAll]] and the
    * index-free replay. `post` holds postings rows covering (at least)
    * the `nTerms` query terms. */
  def conjunctiveFromPostings(post: DataFrame, nTerms: Int, k: Int): DataFrame = {
    val ranked = post.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum("tf").cast("long").as("tf_total"))
      .filter(col("n_terms") === nTerms)
      .orderBy(col("tf_total").desc, col("doc_id").asc)
      .limit(k)
    val w = Window.orderBy(col("tf_total").desc, col("doc_id").asc)
    ranked.withColumn("rank", row_number().over(w).cast("long"))
      .select("doc_id", "tf_total", "rank")
  }

  /** FACETED search: top-k BM25 over `terms`, restricted to documents
    * matching a metadata predicate (lang, source, …) — the filtered-
    * retrieval shape every corpus browser serves. The facet is decided
    * by the DOCUMENTS table, not the index (postings stay metadata-free
    * and facet-agnostic): eligible ids arrive as one narrow
    * (doc_id + facet columns) scan, semi-joined against the PRUNED
    * postings rows BEFORE scoring, so df is the facet-eligible document
    * frequency ([[searchExcluding]]'s discipline) and the facet scan is
    * the only corpus-wide read — one projected column pass, no text.
    * Corpus constants N/dltot stay global via [[statsFor]]. */
  def searchFiltered(spark: SparkSession, dir: String, terms: Seq[String],
                     facet: org.apache.spark.sql.Column,
                     k: Int = 10): DataFrame = {
    val canon = terms.map(canonicalTerm).filter(_.nonEmpty)
    require(canon.nonEmpty, "searchFiltered needs at least one query term")
    val eligible = graft.sources.Tables.documents(spark, dir)
      .filter(facet).select("doc_id")
    bm25FromPostings(
      postingsFor(spark, dir).filter(col("term").isin(canon: _*))
        .join(eligible, Seq("doc_id"), "left_semi"),
      statsFor(spark, dir), k)
  }

  /** Top-k BM25 over `terms` EXCLUDING documents that contain any of
    * `not` (boolean NOT — completes the boolean surface next to
    * [[searchAll]]'s AND, [[searchBm25]]'s ranked OR, phrase and NEAR).
    * Both sides are bucket-pruned point reads of the SAME postings
    * table: the exclusion list's postings are a per-term slice of
    * ≤ df(t) bare doc_ids — broadcast anti-joined against the scored
    * rows BEFORE scoring, so df is the eligible-document frequency and
    * ranks are exactly BM25 over the admissible sub-corpus's hits
    * (corpus constants N/dltot stay global via [[statsFor]]). Never a
    * corpus scan, never a join against the full postings relation. */
  def searchExcluding(spark: SparkSession, dir: String, terms: Seq[String],
                      not: Seq[String], k: Int = 10): DataFrame = {
    val canon = terms.map(canonicalTerm).filter(_.nonEmpty).distinct
    val canonNot = not.map(canonicalTerm).filter(_.nonEmpty).distinct
    require(canon.nonEmpty, "searchExcluding needs at least one query term")
    require(canonNot.nonEmpty,
      "searchExcluding needs at least one excluded term (use searchBm25)")
    val post = postingsFor(spark, dir)
    val banned = broadcast(
      post.filter(col("term").isin(canonNot: _*)).select("doc_id").distinct())
    bm25FromPostings(
      post.filter(col("term").isin(canon: _*))
        .join(banned, Seq("doc_id"), "left_anti"),
      statsFor(spark, dir), k)
  }

  /** Top-k documents containing an exact PHRASE (consecutive tokens),
    * served from the pruned positional scan. The occurrence join is pure
    * equi-joins: an occurrence starts at `s` iff term_i sits at `s + i`
    * for every i, so each phrase term's rows project (doc_id,
    * pos − i AS start) and the i relations intersect on (doc_id, start)
    * — no inequality condition, every join co-partitions on the same
    * key. Ranked by occurrence count (doc_id ties), top-k via
    * orderBy+limit (TakeOrderedAndProject). */
  def searchPhrase(spark: SparkSession, dir: String, phrase: Seq[String],
                   k: Int = 10): DataFrame = {
    // a phrase term that canonicalizes away (punctuation-only) has no
    // position in the canonical token stream — reject, don't shift
    val canon = phrase.map(canonicalTerm)
    require(canon.size >= 2 && canon.forall(_.nonEmpty),
      "a phrase needs at least two non-empty canonical terms")
    phraseFromPositions(
      positionsFor(spark, dir)
        .filter(col("term").isin(canon.distinct: _*)),
      canon, k)
  }

  /** THE phrase-match tail — shared by [[searchPhrase]] and the
    * index-free replay. `pos` holds positional rows covering (at least)
    * the phrase terms. */
  def phraseFromPositions(pos: DataFrame, phrase: Seq[String],
                          k: Int): DataFrame = {
    val rels = phrase.zipWithIndex.map { case (t, i) =>
      pos.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).cast("long").as("start"))
    }
    val occ = rels.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
    val ranked = occ.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_occ"),
        min("start").cast("long").as("first_pos"))
      .orderBy(col("n_occ").desc, col("doc_id").asc)
      .limit(k)
    val w = Window.orderBy(col("n_occ").desc, col("doc_id").asc)
    ranked.withColumn("rank", row_number().over(w).cast("long"))
      .select("doc_id", "n_occ", "first_pos", "rank")
  }

  /** Top-k documents where `second` follows `first` within `slop`
    * tokens (ordered proximity — the NEAR operator). Served from the
    * pruned positional scan like [[searchPhrase]]. */
  def searchNear(spark: SparkSession, dir: String, first: String,
                 second: String, slop: Int, k: Int = 10): DataFrame = {
    require(slop >= 1, "slop must be at least 1 (slop = 1 is the phrase case)")
    val (a, b) = (canonicalTerm(first), canonicalTerm(second))
    require(a.nonEmpty && b.nonEmpty, "NEAR needs two non-empty canonical terms")
    nearFromPositions(
      positionsFor(spark, dir)
        .filter(col("term").isin(Seq(a, b).distinct: _*)),
      a, b, slop, k)
  }

  /** THE proximity tail — an inequality-free formulation: "b within
    * (a.pos, a.pos + slop]" is the UNION over d = 1..slop of the exact
    * equi-join on (doc_id, a.pos = b.pos − d), so every join
    * co-partitions on the same key and no range join appears at any
    * scale (slop is a small query constant, not data-dependent). An
    * anchor occurrence counts once however many b's land in its window
    * (the distinct). */
  def nearFromPositions(pos: DataFrame, first: String, second: String,
                        slop: Int, k: Int): DataFrame = {
    val a = pos.filter(col("term") === first)
      .select(col("doc_id"), col("pos").as("apos"))
    val b = pos.filter(col("term") === second)
      .select(col("doc_id"), col("pos").as("bpos"))
    val occ = (1 to slop).map { d =>
      a.join(b.select(col("doc_id"), (col("bpos") - d).as("apos")),
          Seq("doc_id", "apos"))
        .select(col("doc_id"), col("apos"))
    }.reduce(_ unionByName _).distinct()
    val ranked = occ.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_near"),
        min("apos").cast("long").as("first_pos"))
      .orderBy(col("n_near").desc, col("doc_id").asc)
      .limit(k)
    val w = Window.orderBy(col("n_near").desc, col("doc_id").asc)
    ranked.withColumn("rank", row_number().over(w).cast("long"))
      .select("doc_id", "n_near", "first_pos", "rank")
  }
}
