package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fluent corpus-pipeline API — the document-side counterpart of
  * [[EventTimeOps]]'s implicit class: a user composes the training-data
  * verbs (quality gate → dedup → analyze) as method chains instead of
  * assembling operator calls by hand. Every verb delegates to the same
  * declarative operators the declared queries use, so chains inherit their
  * plan shapes (narrow quality/analysis stages at the scan, content-keyed
  * dedup shuffle) unchanged.
  *
  * Example — the q_curation_pipeline query as a chain:
  * {{{
  *   docs.qualityFiltered().dedupedExact().tokenBudget("lang")
  * }}}
  */
object CorpusOps {

  /** The standard curation gate — single source of truth for the
    * thresholds used by qualityFiltered, q_curation_pipeline and the
    * streaming curation spec. */
  val MinTokens = 20
  val MaxTokens = 90
  val MinDistinctRatio = 0.2

  /** The composed corpus artifacts (dedupedNear / dedupedVerified) default
    * to the dense-corpus banded split — at 100 TB the 6x2 split's
    * candidate count grows ~n^2 with >99.9% false positives (measured,
    * SCALE.md Finding 1), so the pipeline shape a user ships must not. */
  private val BandedBands = MinHashLSH.BandedBands
  private val BandedRows = MinHashLSH.BandedRows

  /** Largest-group row count at which [[DocumentCorpus.packedBinsAuto]]
    * switches from the window form to the distributed prefix sum — the
    * crossover SCALE.md measured (window form still faster at x1000's
    * 2M-row largest group; serialization risk dominates well before
    * 100 TB). */
  val PackWindowMaxGroupRows = 10_000_000L

  /** Diagnostic only: which branch the most recent packedBinsAuto on
    * this driver dispatched to ("window" | "scalable") — read by the
    * scale probe and the branch-pinning spec, never by query semantics. */
  @volatile var lastPackDispatch: String = ""

  implicit class DocumentCorpus(private val df: DataFrame) extends AnyVal {

    /** Append token-count/quality columns (narrow, codegen'd). */
    def withTextStats(textCol: String = "text"): DataFrame =
      df.withColumn("n_tokens", TextFunctions.nTokens(col(textCol)))
        .withColumn("distinct_ratio",
          TextFunctions.nDistinctTokens(col(textCol)).cast("double") /
            col("n_tokens"))

    /** Keep documents passing the standard curation gate. */
    def qualityFiltered(minTokens: Int = MinTokens, maxTokens: Int = MaxTokens,
                        minDistinctRatio: Double = MinDistinctRatio,
                        textCol: String = "text"): DataFrame = {
      val t = TextFunctions.nTokens(col(textCol))
      df.filter(t.between(minTokens, maxTokens) &&
        (TextFunctions.nDistinctTokens(col(textCol)).cast("double") / t) >=
          minDistinctRatio)
    }

    /** One row per distinct text; all non-text columns taken from the
      * min-id row (deterministic survivor). */
    def dedupedExact(idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
      val others = df.columns.filter(_ != textCol).toSeq
      df.groupBy(col(textCol))
        .agg(min(struct(col(idCol) +: others.filter(_ != idCol).map(col): _*)).as("_c"))
        .select(col(textCol) +: others.map(c => col(s"_c.$c").as(c)): _*)
    }

    /** Per-group document and token budget — the curation report. */
    def tokenBudget(groupCol: String, textCol: String = "text"): DataFrame =
      df.groupBy(groupCol)
        .agg(count(lit(1)).as("n_docs"),
             sum(TextFunctions.nTokens(col(textCol)).cast("long")).as("total_tokens"))

    /** Append the codegen rolling-hash fingerprint. */
    def fingerprinted(textCol: String = "text"): DataFrame =
      df.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))

    /** PII-style scrub: redact every `pattern` match with `token` and
      * count the redactions (q_text_redact's semantics as a chain verb).
      * Narrow, codegen'd, runs at the scan. */
    def redacted(pattern: String = "[0-9]+", token: String = "<NUM>",
                 textCol: String = "text"): DataFrame =
      df.withColumn("n_redactions",
          size(regexp_extract_all(col(textCol), lit(pattern), lit(0))).cast("long"))
        .withColumn("redacted_text", regexp_replace(col(textCol), pattern, token))

    /** Fixed-size training-sequence chunks with overlap: one row per
      * (doc, chunk) carrying the chunk's token count — the declared
      * q_text_chunks shape as a chain verb. */
    def chunked(chunkTokens: Int = 32, stride: Int = 24,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      df.select(col(idCol), split(col(textCol), " ").as("_toks"))
        .select(col(idCol), col("_toks"),
          explode(sequence(lit(0),
            greatest(size(col("_toks")) - 1, lit(0)), lit(stride))).as("_start"))
        .filter(col("_start") < size(col("_toks")))
        .select(col(idCol),
          (col("_start") / stride).cast("long").as("chunk_idx"),
          size(slice(col("_toks"), col("_start") + 1, lit(chunkTokens)))
            .cast("long").as("n_chunk_tokens"))

    /** Greedy fixed-budget bin packing per group (q_pack_bins as a verb):
      * deterministic bin ids from a per-group running token count.
      * `tokenCount` selects the budget currency — whitespace tokens by
      * default, real BPE tokens via BpeCountExpression.bpe_count (what an
      * actual 2048-token training bin means). */
    def packedBins(groupCol: String, binTokens: Int = 2048,
                   idCol: String = "doc_id", textCol: String = "text",
                   tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                     TextFunctions.nTokens): DataFrame =
      df.select(col(idCol), col(groupCol),
          tokenCount(col(textCol)).as("n_tokens"))
        .withColumn("_cum_before",
          coalesce(sum(col("n_tokens")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col(groupCol)).orderBy(col(idCol).asc)
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
            lit(0L)))
        .select(col(idCol), col(groupCol),
          col("n_tokens").cast("long").as("n_tokens"),
          floor(col("_cum_before") / binTokens).cast("long").as("bin_id"))

    /** [[packedBins]] with the per-group window cumsum replaced by a
      * DISTRIBUTED PREFIX SUM — identical output (same oracle), scalable
      * shape. The plain form's `Window.partitionBy(group)` routes every
      * row of a group through ONE task: at 100 TB with ~40% of the corpus
      * in one language, that is a single-task serialization of 40 TB.
      * Here instead:
      *
      *  1. slice the id domain into `parts` ranges whose BOUNDARIES are
      *     plan CONSTANTS (one bounded approx-quantile action at
      *     construction — ~parts doubles to the driver, like the KMeans
      *     centroid reads), so the slice id is a pure codegen projection
      *     and every branch below sees the identical slicing with no
      *     materialization pinning;
      *  2. aggregate per-(group, slice) token totals — a
      *     #slices x #groups relation, tiny by construction;
      *  3. window the TINY relation into per-(group, slice) prefix
      *     offsets (safe: one row per slice, not per doc) and
      *     broadcast-join them back;
      *  4. local cumsum within each (group, slice) (window keyed by both:
      *     every task processes only its slice of one group, all slices
      *     in parallel) + offset = the exact global cumsum. The totals
      *     aggregate and the local window hash-partition on the SAME
      *     (group, slice) key, so the exchange is computed once and
      *     reused (plan-visible as ReusedExchange).
      *
      * Prefix-sum associativity makes the result independent of where the
      * quantile boundaries fall (balance is all they affect), so
      * determinism comes from the (group, id) total order alone — the
      * same contract the plain form documents. CorpusOpsSpec pins
      * scalable == plain on a many-partition frame; the declared query
      * pair shares one DuckDB oracle. */
    def packedBinsScalable(groupCol: String, binTokens: Int = 2048,
                           idCol: String = "doc_id", textCol: String = "text",
                           tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                             TextFunctions.nTokens,
                           numPartitions: Int = 0): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val parts =
        if (numPartitions > 0) numPartitions
        else df.sparkSession.sessionState.conf.numShufflePartitions
      // interior quantiles of the id domain as plan literals; dedup
      // (quantiles repeat on skewed domains) keeps the CASE chain minimal
      val bounds = df.stat
        .approxQuantile(idCol, (1 until parts).map(_.toDouble / parts).toArray, 0.001)
        .distinct.sorted
      val pid = bounds.zipWithIndex.reverse
        .foldLeft(lit(bounds.length): org.apache.spark.sql.Column) {
          case (acc, (b, i)) => when(col(idCol) <= b, lit(i)).otherwise(acc)
        }
      val base = df.select(col(idCol), col(groupCol),
          tokenCount(col(textCol)).as("n_tokens"))
        .withColumn("_pid", pid)
      val offsets = base.groupBy(col(groupCol), col("_pid"))
        .agg(sum(col("n_tokens")).as("_part_tokens"))
        .withColumn("_offset",
          coalesce(sum(col("_part_tokens")).over(
            Window.partitionBy(col(groupCol)).orderBy(col("_pid").asc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(groupCol), col("_pid"), col("_offset"))
      base
        .withColumn("_local_before",
          coalesce(sum(col("n_tokens")).over(
            Window.partitionBy(col(groupCol), col("_pid"))
              .orderBy(col(idCol).asc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .join(broadcast(offsets), Seq(groupCol, "_pid"))
        .select(col(idCol), col(groupCol),
          col("n_tokens").cast("long").as("n_tokens"),
          floor((col("_offset") + col("_local_before")) / binTokens)
            .cast("long").as("bin_id"))
    }

    /** REGIME-DISPATCHED packing: [[packedBins]] (per-group window
      * cumsum) below the measured crossover, [[packedBinsScalable]]
      * (distributed prefix sum) above it — the two forms compute the
      * IDENTICAL assignment (spec-pinned, shared oracle), so the only
      * question is constants, and SCALE.md measured the answer: the
      * window form wins up to ~10M-row groups on raw constants (a 2M-row
      * serial sort is ~1 s at x1000, under the scalable form's extra
      * full-data exchange + broadcast join), while beyond the boundary
      * the per-group window is a single-task serialization (40 TB of
      * English through one thread at corpus scale). The dispatch signal
      * is the LARGEST group's row count — exactly the quantity the
      * window form serializes — read by one map-side-combined aggregate
      * at construction (a bounded driver read, the approx-quantile /
      * KMeans-centroid rule; its cost is one narrow pass over two
      * columns, repaid many times over at sf-bench scale where the
      * window branch saves the scalable form's constant factor). */
    def packedBinsAuto(groupCol: String, binTokens: Int = 2048,
                       idCol: String = "doc_id", textCol: String = "text",
                       tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                         TextFunctions.nTokens,
                       maxWindowGroupRows: Long = PackWindowMaxGroupRows): DataFrame = {
      val maxGroup = Option(
          df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
            .agg(max(col("n"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      lastPackDispatch =
        if (maxGroup <= maxWindowGroupRows) "window" else "scalable"
      if (maxGroup <= maxWindowGroupRows)
        packedBins(groupCol, binTokens, idCol, textCol, tokenCount)
      else
        packedBinsScalable(groupCol, binTokens, idCol, textCol, tokenCount)
    }

    /** MinHash-LSH near-dup candidate pairs (see [[MinHashLSH]]). The band
      * split is a pass-through knob; the composed corpus artifacts run the
      * banded 3x4 split (see [[dedupedNear]]). */
    def minhashCandidates(idCol: String = "doc_id", textCol: String = "text",
                          blockCol: String = "lang",
                          numBands: Int = 6, rowsPerBand: Int = 2): DataFrame =
      MinHashLSH.candidatePairs(df, idCol, textCol, blockCol,
        numBands = numBands, rowsPerBand = rowsPerBand)

    /** Near-dup clusters: candidate pairs → connected components →
      * (id, component_id) with the min id as canonical. Defaults to the
      * banded 3x4 split like the rest of the composed corpus family
      * (q_dedup_components, [[dedupedNear]], [[dedupedVerified]]). */
    def dedupClusters(idCol: String = "doc_id", textCol: String = "text",
                      blockCol: String = "lang",
                      numBands: Int = BandedBands,
                      rowsPerBand: Int = BandedRows): DataFrame =
      ConnectedComponents.components(
        minhashCandidates(idCol, textCol, blockCol, numBands, rowsPerBand),
        "id_a", "id_b")

    /** Near-dup-REMOVED corpus — the artifact a training pipeline ships:
      * every document outside any duplicate cluster, plus the min-id
      * (canonical) survivor of each cluster. The dropped-id set is
      * corpus-derived, so the anti join SHUFFLES on the id — a broadcast
      * here would collect an unbounded fraction of the corpus to the
      * driver (same rule as eval-set decontamination). */
    def dedupedNear(idCol: String = "doc_id", textCol: String = "text",
                    blockCol: String = "lang",
                    numBands: Int = BandedBands,
                    rowsPerBand: Int = BandedRows): DataFrame = {
      val dropped = dedupClusters(idCol, textCol, blockCol, numBands, rowsPerBand)
        .filter(col("id") =!= col("component_id"))
        .select(col("id").as(idCol))
      df.join(dropped, Seq(idCol), "left_anti")
    }

    /** Near-dup-removed corpus over VERIFIED edges: exact dedup first,
      * then LSH candidates verified with exact n-gram Jaccard BEFORE
      * clustering (Dedup.dedupPipeline). An LSH false positive costs one
      * array_intersect but can never merge unrelated documents — the
      * production shape on dense corpora, where banding alone leaves a
      * superlinear raw-candidate count and unverified clustering would
      * chain those false positives into giant components (measured:
      * SCALE.md round-4 exponents). Exact-duplicate non-canonicals are
      * dropped too (the pipeline clusters the canonical set), so the
      * output is the full shippable corpus. Both drop sets are
      * corpus-derived: semi/anti joins shuffle on the 8-byte id. */
    def dedupedVerified(idCol: String = "doc_id", textCol: String = "text",
                        blockCol: String = "lang",
                        threshold: Double = 0.4,
                        numBands: Int = BandedBands,
                        rowsPerBand: Int = BandedRows): DataFrame = {
      // computed ONCE and shared by the pipeline (signatures + gram sets)
      // and the survivor semi-join — the text-keyed canonical shuffle is
      // the expensive aggregate here, so it must not run twice
      val canonical = CacheScope.track(
        Dedup.canonicalByText(df, idCol, textCol, blockCol).persist())
      val verified = Dedup.dedupPipelineFrom(canonical, threshold = threshold,
        numBands = numBands, rowsPerBand = rowsPerBand)
      val droppedNear = ConnectedComponents
        .components(verified.select("id_a", "id_b"), "id_a", "id_b")
        .filter(col("id") =!= col("component_id"))
        .select(col("id").as(idCol))
      df.join(canonical.select(col("doc_id").as(idCol)), Seq(idCol), "left_semi")
        .join(droppedNear, Seq(idCol), "left_anti")
    }
  }
}
