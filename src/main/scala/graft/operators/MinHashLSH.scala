package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._

/** MinHash + banded LSH near-duplicate candidate generation — the standard
  * scale path for corpus dedup (shingle → minhash signature → band → bucket
  * join), built entirely from codegen'd column functions over the portable
  * 60-bit hash so the whole pipeline is oracle-checkable.
  *
  * Scale design (100 TB): per document the signature is `numBands * rowsPerBand`
  * longs — constant size regardless of document length — computed in ONE
  * aggregation over the exploded (doc, shingle) pairs (single shuffle keyed
  * by doc_id). Candidate generation joins on (band index, band key): only
  * documents agreeing on an entire band ever meet, so the join's fan-in per
  * bucket is the collision count, not the corpus size. A hot bucket (all-
  * identical boilerplate docs) is the residual skew risk — mitigate upstream
  * with exact-dup removal first (q_dedup_exact), which collapses identical
  * texts before LSH runs.
  */
object MinHashLSH {

  /** The dense-corpus band split the COMPOSED corpus artifacts default to:
    * the same 12 signature minima split 3 bands x 4 rows. Per-band
    * collision probability drops from J^2 to J^4, which ScaleProbe
    * measured as ~4x fewer candidate pairs (>99.9% of which were false
    * positives at x100 under 6x2) at identical signature cost — SCALE.md
    * round-4/5 Finding 1. Single source of truth shared by CorpusOps'
    * dedupedNear/dedupedVerified and the DuckDB oracle CTEs, so the Spark
    * defaults and the oracle SQL can never split differently. The
    * DECLARED knob pair (q_dedup_minhash 6x2 vs q_dedup_minhash_banded
    * 3x4) keeps both operating points measurable side by side. */
  val BandedBands = 3
  val BandedRows = 4

  /** Distinct (doc_id, block, shingle-hash) pairs, hashed IN PLACE by the
    * codegen span kernel (SpanHashesExpression — the round-11 span-family
    * upgrade): no per-shingle HOF dispatch or string allocation, longs
    * through the explode. Distinct-then-hash and hash-then-distinct yield
    * the IDENTICAL gh set (a collision means the same hash value by
    * definition), and everything downstream is min() aggregates —
    * multiplicity-insensitive — so signatures and oracles are unchanged
    * bit for bit. */
  private def shingleHashes(df: DataFrame, idCol: String, textCol: String,
                            blockCol: String, n: Int): DataFrame =
    // Spread.byKey: the shingle+hash stage is the family's dominant map
    // cost and a single-row-group scan would run it on one core — spread
    // the corpus by id first (no-op when the scan is already wide)
    Spread.byKey(df.select(col(idCol).as("doc_id"), col(blockCol).as("block"),
                 col(textCol).as("_text")), "doc_id")
      .select(col("doc_id"), col("block"), split(col("_text"), " ").as("toks"))
      .select(col("doc_id"), col("block"),
        explode(array_distinct(graft.functions.expressions.SpanHash
          .span_hashes(col("toks"), n))).as("h60"))
      .select(col("doc_id"), col("block"), (col("h60") % P).as("gh"))

  /** MinHash signature: k = numBands * rowsPerBand permutation minima,
    * one groupBy. */
  def signatures(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                 n: Int, numBands: Int, rowsPerBand: Int): DataFrame =
    signaturesFromHashes(shingleHashes(df, idCol, textCol, blockCol, n),
      numBands, rowsPerBand)

  /** [[signatures]] from an already-hashed (doc_id, block, gh) frame —
    * for callers that hold exploded shingle hashes already (the
    * ngram-Jaccard guardrail routes its oversized posting lists here
    * without re-shingling). gh must be in [0, P). */
  def signaturesFromHashes(hashes: DataFrame,
                           numBands: Int, rowsPerBand: Int): DataFrame = {
    val k = numBands * rowsPerBand
    val sigCols = (0 until k).map { i =>
      val (a, b) = perm(i)
      min((col("gh") * a + b) % P).as(s"sig_$i")
    }
    hashes.groupBy(col("doc_id"), col("block"))
      .agg(sigCols.head, sigCols.tail: _*)
  }

  /** Per-ROW MinHash signature as one array column — the narrow,
    * shuffle-free form of [[signatures]] for STREAMING input (a streaming
    * groupBy would be a stateful aggregate; here the minimum folds inside
    * the row, so the expression is legal in any append-mode stream and
    * costs zero state). Same shingle construction, portable hash, and
    * permutation family as the batch pipeline — StreamingMinHashDedupSpec
    * asserts bit-equality against [[signatures]].
    * Documents with fewer than `n` tokens have NO shingles — every
    * minimum would be null, and every short document would share the one
    * all-null signature (a dedup keyed on it would collapse unrelated
    * short texts). They fall back to the exact content hash instead:
    * near-duplicate is undefined without shingles, so exact identity is
    * the only sound collision criterion there. */
  def rowSignature(text: Column, n: Int = 3,
                   numBands: Int = 6, rowsPerBand: Int = 2): Column = {
    // same codegen span-hash kernel as the batch path (md5 inside the
    // kernel, only the permutation arithmetic left in the lambda); the
    // min over hashes is set-equal to the min over hashed shingle strings
    val grams = graft.functions.expressions.SpanHash
      .span_hashes(split(text, " "), n)
    val k = numBands * rowsPerBand
    val sig = array((0 until k).map { i =>
      val (a, b) = perm(i)
      array_min(transform(grams, h => (h % P * a + b) % P))
    }: _*)
    val exact = array((0 until k).map(_ => hash60(text) % P): _*)
    when(size(split(text, " ")) >= n, sig).otherwise(exact)
  }

  /** A signatures frame (doc_id, block, sig_0..sig_{k-1}) exploded to its
    * banded form (doc_id, block, band, key) — the join-ready shape a
    * production pipeline MATERIALIZES (e.g. as a table bucketed by `key`):
    * pay shingle+signature once, run every downstream candidate join from
    * the store.
    *
    * Band keys: rowsPerBand=2 packs arithmetically as sig0*P + sig1 (fits
    * int64: P^2 < 2^62 — and replays exactly in the DuckDB oracle); wider
    * bands hash the row values together (hash60 of the joined string) —
    * an equi-join key needs uniqueness, not reversibility. Wider bands
    * are the dense-corpus knob: the candidate S-curve P(pair) =
    * 1-(1-J^r)^b steepens with r, so background-similarity pairs (J~0.05
    * on a dense-vocabulary corpus) stop colliding — the scale probe
    * measures the (b=6,r=2) -> (b=3,r=4) false-positive collapse. */
  def banded(sigs: DataFrame, numBands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val bandKeys: Column = array((0 until numBands).map { j =>
      if (rowsPerBand == 2)
        col(s"sig_${2 * j}") * P + col(s"sig_${2 * j + 1}")
      else
        hash60(concat_ws("_",
          (0 until rowsPerBand).map(i => col(s"sig_${rowsPerBand * j + i}")): _*))
    }: _*)
    sigs.select(col("doc_id"), col("block"),
      posexplode(bandKeys).as(Seq("band", "key")))
  }

  /** Candidate pairs from an already-banded frame (see [[banded]]):
    * the band-bucket self-join alone, no signature recompute. */
  def candidatesFromBanded(bandedSigs: DataFrame): DataFrame =
    bandedSigs.as("a")
      .join(bandedSigs.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

  /** Candidate near-duplicate pairs: documents sharing at least one full
    * band. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     blockCol: String, n: Int = 3,
                     numBands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val sigs = signatures(df, idCol, textCol, blockCol, n, numBands, rowsPerBand)
    // NOT persisted: the self-join's sides are identical subplans and
    // Spark's ReusedExchange computes the signature shuffle once — caching
    // here was measured to defeat that reuse (1.4s -> 2.6s at sf0.1)
    candidatesFromBanded(banded(sigs, numBands, rowsPerBand))
  }
}
