package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-table TRAINING — the other half of the tokenization story
  * beside [[graft.functions.Bpe]] (which APPLIES a table): learn the
  * merge rules from the corpus itself, the way real tokenizers are built
  * (Sennrich et al. 2016). Each round counts adjacent symbol pairs over
  * the pre-token frequency dictionary weighted by frequency, merges the
  * most frequent pair everywhere, and records it; the recorded (rank,
  * lhs, rhs) list IS the trained vocabulary. The output table satisfies
  * the hierarchical invariant Bpe checks at class load (every rule's
  * sides are base chars or earlier outputs) BY CONSTRUCTION of the
  * algorithm.
  *
  * TWO formulations, one answer (spec-pinned equal on the fixture):
  *
  *  - [[train]]: fully distributed rounds — one pair-count aggregate +
  *    one-row argmax to the driver per merge. Transparent and
  *    oracle-shaped, but the ROUND COUNT is its scale ceiling: a real
  *    30k-merge vocabulary means 30k sequential Spark jobs,
  *    scheduler-bound for hours regardless of data size.
  *  - [[trainScalable]]: the production shape (what HuggingFace
  *    tokenizers / SentencePiece do). The merge LOOP is inherently
  *    sequential — merge r+1's argmax depends on merge r — but it only
  *    ever reads the pre-token frequency DICTIONARY, which is
  *    vocabulary-sized model state (Heaps' law: ~n^0.5–0.8 distinct
  *    words), not corpus-sized data. So: ONE corpus-sized Spark
  *    aggregate builds the dictionary, a BOUNDED top-frequency slice of
  *    it is collected (the centroid/codebook rule — the cap is an
  *    explicit parameter, and dropping sub-cap-rare pre-tokens is the
  *    standard `min_frequency` practice of every real trainer), and the
  *    merge loop runs driver-locally with incrementally-maintained pair
  *    counts: 1 Spark job total, then microseconds per merge. Below the
  *    cap it is BIT-IDENTICAL to [[train]] (same argmax, same
  *    tie-break, same leftmost merge) — which is why the declared
  *    q_bpe_train_scalable shares q_bpe_train's DuckDB oracle.
  *
  * Why not batched top-m merges per round (the other textbook scaling):
  * MEASURED divergence, not taste. Selecting m symbol-disjoint pairs
  * from one aggregate and applying them together diverged from
  * sequential training at merge rank 2 on the sf0.001 fixture
  * (sequential re-ranks `(o,r)` above the batch's later picks after
  * merging `(e,r)` — the mid-batch re-rank batching cannot see), so
  * batched-BPE can never share the sequential oracle. The dictionary
  * trainer gets a larger round-count reduction (to 1) with zero
  * approximation below the cap. See SCALE.md "BPE training rounds".
  *
  * Engine portability (what makes TRAINING oracle-checkable): the merge
  * state is a plain string of '|'-wrapped symbols ("|t||h||e|"), so
  * applying a merge is `replace(st, '|l||r|', '|lr|')` — leftmost,
  * non-overlapping, IDENTICAL semantics in Spark and DuckDB — and pair
  * counting is a split + adjacent zip both engines express. Ties break
  * (count DESC, lhs ASC, rhs ASC): binary string order in both engines.
  * Pre-tokens containing the separator '|' are excluded from training on
  * both sides (they're in the "other runs" punctuation class; a trained
  * tokenizer dropping pathological tokens is standard practice).
  */
object BpeTrain {

  /** Fixed round budget: bounds the training cost and the oracle's
    * unrolled replay (the q_sim_ivf_kmeans device). 24 merges is enough
    * to reach multi-character subwords on the fixture corpus. */
  val NumMerges = 24

  /** Dictionary cap for [[trainScalable]]: the driver reads at most this
    * many (pre-token, freq) rows — top by frequency, the ones that
    * decide every early merge. 4M entries ≈ a few hundred MB of strings,
    * the same order as the persisted ANN codebooks; real web-scale
    * vocabularies fit (trainers cap harder via min_frequency). */
  val DefaultMaxDictEntries = 4_000_000

  /** Corpus → pre-token frequency dictionary (the ONE corpus-sized pass,
    * map-side-combined; shared by both trainers). */
  private def dictionary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(
        col(textCol), lit(graft.functions.Bpe.PreTokenRegex), lit(0))).as("pt"))
      .filter(!col("pt").contains("|"))
      .groupBy("pt").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` merge rules from `df`'s `textCol`, one distributed
    * round per merge. Returns the trained table: (merge_rank, lhs, rhs,
    * cnt) in rank order, where lhs/rhs are symbol SURFACES (base chars or
    * concatenations of earlier outputs — the
    * [[graft.functions.Bpe.RuleSurfaces]] form). */
  def train(df: DataFrame, textCol: String,
            numMerges: Int = NumMerges): DataFrame = {
    val spark = df.sparkSession

    // state: each pre-token as a '|'-wrapped symbol string
    var state = dictionary(df, textCol).select(col("freq"),
        concat(lit("|"), array_join(split(col("pt"), ""), "||"), lit("|")).as("st"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      // syms materialized as its own projection (the HOF rule — see
      // Dedup.shinglesFromTokens): the adjacent-pair transform references
      // an attribute, not a recomputed split
      val syms = state.select(col("freq"),
        split(col("st").substr(lit(2), length(col("st")) - 2), "\\|\\|").as("syms"))
      val best = syms
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
                      element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum("freq").as("cnt"))
        // deterministic argmax: one row of model state to the driver
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, rr, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, l, rr, cnt))
        // apply the merge everywhere: leftmost non-overlapping replace —
        // same overlap resolution as Bpe.bpeCount's leftmost-first loop
        val next = state.withColumn("st",
            replace(col("st"), lit("|" + l + "||" + rr + "|"),
              lit("|" + l + rr + "|")))
          .localCheckpoint(true)
        CacheScope.release(state)
        state = next
      }
      r += 1
    }
    CacheScope.release(state)

    import spark.implicits._
    merges.result().toDF("merge_rank", "lhs", "rhs", "cnt")
  }

  /** [[train]] in the production shape: ONE Spark job (the dictionary
    * aggregate + a bounded top-`maxDictEntries` collect), then the merge
    * loop driver-local with incremental pair-count maintenance —
    * microseconds per merge instead of a scheduler round-trip, which is
    * what makes a real 30k–100k-merge vocabulary trainable. Bit-identical
    * to [[train]] whenever the dictionary fits the cap (spec-pinned on
    * the fixture; the declared twin shares the sequential oracle). */
  def trainScalable(df: DataFrame, textCol: String,
                    numMerges: Int = NumMerges,
                    maxDictEntries: Int = DefaultMaxDictEntries): DataFrame = {
    val spark = df.sparkSession
    // bounded driver read, deterministic under the cap: top by frequency,
    // pre-token ASC tie-break (sub-cap-rare pre-tokens are what real
    // trainers drop via min_frequency)
    val dictRows = dictionary(df, textCol)
      .orderBy(col("freq").desc, col("pt").asc)
      .limit(maxDictEntries)
      .collect()
    val dict = dictRows.map(r => (r.getString(0), r.getLong(1)))
    val merges = trainOnDict(dict, numMerges)
    import spark.implicits._
    merges.toDF("merge_rank", "lhs", "rhs", "cnt")
  }

  /** The in-memory merge loop over a (pre-token, freq) dictionary —
    * exactly [[train]]'s per-round semantics (argmax over
    * frequency-weighted adjacent pair counts with the (cnt DESC, lhs ASC,
    * rhs ASC) tie-break; merge-all leftmost non-overlapping), with pair
    * counts maintained INCREMENTALLY: each merge re-scans only the words
    * containing the merged pair (a pair → word-ids index), so cost per
    * merge is proportional to the pair's support, not the dictionary. */
  def trainOnDict(dict: Seq[(String, Long)],
                  numMerges: Int): Seq[(Long, String, String, Long)] = {
    // words as mutable symbol vectors + parallel freq array
    val words = dict.map(_._1.map(_.toString).toArray).toArray
    val freqs = dict.map(_._2).toArray

    // pair -> global weighted count, and pair -> ids of words containing it
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val index = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val w = words(wi); val f = freqs(wi) * sign
      var i = 0
      while (i < w.length - 1) {
        val k = (w(i), w(i + 1))
        val c = counts.getOrElse(k, 0L) + f
        if (c == 0L) counts.remove(k) else counts(k) = c
        if (sign > 0)
          index.getOrElseUpdate(k, scala.collection.mutable.HashSet.empty) += wi
        i += 1
      }
      // on removal the index entries are left stale on purpose: a stale
      // word id is re-checked against the live pair at merge time
    }
    words.indices.foreach(addWord(_, 1L))

    val out = Seq.newBuilder[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      if (counts.isEmpty) done = true
      else {
        // argmax with the engine tie-break; the scan is over the live
        // pair map (vocabulary-alphabet-sized, tiny next to the words)
        var bestK: (String, String) = null
        var bestC = Long.MinValue
        counts.foreach { case (k, c) =>
          if (c > bestC || (c == bestC &&
              (k._1 < bestK._1 || (k._1 == bestK._1 && k._2 < bestK._2)))) {
            bestK = k; bestC = c
          }
        }
        val (l, rr) = bestK
        out += ((r.toLong, l, rr, bestC))
        val merged = l + rr
        // rewrite ONLY the words that contain the pair (leftmost
        // non-overlapping, same as the engines' replace), updating counts
        // by remove-old/add-new — the incremental step
        val touched = index.getOrElse(bestK, scala.collection.mutable.HashSet.empty)
        touched.foreach { wi =>
          val w = words(wi)
          var has = false
          var i = 0
          while (!has && i < w.length - 1) {
            if (w(i) == l && w(i + 1) == rr) has = true
            i += 1
          }
          if (has) { // stale index entries skip here
            addWord(wi, -1L)
            val b = Array.newBuilder[String]
            var j = 0
            while (j < w.length) {
              if (j < w.length - 1 && w(j) == l && w(j + 1) == rr) {
                b += merged; j += 2
              } else { b += w(j); j += 1 }
            }
            words(wi) = b.result()
            addWord(wi, 1L)
          }
        }
        index.remove(bestK)
        counts.remove(bestK) // fully consumed by the rewrite, but a
        // freq-0 word could leave a zero entry; drop defensively
      }
      r += 1
    }
    out.result()
  }
}
