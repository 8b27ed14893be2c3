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
  * Distribution shape (the part that matters at 100 TB): training runs
  * over the DISTINCT pre-token dictionary with frequencies — one
  * corpus-sized aggregate up front, then every round touches only the
  * dictionary (bounded by vocabulary, not corpus). Each round is one
  * map-side-combined pair-count aggregate + an argmax of which ONLY ONE
  * ROW reaches the driver (the model state, like KMeans' centroids), and
  * a narrow string-replace projection applies the merge. Per-round state
  * is localCheckpointed so lineage stays flat (the ConnectedComponents
  * discipline) and the superseded round is released immediately.
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

  /** Learn `numMerges` merge rules from `df`'s `textCol`. Returns the
    * trained table: (merge_rank, lhs, rhs, cnt) in rank order, where
    * lhs/rhs are symbol SURFACES (base chars or concatenations of earlier
    * outputs — the [[graft.functions.Bpe.RuleSurfaces]] form). */
  def train(df: DataFrame, textCol: String,
            numMerges: Int = NumMerges): DataFrame = {
    val spark = df.sparkSession

    // corpus -> pre-token frequency dictionary (the ONE corpus-sized pass)
    val dict = df
      .select(explode(regexp_extract_all(
        col(textCol), lit(graft.functions.Bpe.PreTokenRegex), lit(0))).as("pt"))
      .filter(!col("pt").contains("|"))
      .groupBy("pt").agg(count(lit(1)).as("freq"))

    // state: each pre-token as a '|'-wrapped symbol string
    var state = dict.select(col("freq"),
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
}
