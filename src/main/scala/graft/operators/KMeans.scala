package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the training step that turns
  * [[SimilarityIVF]]'s hash-seeded coarse cells into data-adapted ones
  * (the standard IVF quality upgrade: recall at fixed NProbe/K tracks how
  * well the centroids match the data distribution).
  *
  * Engine-portable determinism (what makes a TRAINED index exactly
  * oracle-checkable, which off-the-shelf k-means is not):
  *  - seeding is the deterministic hash-centroid matrix, not a random
  *    sample;
  *  - the centroid update is the fixed-point exact mean (scale by 2^40 —
  *    an exact FP multiply — truncate to long, sum longs, divide back):
  *    the sum is ORDER-INDEPENDENT, so the result doesn't depend on
  *    partitioning, and every step replays bit-identically in DuckDB
  *    (the q_embed_centroid device);
  *  - assignment uses the same left-fold dot and (dot DESC, cell ASC)
  *    tie-break as the query path;
  *  - the loop runs at most [[MaxIters]] rounds with an exact-fixpoint
  *    early stop. Past the fixpoint a Lloyd's round is the identity, so
  *    an oracle that unrolls exactly MaxIters rounds computes the same
  *    centroids regardless of which round Spark stopped at.
  *
  * Scale: each round is one narrow assignment scan (K codegen dot
  * products per row against centroid LITERALS — no join, no broadcast
  * exchange) plus one (cell, dim)-keyed aggregation of K*Dim cells.
  * Only the K*Dim aggregated sums (model state, ~1024 values) ever reach
  * the driver; the per-round plan is FLAT — each round re-derives
  * assignment from the base frame with new literals, so lineage does not
  * grow and no per-round checkpoint is needed (unlike label propagation,
  * where round r's frame feeds round r+1).
  */
object KMeans {

  /** Fixed round budget. Lloyd's converges fast from any seed on coarse
    * quantizers (K cells, not fine codebooks); 3 rounds captures most of
    * the recall gain and bounds both the training cost and the oracle's
    * unrolled replay. */
  val MaxIters = 3

  /** 2^40 — the fixed-point scale of the exact mean (quantization 2^-40,
    * far below float32 input precision). */
  val Scale = 1099511627776.0

  /** Model memo keyed by the FIXTURE (sfDir, vecCol, maxIters): the
    * training data is an immutable parquet fixture, so one Lloyd's run per
    * fixture serves every consumer — Verify's oracle-validity guard,
    * q_dedup_semantic, q_sim_ivf_kmeans, and the persisted-index build all
    * train on the same frame, and without the memo a verify run paid the
    * identical training three times (round-4 ADVICE). Bench calls
    * [[clearModels]] in its per-run hygiene instead: a benchmark run of a
    * query DECLARED to include training must keep paying it. */
  private val models =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Array[Array[Double]]]()

  def clearModels(): Unit = models.clear()

  /** Evict ONE fixture's memoized model — the retrain hook: a rebuild
    * over replaced corpus content must not reuse centroids trained on
    * the old content (the memo keys on the dir, not the data). */
  def clearModel(sfDir: String): Unit =
    models.keySet.removeIf(_._1 == sfDir)

  /** [[train]] memoized by fixture directory — callers whose vectors come
    * straight from `Tables.embeddings(s, sfDir)` use this. */
  def trainForFixture(vectors: DataFrame, sfDir: String,
                      vecCol: String = "embedding",
                      maxIters: Int = MaxIters): Array[Array[Double]] =
    models.computeIfAbsent((sfDir, vecCol, maxIters),
      _ => train(vectors, vecCol, maxIters))

  /** Train centroids on `vectors`' `vecCol` from the hash seed; returns
    * the trained matrix (K x Dim). Dimensions with no assigned vectors
    * keep their previous centroid. */
  def train(vectors: DataFrame, vecCol: String = "embedding",
            maxIters: Int = MaxIters): Array[Array[Double]] = {
    // Spread: the per-round assignment scan (K dots + posexplode +
    // partial agg) ran as ONE ~520 ms task per round over a single
    // row-group fixture (measured; 3 rounds = 1.6 s of q_sim_ivf_kmeans's
    // 2.6 s) — round-robin is sound here because the decimal sums are
    // order-independent by design. No-op on wide scans.
    val spread = Spread.any(vectors)
    var cents = SimilarityIVF.hashCentroids
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val stats = spread
        .select(SimilarityIVF.cell(col(vecCol), cents).as("cell"),
                posexplode(col(vecCol)).as(Seq("dd", "x")))
        .groupBy("cell", "dd")
        // per-element longs summed through decimal(38,0) — the same
        // q_embed_centroid idiom: matches DuckDB's HUGEINT widening
        // exactly and cannot wrap even at 1e10 vectors per cell (a raw
        // long sum overflows at ~8e6 rows of |x|~1, i.e. one hot cell
        // of a billion-vector corpus)
        .agg(sum((col("x").cast("double") * Scale).cast("long")
               .cast("decimal(38,0)")).as("s"),
             count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone)
      stats.foreach { r =>
        val cell = r.getInt(0); val dd = r.getInt(1)
        // decimal -> double rounds to nearest, identical to DuckDB's
        // CAST(sum AS DOUBLE)
        next(cell)(dd) = r.getDecimal(2).doubleValue() / Scale / r.getLong(3).toDouble
      }
      converged = next.zip(cents).forall { case (a, b) => a.sameElements(b) }
      cents = next
      iter += 1
    }
    cents
  }
}
