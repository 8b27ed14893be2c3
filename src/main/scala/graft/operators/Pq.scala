package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{PqExpressions, TopKAggregate}
import graft.operators.{KMeans => KM}

/** Product quantization over the embedding column — the COMPRESSION layer
  * of the ANN stack (Jegou et al. 2011), composed with the IVF coarse
  * index into IVFADC, the standard billion-scale serving shape:
  *
  *   coarse cell (IVF) -> ADC shortlist from 8-byte codes -> exact re-rank
  *
  * Scale story (the reason this exists at 100 TB): [[SimilarityIVF]]'s
  * probe join still moves every candidate's full vector (512 bytes) into the
  * scoring stage. Here the candidate side of the join carries ONLY
  * (neighbor_id, cell, 8 int codes) — the 64-dim float payload never
  * crosses the shuffle, a 64x reduction of the per-candidate bytes, and
  * the re-rank stage re-reads true vectors for just #queries x R rows by
  * id. Codebooks are hash-derived constants (same md5-label device as the
  * LSH planes / IVF centroids), so every stage replays value-exactly in
  * the DuckDB oracle.
  *
  * Subspace geometry: Dim=64 split into M=8 subspaces of SubDim=8, C=16
  * codes per subspace (4-bit codes; 8 codes = 64 bits per vector).
  */
object Pq {

  val M = 8
  val SubDim = 8   // M * SubDim == SimilarityIVF.Dim
  val C = 16       // codes per subspace

  /** Code vector weight — label family "pq{m}_{c}_{d}", disjoint from the
    * "hp" (LSH) and "ivf" (coarse centroid) families. */
  def codeWeight(m: Int, c: Int, d: Int): Double =
    graft.functions.PortableHash.labelWeight(s"pq${m}_${c}_$d")

  /** The M x C x SubDim hash-seeded codebook — deterministic, so
    * encode/ADC replay in SQL. [[trainCodebook]] refines it with
    * per-subspace k-means; every plan shape below is codebook-agnostic. */
  def codebook: Array[Array[Array[Double]]] =
    Array.tabulate(M, C, SubDim)(codeWeight)

  /** Round budget of [[trainCodebook]] — same discipline as
    * [[KMeans.MaxIters]]: past the fixpoint a round is the identity, so an
    * oracle that unrolls exactly TrainIters rounds computes the same
    * codebook regardless of which round Spark stopped at. */
  val TrainIters = 3

  /** Per-subspace Lloyd's k-means over the M subvector slices — the
    * training step that turns the hash-seeded codebook into a data-adapted
    * one (Jegou et al. 2011 train sub-quantizers exactly this way; on the
    * clustered recall fixture ADC-only recall@5 rises 0.20 -> see
    * AnnRecallSpec). All M subspaces train TOGETHER in one job per round:
    * assignment is the [[graft.functions.expressions.PqEncode]] kernel
    * itself (argmin squared-L2, lower-code tie-break — training and
    * serving cannot drift), exploded to (m, code, d, x) rows, then one
    * (m, code, d)-keyed fixed-point-exact mean (the [[KMeans]] device:
    * scale 2^40, truncate to long, sum through decimal — order-independent
    * and bit-replayable in DuckDB). Only M*C*SubDim = 1024 aggregated
    * values reach the driver per round; empty codes keep their previous
    * codeword. */
  def trainCodebook(vectors: DataFrame, vecCol: String = "embedding",
                    maxIters: Int = TrainIters): Array[Array[Array[Double]]] = {
    // Spread: the per-round encode/explode/partial-agg ran as one task
    // over a single row-group fixture (the KMeans.train finding); decimal
    // sums are order-independent, so round-robin is sound. No-op on wide
    // scans.
    val spread = Spread.any(vectors)
    var cb = codebook
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val stats = spread
        .select(posexplode(PqExpressions.pq_encode(col(vecCol), cb)).as(Seq("m", "code")),
                col(vecCol).as("v"))
        .select(col("m"), col("code"),
                posexplode(slice(col("v"), col("m") * SubDim + lit(1), lit(SubDim))).as(Seq("d", "x")))
        .groupBy("m", "code", "d")
        .agg(sum((col("x").cast("double") * KM.Scale).cast("long")
               .cast("decimal(38,0)")).as("s"),
             count(lit(1)).as("n"))
        .collect()
      val next = cb.map(_.map(_.clone))
      stats.foreach { r =>
        val m = r.getInt(0); val c = r.getInt(1); val d = r.getInt(2)
        next(m)(c)(d) = r.getDecimal(3).doubleValue() / KM.Scale / r.getLong(4).toDouble
      }
      converged = cb.indices.forall(m => cb(m).indices.forall(c =>
        next(m)(c).sameElements(cb(m)(c))))
      cb = next
      iter += 1
    }
    cb
  }

  /** Coarse-cell residual of every vector — the SINGLE projection both
    * training and serving encode from (so the two cannot drift): the input
    * columns minus `vecCol`, plus (cell, res) where res = v - cents[cell]
    * through the codegen [[graft.functions.expressions.CentroidResidual]]. */
  private def residualFrame(vectors: DataFrame, vecCol: String,
                            cents: Array[Array[Double]]): DataFrame =
    vectors
      .withColumn("cell", SimilarityIVF.cell(col(vecCol), cents))
      .withColumn("res", graft.functions.expressions.VectorExpressions
        .centroid_residual(col(vecCol), col("cell"), cents))
      .drop(vecCol)

  /** Residual-PQ training (IVFADC proper): per-subspace k-means over the
    * coarse-quantization residuals v - cents[cell(v)] instead of the raw
    * vectors. Residual magnitudes are a fraction of the originals', so C
    * codes per subspace quantize far more finely — this is where the ADC
    * recall gain comes from (flat training on raw vectors measured ~zero
    * gain at 4-bit codes; AnnRecallSpec has both numbers). */
  def trainResidualCodebook(vectors: DataFrame, vecCol: String = "embedding",
                            maxIters: Int = TrainIters,
                            cents: Array[Array[Double]] = SimilarityIVF.hashCentroids)
      : Array[Array[Array[Double]]] =
    // spread BEFORE the residual projection: cell argmax + subtraction
    // otherwise collapse into the scan-side project under trainCodebook's
    // exchange and run on one core per round (q_dedup_semantic's rule)
    trainCodebook(
      residualFrame(Spread.any(vectors.select(col(vecCol))), vecCol, cents),
      "res", maxIters)

  /** [[trainResidualCodebook]] memoized by fixture — same lifecycle as
    * [[KMeans.trainForFixture]]: one training run per immutable parquet
    * fixture serves Verify and every query; Bench clears between runs so a
    * query declared to include training keeps paying it. The coarse
    * centroids are the fixture's k-means model (itself memoized), so the
    * two stages of the trained index always agree — a caller cannot pair
    * this codebook with mismatched cells. */
  private val models =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Array[Array[Array[Double]]]]()

  def clearModels(): Unit = models.clear()

  /** Evict ONE fixture's memoized codebook ([[KMeans.clearModel]]'s
    * twin — the retrain hook for content-replacing rebuilds). */
  def clearModel(sfDir: String): Unit =
    models.keySet.removeIf(_._1 == sfDir)

  def trainResidualForFixture(vectors: DataFrame, sfDir: String,
                              vecCol: String = "embedding",
                              maxIters: Int = TrainIters): Array[Array[Array[Double]]] =
    models.computeIfAbsent((sfDir, vecCol, maxIters),
      _ => trainResidualCodebook(vectors, vecCol, maxIters,
        KMeans.trainForFixture(vectors, sfDir, vecCol)))

  /** IVFADC top-k: candidates in the query's NProbe coarse cells, ranked
    * by ADC score computed from codes alone. Query side carries its
    * M x C lookup table (built once per query); candidate side carries
    * codes, never vectors. Output (query_id, neighbor_id, rank). */
  def ivfAdcTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                 idColQ: String = "vec_id", idColC: String = "vec_id",
                 vecCol: String = "embedding",
                 cb: Array[Array[Array[Double]]] = codebook): DataFrame = {
    val q = broadcast(queries
      .select(col(idColQ).as("query_id"),
              PqExpressions.pq_lut(col(vecCol), cb).as("lut"),
              explode(SimilarityIVF.probeCells(col(vecCol))).as("cell")))
    val c = candidates
      .select(col(idColC).as("neighbor_id"),
              SimilarityIVF.cell(col(vecCol)).as("cell"),
              PqExpressions.pq_encode(col(vecCol), cb).as("codes"))
    topKTail(c.join(q, Seq("cell"))
      .withColumn("score", PqExpressions.pq_adc(col("lut"), col("codes"))), k)
  }

  /** Shared rank tail: bounded-heap top-k of `score` per query, exploded
    * to (query_id, neighbor_id, rank). */
  private[operators] def topKTail(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(TopKAggregate.top_k(col("score"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("neighbor_id"),
              (col("pos") + 1).cast("long").as("rank"))

  /** Residual IVFADC top-k (the full Jegou et al. construction):
    * candidates carry codes of their RESIDUAL v - cents[cell]; the ADC
    * score adds the coarse term back from the probe side —
    * score = dot(q, cents[cell]) + sum_m lut(m)(codes(m)) — so the
    * approximation error is only the residual's quantization error, not
    * the whole vector's. Same join/payload shape as [[ivfAdcTopK]]: the
    * per-candidate payload is still (id, cell, M codes). */
  def ivfAdcResidualTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                         cb: Array[Array[Array[Double]]],
                         idColQ: String = "vec_id", idColC: String = "vec_id",
                         vecCol: String = "embedding",
                         cents: Array[Array[Double]] = SimilarityIVF.hashCentroids)
      : DataFrame = {
    val q = broadcast(queries
      .select(col(idColQ).as("query_id"),
              PqExpressions.pq_lut(col(vecCol), cb).as("lut"),
              explode(SimilarityIVF.probeCellsWithDot(col(vecCol), cents)).as("pc"))
      .select(col("query_id"), col("lut"),
              col("pc.cell").as("cell"), col("pc.cdot").as("cdot")))
    val c = residualFrame(candidates.select(col(idColC), col(vecCol)), vecCol, cents)
      .select(col(idColC).as("neighbor_id"), col("cell"),
              PqExpressions.pq_encode(col("res"), cb).as("codes"))
    topKTail(c.join(q, Seq("cell"))
      .withColumn("score",
        col("cdot") + PqExpressions.pq_adc(col("lut"), col("codes"))), k)
  }

  /** The full IVFADC serving funnel: ADC shortlist of R per query, then
    * exact-cosine re-rank of the shortlist to top-k. The re-rank join
    * fetches true vectors for only #queries x R candidate ids — the
    * shortlist (not the corpus) is the broadcast side — so the exact
    * arithmetic runs on a constant-bounded row set however large the
    * candidate corpus is. Output (query_id, neighbor_id, rank). */
  def ivfAdcRerank(queries: DataFrame, candidates: DataFrame,
                   k: Int, r: Int,
                   idColQ: String = "vec_id", idColC: String = "vec_id",
                   vecCol: String = "embedding",
                   cb: Array[Array[Array[Double]]] = codebook): DataFrame =
    exactRerank(queries, candidates,
      ivfAdcTopK(queries, candidates, r, idColQ, idColC, vecCol, cb),
      k, idColQ, idColC, vecCol, vecCol)

  /** [[ivfAdcRerank]] with the residual-ADC shortlist — the serving
    * funnel a trained deployment runs. */
  def ivfAdcResidualRerank(queries: DataFrame, candidates: DataFrame,
                           k: Int, r: Int, cb: Array[Array[Array[Double]]],
                           idColQ: String = "vec_id", idColC: String = "vec_id",
                           vecCol: String = "embedding",
                           cents: Array[Array[Double]] = SimilarityIVF.hashCentroids)
      : DataFrame =
    exactRerank(queries, candidates,
      ivfAdcResidualTopK(queries, candidates, r, cb, idColQ, idColC, vecCol, cents),
      k, idColQ, idColC, vecCol, vecCol)

  /** Exact-cosine re-rank of a shortlist to top-k. The re-rank join
    * fetches true vectors for only #queries x R shortlisted ids — the
    * shortlist (not the corpus) is the broadcast side — so the exact
    * arithmetic runs on a constant-bounded row set however large the
    * candidate corpus is. */
  private[operators] def exactRerank(queries: DataFrame, candidates: DataFrame,
                                     shortlist: DataFrame, k: Int,
                                     idColQ: String, idColC: String,
                                     vecColQ: String, vecColC: String): DataFrame = {
    val cand = candidates
      .select(col(idColC).as("neighbor_id"), col(vecColC).as("c_vec"))
    val qv = broadcast(queries
      .select(col(idColQ).as("query_id"), col(vecColQ).as("q_vec")))
    topKTail(
      cand.join(broadcast(shortlist.select(col("query_id"), col("neighbor_id"))),
          Seq("neighbor_id"))
        .join(qv, Seq("query_id"))
        .withColumn("score", Similarity.cosine(col("q_vec"), col("c_vec"))), k)
  }
}
