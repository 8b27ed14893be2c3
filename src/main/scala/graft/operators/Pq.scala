package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{PqExpressions, TopKAggregate}

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

  /** The M x C x SubDim codebook — deterministic, so encode/ADC replay in
    * SQL. A production deployment would train per-subspace k-means (the
    * [[KMeans]] machinery applies per subspace unchanged); every plan
    * shape below is codebook-agnostic. */
  def codebook: Array[Array[Array[Double]]] =
    Array.tabulate(M, C, SubDim)(codeWeight)

  /** IVFADC top-k: candidates in the query's NProbe coarse cells, ranked
    * by ADC score computed from codes alone. Query side carries its
    * M x C lookup table (built once per query); candidate side carries
    * codes, never vectors. Output (query_id, neighbor_id, rank). */
  def ivfAdcTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                 idColQ: String = "vec_id", idColC: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val cb = codebook
    val q = broadcast(queries
      .select(col(idColQ).as("query_id"),
              PqExpressions.pq_lut(col(vecCol), cb).as("lut"),
              explode(SimilarityIVF.probeCells(col(vecCol))).as("cell")))
    val c = candidates
      .select(col(idColC).as("neighbor_id"),
              SimilarityIVF.cell(col(vecCol)).as("cell"),
              PqExpressions.pq_encode(col(vecCol), cb).as("codes"))
    c.join(q, Seq("cell"))
      .withColumn("score", PqExpressions.pq_adc(col("lut"), col("codes")))
      .groupBy(col("query_id"))
      .agg(TopKAggregate.top_k(col("score"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("neighbor_id"),
              (col("pos") + 1).cast("long").as("rank"))
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
                   vecCol: String = "embedding"): DataFrame = {
    val shortlist = ivfAdcTopK(queries, candidates, r, idColQ, idColC, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val cand = candidates
      .select(col(idColC).as("neighbor_id"), col(vecCol).as("c_vec"))
    val qv = broadcast(queries
      .select(col(idColQ).as("query_id"), col(vecCol).as("q_vec")))
    cand.join(broadcast(shortlist), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("score", Similarity.cosine(col("q_vec"), col("c_vec")))
      .groupBy(col("query_id"))
      .agg(TopKAggregate.top_k(col("score"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("neighbor_id"),
              (col("pos") + 1).cast("long").as("rank"))
  }
}
