package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * Scores are computed in double precision with a fixed left-to-right fold,
  * so results are bit-identical to a sequential engine's loop — which makes
  * top-k ranks deterministic and oracle-comparable.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the candidate table — one scan, no shuffle until the per-query
  * top-k, which is a bounded heap per partition via window rank over
  * (query, score). The LSH path (see [[SimilarityLSH]]) buckets candidates
  * by random-hyperplane signatures so each query only scores its bucket.
  */
object Similarity {

  /** Sequential-fold dot product (double accumulation, left to right),
    * compiled to a primitive codegen loop — see
    * [[graft.functions.expressions.DotProduct]]. Bit-identical to the
    * `aggregate(zip_with(...))` fold it replaces. */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.dot_native(a, b)

  /** Cosine similarity, computed as dot/(sqrt(dot_aa * dot_bb)) in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Brute-force cosine top-k: for each row of `queries`, the `k` highest-
    * scoring rows of `candidates` (ties broken by candidate id ascending).
    * `queries` is broadcast — the candidate scan never shuffles its vectors
    * — and the per-query top-k runs as the bounded-heap
    * [[graft.functions.expressions.TopKByScore]] aggregate: each map task
    * keeps at most k entries per query, so the shuffle carries
    * #queries x k heap entries instead of every scored candidate (the
    * window-rank formulation would shuffle all #candidates x #queries
    * scored rows to the rank stage).
    *
    * `carryQ`/`carryC` project extra columns (prefixed `q_`/`c_`) into
    * the scored pairs and `pairFilter` prunes pairs BEFORE scoring — the
    * hard-negative-mining hook (filter runs at the scan, so excluded
    * pairs never pay the dot product and never enter a heap).
    */
  def topK(queries: DataFrame, candidates: DataFrame, k: Int,
           idColQ: String = "vec_id", idColC: String = "vec_id",
           vecCol: String = "embedding",
           carryQ: Seq[String] = Nil, carryC: Seq[String] = Nil,
           pairFilter: Column = lit(true)): DataFrame = {
    val q = broadcast(queries.select(
      col(idColQ).as("query_id") +: col(vecCol).as("q_vec") +:
        carryQ.map(n => col(n).as(s"q_$n")): _*))
    val c = candidates.select(
      col(idColC).as("neighbor_id") +: col(vecCol).as("c_vec") +:
        carryC.map(n => col(n).as(s"c_$n")): _*)
    val scored = c.crossJoin(q)
      .filter(pairFilter)
      .withColumn("score", cosine(col("q_vec"), col("c_vec")))
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.expressions.TopKAggregate
        .top_k(col("score"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("neighbor_id"),
              (col("pos") + 1).cast("long").as("rank"), col("entry.score").as("score"))
  }
}
