package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for approximate nearest neighbors over embedding
  * columns — the scale path beside [[Similarity.topK]]'s brute force.
  *
  * Hyperplane weights are derived from the portable md5 hash of
  * "hp<i>_<dim>" labels, so the (deterministic, seedless) planes can be
  * regenerated bit-identically inside DuckDB SQL — even the ANN pipeline is
  * exactly oracle-checkable.
  *
  * Scale design: each vector is scanned once to compute its bucket (narrow,
  * codegen'd); the query side is broadcast; candidates meet only within a
  * bucket, so scoring work per query is the bucket occupancy, not the corpus
  * size. More planes → smaller buckets → lower recall: the standard LSH
  * trade; multi-probe or repeated tables raise recall at known cost.
  */
object SimilarityLSH {

  val Dim = 64
  val NumPlanes = 4
  /** Number of independent hash tables; candidates are the union over
    * tables. Recall on isotropic data ~= 1-(1-2^-NumPlanes)^NumTables;
    * clustered real-world embeddings do far better because true neighbors
    * share sign bits with probability 1-theta/pi per plane. */
  val NumTables = 4

  /** Plane i, dimension d weight in [-1, 1]: (hash60("hp<i>_<d>") % 2001 - 1000)/1000. */
  def planeWeight(i: Int, d: Int): Double =
    graft.functions.PortableHash.labelWeight(s"hp${i}_$d")

  private def planeCol(i: Int): Column =
    array((0 until Dim).map(d => lit(planeWeight(i, d))): _*)

  /** Bucket id within hash table `t`: sign bits of the vector's dot
    * products with planes t*NumPlanes .. t*NumPlanes+NumPlanes-1. */
  def bucket(vec: Column, t: Int): Column =
    (0 until NumPlanes).map { i =>
      val dot = Similarity.dot(vec, planeCol(t * NumPlanes + i))
      when(dot > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (table, bucket) pairs for a vector, one row per hash table. */
  def tableBuckets(vec: Column): Column =
    array((0 until NumTables).map(t =>
      struct(lit(t).as("t"), bucket(vec, t).as("bk"))): _*)

  /** MULTIPROBE (table, bucket) pairs for a QUERY vector: each table's
    * base bucket plus every bucket at Hamming distance 1 (each of the
    * NumPlanes sign bits flipped) — the standard recall knob for
    * hyperplane LSH: a true neighbor that disagrees on exactly one
    * near-boundary plane still meets the query. Query-side only, so the
    * join stays an equi-join on (t, bk) and the CANDIDATE table is never
    * re-bucketed or re-shuffled; probe cost is (1 + NumPlanes) x the
    * single-probe query fan-out — (#queries x NumTables x 5) broadcast
    * rows, still query-set-sized. Candidate work grows with the extra
    * buckets actually probed (measured on the clustered fixture in
    * AnnRecallSpec: 2.6x pairs for recall@5 0.84 -> 1.00). */
  def tableBucketsMultiprobe(vec: Column): Column =
    array((for { t <- 0 until NumTables; flip <- 0 to NumPlanes } yield {
      val bk =
        if (flip == 0) bucket(vec, t)
        else bucket(vec, t).bitwiseXOR(lit(1L << (flip - 1)))
      struct(lit(t).as("t"), bk.as("bk"))
    }): _*)

  /** Deepest supported adaptive bucket depth (2^20 buckets per table). */
  val MaxAdaptivePlanes = 20

  /** Plane weights beyond the fixed NumPlanes family: table t's first
    * NumPlanes planes are EXACTLY [[planeWeight]]'s (an adaptive depth of
    * NumPlanes reproduces [[bucket]] bit-for-bit, and the annTopK oracle's
    * labels stay valid); deeper bits draw from a fresh label family. */
  private def deepPlaneCol(t: Int, i: Int): Column =
    if (i < NumPlanes) planeCol(t * NumPlanes + i)
    else array((0 until Dim).map(d =>
      lit(graft.functions.PortableHash.labelWeight(s"hpx${t}_${i}_$d"))): _*)

  /** (table, bucket) pairs at a PER-ROW depth `planes` (a column, clamped
    * [NumPlanes, MaxAdaptivePlanes] by the caller): the adaptive form of
    * [[tableBuckets]] for size-dependent bucketing. Bucket = the first
    * `planes` sign bits packed into a long; rows of the SAME block (same
    * depth) always agree on key layout. Bits at or beyond the depth are
    * gated off BEFORE their dot product runs — `If` branches evaluate
    * lazily in codegen, so a row pays only for the depth its block uses
    * (evaluating all MaxAdaptivePlanes dots and masking afterwards was
    * ~5x the needed bucketing work at the minimum depth). */
  def tableBucketsAdaptive(vec: Column, planes: Column): Column =
    array((0 until NumTables).map { t =>
      val bk = (0 until MaxAdaptivePlanes).map { i =>
        when(lit(i) < planes,
          when(Similarity.dot(vec, deepPlaneCol(t, i)) > 0, shiftleft(lit(1L), i))
            .otherwise(lit(0L)))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("t"), bk.as("bk"))
    }: _*)

  /** ANN top-k: queries meet candidates that share a bucket in ANY of the
    * hash tables (distinct union of per-table collisions), then exact
    * cosine ranks the candidate set. `multiprobe` widens each query to
    * its Hamming-1 bucket neighborhood per table (recall knob — see
    * [[tableBucketsMultiprobe]]). */
  /** `carryQ`/`carryC` project extra columns (prefixed `q_`/`c_`) into
    * the collided pairs and `pairFilter` prunes them before scoring —
    * the ANN form of [[Similarity.topK]]'s hard-negative-mining hook
    * (mining within buckets is how contrastive pipelines find negatives
    * at corpus scale without a full scan per anchor batch). */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              idColQ: String = "vec_id", idColC: String = "vec_id",
              vecCol: String = "embedding",
              multiprobe: Boolean = false,
              carryQ: Seq[String] = Nil, carryC: Seq[String] = Nil,
              pairFilter: Column = lit(true)): DataFrame = {
    val qBuckets =
      if (multiprobe) tableBucketsMultiprobe(col(vecCol))
      else tableBuckets(col(vecCol))
    val q = broadcast(queries
      .select(col(idColQ).as("query_id") +: col(vecCol).as("q_vec") +:
        explode(qBuckets).as("tb") +: carryQ.map(n => col(n).as(s"q_$n")): _*)
      .select(col("query_id") +: col("q_vec") +: col("tb.t").as("t") +:
        col("tb.bk").as("bk") +: carryQ.map(n => col(s"q_$n")): _*))
    val c = candidates
      .select(col(idColC).as("neighbor_id") +: col(vecCol).as("c_vec") +:
        explode(tableBuckets(col(vecCol))).as("tb") +: carryC.map(n => col(n).as(s"c_$n")): _*)
      .select(col("neighbor_id") +: col("c_vec") +: col("tb.t").as("t") +:
        col("tb.bk").as("bk") +: carryC.map(n => col(s"c_$n")): _*)
    // score BEFORE deduplicating multi-table collisions: the distinct then
    // shuffles 24 bytes per pair instead of dragging both 64-float vectors
    // through the exchange as part of the distinct key (scoring a duplicate
    // collision <= NumTables times is cheap codegen work; shuffling its
    // vectors is not).
    c.join(q, Seq("t", "bk"))
      .filter(pairFilter)
      .withColumn("score", Similarity.cosine(col("q_vec"), col("c_vec")))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("score")).as("score"))
      // bounded-heap per-query top-k (same TopKByScore as Similarity.topK):
      // map-side partials keep at most k entries per query, so the rank
      // stage shuffles #queries x k heap entries — the window row_number
      // formulation this replaced shuffled and sorted EVERY candidate pair,
      // which a hot LSH bucket turns into the bottleneck at scale.
      .groupBy(col("query_id"))
      .agg(graft.functions.expressions.TopKAggregate
        .top_k(col("score"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("neighbor_id"),
              (col("pos") + 1).cast("long").as("rank"))
  }
}
