package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Recall of the two ANN scale paths against brute force — approximate
  * operators need a measured quality bound, not just oracle agreement
  * with their own replica. Isotropic synthetic vectors are the worst case
  * for both (no cluster structure to exploit), so these floors are
  * conservative. */
class AnnRecallSpec extends SparkSpec {

  // brute-force ground truth computed once, shared by both recall tests
  private lazy val truth: Set[(Long, Long)] = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.topK(
        e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def recallAt5(ann: org.apache.spark.sql.DataFrame): Double = {
    val got = ann.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (got intersect truth).size.toDouble / truth.size
  }

  test("hyperplane-LSH ANN recall@5 stays above the isotropic floor") {
    val s = spark
    val e = Tables.embeddings(s, sfDir)
    val r = recallAt5(SimilarityLSH.annTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5))
    info(f"LSH recall@5 = $r%.2f")
    assert(r >= 0.2, f"LSH recall collapsed: $r%.2f")
  }

  test("k-means-trained IVF materially beats hash centroids on clustered data") {
    val s = spark
    import s.implicits._
    // 8 deterministic clusters (portable-hash pseudo-randoms): 320
    // candidates + 10 queries, each a center plus noise. The noise scale
    // matters: tight clusters sit entirely inside ANY cell partition (even
    // hash centroids score perfect recall), so the clusters are made
    // diffuse enough to straddle arbitrary cell boundaries while cluster
    // mates remain each point's true nearest neighbors — the regime where
    // centroid PLACEMENT is what recall depends on.
    def prand(seed: String): Double = graft.functions.PortableHash.labelWeight(seed)
    val dim = SimilarityIVF.Dim
    val centers = Array.tabulate(8, dim)((c, d) => prand(s"kmc${c}_$d"))
    def point(family: String, i: Int): Array[Float] = {
      val c = i % 8
      Array.tabulate(dim)(d => (centers(c)(d) + 0.55 * prand(s"$family${i}_$d")).toFloat)
    }
    val rows = (0 until 10).map(i => (i.toLong, point("kmq", i))) ++
      (0 until 320).map(i => (i + 100L, point("kmn", i)))
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 10)
    val cands = df.filter(col("vec_id") >= 10)
    val truth = Similarity.topK(queries, cands, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = ann.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect truth).size.toDouble / truth.size
    }
    val rHash = recall(SimilarityIVF.ivfTopK(queries, cands, k = 5))
    val trained = KMeans.train(df)
    val rTrained = recall(SimilarityIVF.ivfTopK(queries, cands, k = 5, cents = trained))
    info(f"IVF recall@5: hash centroids $rHash%.2f -> k-means $rTrained%.2f")
    assert(rTrained >= rHash + 0.15,
      f"training did not materially improve recall: $rHash%.2f -> $rTrained%.2f")
    assert(rTrained >= 0.5, f"trained recall too low: $rTrained%.2f")
  }

  test("IVF ANN recall@5 stays above the NProbe/K floor") {
    val s = spark
    val e = Tables.embeddings(s, sfDir)
    val r = recallAt5(SimilarityIVF.ivfTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5))
    info(f"IVF recall@5 = $r%.2f")
    // NProbe/K = 2/16 of the corpus scanned; random-centroid floor ~ that
    assert(r >= 0.1, f"IVF recall collapsed: $r%.2f")
  }
}
