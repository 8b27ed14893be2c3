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
