package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Block-size guardrail for embedding near-dup (Dedup.embeddingNearDups):
  * small blocks get exact all-pairs; blocks beyond maxBlockSize route
  * through hyperplane-LSH buckets so the quadratic join never materializes
  * for them. */
class EmbeddingGuardSpec extends SparkSpec {

  // Block of 6: two identical +1 vectors and four identical -1 vectors.
  // v and -v land in complementary buckets in EVERY hash table (all plane
  // dots flip sign and none is 0), so cross-sign pairs are never LSH
  // candidates — which makes candidate pruning observable.
  private def fixture = {
    val s = spark
    import s.implicits._
    val plus = Array.fill(SimilarityLSH.Dim)(1.0f)
    val minus = Array.fill(SimilarityLSH.Dim)(-1.0f)
    (Seq(1L, 2L).map(i => (i, "big", plus)) ++
     Seq(3L, 4L, 5L, 6L).map(i => (i, "big", minus)))
      .toDF("vec_id", "label", "embedding")
  }

  test("small blocks use exact all-pairs (guardrail off below threshold)") {
    val all = Dedup.embeddingNearDups(fixture, "vec_id", "embedding", "label",
      threshold = -1.0, maxBlockSize = 100)
    // all 15 pairs of the 6-vector block survive threshold -1
    assert(all.count() == 15L)
  }

  test("oversized blocks route through LSH buckets — no all-pairs join") {
    val guarded = Dedup.embeddingNearDups(fixture, "vec_id", "embedding", "label",
      threshold = -1.0, maxBlockSize = 4)
    val pairs = guarded.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // within-sign pairs (true near-dups, cosine 1.0) are all found:
    // identical vectors share every bucket
    assert(pairs.contains((1L, 2L)))
    Seq((3L, 4L), (3L, 5L), (3L, 6L), (4L, 5L), (4L, 6L), (5L, 6L))
      .foreach(p => assert(pairs.contains(p), s"missing within-sign pair $p"))
    // cross-sign pairs never share a bucket: candidate generation pruned
    // them — 7 pairs, not the all-pairs 15. (This count IS the routing
    // proof: the all-pairs branch would have returned all 15 pairs at
    // threshold -1, so only the bucket join can explain the pruning.)
    assert(pairs.size == 7, s"expected bucket-pruned candidates, got $pairs")
  }

  test("every sf fixture stays under the exact-path guardrail " +
       "(q_dedup_embedding oracle validity)") {
    // the declared query's exact all-pairs oracle is only valid while
    // every block takes the exact path; this assertion derives from the
    // SAME constant the operator defaults to, so a regenerated fixture
    // with an oversized block fails HERE instead of silently flipping the
    // query to approximate LSH results (round-2 ADVICE). Checked against
    // all three fixture scales; a missing fixture dir is a test error.
    val s = spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val maxBlock = graft.sources.Tables.embeddings(s, s"/root/testdata/$sf")
        .groupBy("label").count().agg(max("count")).head().getLong(0)
      assert(maxBlock <= Dedup.DefaultMaxBlockSize,
        s"$sf: a block has $maxBlock rows > guardrail " +
          s"${Dedup.DefaultMaxBlockSize} — q_dedup_embedding would route " +
          "through LSH and diverge from its exact oracle")
    }
  }

  test("trained k-means cells stay under the guardrail on every sf fixture " +
       "(q_dedup_semantic oracle validity)") {
    // q_dedup_semantic blocks by TRAINED cell id instead of the label
    // column; its exact within-cell oracle carries the same validity
    // condition — the hottest cell must stay on the exact path. Trained
    // centroids adapt to the data, so cell occupancy is data-dependent:
    // assert it from the same constant, per fixture.
    val s = spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = graft.sources.Tables.embeddings(s, s"/root/testdata/$sf")
      val cents = KMeans.train(e)
      val maxCell = e
        .select(SimilarityIVF.cell(col("embedding"), cents).as("cell"))
        .groupBy("cell").count().agg(max("count")).head().getLong(0)
      assert(maxCell <= Dedup.DefaultMaxBlockSize,
        s"$sf: hottest trained cell has $maxCell rows > guardrail " +
          s"${Dedup.DefaultMaxBlockSize} — q_dedup_semantic would route " +
          "through LSH and diverge from its exact oracle")
    }
  }
}
