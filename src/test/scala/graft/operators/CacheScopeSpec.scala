package graft.operators

import graft.{SparkEntry, SparkSpec}

/** The loan pattern must actually close the loop: after an action inside
  * withOperatorCaches, NO operator-internal materialization may survive —
  * neither CacheManager entries (persist) nor persistent RDDs
  * (localCheckpoint storage, which `catalog.clearCache()` cannot free).
  * These four queries cover every operator family that materializes
  * internally: ngram base grams, pipeline shingle sets, SimHash chunks,
  * and ConnectedComponents' per-round + final label checkpoints. */
class CacheScopeSpec extends SparkSpec {

  test("operator-internal caches are fully released after the action") {
    val s = spark
    // the session is shared across suites — start from a clean slate and
    // compare against a snapshot rather than asserting global emptiness
    s.catalog.clearCache()
    CacheScope.releaseAll()
    val before = s.sparkContext.getPersistentRDDs.keySet
    for (name <- Seq("q_dedup_ngram_jaccard", "q_dedup_pipeline",
                     "q_dedup_simhash", "q_dedup_components")) {
      CacheScope.withOperatorCaches {
        SparkEntry.queries(name)(s, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      assert(s.sharedState.cacheManager.isEmpty,
        s"$name left cached plans in the CacheManager")
      val leaked = s.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$name left persistent RDDs: $leaked")
    }
  }
}
