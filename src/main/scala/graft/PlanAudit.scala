package graft
import org.apache.spark.sql.SparkSession
/** Prints formatted physical plans for representative queries — the
  * plan-shape audit behind SCALE.md. Run: sbt "runMain graft.PlanAudit" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    // q_decontaminate / q_dedup_ngram_jaccard / q_text_fluency are audited
    // for the round-3 invariant: NO broadcast of a corpus-derived relation
    // (only the eval-gram set, small by construction, may broadcast).
    val interesting = Seq("q_source_scan", "q_tpch_pricing", "q_join_brand_volume",
      "q_topk_orders", "q_window_count_hourly", "q_sim_topk",
      "q_sim_ann_lsh", "q_sim_ivf", "q_asof_last_purchase",
      "q_keyed_count_salted", "q_range_join_bands", "q_curation_pipeline",
      "q_decontaminate", "q_dedup_ngram_jaccard", "q_text_fluency",
      "q_corpus_dedup_full", "q_dedup_substring", "q_zorder_key",
      "q_sim_ivf_indexed", "q_sim_ann_lsh_multiprobe", "q_sim_ivf_pq",
      "q_sim_ivf_pq_rerank", "q_sim_ivf_pq_trained", "q_sim_ivf_pq_indexed",
      "q_text_lm_bigram",
      // round-10: the component-map serving twin (bucketed index side —
      // the doc_id join must not exchange the stored table) and the
      // survivor-selection window (high-cardinality partition key)
      "q_split_leakage_safe_indexed", "q_dedup_keep_best",
      // round-11: the bloom prefilter must appear as a plain Filter over
      // the scan (plan-constant bits, no exchange before the verify join);
      // the semantic serving twin's blocked self-join reads the
      // cell-bucketed cells table; the shard manifest rides the
      // regime-dispatched packing assignment
      "q_decontaminate_bloom", "q_dedup_semantic_indexed", "q_export_shards",
      // round-11 (late): BM25 doc search must show TakeOrderedAndProject
      // over the bucket-pruned postings scan (pins in InvertedIndexSpec);
      // cluster-balanced sampling must show the heap aggregate (partial
      // per map partition), never a rank window over K tiny partitions
      "q_search_bm25", "q_sample_cluster_balanced",
      // round-13: the boolean-NOT's exclusion must be a broadcast
      // anti-join over the pruned postings point read; the faceted
      // search's facet side one narrow column scan semi-joined before
      // scoring; the deleted ANN twin's tombstone filter a broadcast
      // anti-join on the index side; recall@5's overlap a semi join on
      // 16-byte id pairs
      "q_search_not", "q_search_filtered", "q_sim_ivf_deleted",
      "q_ann_recall",
      // round-15: the batched-fuzzy serve must show the pruned postings
      // point read (literal IN over the union of expansions) with the
      // tiny (qterm, term) mapping broadcast — never a postings-side
      // exchange — and the per-qterm rank window AFTER the aggregate
      "q_search_fuzzy_batch")
    interesting.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(s, dir).explain("formatted")
    }
    // Second pass with size-based auto-broadcast OFF: any BroadcastExchange
    // still present comes from an explicit hint. The rule: a hint is legal
    // ONLY on a relation bounded by construction or contract — the eval
    // gram set (q_decontaminate), ANN query sets (user's query batch),
    // TPC-H dimension tables, and the per-block count aggregate
    // (q_dedup_embedding: #blocks rows, low-cardinality blockCol by
    // contract). CORPUS-sized relations (contaminated ids, gram df, term
    // tf, dropped-id sets) must flow through shuffled joins and show NO
    // BroadcastExchange here. (The first pass MAY broadcast them at tiny
    // SF: that is Catalyst's statistics-based choice, which reverts to
    // shuffle joins at real sizes — the defect was the unconditional
    // hint, now gone.)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // q_dedup_substring_removal joins its corpus-derived covered-set back
    // by doc_id — that join must show NO BroadcastExchange here; the ANN
    // serving/multiprobe queries may broadcast ONLY their query sets
    // q_text_lm_bigram's bigram/unigram count relations are
    // corpus-vocabulary-sized: both joins must show NO BroadcastExchange
    // here (only the 1-row V aggregate may)
    // q_decontaminate_bloom may broadcast ONLY the eval-gram verify
    // relation (the q_decontaminate rule); its bloom bits are a plan
    // constant, not a relation, so they never appear as an exchange
    // q_curation_funnel's near-dup dropped-id set and q_text_collocations'
    // vocab-sized count relations are corpus-derived: both must show NO
    // BroadcastExchange here (no hints anywhere in their trees)
    Seq("q_decontaminate", "q_dedup_ngram_jaccard", "q_text_fluency",
        "q_corpus_dedup_full", "q_text_tfidf", "q_dedup_embedding",
        "q_corpus_dedup_verified", "q_mix_sources",
        "q_dedup_substring", "q_boilerplate_spans",
        "q_dedup_substring_removal", "q_text_lm_bigram",
        "q_decontaminate_bloom", "q_curation_funnel",
        "q_text_collocations").foreach { name =>
      println(s"========== $name (auto-broadcast disabled: hints only) ==========")
      SparkEntry.queries(name)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
