package graft

import graft.SparkSpec

/** Cross-query invariants: independent declared queries must agree on the
  * quantities they share — a second verification layer on top of the
  * per-query DuckDB oracles (two queries can each match their own oracle
  * and still disagree if an oracle encodes the wrong semantics). */
class CrossQueryConsistencySpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("rejection attribution reconciles with the funnel's stage counts") {
    // q_curation_rejections' per-stage rejected counts must equal the
    // consecutive survivor deltas of q_curation_funnel, and 'kept' must
    // equal the final stage — independent derivations of the same funnel
    val rej = graft.operators.CacheScope.withOperatorCaches {
      q("q_curation_rejections").collect()
        .map(r => (r.getLong(0), r.getString(1)))
    }
    val byStage = rej.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val funnel = graft.operators.CacheScope.withOperatorCaches {
      q("q_curation_funnel").collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    assert(rej.map(_._1).distinct.length == rej.length,
      "one attribution row per document")
    assert(rej.length.toLong == funnel(1L), "attribution covers the raw corpus")
    assert(byStage.getOrElse("quality", 0L) == funnel(1L) - funnel(2L))
    assert(byStage.getOrElse("exact_dedup", 0L) == funnel(2L) - funnel(3L))
    assert(byStage.getOrElse("near_dedup", 0L) == funnel(3L) - funnel(4L))
    assert(byStage.getOrElse("kept", 0L) == funnel(4L))
  }

  test("token counts agree between q_text_tokens and q_pack_bins") {
    val fromTokens = q("q_text_tokens").select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromBins = q("q_pack_bins").select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromTokens == fromBins)
  }

  test("chunk geometry follows from each document's token count") {
    val nTok = q("q_text_tokens").select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = q("q_text_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(chunks.keySet == nTok.keySet)
    chunks.foreach { case (doc, cs) =>
      val n = nTok(doc)
      val expected = (0L until n by 24).zipWithIndex
        .map { case (s, i) => (doc, i.toLong, math.min(32L, n - s)) }.toSet
      assert(cs.toSet == expected, s"doc $doc: ${cs.toSet} != $expected")
    }
  }

  test("leakage-safe split: clusters never straddle splits, singletons " +
       "hash independently, and the split partitions the corpus") {
    val split = q("q_split_leakage_safe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val comp = q("q_dedup_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // partition: one row per document, every doc assigned exactly one split
    val total = graft.sources.Tables.documents(spark, sfDir).count()
    assert(split.length.toLong == total)
    assert(split.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // the leakage guard itself: all members of a component carry the
    // component as group_id, hence the SAME split — a per-doc hash split
    // would break this for any cluster whose members hash differently
    val byGroup = split.groupBy(_._2)
    byGroup.foreach { case (g, rows) =>
      assert(rows.map(_._3).toSet.size == 1, s"group $g straddles splits")
    }
    // group ids agree with the components query (singletons = own id)
    split.foreach { case (id, g, _) =>
      assert(g == comp.getOrElse(id, id), s"doc $id group $g vs components")
    }
    // near-dup pairs land in one split (the contamination case in words)
    q("q_dedup_minhash_banded").collect()
      .map(r => (r.getLong(0), r.getLong(1))).foreach { case (a, b) =>
        val sa = split.find(_._1 == a).get._3
        val sb = split.find(_._1 == b).get._3
        assert(sa == sb, s"near-dup pair ($a,$b) split across $sa/$sb")
      }
  }

  test("every document of a near-dup pair resolves into the same component") {
    // q_dedup_components derives clusters from the banded 3x4 candidate
    // split (shared with the composed corpus family), so the pair query it
    // must absorb is the banded one — a 6x2-only pair can legitimately be
    // absent from the banded edge set (the documented recall trade).
    val pairs = q("q_dedup_minhash_banded").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val comp = q("q_dedup_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
    }
  }

  test("window-rank and bounded-heap bottom-k sample the same group sizes") {
    // the two samplers order by different (but equally valid) hash keys, so
    // the SETS may differ — the invariants they must share: same per-group
    // sample size (min(5, group size)) and both subsets of the corpus
    val docs = q("q_text_tokens").select("doc_id").collect().map(_.getLong(0)).toSet
    val a = q("q_sample_bottomk").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = q("q_sample_bottomk_heap").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.map(_._2).groupBy(identity).view.mapValues(_.length).toMap ==
           b.map(_._2).groupBy(identity).view.mapValues(_.length).toMap,
      "per-language sample sizes must agree")
    assert(a.map(_._1).forall(docs) && b.map(_._1).forall(docs))
  }

  test("canonical dedup merges case/punct/whitespace variants; refines to exact dedup") {
    val s = spark
    import s.implicits._
    // synthetic: canonicalization collapses the three surface variants
    val syn = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "HELLO WORLD."),
      (4L, "different text")
    ).toDF("doc_id", "text")
    val groups = syn.groupBy(graft.functions.PortableHash.hash60(
        graft.operators.Dedup.canonicalText(org.apache.spark.sql.functions.col("text"))))
      .agg(org.apache.spark.sql.functions.min("doc_id").as("canonical_id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_copies"))
      .select("canonical_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(groups == Set((1L, 3L), (4L, 1L)), s"got $groups")
    // on the fixture corpus: canonical classes can only MERGE exact
    // classes, never split them — class count and survivor mass bound
    val exact = q("q_dedup_exact").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val canon = q("q_dedup_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(canon.length <= exact.length)
    assert(canon.map(_._2).sum == exact.map(_._2).sum,
      "total multiplicity must be the corpus size either way")
  }

  test("BPE fertility is consistent with the per-doc token queries; >= 1 per language") {
    val fert = q("q_text_bpe_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fert.nonEmpty)
    fert.foreach { case (lang, nBpe, nWs, f) =>
      assert(f >= 1.0, s"$lang fertility $f < 1 (pre-tokens split at word boundaries)")
      assert(f == nBpe.toDouble / nWs.toDouble)
    }
    // cross-check the summed masses against q_text_tokens_bpe_real's
    // per-doc counts joined to the lang column
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = q("q_text_tokens_bpe_real").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byLang = perDoc.groupBy(p => docs(p._1)).view.mapValues(_.map(_._2).sum).toMap
    fert.foreach { case (lang, nBpe, _, _) =>
      assert(byLang(lang) == nBpe,
        s"$lang BPE mass $nBpe != summed per-doc ${byLang(lang)}")
    }
  }

  test("per-dimension embedding stats cover every dim with the full vector count") {
    val rows = q("q_embed_dim_stats").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSet == (1L to 64L).toSet)
    val nVecs = graft.sources.Tables.embeddings(spark, sfDir).count()
    rows.foreach { case (dim, n, sumV, sumSq, mean) =>
      assert(n == nVecs, s"dim $dim saw $n of $nVecs vectors")
      assert(mean == sumV / n)
      assert(sumSq >= 0.0)
    }
  }

  test("curation funnel stages are monotone and agree with the stage queries") {
    val funnel = q("q_curation_funnel").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(funnel.map(_._2).toSeq ==
      Seq("raw", "quality", "exact_dedup", "near_dedup"))
    // docs and tokens can only shrink down the funnel
    funnel.zip(funnel.drop(1)).foreach { case (a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"funnel grew from $a to $b")
    }
    // stage 2 == q_quality_filter's survivor count
    assert(funnel(1)._3 == q("q_quality_filter").count())
    // stage 3 == q_curation_pipeline's per-language stats summed
    val pipe = q("q_curation_pipeline").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(funnel(2)._3 == pipe.map(_._1).sum)
    assert(funnel(2)._4 == pipe.map(_._2).sum)
  }

  test("collocations respect min support, PMI rank order, and the bigram mass") {
    val rows = q("q_text_collocations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 5), "every collocation must meet min support")
    val sorted = rows.sortBy(_._4).toSeq
    sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1),
        s"rank order violated between $a and $b")
    }
    // each reported pair count is bounded by its words' unigram counts
    val cug = q("q_text_termfreq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (b, n, _, _) =>
      val Array(w1, w2) = b.split(" ")
      assert(n <= math.min(cug(w1), cug(w2)),
        s"pair count $n exceeds unigram counts for '$b'")
    }
  }

  test("quality-weighted sample accepts at a rate tracking quality; deterministic") {
    val out = q("q_sample_quality_weighted").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.nonEmpty)
    // every survivor's own quality bounds its acceptance: h < floor(q·2^50)
    // implies q > 0 — and high-quality docs must survive at a visibly
    // higher rate than low-quality ones (split at the corpus median)
    val all = q("q_text_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(2).toDouble / r.getLong(1)))
    val med = all.map(_._2).sorted.apply(all.length / 2)
    val kept = out.map(_._1).toSet
    def rate(xs: Array[(Long, Double)]) =
      if (xs.isEmpty) 0.0 else xs.count(x => kept(x._1)).toDouble / xs.length
    val (hi, lo) = all.partition(_._2 >= med)
    assert(rate(hi) > rate(lo),
      s"high-quality acceptance ${rate(hi)} must exceed low ${rate(lo)}")
    // deterministic across runs
    val again = q("q_sample_quality_weighted").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSet == again.toSet)
  }

  test("packed sequences carry exactly their bin's documents and token mass") {
    val seqs = q("q_pack_sequences").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
                 (r.getString(2), r.getLong(3), r.getLong(4))))
    val bins = q("q_pack_bins").collect()
      .map(r => ((r.getString(1), r.getLong(3)), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> (v.map(_._2).sum, v.size.toLong) }
    assert(seqs.map(_._1).toSet == bins.keySet)
    seqs.foreach { case (key, (text, tokens, nDocs)) =>
      val (expTokens, expDocs) = bins(key)
      assert(tokens == expTokens, s"bin $key token mass")
      assert(nDocs == expDocs, s"bin $key doc count")
      // fixture texts never contain the EOS marker, so doc count is
      // recoverable from the packed surface itself
      assert(text.split("<eos>", -1).length.toLong == nDocs, s"bin $key eos count")
    }
  }

  test("pack provenance offsets tile each bin's packed sequence exactly") {
    // per (lang, bin): offsets are the in-bin running token sums in doc-id
    // order (0 for the first doc, contiguous after), and the last doc's
    // offset + tokens equals the bin's q_pack_sequences token mass — the
    // inverse mapping and the loader artifact agree row by row
    val prov = q("q_pack_provenance").collect()
      .map(r => ((r.getString(1), r.getLong(2)), (r.getLong(0), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1) }
    val seqTokens = q("q_pack_sequences").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    assert(prov.keySet == seqTokens.keySet)
    prov.foreach { case (key, docs) =>
      var expect = 0L
      docs.foreach { case (id, n, off) =>
        assert(off == expect, s"bin $key doc $id offset $off != running sum $expect")
        expect += n
      }
      assert(expect == seqTokens(key), s"bin $key total $expect != packed mass")
    }
  }

  test("corpus report totals equal the individual declared queries") {
    val report = q("q_corpus_report").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(report.map(_._2).sum == docs.count())
    assert(report.map(_._4).sum == q("q_quality_filter").count())
    assert(report.map(_._6).sum == q("q_dedup_components").count())
    val clusters = q("q_dedup_components")
      .select("component_id").distinct().count()
    // clusters are per-lang blocks, so per-lang cluster counts sum to the
    // global distinct-component count
    assert(report.map(_._7).sum == clusters)
  }

  test("bin packing never exceeds the budget except for oversize singletons") {
    val rows = q("q_pack_bins").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2))) // lang, bin, tokens
    rows.groupBy(t => (t._1, t._2)).foreach { case ((lang, bin), ds) =>
      val total = ds.map(_._3).sum
      // greedy running-cumsum packing: a bin may only exceed 2048 via the
      // single document that straddles the boundary
      assert(total - ds.map(_._3).max < 2048,
        s"bin ($lang,$bin) over budget beyond its straddling doc: $total")
    }
  }

  test("salted and unsalted keyed counts are identical") {
    val plain = q("q_keyed_count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = q("q_keyed_count_salted").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("full-dedup survivors account exactly for components and cluster count") {
    val comp = q("q_dedup_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val members = comp.length.toLong
    val clusters = comp.map(_._2).distinct.length.toLong
    val totalDocs = q("q_text_tokens").count()
    val survivors = q("q_corpus_dedup_full").collect()
      .map(_.getLong(1)).sum
    // every cluster keeps exactly one survivor: docs - members + clusters
    assert(members > clusters, "fixture should contain at least one real cluster")
    assert(survivors == totalDocs - members + clusters,
      s"survivors=$survivors docs=$totalDocs members=$members clusters=$clusters")
  }

  test("decontaminated set is exactly the non-eval docs minus gram-overlap hits") {
    val kept = q("q_decontaminate").collect().map(_.getLong(0)).toSet
    val nDocs = q("q_text_tokens").count()
    assert(kept.forall(_ >= 10))
    assert(kept.size <= nDocs - 10)
  }

  test("span removal mass is consistent with the span duplication score") {
    // q_dedup_substring scores per-doc duplication (distinct spans in >= 2
    // docs); q_dedup_substring_removal excises every token covered by such
    // a span. Ties (per doc): removal happens iff the score says dup_ratio
    // > 0; a doc with any dup span loses at least one full span width; no
    // doc loses more tokens than it has; docs without spans (< w tokens,
    // absent from the score query) lose nothing.
    import org.apache.spark.sql.functions.{col, size, split}
    val w = graft.operators.Dedup.DefaultSpanWidth
    val score = q("q_dedup_substring").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_dup_spans
    val removal = q("q_dedup_substring_removal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nTok = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(removal.map(_._1).toSet == nTok.keySet, "removal must emit every doc")
    assert(removal.exists(_._3 > 0), "fixture should contain removed spans")
    removal.foreach { case (doc, clean, nRemoved) =>
      val dupSpans = score.getOrElse(doc, 0L)
      assert((nRemoved > 0) == (dupSpans > 0),
        s"doc $doc: n_removed=$nRemoved but score n_dup_spans=$dupSpans")
      if (dupSpans > 0) assert(nRemoved >= w, s"doc $doc: partial span removed")
      assert(nRemoved <= nTok(doc), s"doc $doc: removed more than its tokens")
      val keptLen = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(keptLen == nTok(doc) - nRemoved,
        s"doc $doc: kept $keptLen + removed $nRemoved != ${nTok(doc)}")
    }
  }

  test("boilerplate removal strips a subset of dedup removal's mass") {
    // minDocs = 3 spans are a subset of minDocs = 2 spans, so per doc the
    // boilerplate pass can never remove more than the dedup pass
    val dd = q("q_dedup_substring_removal").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bp = q("q_boilerplate_removal").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dd.keySet == bp.keySet, "both passes must emit every document")
    bp.foreach { case (id, n) =>
      assert(n <= dd(id), s"doc $id: boilerplate removed $n > dedup ${dd(id)}")
    }
    assert(bp.values.sum < dd.values.sum,
      "fixture has nd=2 spans, so the thresholds must separate")
  }

  test("bigram LM scores equal an independent driver-side replay") {
    // full independent recount: corpus bigram/unigram tables and V built
    // with plain Scala maps, per-doc smoothed-probability sums replayed
    // with the same fixed op order as the query and its oracle
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[String, Long]
    docs.values.foreach { t =>
      t.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      t.sliding(2).filter(_.size == 2)
        .foreach(p => { val b = p.mkString(" "); big(b) = big.getOrElse(b, 0L) + 1 })
    }
    val v = uni.size.toLong
    val expect = docs.collect { case (id, t) if t.size >= 2 =>
      val s = t.sliding(2).map { p =>
        math.floor((big(p.mkString(" ")) + 1).toDouble * 1048576.0 /
          (uni(p.head) + v).toDouble).toLong
      }.sum
      id -> (BigDecimal(s).toDouble / 1048576.0, (t.size - 1).toLong)
    }
    val got = q("q_text_lm_bigram").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"lm score diverges for doc $id: got ${got(id)}, expect $e")
    }
  }

  test("persisted-index IVF serves the same neighbors as per-query retraining") {
    val retrained = q("q_sim_ivf_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val indexed = q("q_sim_ivf_indexed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(retrained.nonEmpty && indexed == retrained,
      s"indexed != retrained: missing=${retrained -- indexed} extra=${indexed -- retrained}")
  }

  test("persisted-cell semantic dedup serves the same pairs as per-query retraining") {
    val retrained = q("q_dedup_semantic").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = q("q_dedup_semantic_indexed").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(retrained.nonEmpty && indexed == retrained,
      s"indexed != retrained: missing=${retrained -- indexed} extra=${indexed -- retrained}")
  }

  test("maintained-index search twins equal the base-build twins") {
    // q_search_*_maintained serve from an index whose last slice arrived
    // via the ledgered append path; append == rebuild is exact for this
    // family, so the results must be bit-identical to the full-corpus
    // base-build queries — the declared-surface guarantee that index
    // maintenance cannot change any answer
    def rows(name: String) = q(name).collect()
      .map(r => (0 until r.length).map(r.get).toList).toSet
    assert(rows("q_search_bm25_maintained") == rows("q_search_bm25"))
    assert(rows("q_search_phrase_maintained") == rows("q_search_phrase"))
    assert(rows("q_search_hybrid_maintained") == rows("q_search_hybrid"))
  }

  test("recall@5 equals the overlap of the two declared retrieval queries") {
    // q_ann_recall must be DERIVABLE from the declared surface: its
    // n_hits per query is exactly |q_sim_ivf_indexed's top-5 ∩
    // q_sim_topk's top-5| — three independent query paths, one fixpoint
    val ivf = q("q_sim_ivf_indexed").filter("rank <= 5").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = q("q_sim_topk").filter("rank <= 5").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val derived = ivf.intersect(exact).groupBy(_._1)
      .map { case (qid, hits) => (qid, hits.size.toLong) }
    val declared = q("q_ann_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(declared.nonEmpty)
    declared.foreach { case (qid, n) =>
      assert(n == derived.getOrElse(qid, 0L),
        s"query $qid: declared n_hits=$n, derived=${derived.getOrElse(qid, 0L)}")
    }
    // the exclusion and facet searches are sub-surfaces of BM25's doc
    // universe: no NOT hit contains the excluded term's docs, no faceted
    // hit leaves the facet — both already spec-pinned; here pin the
    // CROSS-query containment that every hit set is drawn from docs the
    // corpus-wide BM25 scorer could see (n_terms >= 1)
    assert(q("q_search_not").filter("n_terms < 1").count() == 0)
    assert(q("q_search_filtered").filter("n_terms < 1").count() == 0)
  }

  test("per-doc dup-span mass equals the per-span transpose's mass") {
    // q_dedup_substring counts, per DOC, its spans that occur in >= 2
    // docs; summing that over docs must equal summing nd over every span
    // with nd >= 2 — the same (doc, span) incidences counted from the
    // other side. The boilerplate query is the nd >= 3 slice of the same
    // frequency table, so its mass bounds from below.
    val perDoc = q("q_dedup_substring").collect()
      .map(r => r.getLong(2)).sum // n_dup_spans
    val spans = graft.operators.Dedup.spanRows(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text")
      .groupBy(graft.functions.PortableHash.hash60(
        org.apache.spark.sql.functions.col("span")).as("h"))
      .count().collect().map(_.getLong(1))
    val transposeMass = spans.filter(_ >= 2).sum
    assert(perDoc == transposeMass,
      s"per-doc dup-span mass $perDoc != per-span mass $transposeMass")
    val boilerplateMass = q("q_boilerplate_spans").collect()
      .map(_.getLong(1)).sum
    assert(boilerplateMass <= transposeMass && boilerplateMass > 0,
      s"boilerplate mass $boilerplateMass vs transpose mass $transposeMass")
  }
}
