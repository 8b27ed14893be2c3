package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables
import graft.operators.CorpusOps._

/** The fluent corpus API must be sugar, not a second implementation: each
  * chain's result equals the declared query / operator it delegates to. */
class CorpusOpsSpec extends SparkSpec {

  test("qualityFiltered.dedupedExact.tokenBudget equals q_curation_pipeline") {
    val s = spark
    val viaChain = Tables.documents(s, sfDir)
      .select("doc_id", "text", "lang")
      .qualityFiltered()
      .dedupedExact()
      .tokenBudget("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaQuery = graft.SparkEntry.queries("q_curation_pipeline")(s, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaChain == viaQuery)
  }

  test("dedupClusters equals the declared components query") {
    val s = spark
    val viaChain = Tables.documents(s, sfDir)
      .dedupClusters()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaQuery = graft.SparkEntry.queries("q_dedup_components")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaChain == viaQuery)
  }

  test("redacted verb equals the declared q_text_redact stats") {
    val s = spark
    import graft.operators.CorpusOps._
    import org.apache.spark.sql.functions._
    // same pattern as the declared query — one that actually fires on the
    // fixture, so the equivalence is not vacuously over zero matches
    val viaVerb = graft.sources.Tables.documents(s, sfDir)
      .redacted(pattern = "[aeiou]{2,}", token = "<V>")
      .select(col("doc_id"), col("n_redactions"),
        length(col("redacted_text")).cast("long").as("redacted_len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val declared = graft.SparkEntry.queries("q_text_redact")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaVerb == declared && declared.nonEmpty)
    assert(viaVerb.exists(_._2 > 0), "fixture must produce real redactions")
  }

  test("dedupedVerified survivors: no duplicate texts, one survivor per verified pair") {
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text", "lang")
    val survivors = docs.dedupedVerified()
    try {
      val surv = survivors.persist()
      assert(surv.count() > 0)
      // exact dedup held: survivors carry pairwise-distinct texts
      assert(surv.groupBy("text").count().filter(col("count") > 1).count() == 0)
      // every verified near-dup pair lost at least one endpoint: a pair is
      // an edge, so both ids share a component and only the min survives
      val verified = Dedup.dedupPipeline(docs, "doc_id", "text", "lang")
        .select("id_a", "id_b")
      val ids = surv.select(col("doc_id"))
      val bothSurvived = verified
        .join(ids.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
        .join(ids.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
        .count()
      assert(bothSurvived == 0,
        s"$bothSurvived verified near-dup pairs kept both endpoints")
    } finally {
      survivors.unpersist()
      CacheScope.releaseAll() // dedupPipeline's tracked gsets persist
    }
  }

  test("scalable bin packing equals the window form on a many-partition frame") {
    val s = spark
    import s.implicits._
    import graft.operators.CorpusOps._
    // skewed groups (one group dominates, like en at 100 TB) across many
    // range slices, so group boundaries fall INSIDE partitions and
    // partitions hold multiple groups — both cross-cases exercised; ids
    // shuffled so range partitioning actually reorders
    val rnd = new scala.util.Random(41)
    val docs = rnd.shuffle((0 until 2000).toList).map { i =>
      val lang = if (i % 10 < 7) "en" else if (i % 10 < 9) "de" else "fr"
      (i.toLong, Seq.fill(3 + rnd.nextInt(40))("w").mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
    val plain = docs.packedBins("lang", binTokens = 64).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    for (parts <- Seq(3, 7, 32)) {
      val scalable = CacheScope.withOperatorCaches {
        docs.packedBinsScalable("lang", binTokens = 64, numPartitions = parts)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      }
      assert(scalable == plain, s"divergence at numPartitions=$parts")
    }
  }

  test("scalable packing equals the window form under the BPE token counter") {
    // q_pack_bins_bpe composes packedBinsScalable with the real-BPE
    // counter: the assignment machinery must be orthogonal to the token
    // currency, so scalable == plain must hold under bpe_count too
    val s = spark
    val bpe = graft.functions.expressions.BpeCountExpression.bpe_count(_)
    val docs = Tables.documents(s, sfDir).select("doc_id", "text", "lang")
    val plain = docs.packedBins("lang", binTokens = 256, tokenCount = bpe)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val scalable = CacheScope.withOperatorCaches {
      docs.packedBinsScalable("lang", binTokens = 256, tokenCount = bpe,
          numPartitions = 7)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(scalable == plain && plain.nonEmpty)
    // BPE tokens differ from whitespace tokens on the fixture, so the
    // equality is not vacuously the whitespace case re-run
    val ws = docs.packedBins("lang", binTokens = 256).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(ws != plain, "BPE counter must actually change the assignment input")
  }

  test("above the dispatch boundary, packed plans carry no corpus-sized per-group-only window") {
    // The scale pin behind the packed family, restated for the
    // regime-dispatched form (round-10 verdict item 2): whenever the
    // scalable branch is in effect — always for q_pack_bins_scalable,
    // and for packedBinsAuto whenever the largest group exceeds the
    // boundary — the only Window partitioned by the group ALONE may be
    // the one over the tiny per-(group, slice) totals aggregate (an
    // Aggregate must sit beneath it); the corpus-sized cumsum must be
    // keyed by (group, slice) — a 2-expression partition spec. The
    // window form's plan violates both.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window}
    val s = spark
    import graft.operators.CorpusOps._
    def windows(p: LogicalPlan): Seq[Window] =
      p.collect { case w: Window => w }
    def assertScalableShape(name: String, plan: LogicalPlan): Unit = {
      val ws = windows(plan)
      assert(ws.exists(_.partitionSpec.length == 2),
        s"$name: missing the (group, slice)-keyed distributed cumsum window")
      ws.filter(_.partitionSpec.length == 1).foreach { w =>
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"$name: a per-group-only window runs over a non-aggregated " +
            "(corpus-sized) input — the single-task scale-killer")
      }
    }
    assertScalableShape("q_pack_bins_scalable", CacheScope.withOperatorCaches {
      graft.SparkEntry.queries("q_pack_bins_scalable")(s, sfDir)
        .queryExecution.optimizedPlan
    })
    // auto ABOVE the boundary (forced by a zero threshold): the
    // scalable-branch plan, and the diagnostic records the branch
    val forced = CacheScope.withOperatorCaches {
      val df = Tables.documents(s, sfDir)
        .packedBinsAuto("lang", maxWindowGroupRows = 0L)
      assert(CorpusOps.lastPackDispatch == "scalable")
      df.queryExecution.optimizedPlan
    }
    assertScalableShape("packedBinsAuto(boundary=0)", forced)
    // auto BELOW the boundary (the fixture regime): the window branch —
    // the constants winner SCALE.md measured — and the composed packed
    // queries inherit it
    for (name <- Seq("q_pack_bins_auto", "q_pack_sequences", "q_pack_bins_bpe",
                     "q_pack_provenance")) {
      CacheScope.withOperatorCaches {
        graft.SparkEntry.queries(name)(s, sfDir).queryExecution.optimizedPlan
      }
      assert(CorpusOps.lastPackDispatch == "window",
        s"$name: expected the window branch below the boundary")
    }
    // and the window form, for contrast, is exactly the shape banned above
    val plainPlan = Tables.documents(s, sfDir)
      .packedBins("lang").queryExecution.optimizedPlan
    assert(windows(plainPlan).forall(w =>
      w.partitionSpec.length == 1 &&
        w.child.collectFirst { case a: Aggregate => a }.isEmpty))
  }

  test("auto packing equals both branches and dispatches on the largest group") {
    val s = spark
    import s.implicits._
    import graft.operators.CorpusOps._
    val rnd = new scala.util.Random(43)
    val docs = rnd.shuffle((0 until 1500).toList).map { i =>
      val lang = if (i % 10 < 7) "en" else if (i % 10 < 9) "de" else "fr"
      (i.toLong, Seq.fill(3 + rnd.nextInt(40))("w").mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
    val plain = docs.packedBins("lang", binTokens = 64).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // default boundary: largest group (~1050 rows) is far below 10M
    val auto = CacheScope.withOperatorCaches {
      docs.packedBinsAuto("lang", binTokens = 64).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(CorpusOps.lastPackDispatch == "window")
    assert(auto == plain && plain.nonEmpty)
    // boundary forced below the largest group: the scalable branch, same
    // assignment (prefix-sum associativity)
    val autoScalable = CacheScope.withOperatorCaches {
      docs.packedBinsAuto("lang", binTokens = 64, maxWindowGroupRows = 100L)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(CorpusOps.lastPackDispatch == "scalable")
    assert(autoScalable == plain)
    // empty input: no groups, defined behavior (window branch, no rows)
    val empty = docs.filter(col("doc_id") < 0)
    assert(empty.packedBinsAuto("lang", binTokens = 64).count() == 0)
  }

  test("shard manifest conserves bins, docs, and tokens of the packed assignment") {
    val s = spark
    import s.implicits._
    val assigned = Tables.documents(s, sfDir).packedBinsAuto("lang", binTokens = 2048)
    val manifest = graft.SparkEntry.queries("q_export_shards")(s, sfDir)
    // partition property: every bin lands in exactly one shard, so the
    // manifest's per-lang bin/doc/token totals equal the assignment's
    val fromAssign = assigned.groupBy("lang")
      .agg(countDistinct(col("bin_id")).as("bins"),
        count(lit(1)).as("docs"), sum(col("n_tokens")).as("toks"))
      .as[(String, Long, Long, Long)].collect().toSet
    val fromManifest = manifest.groupBy("lang")
      .agg(sum(col("n_bins")).as("bins"),
        sum(col("n_docs")).as("docs"), sum(col("shard_tokens")).as("toks"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(fromManifest == fromAssign && fromAssign.nonEmpty)
    // determinism of the export: a second construction is byte-identical
    val again = graft.SparkEntry.queries("q_export_shards")(s, sfDir)
    assert(manifest.exceptAll(again).count() == 0 &&
           again.exceptAll(manifest).count() == 0)
  }

  test("shard manifest matches a physically written shard-partitioned artifact") {
    val s = spark
    import s.implicits._
    // the export's physical form: docs written partitionBy(lang, shard_id);
    // the manifest must agree with what a reader finds on disk
    val out = java.nio.file.Files.createTempDirectory("shard-export").toString
    try {
      val assigned = Tables.documents(s, sfDir)
        .packedBinsAuto("lang", binTokens = 2048)
        .withColumn("shard_id", floor(col("bin_id") / 8).cast("long"))
      assigned.write.mode("overwrite")
        .partitionBy("lang", "shard_id").parquet(out)
      val onDisk = s.read.parquet(out)
        .groupBy("lang", "shard_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("toks"))
        .as[(String, Long, Long, Long)].collect().toSet
      val manifest = graft.SparkEntry.queries("q_export_shards")(s, sfDir)
        .select(col("lang"), col("shard_id"), col("n_docs"),
          col("shard_tokens"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(onDisk == manifest && manifest.nonEmpty,
        "the manifest must describe exactly the written partitions")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(out))
    }
  }

  test("fingerprinted and withTextStats append the documented columns and types") {
    val s = spark
    val out = Tables.documents(s, sfDir)
      .withTextStats().fingerprinted()
      .select("doc_id", "n_tokens", "distinct_ratio", "fingerprint")
    import org.apache.spark.sql.types._
    assert(out.schema("n_tokens").dataType == IntegerType)
    assert(out.schema("distinct_ratio").dataType == DoubleType)
    assert(out.schema("fingerprint").dataType == LongType)
    assert(out.filter(col("fingerprint").isNull ||
                      col("distinct_ratio").isNull).count() == 0)
    // fingerprint values agree with the declared query's column function —
    // BOTH directions, so silently-dropped rows can't sneak a pass
    val direct = Tables.documents(s, sfDir)
      .select(col("doc_id"), graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val chained = out.select(col("doc_id"), col("fingerprint").as("fp"))
    assert(chained.exceptAll(direct).count() == 0 &&
           direct.exceptAll(chained).count() == 0)
  }
}
