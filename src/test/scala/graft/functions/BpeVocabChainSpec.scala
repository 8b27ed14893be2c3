package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.{BpeCountExpression, BpeDynExpressions, BpeEncodeExpression}
import graft.operators.BpeVocab
import graft.sources.Tables

/** The end-to-end tokenizer artifact chain: trained merge table
  * persisted once (BpeVocab), applied by the table-driven codegen
  * expressions (BpeDyn) — and the applier's semantics pinned against
  * both the static compiled-in table and a driver-side replay of the
  * trainer's own replace chain. */
class BpeVocabChainSpec extends SparkSpec {

  test("the dynamic applier under the static table equals the static expressions") {
    // rank-order replay == rank-priority merging for a hierarchical
    // table (the Bpe equivalence argument) — asserted bit-for-bit by
    // running BOTH appliers over the fixture corpus
    val s = spark
    val rules = Bpe.RuleSurfaces
    val rows = Tables.documents(s, sfDir).select(
        BpeEncodeExpression.bpe_encode(col("text")).as("stat_enc"),
        BpeDynExpressions.bpe_encode_dyn(col("text"), rules).as("dyn_enc"),
        BpeCountExpression.bpe_count(col("text")).as("stat_cnt"),
        BpeDynExpressions.bpe_count_dyn(col("text"), rules).as("dyn_cnt"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), "encode divergence")
      assert(r.getLong(2) == r.getLong(3), "count divergence")
    }
  }

  test("stored vocabulary equals the scalable trainer's output and serves without retraining") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpevocab").toString
    try {
      val docs = Seq(
        (1L, "the cat and the hat in the hall", "en", "s0", 31),
        (2L, "that cat sat with another cat", "en", "s0", 29),
        (3L, "the thin thing that sang", "en", "s0", 24))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val stored = BpeVocab.tableFor(s, dir)
        .orderBy("merge_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      val trained = graft.operators.BpeTrain
        .trainScalable(Tables.documents(s, dir), "text")
        .orderBy("merge_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(stored.sameElements(trained) && stored.nonEmpty)

      // staleness (the SnapshotMeta convention): fresh build reads
      // clean; a regenerated/extended corpus at the same path reads
      // stale — tableExists alone cannot see either
      assert(!BpeVocab.snapshotStale(s, dir))
      Seq((4L, "late arrival", "en", "s0", 12))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("append").parquet(s"$dir/documents.parquet")
      assert(BpeVocab.snapshotStale(s, dir),
        "extended corpus must read stale against the stamped vocabulary")

      // serving reads the STORE, not the trainer: plant a sentinel table
      // and observe mergesFor return it verbatim
      val sentinel = Seq((0L, "x", "y", 9L))
        .toDF("merge_rank", "lhs", "rhs", "cnt")
      BpeVocab.drop(s, dir)
      // recreate under the same name via the public path, then overwrite
      BpeVocab.ensure(s, dir)
      sentinel.write.mode("overwrite")
        .saveAsTable(BpeVocab.ensure(s, dir))
      assert(BpeVocab.mergesFor(s, dir) == IndexedSeq(("x", "y")),
        "mergesFor must serve the stored table, not re-train")
    } finally {
      BpeVocab.drop(s, dir)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("trained-table apply replays the trainer's replace chain (driver-side pin)") {
    // independent scalar replay: wrapped-state replaces in rank order —
    // the exact train/oracle formulation — vs BpeDyn.tokenize
    val rules = IndexedSeq(("t", "h"), ("th", "e"), (" ", "the"))
    val dyn = new BpeDyn(rules)
    def replay(pt: String): Seq[String] = {
      var st = "|" + pt.map(c => c.toString).mkString("||") + "|"
      rules.foreach { case (l, r) =>
        st = st.replace("|" + l + "||" + r + "|", "|" + l + r + "|")
      }
      st.substring(1, st.length - 1).split("\\|\\|").toSeq
    }
    for (pt <- Seq("the", " theme", "thth", "hat", "x", " the")) {
      assert(dyn.tokenize(pt).toSeq == replay(pt), s"divergence on '$pt'")
    }
    // '|' pre-tokens: excluded from training -> base code points
    assert(dyn.tokenize("|t").toSeq == Seq("|", "t"))
    // counts/encode compose per pre-token over a document
    import org.apache.spark.unsafe.types.UTF8String
    assert(dyn.countTokens(UTF8String.fromString("the theme")) ==
      replay("the").length + replay(" theme").length)
    val enc = dyn.encodeDoc(UTF8String.fromString("the hat")).toString
    assert(enc.split(Bpe.Sep).toSeq == replay("the") ++ replay(" hat"))
    assert(enc.count(_ == Bpe.Sep) == dyn.countTokens(UTF8String.fromString("the hat")))
    // stripping separators reproduces the input
    assert(enc.replace(Bpe.Sep.toString, "") == "the hat")
  }

  test("the indexed encode is one codegen'd scan: zero exchanges in the plan") {
    // the vocabulary rides in as a constant object, so the whole query
    // must be a narrow projection at the scan — no shuffle, inside
    // whole-stage codegen (the 100 TB tokenization-pass shape)
    val plan = graft.SparkEntry.queries("q_bpe_encode_indexed")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    // the compact rendering marks whole-stage-codegen stages with *(n)
    assert(plan.contains("*(1) Project"), s"fell out of codegen:\n$plan")
  }

  test("the indexed encode equals a fresh-rules dynamic encode on the fixture") {
    // q_bpe_encode_indexed reads the persisted vocab; the same rules
    // applied directly must agree — and differ from the static table's
    // encoding somewhere (the trained vocabulary is corpus-derived, so
    // equality with the hand-seeded table would mean the chain is
    // vacuous)
    val s = spark
    val rules = BpeVocab.mergesFor(s, sfDir)
    assert(rules.nonEmpty)
    val rows = graft.SparkEntry.queries("q_bpe_encode_indexed")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val direct = Tables.documents(s, sfDir).select(
        col("doc_id"),
        BpeDynExpressions.bpe_encode_dyn(col("text"), rules).as("tokens_str"),
        BpeDynExpressions.bpe_count_dyn(col("text"), rules).as("n_tokens_bpe"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == direct && rows.nonEmpty)
    val static0 = Tables.documents(s, sfDir).select(
        col("doc_id"),
        BpeEncodeExpression.bpe_encode(col("text")).as("e"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.exists { case (id, e, _) => static0(id) != e },
      "trained vocabulary must differ from the static table somewhere")
    // and every encoding round-trips to the document text
    val texts = Tables.documents(s, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { case (id, e, n) =>
      assert(e.replace(Bpe.Sep.toString, "") == texts(id))
      assert(e.count(_ == Bpe.Sep).toLong == n)
    }
  }
}
