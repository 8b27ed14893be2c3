package graft.operators

import graft.SparkSpec

/** [[BpeTrain]] against an independent in-memory reference: the same
  * algorithm (pair counts over a pre-token frequency dict, argmax with
  * the (cnt DESC, lhs, rhs) tie-break, merge-all leftmost) implemented
  * directly over Scala collections — no wrapped strings, no DataFrames.
  * Two formulations, one answer; the DuckDB oracle is the third. */
class BpeTrainSpec extends SparkSpec {

  /** Reference trainer over symbol VECTORS (not the operator's wrapped
    * strings — a different state representation on purpose). */
  private def reference(corpus: Seq[String], numMerges: Int): Seq[(Long, String, String, Long)] = {
    val pat = java.util.regex.Pattern.compile(graft.functions.Bpe.PreTokenRegex)
    val freq = scala.collection.mutable.Map.empty[String, Long]
    corpus.foreach { doc =>
      val m = pat.matcher(doc)
      while (m.find()) {
        val t = m.group()
        if (!t.contains("|")) freq(t) = freq.getOrElse(t, 0L) + 1L
      }
    }
    var dict: Map[Vector[String], Long] =
      freq.toMap.map { case (t, f) => t.map(_.toString).toVector -> f }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        syms.indices.dropRight(1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax: max count, then lexicographically smallest (lhs, rhs)
        val ((l, rt), c) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r.toLong, l, rt, c))
        dict = dict.groupMapReduce {
          case (syms, _) =>
            // merge all occurrences, leftmost first
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rt) {
                b += (l + rt); i += 2
              } else { b += syms(i); i += 1 }
            }
            b.result()
        }(_._2)(_ + _)
      }
      r += 1
    }
    out.result()
  }

  private def trained(corpus: Seq[String], numMerges: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    BpeTrain.train(corpus.toDF("text"), "text", numMerges)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("learned merges match the reference on a hand-readable corpus") {
    val corpus = Seq(
      "the cat and the hat and the bat",
      "then the cats sat, and that was that",
      "thin things think 100 and 1000")
    assert(trained(corpus, 12) == reference(corpus, 12))
  }

  test("generative parity: random corpora over a tiny alphabet") {
    val rnd = new scala.util.Random(11)
    (0 until 5).foreach { trial =>
      val corpus = Seq.fill(8)(
        Seq.fill(3 + rnd.nextInt(10))(
          Seq.fill(1 + rnd.nextInt(5))(('a' + rnd.nextInt(3)).toChar).mkString)
          .mkString(" "))
      val got = trained(corpus, 10)
      val exp = reference(corpus, 10)
      assert(got == exp, s"trial $trial diverged on corpus $corpus:\n$got\nvs\n$exp")
    }
  }

  test("generative parity: the heap/index loop equals a naive recount trainer, to exhaustion") {
    // trainOnDict's incremental machinery (lazy max-heap with stale-
    // snapshot discards, exactly-maintained pair->words index) against
    // the simplest possible formulation: full pair recount + argmax
    // every round. Many random dictionaries, run PAST exhaustion, so
    // tie-breaks, overlap counting ("aaa"), index removal, and heap
    // staleness all get exercised. Driver-only — no Spark in the loop.
    def naive(dict: Seq[(String, Long)], numMerges: Int): Seq[(Long, String, String, Long)] = {
      var words = dict.map { case (w, f) => (w.map(_.toString).toVector, f) }
      val out = Seq.newBuilder[(Long, String, String, Long)]
      var r = 0
      var done = false
      while (r < numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (syms, f) =>
          syms.indices.dropRight(1).foreach { i =>
            val k = (syms(i), syms(i + 1))
            counts(k) = counts.getOrElse(k, 0L) + f
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, rt), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          out += ((r.toLong, l, rt, c))
          words = words.map { case (syms, f) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rt) {
                b += (l + rt); i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), f)
          }
        }
        r += 1
      }
      out.result()
    }
    val rnd = new scala.util.Random(42)
    (0 until 60).foreach { trial =>
      val n = 1 + rnd.nextInt(30)
      val dict = (0 until n).map { _ =>
        Seq.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString
      }.distinct.map(w => (w, 1L + rnd.nextInt(50)))
      val got = BpeTrain.trainOnDict(dict, 1000)
      val exp = naive(dict, 1000)
      assert(got == exp, s"trial $trial diverged on dict $dict:\n$got\nvs\n$exp")
    }
  }

  test("learned table is hierarchical: every side is a base char or an earlier output") {
    val corpus = Seq("aaa bbb aaab", "aab aab aab bba")
    val merges = trained(corpus, 8)
    val outputs = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (_, l, r, _) =>
      assert(l.length == 1 || outputs.contains(l), s"lhs '$l' not derivable")
      assert(r.length == 1 || outputs.contains(r), s"rhs '$r' not derivable")
      outputs += (l + r)
    }
    // counts are positive and ranks are consecutive from 0
    assert(merges.map(_._1) == merges.indices.map(_.toLong))
    assert(merges.forall(_._4 >= 1L))
  }

  test("trainScalable equals the distributed rounds on the fixture corpus") {
    // the q_pack_bins_scalable device: the dictionary-local twin must
    // match the SAME answer (and so the same DuckDB oracle) the
    // distributed form is graded against — including recorded counts
    val s = spark
    val docs = graft.sources.Tables.documents(s, sfDir).select("text")
    val viaRounds = BpeTrain.train(docs, "text", BpeTrain.NumMerges)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val viaDict = BpeTrain.trainScalable(docs, "text", BpeTrain.NumMerges)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(viaDict == viaRounds,
      s"dictionary-local training diverged from the distributed rounds:\n$viaDict\nvs\n$viaRounds")
  }

  test("trainOnDict equals the reference trainer, and handles a real vocabulary depth") {
    // same two corpora as the reference-parity suites
    val corpus = Seq(
      "the cat and the hat and the bat",
      "then the cats sat, and that was that",
      "thin things think 100 and 1000")
    val pat = java.util.regex.Pattern.compile(graft.functions.Bpe.PreTokenRegex)
    val freq = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    corpus.foreach { doc =>
      val m = pat.matcher(doc)
      while (m.find()) {
        val t = m.group()
        if (!t.contains("|")) freq(t) = freq.getOrElse(t, 0L) + 1L
      }
    }
    assert(BpeTrain.trainOnDict(freq.toSeq, 12) == reference(corpus, 12))
    // depth: run the loop to exhaustion (far past the fixture's pair
    // supply) — the incremental index must stay consistent to the end;
    // this is the microseconds-per-merge path that makes 30k merges a
    // driver-side formality rather than 30k Spark jobs
    val deep = BpeTrain.trainOnDict(freq.toSeq, 2000)
    assert(deep.size < 2000, "exhaustion expected on a tiny dictionary")
    assert(deep.take(12) == reference(corpus, 12))
    // hierarchy still holds at depth
    val outputs = scala.collection.mutable.Set.empty[String]
    deep.foreach { case (_, l, r, _) =>
      assert(l.length == 1 || outputs.contains(l))
      assert(r.length == 1 || outputs.contains(r))
      outputs += (l + r)
    }
  }

  test("trainScalable equals the distributed rounds on a non-BMP corpus") {
    // astral-plane text (emoji = surrogate pairs in UTF-16): the engine's
    // split(pt, "") runs over UTF8String and yields WHOLE CODE POINTS —
    // an emoji is one symbol — and the dictionary-local loop must mirror
    // exactly that (BpeTrain.trainOnDict splits by code point). The
    // review finding this pins caught the twin splitting by UTF-16 code
    // unit and diverging from the distributed rounds at merge rank 0
    import spark.implicits._
    val docs = (Seq.fill(20)("😀😀go 😀go west") ++
        Seq.fill(5)("plain words here")).toDF("text")
    val viaRounds = BpeTrain.train(docs, "text", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val viaDict = BpeTrain.trainScalable(docs, "text", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(viaDict == viaRounds,
      s"non-BMP divergence:\n$viaDict\nvs\n$viaRounds")
  }

  test("trainScalable's dictionary cap keeps the top-frequency entries") {
    // under a tight cap the trainer must still run, on the head of the
    // dictionary only — the min_frequency practice of real trainers
    import spark.implicits._
    val docs = Seq.fill(50)("aa bb").toDF("text")
      .union(Seq.fill(2)("zz qq").toDF("text"))
    val capped = BpeTrain.trainScalable(docs, "text", numMerges = 4,
        maxDictEntries = 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // "aa"/" bb" dominate ("zz"/" qq" fall past the cap): merges come
    // from the head entries only
    assert(capped.nonEmpty)
    assert(capped.forall { case (l, r) => "ab b".contains(l.last) && "ab b".contains(r.head) },
      s"capped training leaked tail-entry symbols: $capped")
  }

  test("training leaves no cached state behind") {
    import spark.implicits._
    BpeTrain.train(Seq("some text here", "some text there").toDF("text"), "text", 4)
      .collect()
    val persistent = spark.sparkContext.getPersistentRDDs
    assert(persistent.isEmpty,
      s"BpeTrain stranded ${persistent.size} materialized RDDs: ${persistent.values.map(_.name)}")
  }
}
