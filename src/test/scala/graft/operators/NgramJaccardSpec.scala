package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The declared q_dedup_ngram_jaccard fixture has a DEGENERATE 31-word
  * vocabulary (every shingle common, prefix filtering prunes nothing —
  * documented in SCALE.md). This spec covers the realistic regime the
  * operator is built for: a sparse vocabulary where most document pairs
  * share no shingle, verified exactly against a driver-side brute-force
  * all-pairs Jaccard. Planted near-dups (one-token edits) must all
  * surface; nothing else may. */
class NgramJaccardSpec extends SparkSpec {

  test("exact pairs on a sparse-vocab corpus with planted near-dups") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    val vocab = (0 until 500).map(i => s"t$i")
    def freshDoc(): Vector[String] =
      Vector.fill(25 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
    // 40 base docs, each with a one-token-mutated near-dup twin
    val docs: Seq[(Long, String)] = (0 until 40).flatMap { i =>
      val d = freshDoc()
      val mutated = d.updated(rnd.nextInt(d.size), vocab(rnd.nextInt(vocab.size)))
      Seq((2L * i, d.mkString(" ")), (2L * i + 1, mutated.mkString(" ")))
    }
    val df = docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
    // the operator's documented cache lifecycle: the caller releases its
    // tracked persist after the action (the session is shared across suites)
    val got = CacheScope.withOperatorCaches {
      Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", n = 3,
          threshold = 0.3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }

    // brute-force reference: distinct word-3-gram sets, all pairs
    def grams(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
    val gs = docs.map { case (id, t) => id -> grams(t) }
    val exp = (for {
      (a, ga) <- gs; (b, gb) <- gs if a < b
      inter = (ga & gb).size
      j = inter.toDouble / (ga.size + gb.size - inter) if j >= 0.3
    } yield (a, b) -> j).toMap

    assert(exp.size >= 30, s"fixture should plant enough near-dup pairs: ${exp.size}")
    assert(got.keySet == exp.keySet,
      s"missing=${exp.keySet -- got.keySet} extra=${got.keySet -- exp.keySet}")
    // same int/int IEEE division on both sides -> exactly equal
    exp.foreach { case (k, j) => assert(got(k) == j, s"score mismatch at $k") }
  }

  test("hot-gram docs route through banded MinHash — a pair sharing ONLY " +
       "hot grams is found by the banded branch, never the f^2 bucket join") {
    val s = spark
    import s.implicits._
    // 60 docs share one boilerplate head (every head-internal 3-gram has
    // df = 62) but carry long unique 24-token tails: 32 grams/doc, prefix
    // length 23 < 24 unique tail grams, so their prefixes hold only rare
    // grams and they stay on the exact path. Docs 100/101 are PURE
    // boilerplate — every gram they own has df = 62 > the forced cap of
    // 8, so the exact path has no rows for them at all: the (100,101)
    // duplicate pair is reachable ONLY via banded-MinHash candidates
    // (identical docs → identical signatures → every band collides, so
    // the find is deterministic). Docs 0/200 are an identical tailed pair
    // found by the exact path concurrently. Cross-pair Jaccards stay
    // under the 0.3 threshold: tailed-vs-tailed J = 8/(32+32-8) ≈ 0.14,
    // tailed-vs-pure-boiler J = 8/(32+8-8) = 0.25, so exact verification
    // admits exactly the two planted pairs and nothing else.
    val boiler = "the quick brown fox jumps over the lazy dog again"
    def tail(i: Int): String = (0 until 24).map(k => s"u${i}x$k").mkString(" ")
    val docs: Seq[(Long, String)] = (0 until 60).map { i =>
      (i.toLong, s"$boiler ${tail(i)}")
    } ++ Seq((100L, boiler), (101L, boiler), (200L, s"$boiler ${tail(0)}"))
    val df = docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = CacheScope.withOperatorCaches {
      Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", n = 3,
          threshold = 0.3, maxPostingSize = 8L)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    assert(got.keySet == Set((100L, 101L), (0L, 200L)),
      s"expected the banded-only pair and the exact-path pair, got ${got.keySet}")
    assert(got((100L, 101L)) == 1.0 && got((0L, 200L)) == 1.0)
  }

  test("property: exact equality with brute force on random corpora " +
       "(sparse and dense vocab, short docs, duplicates)") {
    // adversarial shapes for the round-9 refactor (hash-ordered prefixes,
    // df-routed guardrail): random corpora whose pair mass stays under
    // the volume budget, so the operator MUST be exactly the brute-force
    // all-pairs answer — any prefix-selection or routing bug shows as a
    // missing or extra pair. Mix of regimes per trial: vocabulary size 6
    // (dense — prefix filtering prunes nothing) to 200 (sparse), doc
    // lengths 0-12 tokens (sub-n docs produce no grams), 10% literal
    // duplicates, 2 languages so blocking is exercised.
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 6) {
      val vocabSize = Seq(6, 12, 40, 200)(trial % 4)
      val vocab = (0 until vocabSize).map(i => s"v$i")
      val nDocs = 24 + rnd.nextInt(20)
      val raw = (0 until nDocs).map { i =>
        val len = rnd.nextInt(13)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
         if (rnd.nextInt(2) == 0) "en" else "de")
      }
      // 10% duplicates of an earlier doc (same lang so they must pair)
      val docs = raw.map { case t @ (id, _, _) =>
        if (id % 10 == 9) { val (_, tx, lg) = raw((id / 2).toInt); (id, tx, lg) }
        else t
      }
      val s = spark
      import s.implicits._
      val df = docs.toDF("doc_id", "text", "lang")
      val got = CacheScope.withOperatorCaches {
        Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", n = 3,
            threshold = 0.3)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      }
      def grams(t: String): Set[String] = {
        val toks = t.split(" ").filter(_.nonEmpty).toSeq
        if (toks.size < 3) Set.empty
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val gs = docs.map { case (id, t, l) => (id, grams(t), l) }
      val exp = (for {
        (a, ga, la) <- gs; (b, gb, lb) <- gs
        if a < b && la == lb && ga.nonEmpty && gb.nonEmpty
        inter = (ga & gb).size
        j = inter.toDouble / (ga.size + gb.size - inter) if j >= 0.3
      } yield (a, b) -> j).toMap
      assert(got == exp,
        s"trial $trial (vocab $vocabSize, $nDocs docs): " +
        s"missing=${exp.keySet -- got.keySet} extra=${got.keySet -- exp.keySet}")
    }
  }

  test("candidate-volume budget tightens the cap — dense fixture hands off " +
       "to banded and still finds the planted duplicate") {
    val s = spark
    import s.implicits._
    // 30 docs over a tiny shared vocabulary, so every gram's df is ~2-6
    // and no gram crosses a per-gram cap — but the TOTAL pair mass
    // exceeds a forced 10-pair budget, which must tighten the effective
    // cap, route the (now-hot) grams' documents through banded MinHash,
    // and still surface the planted identical pair (identical docs ->
    // identical signatures -> deterministic collision). This is the
    // dense-vocab regime in miniature: the x30 probe corpus' exact path
    // spilled >70 GB with no hot posting list anywhere near the cap.
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 8).map(i => s"w$i")
    val docs: Seq[(Long, String)] = (0 until 30).map { i =>
      (i.toLong, Vector.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (100L, "")
    val base = docs.init :+ (100L, docs.head._2) // doc 100 duplicates doc 0
    val df = base.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = CacheScope.withOperatorCaches {
      Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", n = 3,
          threshold = 0.9, maxCandidatePairs = 10L)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    // brute force at the same threshold confirms the expected pair set
    def grams(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
    val gs = base.map { case (id, t) => id -> grams(t) }
    val exp = (for {
      (a, ga) <- gs; (b, gb) <- gs if a < b
      inter = (ga & gb).size
      j = inter.toDouble / (ga.size + gb.size - inter) if j >= 0.9
    } yield (a, b)).toSet
    assert(exp.contains((0L, 100L)), "fixture must plant the duplicate pair")
    // banded recall is approximate by design: the planted identical pair
    // MUST be found (deterministic collision); no non-pair may appear
    // (exact verification); near-threshold extras may legitimately be
    // missed, so assert containment both ways on the planted pair + subset
    assert(got.keySet.contains((0L, 100L)),
      s"planted duplicate lost in banded handoff: ${got.keySet}")
    assert(got.keySet.subsetOf(exp), s"false positives: ${got.keySet -- exp}")
    assert(got((0L, 100L)) == 1.0)
  }

  test("every sf fixture stays under the exact-path guardrail " +
       "(q_dedup_ngram_jaccard oracle validity)") {
    // the declared query's all-pairs oracle is only valid while every
    // document takes the exact path. The operator routes on per-block
    // gram document frequency (the df_ it already computes for prefix
    // ordering), so max per-block df < DefaultMaxPostingSize is the EXACT
    // guardrail condition — derived from the SAME constant the operator
    // defaults to, so a regenerated fixture with a hot boilerplate gram
    // fails HERE instead of silently flipping the query to banded
    // candidates.
    val s = spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = graft.sources.Tables.documents(s, s"/root/testdata/$sf")
      val dfreq = docs
        .select(col("lang"), split(col("text"), " ").as("toks"))
        .select(col("lang"), explode(Dedup.shinglesFromTokens(col("toks"), 3)).as("gram"))
        .groupBy("lang", "gram").count()
      val r = dfreq.agg(max("count"),
        sum(expr("count * (count - 1) / 2"))).head()
      val (maxDf, pairMass) = (r.getLong(0), r.getDouble(1).toLong)
      assert(maxDf < Dedup.DefaultMaxPostingSize,
        s"$sf: hottest posting list $maxDf >= guardrail ${Dedup.DefaultMaxPostingSize}")
      // second half of the (now two-part) oracle-validity condition: the
      // TOTAL exact-path pair mass must fit the candidate-volume budget,
      // or the operator tightens the cap and flips part of the fixture to
      // banded candidates (approximate recall, oracle would diverge)
      assert(pairMass <= Dedup.DefaultMaxCandidatePairs,
        s"$sf: exact-path pair mass $pairMass exceeds candidate budget")
    }
  }
}
