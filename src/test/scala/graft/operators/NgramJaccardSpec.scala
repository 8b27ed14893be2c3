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

  test("oversized posting lists route through banded MinHash — hot bucket never self-joins") {
    val s = spark
    import s.implicits._
    // 60 docs sharing one boilerplate head (a hot posting list of 60) with
    // long unique tails, plus one planted exact-duplicate pair. The
    // 10-token head contributes 8 shared head-internal 3-grams; a 24-token
    // tail pushes each doc to 32 grams, so cross-doc J = 8/(32+32-8) =
    // 0.143 << 0.3. With the guardrail forced on (maxPostingSize = 8 < 60)
    // the hot bucket's docs generate candidates via banded MinHash; the
    // duplicate pair has identical signatures, so it ALWAYS collides —
    // found deterministically — while the f^2 hot-bucket join never runs.
    // Verification keeps the result set exact: only the planted pair
    // clears J >= 0.3 either way.
    val boiler = "the quick brown fox jumps over the lazy dog again"
    def tail(i: Int): String = (0 until 24).map(k => s"u${i}x$k").mkString(" ")
    val docs0 = s"$boiler ${tail(0)}"
    val docs: Seq[(Long, String)] = (0 until 60).map { i =>
      (i.toLong, s"$boiler ${tail(i)}")
    } :+ (100L, docs0)
    val df = docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = CacheScope.withOperatorCaches {
      Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", n = 3,
          threshold = 0.3, maxPostingSize = 8L)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    assert(got.keySet == Set((0L, 100L)),
      s"expected exactly the planted duplicate pair, got ${got.keySet}")
    assert(got((0L, 100L)) == 1.0)
  }

  test("every sf fixture stays under the exact-path guardrail " +
       "(q_dedup_ngram_jaccard oracle validity)") {
    // the declared query's all-pairs oracle is only valid while every
    // posting list takes the exact path. A prefix posting list is a
    // subset of the gram's full per-block posting list, so max per-block
    // document frequency < DefaultMaxPostingSize is a sufficient
    // condition — derived from the SAME constant the operator defaults
    // to, so a regenerated fixture with a hot boilerplate gram fails
    // HERE instead of silently flipping the query to banded candidates.
    val s = spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = graft.sources.Tables.documents(s, s"/root/testdata/$sf")
      val maxDf = docs
        .select(col("lang"), split(col("text"), " ").as("toks"))
        .select(col("lang"), explode(Dedup.shinglesFromTokens(col("toks"), 3)).as("gram"))
        .groupBy("lang", "gram").count()
        .agg(max("count")).head().getLong(0)
      assert(maxDf < Dedup.DefaultMaxPostingSize,
        s"$sf: hottest posting list $maxDf >= guardrail ${Dedup.DefaultMaxPostingSize}")
    }
  }
}
