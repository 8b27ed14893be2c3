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
}
