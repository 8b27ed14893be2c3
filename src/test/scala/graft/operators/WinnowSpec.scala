package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.SpanHash

/** Winnowed fingerprinting (Schleimer et al. 2003): the deque kernel
  * against a naive reference, the selection guarantee that makes the
  * subsample sound for dedup, and the mass reduction it buys. */
class WinnowSpec extends SparkSpec {

  private val w = 8
  private val k = 4

  test("deque kernel equals the naive per-window minimum on random token arrays") {
    val s = spark
    import s.implicits._
    val rnd = new Random(41)
    val cases = (1 to 80).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => s"t${rnd.nextInt(12)}")
    }
    val got = cases.toDF("toks")
      .select(SpanHash.winnow_hashes(col("toks"), w, k).as("hs"))
      .as[Seq[Long]].collect().map(_.toList)
    val want = cases.map { t =>
      val spans =
        if (t.length < w) Nil
        else (0 to t.length - w).map(j =>
          graft.functions.PortableHash.hash60String(t.slice(j, j + w).mkString(" ")))
      if (spans.length < k) Nil
      else (0 to spans.length - k).map(j => spans.slice(j, j + k).min).toList
    }
    assert(got.toList == want.toList)
  }

  test("selection guarantee: a shared run of >= w+k-1 tokens forces a shared fingerprint") {
    val s = spark
    import s.implicits._
    val rnd = new Random(43)
    // 20 trials: two otherwise-disjoint documents share exactly one
    // (w+k-1)-token run at random offsets — the guarantee's minimum
    for (trial <- 1 to 20) {
      val run = (0 until w + k - 1).map(i => s"shared${trial}_$i")
      def host(prefixN: Int, suffixN: Int, tag: String) =
        ((0 until prefixN).map(i => s"$tag-p$i") ++ run ++
          (0 until suffixN).map(i => s"$tag-s$i")).toSeq
      val a = host(rnd.nextInt(30), rnd.nextInt(30), s"a$trial")
      val b = host(rnd.nextInt(30), rnd.nextInt(30), s"b$trial")
      val fps = Seq(a, b).toDF("toks")
        .select(array_distinct(SpanHash.winnow_hashes(col("toks"), w, k)).as("f"))
        .as[Seq[Long]].collect()
      assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty,
        s"trial $trial: documents sharing a ${w + k - 1}-token run must share a fingerprint")
    }
  }

  test("winnowed dedup profile catches the fixture's copies; fingerprint mass is a real subsample") {
    val s = spark
    val prof = graft.SparkEntry.queries("q_dedup_winnow")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(prof.nonEmpty && prof.forall { case (_, nf, nd) => nd <= nf })
    // the fixture corpus contains exact duplicates (TESTDATA.md): the
    // profile must flag SOME duplicated fingerprints
    assert(prof.exists(_._3 > 0), "fixture duplicates must surface")
    val win = graft.SparkEntry.queries("q_text_winnow")(s, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(win.nonEmpty)
    // mass: fingerprints are a strict subsample, averaging near 2/(k+1)
    val (spanSum, fpSum) = win.foldLeft((0L, 0L)) {
      case ((a, b), (ns, nf)) => (a + ns, b + nf)
    }
    val ratio = fpSum.toDouble / spanSum
    assert(ratio < 0.7 && ratio > 0.2,
      s"fingerprint mass should be a real subsample near 2/(k+1): $ratio")
  }
}
