package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit-level semantics for [[Dedup.duplicatedSpanStats]] on a corpus
  * whose span structure is known by construction — the oracle checks the
  * full fixture; this pins the EDGES (partial copy, self-repetition,
  * short doc, disjoint docs) where the aggregate shape could silently
  * drift. */
class SubstringDedupSpec extends SparkSpec {

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("span coverage: partial copies register, self-repetition does not, short docs are absent") {
    import spark.implicits._
    val w = 4 // small width so the fixture stays readable
    val unique = words("a", 12)               // 12 tokens, all spans unique
    val copiedRun = words("c", 6)             // 6 shared tokens -> 3 spans at w=4
    val docs = Seq(
      (1L, unique),                                        // no dup spans
      (2L, s"${words("b", 8)} $copiedRun"),                // tail copied
      (3L, s"$copiedRun ${words("d", 8)}"),                // head copied
      (4L, s"${words("e", 2)} ${words("e", 2)} ${words("e", 2)}"), // self-repeat only
      (5L, "tiny doc here")                                // < w tokens: absent
    ).toDF("doc_id", "text")

    val out = Dedup.duplicatedSpanStats(docs, "doc_id", "text", w)
      .orderBy("doc_id").collect()

    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(!byId.contains(5L), "doc shorter than w must produce no row")

    // doc 1: 12 tokens -> 9 spans, none shared
    assert(byId(1L) == Row(1L, 9L, 0L, 0.0))

    // docs 2 and 3: 14 tokens -> 11 distinct spans each; the copied
    // 6-token run contributes w-grams fully inside it: 6-4+1 = 3 shared
    // spans (boundary spans mix prefixes and differ between the docs)
    Seq(2L, 3L).foreach { id =>
      val r = byId(id)
      assert(r.getLong(1) == 11, s"doc $id span count")
      assert(r.getLong(2) == 3, s"doc $id dup spans")
      assert(r.getDouble(3) == 3.0 / 11.0, s"doc $id ratio")
    }

    // doc 4: "e0 e1 e0 e1 e0 e1" -> rolling spans repeat WITHIN the doc
    // only; distinct-doc frequency stays 1, so nothing counts as dup
    val r4 = byId(4L)
    assert(r4.getLong(2) == 0, "self-repetition must not count as cross-doc dup")
    // 6 tokens -> 3 positions but only 2 DISTINCT spans (array_distinct)
    assert(r4.getLong(1) == 2)
  }

  test("exact duplicate docs: every span duplicated, ratio 1.0") {
    import spark.implicits._
    val t = words("x", 10)
    val out = Dedup.duplicatedSpanStats(
      Seq((1L, t), (2L, t)).toDF("doc_id", "text"), "doc_id", "text")
    assert(out.collect().forall(r => r.getDouble(3) == 1.0))
  }

  test("span-hash kernel is bit-identical to hash60 of the joined span string") {
    import spark.implicits._
    import graft.functions.expressions.SpanHash
    // mixed widths, multi-byte text, and a too-short doc; the kernel's
    // contract is element j == hash60("tok[j] .. tok[j+w-1]") — replayed
    // here through PortableHash.hash60String, the one JVM definition of
    // the hash contract
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld naïve café déjà vu encore une fois",
      "a b", // shorter than w -> empty
      words("t", 30))
    val w = 4
    val got = texts.toDF("text")
      .select(SpanHash.span_hashes(split(col("text"), " "), w).as("hs"))
      .as[Seq[Long]].collect()
    val want = texts.map { t =>
      val toks = t.split(" ")
      if (toks.length < w) Seq.empty[Long]
      else (0 to toks.length - w).map(j =>
        graft.functions.PortableHash.hash60String(toks.slice(j, j + w).mkString(" ")))
    }
    assert(got.toSeq.map(_.toList) == want.toList.map(_.toList))
  }
}
