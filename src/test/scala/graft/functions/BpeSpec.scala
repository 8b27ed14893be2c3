package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/** The real BPE merge loop vs the oracle's formulation.
  *
  * [[Bpe.bpeCount]] runs rank-priority pair merging (the actual BPE
  * algorithm); the DuckDB oracle replays the table as a rank-ordered
  * greedy replace chain. The equivalence argument (Bpe.scala doc) says
  * the two have the same fixpoint for hierarchy-respecting tables — this
  * suite CHECKS that claim with an independent in-JVM replica of the
  * replace chain, over hand cases, generated strings, and the real corpus.
  */
class BpeSpec extends AnyFunSuite {

  /** In-JVM replica of the oracle: rules in rank order, each as one
    * leftmost-greedy replace-all (String.replace == DuckDB replace()). */
  private def replayCount(preToken: String): Int =
    Bpe.rulesResolved.foldLeft(preToken) { case (s, (l, r, o)) =>
      s.replace(new String(Array(l, r)), o.toString)
    }.length

  private def pretokens(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(Bpe.PreTokenRegex).matcher(text)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) out += m.group()
    out.toSeq
  }

  test("merge table is hierarchical and symbols are unique") {
    // class-load of `rulesResolved` already enforces side resolvability;
    // outputs must also be distinct and outside the base alphabet
    val outsList = Bpe.rulesResolved.map(_._3)
    assert(outsList.distinct.size == outsList.size)
    assert(outsList.forall(_ >= 0xE000.toChar))
  }

  test("hand cases: hierarchy merges to single tokens") {
    assert(Bpe.bpeCount("the") == 1)      // t+h -> th, th+e -> the
    assert(Bpe.bpeCount(" the") == 1)     // ' '+the
    assert(Bpe.bpeCount("thethe") == 2)   // no (the,the) rule
    assert(Bpe.bpeCount("x") == 1)
    assert(Bpe.bpeCount("") == 0)
    assert(Bpe.countTokens(UTF8String.fromString("")) == 0L)
    // count is bounded by chars below and pre-tokens above
    val t = "the cat sat on the mat in 2024"
    val n = Bpe.countTokens(UTF8String.fromString(t))
    assert(n >= pretokens(t).size && n <= t.length)
    assert(n == pretokens(t).map(Bpe.bpeCount).sum.toLong)
  }

  test("merge loop equals the rank-ordered replace chain on generated strings") {
    val gen = for {
      n <- Gen.choose(0, 24)
      cs <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.oneOf("etaoinshrdlu ".toSeq)),
        (2, Gen.oneOf("bcfgmpw0123".toSeq))))
    } yield cs.mkString
    val samples = (0 until 500).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)))
    samples.foreach { s =>
      // generated strings can span pre-token classes; compare per pre-token
      pretokens(s).foreach { t =>
        assert(Bpe.bpeCount(t) == replayCount(t),
          s"divergence on pre-token '$t' of '$s'")
      }
    }
  }

  /** In-JVM replica of the ENCODE oracle (Bpe.encodeSql): replace chain
    * to the symbol fixpoint, Sep after every surviving symbol, then each
    * rule symbol expanded to its surface. */
  private def replayEncode(preToken: String): String = {
    val fix = Bpe.rulesResolved.foldLeft(preToken) { case (s, (l, r, o)) =>
      s.replace(new String(Array(l, r)), o.toString)
    }
    val sepped = fix.flatMap(c => Seq(c, Bpe.Sep))
    Bpe.rulesResolved.zipWithIndex.foldLeft(sepped.mkString) {
      case (s, ((_, _, o), i)) =>
        s.replace(o.toString, Bpe.RuleSurfaces(i)._1 + Bpe.RuleSurfaces(i)._2)
    }
  }

  test("encode: hand cases, and the wire-form invariants") {
    def enc(t: String): String = Bpe.encodeDoc(UTF8String.fromString(t)).toString
    val S = Bpe.Sep
    assert(enc("the") == s"the$S")
    // " cat": (a,t) merges first (tier-1 rank), then ( ,c) (tier 3) ->
    // tokens [the][ c][at]
    assert(enc("the cat").split(S).toSeq == Seq("the", " c", "at"))
    assert(enc("") == "")
    // invariant 1: stripping separators reproduces the pre-token
    // concatenation (the input text itself on single-spaced corpora)
    // invariant 2: separator count == the declared token count
    for (t <- Seq("the cat sat on the mat in 2024", "with that out of it",
                  "  double  spaces", "mixed 0042 runs!!")) {
      val e = enc(t)
      assert(e.filterNot(_ == S) == pretokens(t).mkString, s"surface loss on '$t'")
      assert(e.count(_ == S).toLong == Bpe.countTokens(UTF8String.fromString(t)),
        s"token count mismatch on '$t'")
    }
  }

  test("encode passes non-symbol chars >= U+E000 through, matching the oracle's ELSE branch") {
    // PUA / CJK-compat / fullwidth input chars (and Sep itself) are >= U+E000
    // but are NOT rule outputs: they must pass through verbatim — the oracle's
    // `CASE c ... ELSE c END` does exactly that, and bpeEncode must not throw.
    def enc(t: String): String = Bpe.encodeDoc(UTF8String.fromString(t)).toString
    val pua = 0xF000.toChar        // private-use, above every rule symbol
    val cjkCompat = 0xF900.toChar  // CJK compatibility ideograph block start
    val fullwidth = 0xFF01.toChar  // fullwidth exclamation mark
    for (c <- Seq(pua, cjkCompat, fullwidth, Bpe.Sep)) {
      val t = s"ab${c}cd"
      pretokens(t).foreach { p =>
        assert(Bpe.bpeEncode(p) == replayEncode(p),
          s"encode divergence on pre-token '$p' with char U+${c.toInt.toHexString}")
      }
      // whole-doc entry point must not throw either
      assert(enc(t).filterNot(_ == Bpe.Sep).nonEmpty || c == Bpe.Sep)
    }
  }

  test("encode equals the oracle replay on generated strings and the corpus") {
    val gen = for {
      n <- Gen.choose(0, 24)
      cs <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.oneOf("etaoinshrdlu ".toSeq)),
        (2, Gen.oneOf("bcfgmpw0123".toSeq))))
    } yield cs.mkString
    val samples = (0 until 300).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(99L + i)))
    samples.foreach { s =>
      pretokens(s).foreach { t =>
        assert(Bpe.bpeEncode(t) == replayEncode(t),
          s"encode divergence on pre-token '$t' of '$s'")
      }
    }
    val spark = graft.SparkSpec.session
    val texts = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0))
    texts.flatMap(pretokens).distinct.foreach { t =>
      assert(Bpe.bpeEncode(t) == replayEncode(t), s"encode divergence on '$t'")
    }
  }

  test("merge loop equals the replace chain on every corpus pre-token (sf0.001)") {
    val s = graft.SparkSpec.session
    val texts = graft.sources.Tables.documents(s, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0))
    val distinctPretokens = texts.flatMap(pretokens).distinct
    assert(distinctPretokens.nonEmpty)
    distinctPretokens.foreach { t =>
      assert(Bpe.bpeCount(t) == replayCount(t), s"divergence on '$t'")
    }
    // and the corpus actually exercises the table: some pre-token must merge
    assert(distinctPretokens.exists(t => Bpe.bpeCount(t) < t.length))
  }
}
