package graft.functions

import graft.SparkSpec
import graft.functions.expressions.GramBloom
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Bloom-pruned decontamination composition: kernel guarantees
  * (no false negatives ever, FP rate near target), codegen==interpreted
  * parity for the probe expression, the loud cap, and end-to-end equality
  * with the exact rule it prunes for. */
class BloomDecontaminateSpec extends SparkSpec {

  private def bloomOf(keys: Seq[String], fpp: Double = 0.01) = {
    val (m, k) = GramBloom.params(keys.size.toLong, fpp)
    val bits = new Array[Long](m >>> 6)
    keys.foreach(s => GramBloom.set(bits, m, k, UTF8String.fromString(s)))
    (bits, m, k)
  }

  test("no false negatives: every inserted key is contained") {
    val keys = (0 until 5000).map(i => s"gram $i of the eval suite")
    val (bits, m, k) = bloomOf(keys)
    assert(keys.forall(s =>
      GramBloom.contains(bits, m, k, UTF8String.fromString(s))))
  }

  test("false-positive rate is near the target, not a degenerate all-true") {
    val keys = (0 until 5000).map(i => s"member $i")
    val (bits, m, k) = bloomOf(keys, fpp = 0.01)
    val probes = (0 until 20000).map(i => s"non-member $i")
    val fps = probes.count(s =>
      GramBloom.contains(bits, m, k, UTF8String.fromString(s)))
    val rate = fps.toDouble / probes.size
    assert(rate < 0.03, s"FP rate $rate should be near the 1% target")
  }

  test("probe expression: codegen (top-level filter) == interpreted (inside exists)") {
    import spark.implicits._
    val keys = Seq("alpha beta gamma", "delta epsilon zeta")
    val (bits, m, k) = bloomOf(keys)
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota"), (4L, "alpha beta DELTA")
    ).toDF("id", "s")
    // codegen path: the expression sits in a plain Filter inside the
    // whole-stage span
    val viaFilter = df.filter(GramBloom.bloom_contains(bits, m, k)(col("s")))
      .select("id").as[Long].collect().toSet
    // interpreted path: the same expression under a higher-order lambda
    val viaExists = df.select(col("id"), array(col("s")).as("a"))
      .filter(exists(col("a"), g => GramBloom.bloom_contains(bits, m, k)(g)))
      .select("id").as[Long].collect().toSet
    assert(viaFilter == viaExists)
    assert(Set(1L, 2L).subsetOf(viaFilter)) // members always flagged
    // doc 3/4 (non-members) MAY false-positive — that is the filter's
    // contract, so their absence is deliberately not asserted
  }

  test("build cap binds loudly, never truncates silently") {
    import spark.implicits._
    val keys = (0 until 50).map(i => s"k$i").toDF("gram")
    val e = intercept[IllegalArgumentException] {
      GramBloom.build(keys, "gram", maxEntries = 10)
    }
    assert(e.getMessage.contains("maxEntries"))
  }

  test("q_decontaminate_bloom == q_decontaminate (exact rule, pruned plan)") {
    val exact = graft.SparkEntry.queries("q_decontaminate")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val bloomed = graft.SparkEntry.queries("q_decontaminate_bloom")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(bloomed == exact)
    assert(exact.nonEmpty)
  }

  test("the pruned plan explodes only the bloom-flagged branch; bits are a plan constant") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Generate, Join, LogicalPlan}
    import graft.functions.expressions.BloomContainsAnyExpression
    val df = graft.SparkEntry.queries("q_decontaminate_bloom")(spark, sfDir)
    val lp = df.queryExecution.optimizedPlan
    def hasBloomFilterBelow(p: LogicalPlan): Boolean = p.exists {
      case f: LFilter =>
        f.condition.exists(_.isInstanceOf[BloomContainsAnyExpression])
      case _ => false
    }
    // the verify-side explode must sit ABOVE the bloom prefilter — the
    // structural form of "only flagged documents pay the explode"
    val gens = lp.collect { case g: Generate => g }
    assert(gens.nonEmpty && gens.exists(hasBloomFilterBelow),
      s"some Generate must have the bloom Filter beneath it:\n$lp")
    // the bloom bits travel as a plan constant: no join may sit BELOW
    // the bloom filter (a broadcast of the eval relation feeding the
    // prefilter would appear here as a Join under the Filter)
    lp.foreach {
      case f: LFilter if f.condition.exists(_.isInstanceOf[BloomContainsAnyExpression]) =>
        assert(f.find(_.isInstanceOf[Join]).isEmpty,
          s"the bloom prefilter must not depend on any join:\n$f")
      case _ => ()
    }
    assert(df.queryExecution.executedPlan.toString.contains("bloom_contains_any"),
      "bloom probe should survive into the executed plan as a filter")
  }

  test("long variant: no false negatives, containsAny flags iff some element is set") {
    def scramble(i: Long): Long = i * 0x9E3779B97F4A7C15L + 12345L
    val keys = (0 until 5000).map(i => scramble(i))
    val (m, k) = GramBloom.params(keys.size.toLong, 1e-4)
    val bits = new Array[Long](m >>> 6)
    keys.foreach(v => GramBloom.setLong(bits, m, k, v))
    assert(keys.forall(v => GramBloom.containsLong(bits, m, k, v)))
    // per-key FP at 1e-4: 20k random probes should see ~2 FPs, bound 20
    val probes = (1 to 20000).map(i => scramble(-i - 1))
    val fps = probes.count(v => GramBloom.containsLong(bits, m, k, v))
    assert(fps <= 20, s"long-variant FP count $fps far above the 1e-4 target")
    // array probe: any member -> true, all non-members overwhelmingly false
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    assert(GramBloom.containsAny(bits, m, k,
      new GenericArrayData(Array(probes.head, keys(17)))))
  }

  test("doc-level FP rate: a clean many-gram document stays percent-level at fpp=1e-4") {
    import spark.implicits._
    import graft.functions.expressions.SpanHash
    // 200 eval grams vs 1000 clean docs of ~100 grams each, all disjoint
    val evalDocs = (0 until 5).map(i => (i.toLong, (0 until 42).map(j => s"e${i}_$j").mkString(" ")))
    val clean = (0 until 1000).map(i => (100L + i, (0 until 102).map(j => s"c${i}_$j").mkString(" ")))
    val all = (evalDocs ++ clean).toDF("doc_id", "text")
    val evalHashes = all.filter(col("doc_id") < 10)
      .select(split(col("text"), " ").as("toks"))
      .select(explode(array_distinct(SpanHash.span_hashes(col("toks"), 3))).as("h"))
      .distinct()
    val (bits, m, k) = GramBloom.buildLong(evalHashes, "h", fpp = 1e-4)
    val flagged = all.filter(col("doc_id") >= 10)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(GramBloom.bloom_contains_any(bits, m, k)(SpanHash.span_hashes(col("toks"), 3)))
      .count()
    assert(flagged <= 50, s"$flagged of 1000 clean docs flagged — doc-level FP should be ~1%")
  }
}
