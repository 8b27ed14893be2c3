package graft.functions.expressions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compact Bloom filter over STRING keys, built once on the driver from a
  * bounded key set and probed row-side inside whole-stage codegen.
  *
  * Why it exists (SURVEY.md §4 — custom code only as a scale upgrade): the
  * exact decontamination rule (`q_decontaminate`) must explode EVERY
  * training document into word-3-gram rows before the broadcast-hash probe
  * — a ~|tokens|-per-doc row blowup that at 100 TB is the dominant cost of
  * the whole pass even though the eval side is tiny. A Bloom filter of the
  * eval gram set is a fixed-size array shipped inside the plan, so each
  * document can be tested IN PLACE at the scan (`exists` over its gram
  * array); only the flagged fraction — contamination is percent-level in
  * production corpora — ever pays the explode + shuffle + distinct.
  * False positives (target fpp here 1%) only inflate that flagged fraction
  * and are removed by the exact verify join that follows; false negatives
  * are impossible (every true eval gram was inserted), so the composed
  * result is bit-identical to the exact rule and shares its oracle.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over two XXH64 seeds
  * (Spark's own codegen'd hash kernel, `XXH64.hashUTF8String`) — the SAME
  * static used by the driver-side build and the executor-side probe, so
  * build/probe consistency holds by construction rather than by matching a
  * private implementation of `DataFrameStatFunctions.bloomFilter`.
  */
object GramBloom {
  private val Seed1 = 0x6b6f7270L
  private val Seed2 = 0x9747b28cL

  /** Sized from the standard Bloom formulae: m = -n ln p / (ln 2)^2 bits
    * (rounded up to whole longs), k = m/n ln 2 hash functions. The array
    * is indexed by Int, so m caps at ~2^31 bits; past ~25M keys at
    * fpp=1e-4 that cap would bind and a silent clamp would degrade the
    * effective per-key fpp — eroding the compounded per-document FP
    * budget the decontamination sizing depends on — so exceeding it
    * fails loudly like the maxEntries check (shard the key set or raise
    * fpp instead). */
  def params(n: Long, fpp: Double): (Int, Int) = {
    require(n > 0, "empty key set — nothing to filter")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2)
    val mBits0 = math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong
    val mBits = ((mBits0 + 63) / 64) * 64
    require(mBits <= Int.MaxValue.toLong - 63,
      s"GramBloom.params: n=$n at fpp=$fpp needs $mBits bits, over the " +
        "2^31-bit array cap — the filter can no longer honor the " +
        "requested fpp; shard the key set or raise fpp")
    val k = math.max(1, math.round(mBits.toDouble / n * ln2).toInt)
    (mBits.toInt, k)
  }

  def set(bits: Array[Long], mBits: Int, k: Int, s: UTF8String): Unit = {
    val h1 = XXH64.hashUTF8String(s, Seed1)
    val h2 = XXH64.hashUTF8String(s, Seed2)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits).toInt
      bits(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  /** Static membership probe — called directly from generated code. */
  def contains(bits: Array[Long], mBits: Int, k: Int, s: UTF8String): Boolean = {
    val h1 = XXH64.hashUTF8String(s, Seed1)
    val h2 = XXH64.hashUTF8String(s, Seed2)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits).toInt
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Build from a one-column DataFrame of keys. The collect is BOUNDED BY
    * CONSTRUCTION — eval suites are small relative to any corpus — and the
    * cap is observable, not silent (the ADVICE r10 rule): we fetch
    * maxEntries+1 rows and fail loudly if the cap binds, because a
    * truncated filter would silently lose the no-false-negative guarantee
    * that makes the exact-verify composition sound. */
  def build(keys: DataFrame, column: String, fpp: Double = 0.01,
            maxEntries: Int = 4000000): (Array[Long], Int, Int) = {
    val rows = keys.select(column).na.drop().distinct()
      .limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"GramBloom.build: key set exceeds maxEntries=$maxEntries — a " +
        "truncated Bloom filter loses the no-false-negative guarantee; " +
        "raise the cap or pre-reduce the key set")
    val (mBits, k) = params(rows.length.toLong.max(1L), fpp)
    val bits = new Array[Long](mBits >>> 6)
    rows.foreach { r =>
      set(bits, mBits, k, UTF8String.fromString(r.getString(0)))
    }
    (bits, mBits, k)
  }

  /** Column API: true iff `key` might be in the built filter. */
  def bloom_contains(bits: Array[Long], mBits: Int, k: Int)(key: Column): Column =
    Bridge.column(BloomContainsExpression(bits, mBits, k, Bridge.expression(key)))

  // ---- LONG-key variant: the codegen-end-to-end document prefilter ----
  //
  // A per-GRAM fpp compounds per DOCUMENT: at fpp=0.01 a clean ~80-gram
  // document is falsely flagged with probability 1-(1-0.01)^80 ~ 55% —
  // the measured decontam probe flagged 47% of a corpus with 2% planted
  // contamination. The document-level operating point needs per-key fpp
  // ~ target_doc_fpp / grams_per_doc (1e-4 -> ~1% doc-level at 100
  // grams), which costs only ~2x the bits (m grows with log 1/p).
  // Keys are the 60-bit span hashes the codegen span kernel
  // (SpanHashesExpression) already emits, so both the eval-side build
  // input and the probe side are whole-stage-codegen with no string or
  // interpreted-lambda work anywhere in the hot path.

  def setLong(bits: Array[Long], mBits: Int, k: Int, v: Long): Unit = {
    val h1 = XXH64.hashLong(v, Seed1)
    val h2 = XXH64.hashLong(v, Seed2)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits).toInt
      bits(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  def containsLong(bits: Array[Long], mBits: Int, k: Int, v: Long): Boolean = {
    val h1 = XXH64.hashLong(v, Seed1)
    val h2 = XXH64.hashLong(v, Seed2)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits).toInt
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Static any-element probe — one generated call per document. */
  def containsAny(bits: Array[Long], mBits: Int, k: Int,
                  arr: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (containsLong(bits, mBits, k, arr.getLong(i))) return true
      i += 1
    }
    false
  }

  /** Build from a one-column LONG DataFrame (e.g. distinct span hashes of
    * the eval suite) — same bounded-collect contract as [[build]]. */
  def buildLong(keys: DataFrame, column: String, fpp: Double = 1e-4,
                maxEntries: Int = 4000000): (Array[Long], Int, Int) = {
    val rows = keys.select(column).na.drop().distinct()
      .limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"GramBloom.buildLong: key set exceeds maxEntries=$maxEntries — a " +
        "truncated Bloom filter loses the no-false-negative guarantee; " +
        "raise the cap or pre-reduce the key set")
    val (mBits, k) = params(rows.length.toLong.max(1L), fpp)
    val bits = new Array[Long](mBits >>> 6)
    rows.foreach(r => setLong(bits, mBits, k, r.getLong(0)))
    (bits, mBits, k)
  }

  /** Column API: true iff ANY element of the ARRAY<BIGINT> column might be
    * in the built filter. */
  def bloom_contains_any(bits: Array[Long], mBits: Int, k: Int)(keys: Column): Column =
    Bridge.column(BloomContainsAnyExpression(bits, mBits, k, Bridge.expression(keys)))
}

/** EXACT membership against a plan-constant sorted long array (binary
  * search per element, one generated call per row) — the confirm tier of
  * the streaming decontamination chain: the Bloom prefilter says "maybe",
  * this answers exactly IN HASH CURRENCY with no join, which is what makes
  * per-row decontamination expressible in a STREAMING query (the batch
  * form's verify join derives its anti-join side from the corpus itself —
  * a stream cannot anti-join against an aggregate of itself). Size: 8
  * bytes/key, fine for eval suites (bounded by construction); the bloom
  * tier in front keeps the common clean-document case one cache-resident
  * probe instead of log2(M) jumps through a multi-MB array. */
object SortedLongSet {
  def containsAny(sorted: Array[Long],
                  arr: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) return true
      i += 1
    }
    false
  }

  /** Bounded, cap-checked collect of a one-column LONG DataFrame into the
    * sorted plan constant (the GramBloom.buildLong contract). */
  def build(keys: DataFrame, column: String, maxEntries: Int = 4000000): Array[Long] = {
    val rows = keys.select(column).na.drop().distinct()
      .limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"SortedLongSet.build: key set exceeds maxEntries=$maxEntries")
    val out = rows.map(_.getLong(0))
    java.util.Arrays.sort(out)
    out
  }

  def contains_any(sorted: Array[Long])(keys: Column): Column =
    Bridge.column(SortedContainsAnyExpression(sorted, Bridge.expression(keys)))
}

case class SortedContainsAnyExpression(sorted: Array[Long], child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_contains_any expects ARRAY<BIGINT> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SortedLongSet.containsAny(sorted,
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("sortedSet", sorted, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SortedLongSet.containsAny($setRef, $c)")
  }

  override def toString: String = s"sorted_contains_any($child)"

  override protected def withNewChildInternal(newChild: Expression): SortedContainsAnyExpression =
    copy(child = newChild)
}

/** Membership probe against a driver-built [[GramBloom]] bit array. The
  * array travels as a plan reference (`ctx.addReferenceObj`), not a
  * broadcast relation — there is no join, no exchange, and the probe is one
  * static call inside the scan's whole-stage-codegen span. Also evaluates
  * interpreted (`nullSafeEval`) for use inside higher-order lambdas, where
  * Spark evaluates the function body row-by-row. */
case class BloomContainsExpression(bits: Array[Long], mBits: Int, k: Int,
                                   child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects STRING input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    GramBloom.contains(bits, mBits, k, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.GramBloom.contains($bitsRef, $mBits, $k, $c)")
  }

  // the bit array renders as long[]@identity in plan strings — keep the
  // node label short instead of dumping k probe parameters
  override def toString: String = s"bloom_contains($child)"

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpression =
    copy(child = newChild)
}

/** Any-element membership probe over an ARRAY<BIGINT> column — the
  * document-level prefilter: one static call per document inside the
  * scan's codegen span (composes with SpanHashesExpression so the whole
  * flag stage is generated code; no interpreted higher-order lambda). */
case class BloomContainsAnyExpression(bits: Array[Long], mBits: Int, k: Int,
                                      child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains_any expects ARRAY<BIGINT> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GramBloom.containsAny(bits, mBits, k,
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.GramBloom.containsAny($bitsRef, $mBits, $k, $c)")
  }

  override def toString: String = s"bloom_contains_any($child)"

  override protected def withNewChildInternal(newChild: Expression): BloomContainsAnyExpression =
    copy(child = newChild)
}
