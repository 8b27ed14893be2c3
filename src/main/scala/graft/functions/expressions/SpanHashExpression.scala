package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Rolling-span hash kernel shared by the interpreted and generated paths.
  *
  * Element j of the result is EXACTLY
  * `hash60(array_join(slice(toks, j+1, w), " "))` — md5 over the UTF-8
  * bytes of the space-joined w-token window, first 15 hex chars parsed
  * base-16 (= first 8 digest bytes as a big-endian long >>> 4). The span
  * STRING is never materialized: token byte slices feed the digest
  * directly with a 0x20 separator, which is byte-identical to hashing the
  * joined string because UTF-8 concatenation is byte concatenation. The
  * DuckDB oracles replay `md5(span_text)` unchanged.
  */
object SpanHash {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val empty = new GenericArrayData(Array.empty[Long])

  /** All w-token rolling span hashes of a token array, in span-start
    * order (index j = 0-based start position); empty when the document
    * is shorter than w. split() output never contains nulls, but the
    * SQL surface (GraftExtensions) accepts any ARRAY<STRING>: null
    * elements are SKIPPED along with their separator — exactly what
    * `array_join(slice(...), " ")` does without a null replacement, so
    * the contract element j == hash60(array_join(slice(toks, j+1, w)))
    * holds on null-bearing arrays too instead of NPE-ing. */
  def spanHashes(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return empty
    val md = mdLocal.get()
    val digest = new Array[Byte](16)
    // one byte copy per token, not one per (token x covering span)
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      tokBytes(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    var j = 0
    while (j <= n - w) {
      md.reset()
      var t = j
      var wrote = false
      while (t < j + w) {
        if (tokBytes(t) != null) {
          if (wrote) md.update(0x20.toByte)
          md.update(tokBytes(t))
          wrote = true
        }
        t += 1
      }
      md.digest(digest, 0, 16)
      out(j) = (((digest(0) & 0xffL) << 56) | ((digest(1) & 0xffL) << 48) |
        ((digest(2) & 0xffL) << 40) | ((digest(3) & 0xffL) << 32) |
        ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
        ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)) >>> 4
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `span_hashes(toks, w)` over a token-array column. */
  def span_hashes(toks: Column, w: Int): Column =
    Bridge.column(SpanHashesExpression(Bridge.expression(toks), w))

  /** WINNOWED span hashes (Schleimer et al. 2003, the MOSS scheme):
    * element j = min of the w-token span hashes in window [j, j+k-1] —
    * the per-window minimum selection whose DISTINCT set is the
    * document's fingerprint. The guarantee that makes it sound for
    * substring dedup: any shared run of >= w+k-1 tokens contains a full
    * window on both sides, and the minimum of equal hash windows is
    * equal, so the documents MUST share a fingerprint — detection never
    * misses long matches, while per-doc fingerprint mass drops to
    * ~2/(k+1) of span mass. Computed in one pass over the span hashes
    * with a monotonic deque (O(n), not O(n*k)); empty when the document
    * has fewer than w+k-1 tokens. */
  def winnowHashes(toks: ArrayData, w: Int, k: Int): ArrayData = {
    val spans = spanHashes(toks, w)
    val n = spans.numElements()
    if (n < k) return empty
    val out = new Array[Long](n - k + 1)
    // deque of indices with increasing hash values; front = window min.
    // ties keep the EARLIEST index (strict < when evicting), which makes
    // the per-window minimum value well-defined either way — the output
    // is the VALUE, so tie policy cannot change it.
    val dq = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail) live
    var j = 0
    while (j < n) {
      while (tail > head && spans.getLong(dq(tail - 1)) > spans.getLong(j))
        tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - k) head += 1
      if (j >= k - 1) out(j - k + 1) = spans.getLong(dq(head))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `winnow_hashes(toks, w, k)` — positional per-window
    * minima; wrap in `array_distinct` for the fingerprint SET. */
  def winnow_hashes(toks: Column, w: Int, k: Int): Column =
    Bridge.column(WinnowHashesExpression(Bridge.expression(toks), w, k))
}

/** All rolling w-token span hashes of a token array in ONE codegen call.
  *
  * Why a custom Expression (SURVEY.md §4 — custom code only as a scale
  * upgrade): the functions-API span stage builds each span STRING through
  * interpreted higher-order functions (slice + array_join per span — HOF
  * dispatch per element, a UTF8String concat allocation per span), then
  * EXPLODES ~50-byte strings only to hash them to 8 bytes on the other
  * side. This expression hashes in place: the explode carries longs, the
  * per-span Catalyst dispatch and string allocations disappear, and the
  * whole span stage is one static call inside the scan's codegen span.
  * Bit-identical to the fold it replaces (see [[SpanHash.spanHashes]]),
  * so every span-family oracle is unchanged.
  */
case class SpanHashesExpression(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"span width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_hashes expects ARRAY<STRING> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SpanHash.spanHashes(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SpanHash.spanHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashesExpression =
    copy(child = newChild)
}

/** Winnowed (per-window minimum) span hashes in one codegen call — see
  * [[SpanHash.winnowHashes]] for the selection guarantee and the O(n)
  * deque. Same input contract as [[SpanHashesExpression]]. */
case class WinnowHashesExpression(child: Expression, w: Int, k: Int)
  extends UnaryExpression {
  require(w >= 1 && k >= 1, s"span width and window must be >= 1, got w=$w k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_hashes expects ARRAY<STRING> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SpanHash.winnowHashes(input.asInstanceOf[ArrayData], w, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SpanHash.winnowHashes($c, $w, $k)")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashesExpression =
    copy(child = newChild)
}
