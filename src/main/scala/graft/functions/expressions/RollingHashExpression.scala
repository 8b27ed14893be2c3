package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared fold kernel for [[RollingHashExpression]] — a plain static method
  * so the generated whole-stage code can call it directly. */
object RollingHash {
  val Mod = 1000000007L

  /** fold(acc*31 + codePoint) mod 1e9+7 over the string's characters —
    * exactly what `aggregate(transform(split(text,""), ascii), 0L, ...)`
    * computes (Spark's split on the empty pattern yields one element per
    * character with no trailing empty, SPARK-40194; `ascii` returns the
    * code point), and what the DuckDB oracle's
    * `list_reduce(..., string_split(text,''), ascii ...)` replays.
    * ASCII fast path walks the UTF8String bytes in place (no allocation);
    * multi-byte strings fall back to code-point iteration, which agrees
    * with both engines' `ascii` on non-ASCII characters. */
  def fpHash(s: UTF8String): Long = {
    var acc = 0L
    val nBytes = s.numBytes
    if (nBytes == s.numChars()) {
      var i = 0
      while (i < nBytes) {
        acc = (acc * 31L + (s.getByte(i) & 0xffL)) % Mod
        i += 1
      }
    } else {
      val str = s.toString
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        acc = (acc * 31L + cp) % Mod
        i += Character.charCount(cp)
      }
    }
    acc
  }
}

/** Native rolling-hash document fingerprint.
  *
  * Why a custom Expression (SURVEY.md §4 "custom code only as perf
  * upgrade"): the functions-API formulation materializes a per-character
  * string array and an ascii-mapped long array per document and folds them
  * through interpreted higher-order functions — measured 4.2 s at sf0.1 for
  * what is one tight loop. This compiles to a single static call inside
  * whole-stage codegen: no arrays, no per-character Catalyst dispatch.
  * Results are bit-identical to the fold it replaces (see
  * [[RollingHash.fpHash]]), so the DuckDB oracle is unchanged.
  */
case class RollingHashExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.fpHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.RollingHash.fpHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpression =
    copy(child = newChild)
}

object RollingHashExpression {
  /** Column API for the native rolling-hash fingerprint. */
  def rolling_hash(text: Column): Column =
    Bridge.column(RollingHashExpression(Bridge.expression(text)))
}
