package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Shared interleave kernel for [[ZOrderExpression]] — a plain static
  * method so the generated whole-stage code can call it directly. */
object ZOrder {

  /** Spread the low 32 bits of `v` into the even bit positions of a long
    * (the standard mask-shift Morton spread: 5 shift/or/and steps, no
    * loop). Bits above the low 32 are DROPPED — callers range-bucket or
    * truncate wider keys first (a layout key needs locality, not
    * injectivity). */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton/Z-order key: bit-interleave of the low 32 bits of `x` (even
    * positions) and `y` (odd positions). Monotone locality in BOTH
    * dimensions — sorting by it clusters rows that are close in either
    * column, which is what makes min/max row-group pruning engage for
    * filters on either one. */
  def zkey(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** Z-order (Morton) interleave of two integer columns — the
  * multi-dimensional LAYOUT key (the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * device, re-expressed as a plain codegen expression): write data sorted
  * by `z_order(a, b)` and parquet min/max row-group stats become selective
  * for predicates on EITHER column, where a single-column sort only serves
  * its leading column. Pure per-row bit math inside whole-stage codegen —
  * the sort it feeds is the same one shuffle any sorted write already
  * pays. Evidence: ZOrderSpec (row-group skipping on both dimensions of a
  * z-sorted write vs a one-column sort) + SCALE.md.
  */
case class ZOrderExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_order expects (BIGINT, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.zkey(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expressions.ZOrder.zkey($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpression =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpression {
  /** Column API for the Z-order layout key. Inputs are cast to long; only
    * their low 32 bits participate (see [[ZOrder.spread]]). */
  def z_order(x: Column, y: Column): Column =
    Bridge.column(ZOrderExpression(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long"))))

  /** The same key in DuckDB SQL (bit-by-bit interleave over the low 32
    * bits — the oracle replay of [[ZOrder.zkey]]). Computed in HUGEINT
    * with an explicit two's-complement wrap: the kernel's bit 63 (y's
    * bit 31) makes the long NEGATIVE in Scala, while a BIGINT `1 << 63`
    * overflows in DuckDB — so the shifts accumulate in 128-bit and the
    * wrap reproduces the signed-64 value exactly over the full 32-bit
    * input domain (ZOrderSpec checks the kernel on full-range longs). */
  def zOrderSql(x: String, y: String): String = {
    val s =
      s"""list_sum(list_transform(range(0, 32), i ->
         |    (CAST(($x >> i) & 1 AS HUGEINT) << (2*i)) +
         |    (CAST(($y >> i) & 1 AS HUGEINT) << (2*i + 1))))""".stripMargin
    s"""CAST(CASE WHEN $s >= 9223372036854775808::HUGEINT
       |  THEN $s - 18446744073709551616::HUGEINT ELSE $s END AS BIGINT)""".stripMargin
  }
}
