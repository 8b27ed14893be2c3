package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real-BPE token count as a native codegen expression.
  *
  * Why an Expression (SURVEY.md §4 custom-code ladder): the merge loop is
  * imperative per-document work that the functions API cannot express, and
  * a Scala UDF would fall out of whole-stage codegen and pay
  * serialization per row. This stays inside the generated stage as one
  * static call (the same pattern as [[RollingHashExpression]]), so the
  * BPE count composes with packing/histogram pipelines at scan speed —
  * the shape a 100 TB token-budget pass needs. Semantics live in
  * [[graft.functions.Bpe]]; the DuckDB oracle replays them as a
  * rank-ordered `replace()` chain.
  */
case class BpeCountExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_count expects STRING input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.Bpe.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpression =
    copy(child = newChild)
}

object BpeCountExpression {
  /** Column API for the real-BPE token count. */
  def bpe_count(text: Column): Column =
    Bridge.column(BpeCountExpression(Bridge.expression(text)))
}
