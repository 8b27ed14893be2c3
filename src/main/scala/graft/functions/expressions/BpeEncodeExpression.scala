package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real-BPE ENCODE (the token sequence, not just its length) as a native
  * codegen expression — the other half of the apply story beside
  * [[BpeCountExpression]], and what a tokenization pass actually ships:
  * per document, every token's surface followed by `Bpe.Sep`, in order.
  * Same custom-code rationale as the count: an imperative merge loop per
  * document that must stay inside whole-stage codegen (one static call),
  * not fall out through a Scala UDF. Semantics live in
  * [[graft.functions.Bpe]]; the DuckDB oracle replays them with the same
  * replace chain plus per-symbol separator insertion (`Bpe.encodeSql`).
  */
case class BpeEncodeExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects STRING input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.Bpe.encodeDoc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encodeDoc($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpression =
    copy(child = newChild)
}

object BpeEncodeExpression {
  /** Column API for the real-BPE token sequence (Sep-joined wire form). */
  def bpe_encode(text: Column): Column =
    Bridge.column(BpeEncodeExpression(Bridge.expression(text)))
}
