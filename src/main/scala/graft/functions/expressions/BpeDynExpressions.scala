package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeDyn

/** Trained-table BPE application as native codegen expressions — the
  * dynamic twins of [[BpeCountExpression]]/[[BpeEncodeExpression]],
  * whose merge table is compiled in. Here the table is MODEL STATE (the
  * persisted vocabulary artifact, [[graft.operators.BpeVocab]]), so the
  * applier rides into the generated code as a CONSTANT OBJECT through
  * `ctx.addReferenceObj` — the [[PqExpressions]] codebook pattern: one
  * virtual call per document inside whole-stage codegen, no Janino
  * re-compilation per vocabulary, no UDF serialization. */
object BpeDynExpressions {

  private def checkStr(dt: DataType, what: String): TypeCheckResult =
    if (dt == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$what expects STRING input, got ${dt.simpleString}")

  /** Column API: trained-table token count. */
  def bpe_count_dyn(text: Column, rules: IndexedSeq[(String, String)]): Column =
    Bridge.column(BpeDynCount(Bridge.expression(text), new BpeDyn(rules)))

  /** Column API: trained-table token sequence (surface + Sep wire form). */
  def bpe_encode_dyn(text: Column, rules: IndexedSeq[(String, String)]): Column =
    Bridge.column(BpeDynEncode(Bridge.expression(text), new BpeDyn(rules)))

  case class BpeDynCount(child: Expression, applier: BpeDyn)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      checkStr(child.dataType, "bpe_count_dyn")
    override protected def nullSafeEval(input: Any): Any =
      applier.countTokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeDyn", applier, classOf[BpeDyn].getName)
      defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeDynCount =
      copy(child = newChild)
  }

  case class BpeDynEncode(child: Expression, applier: BpeDyn)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult =
      checkStr(child.dataType, "bpe_encode_dyn")
    override protected def nullSafeEval(input: Any): Any =
      applier.encodeDoc(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeDyn", applier, classOf[BpeDyn].getName)
      defineCodeGen(ctx, ev, c => s"$ref.encodeDoc($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeDynEncode =
      copy(child = newChild)
  }
}
