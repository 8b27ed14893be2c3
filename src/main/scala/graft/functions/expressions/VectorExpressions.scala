package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native dot product over float/double array columns.
  *
  * Semantics: promote each element to double, multiply pairwise, accumulate
  * LEFT TO RIGHT — exactly the fold `aggregate(zip_with(a,b,_*_),0.0,_+_)`
  * computes, and exactly what the DuckDB oracles' `list_reduce` replays, so
  * swapping this in changes performance, never results.
  *
  * Why a custom Expression (SURVEY.md §4 "custom code only as perf
  * upgrade"): the functions-API fold materializes a zipped intermediate
  * array per row-pair and walks it with per-element Catalyst dispatch. This
  * expression compiles to a tight primitive loop inside whole-stage codegen
  * — no allocation, no boxing — which matters when similarity joins score
  * millions of candidate pairs. Falls back to an interpreted eval with the
  * identical accumulation order.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // length mismatch yields NULL — same as the zip_with/aggregate fold this
  // expression documents itself equivalent to (zip_with pads the shorter
  // array with nulls, nulling the whole sum), so malformed vectors surface
  // instead of silently scoring a truncated prefix
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Dot products of a vector column against a CONSTANT centroid matrix
  * (K x Dim), returned as array<double> of K dots in centroid order.
  *
  * Why not K [[DotProduct]]s against `array(lit...)` literals: that form
  * embeds K x Dim literal nodes in the expression tree, and the generated
  * source CHANGES whenever the matrix values change — each Lloyd's
  * training round then pays a fresh Janino compilation of a very large
  * method (measured as the dominant fixed cost of KMeans.train; see
  * SCALE.md). Here the matrix enters through `ctx.addReferenceObj`, so the
  * generated source is matrix-value-INVARIANT: every training round (and
  * every retrain) reuses one compiled unit from the codegen cache.
  *
  * Accumulation per centroid is the same left-to-right double fold as
  * [[DotProduct]], so scores are bit-identical to the literal form and to
  * the oracles' `list_reduce` replay. A vector whose length differs from
  * the matrix's Dim yields NULL (the literal form nulled per-dot; one
  * malformed vector should surface, not score a truncated prefix).
  */
case class CentroidDots(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_dots expects array<float|double> input, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = if (cents.isEmpty) 0 else cents(0).length
    if (x.numElements() != dim) return null
    val isF = elemIsFloat
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val row = cents(c)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val xd: Double = if (isF) x.getFloat(d).toDouble else x.getDouble(d)
        acc += xd * row(d)
        d += 1
      }
      out(c) = acc
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    // constant OBJECT reference: the generated source below never mentions
    // a matrix value, so retraining produces byte-identical source and the
    // codegen cache serves it compiled
    val matRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.freshName("mat")
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |double[][] $mat = $matRef;
         |int $dim = $mat.length == 0 ? 0 : $mat[0].length;
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$mat.length];
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += ((double) $v.$get($d)) * $mat[$c][$d];
         |    }
         |    $out[$c] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  // Array fields compare by reference under case-class equality; compare
  // matrix CONTENTS so two plans over equal matrices canonicalize alike
  // (semanticEquals / subexpression elimination)
  override def equals(other: Any): Boolean = other match {
    case CentroidDots(c2, m2) =>
      child == c2 && cents.length == m2.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), m2(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + cents.map(java.util.Arrays.hashCode).toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): CentroidDots =
    copy(child = newChild)
}

/** Residual of a vector against its coarse cell's centroid:
  * res[d] = (double)v[d] - cents[cell][d], as array<double> — the input to
  * residual product quantization (IVFADC proper, Jegou et al. 2011 §IV:
  * sub-quantizers encode the coarse-quantization RESIDUAL, whose much
  * smaller magnitudes make C codes per subspace go far further than on raw
  * vectors). The centroid matrix is a constant reference (the
  * [[CentroidDots]] discipline), the cell id is a per-row column. NULL on
  * a dim mismatch or an out-of-range cell — a corrupted assignment
  * surfaces instead of subtracting garbage. */
case class CentroidResidual(left: Expression, right: Expression,
                            cents: Array[Array[Double]])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vecOk && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"centroid_residual expects (array<float|double>, int), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, cl: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cell = cl.asInstanceOf[Int]
    val dim = if (cents.isEmpty) 0 else cents(0).length
    if (x.numElements() != dim || cell < 0 || cell >= cents.length) return null
    val isF = elemIsFloat
    val row = cents(cell)
    val out = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      val xd: Double = if (isF) x.getFloat(d).toDouble else x.getDouble(d)
      out(d) = xd - row(d)
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val matRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, cl) => {
      val mat = ctx.freshName("mat")
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val d = ctx.freshName("d")
      s"""
         |double[][] $mat = $matRef;
         |int $dim = $mat.length == 0 ? 0 : $mat[0].length;
         |if ($v.numElements() != $dim || $cl < 0 || $cl >= $mat.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$dim];
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $out[$d] = ((double) $v.$get($d)) - $mat[$cl][$d];
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override def equals(other: Any): Boolean = other match {
    case CentroidResidual(l2, r2, m2) =>
      left == l2 && right == r2 && cents.length == m2.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), m2(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      cents.map(java.util.Arrays.hashCode).toSeq.hashCode()

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidResidual =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column API for the native dot product. */
  def dot_native(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for the constant-matrix centroid dots. */
  def centroid_dots(vec: Column, cents: Array[Array[Double]]): Column =
    Bridge.column(CentroidDots(Bridge.expression(vec), cents))

  /** Column API for the per-cell centroid residual. */
  def centroid_residual(vec: Column, cell: Column,
                        cents: Array[Array[Double]]): Column =
    Bridge.column(CentroidResidual(
      Bridge.expression(vec), Bridge.expression(cell), cents))
}
