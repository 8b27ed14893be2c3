package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jegou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search") — the vector-COMPRESSION half of the ANN
  * stack: split a Dim-vector into M subvectors, encode each against a
  * per-subspace codebook of C centroids, and score query-candidate pairs
  * from the codes alone (asymmetric distance computation, ADC) without
  * ever touching the candidate's floats.
  *
  * Why this is the 100 TB path: a 64-dim float64 embedding is 512 bytes;
  * its 8 subspace codes are 8 bytes — the candidate payload that crosses
  * the probe join shrinks 64x, which at corpus scale is the difference
  * between an index that fits in cluster memory and one that doesn't.
  *
  * All three kernels take the codebook as a CONSTANT OBJECT through
  * `ctx.addReferenceObj` (the [[CentroidDots]] lesson: literal-matrix
  * forms regenerate Janino source per codebook change), accumulate
  * left-to-right in double, and are replayed value-exactly by the DuckDB
  * oracles (same md5-label weights, same fold order).
  */
object PqExpressions {

  /** Column API: array<int> of M codes, one per subspace. */
  def pq_encode(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), cb))

  /** Column API: array<array<double>> ADC lookup table (M x C) for a
    * QUERY vector — lut(m)(c) = dot(q_m, cb(m)(c)). */
  def pq_lut(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqLut(Bridge.expression(vec), cb))

  /** Column API: ADC score = sum_m lut(m)(codes(m)) — the approximate
    * dot(query, candidate) computed from the candidate's codes alone. */
  def pq_adc(lut: Column, codes: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(lut), Bridge.expression(codes)))

  private[expressions] def cbEquals(a: Array[Array[Array[Double]]],
                                    b: Array[Array[Array[Double]]]): Boolean =
    a.length == b.length && a.indices.forall { m =>
      a(m).length == b(m).length &&
        a(m).indices.forall(c => java.util.Arrays.equals(a(m)(c), b(m)(c)))
    }

  private[expressions] def cbHash(cb: Array[Array[Array[Double]]]): Int =
    cb.map(_.map(java.util.Arrays.hashCode).toSeq.hashCode()).toSeq.hashCode()

  private[expressions] def checkVec(dt: DataType, what: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$what expects array<float|double> input, got ${other.simpleString}")
    }
}

/** Per-subspace nearest-code ids for a vector: array<int> of length M.
  * Distance is squared L2, accumulated left-to-right; argmin ties break
  * to the LOWER code id (strict `<` while scanning codes ascending —
  * the same first-occurrence-of-min `list_position(l, list_min(l))`
  * returns in the DuckDB replay). NULL for a vector whose length is not
  * M x SubDim (malformed vectors surface, never encode a prefix). */
case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    PqExpressions.checkVec(child.dataType, "pq_encode")

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = cb.length
    val sub = if (m == 0) 0 else cb(0)(0).length
    if (x.numElements() != m * sub) return null
    val isF = elemIsFloat
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val codes = cb(mi)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codes.length) {
        val w = codes(c)
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val xd: Double =
            if (isF) x.getFloat(mi * sub + d).toDouble else x.getDouble(mi * sub + d)
          val diff = xd - w(d)
          acc += diff * diff
          d += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cbRef = ctx.addReferenceObj("cb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b"); val m = ctx.freshName("m")
      val sub = ctx.freshName("sub"); val out = ctx.freshName("out")
      val mi = ctx.freshName("mi"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |double[][][] $b = $cbRef;
         |int $m = $b.length;
         |int $sub = $m == 0 ? 0 : $b[0][0].length;
         |if ($v.numElements() != $m * $sub) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    int $best = 0;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $b[$mi].length; $c++) {
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $sub; $d++) {
         |        double $diff = ((double) $v.$get($mi * $sub + $d)) - $b[$mi][$c][$d];
         |        $acc += $diff * $diff;
         |      }
         |      if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |    }
         |    $out[$mi] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override def equals(other: Any): Boolean = other match {
    case PqEncode(c2, b2) => child == c2 && PqExpressions.cbEquals(cb, b2)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + PqExpressions.cbHash(cb)

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC lookup table for a QUERY vector: array<array<double>> of M rows of
  * C entries, lut(m)(c) = dot(q[m*sub .. m*sub+sub), cb(m)(c)) — computed
  * ONCE per query, so per-candidate scoring is M array reads instead of
  * Dim multiplies. Same left-to-right fold as [[DotProduct]]. */
case class PqLut(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    PqExpressions.checkVec(child.dataType, "pq_lut")

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = cb.length
    val sub = if (m == 0) 0 else cb(0)(0).length
    if (x.numElements() != m * sub) return null
    val isF = elemIsFloat
    val rows = new Array[ArrayData](m)
    var mi = 0
    while (mi < m) {
      val codes = cb(mi)
      val row = new Array[Double](codes.length)
      var c = 0
      while (c < codes.length) {
        val w = codes(c)
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val xd: Double =
            if (isF) x.getFloat(mi * sub + d).toDouble else x.getDouble(mi * sub + d)
          acc += xd * w(d)
          d += 1
        }
        row(c) = acc
        c += 1
      }
      rows(mi) = new GenericArrayData(row)
      mi += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cbRef = ctx.addReferenceObj("cb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b"); val m = ctx.freshName("m")
      val sub = ctx.freshName("sub"); val rows = ctx.freshName("rows")
      val row = ctx.freshName("row"); val mi = ctx.freshName("mi")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |double[][][] $b = $cbRef;
         |int $m = $b.length;
         |int $sub = $m == 0 ? 0 : $b[0][0].length;
         |if ($v.numElements() != $m * $sub) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] $rows = new Object[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    double[] $row = new double[$b[$mi].length];
         |    for (int $c = 0; $c < $b[$mi].length; $c++) {
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $sub; $d++) {
         |        $acc += ((double) $v.$get($mi * $sub + $d)) * $b[$mi][$c][$d];
         |      }
         |      $row[$c] = $acc;
         |    }
         |    $rows[$mi] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
         |}
       """.stripMargin
    })
  }

  override def equals(other: Any): Boolean = other match {
    case PqLut(c2, b2) => child == c2 && PqExpressions.cbEquals(cb, b2)
    case _ => false
  }
  override def hashCode(): Int = 37 * child.hashCode() + PqExpressions.cbHash(cb)

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC score from a query's lookup table and a candidate's codes:
  * sum_m lut(m)(codes(m)), folded left-to-right — the approximate
  * dot(query, candidate) whose only per-candidate input is the M-byte
  * code array. NULL on rank mismatch or an out-of-range code (a
  * corrupted index surfaces instead of scoring garbage). */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val lutOk = left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (lutOk && codesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<array<double>>, array<int>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = lut.numElements()
    if (codes.numElements() != m) return null
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      val row = lut.getArray(mi)
      val c = codes.getInt(mi)
      if (c < 0 || c >= row.numElements()) return null
      acc += row.getDouble(c)
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m"); val mi = ctx.freshName("mi")
      val row = ctx.freshName("row"); val c = ctx.freshName("c")
      val acc = ctx.freshName("acc"); val bad = ctx.freshName("bad")
      s"""
         |int $m = $a.numElements();
         |if ($b.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $mi = 0; $mi < $m && !$bad; $mi++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $a.getArray($mi);
         |    int $c = $b.getInt($mi);
         |    if ($c < 0 || $c >= $row.numElements()) { $bad = true; }
         |    else { $acc += $row.getDouble($c); }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}
