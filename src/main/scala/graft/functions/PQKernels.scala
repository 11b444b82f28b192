package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels as native codegen'd Catalyst expressions.
  *
  * Both take (vec: array<double>, codebook: LITERAL
  * array<array<array<double>>> of shape m × k × subDim) and iterate the
  * codebook as a driver-materialized `double[][][]` reference object, so
  * the generated code is a fixed-size loop — O(1) in m·k — instead of the
  * m·k unrolled literal expressions that previously blew janino's 64 KB
  * method limit (and HotSpot's 8 KB JIT limit) once m·k reached 128.
  *
  * Semantics are bit-identical to the unrolled form they replace:
  * partial distance d(s,c) = −2·Σⱼ vec[s·subDim+j]·cb[s][c][j] + ‖cb[s][c]‖²
  * with both sums accumulated left-to-right, argmin ties to the LOWER c.
  */
abstract class PQKernelBase extends BinaryExpression {
  def vec: Expression = left
  def codebook: Expression = right

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cOk = codebook.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    if (!vOk || !cOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<array<double>>>), " +
        s"got ${vec.dataType.simpleString} and ${codebook.dataType.simpleString}")
    else if (!codebook.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName codebook must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullIntolerant: Boolean = true

  /** Codebook materialized once on the driver (it is foldable by check).
    * Must be RECTANGULAR: the generated code indexes every subspace with
    * subspace-0's k and subDim, so a ragged literal would read wrong
    * cells (or throw) in codegen while interpreting fine — validate
    * loudly instead.
    */
  @transient protected lazy val cb: Array[Array[Array[Double]]] = {
    val a = codebook.eval(null).asInstanceOf[ArrayData]
    val out = Array.tabulate(a.numElements()) { s =>
      val as = a.getArray(s)
      Array.tabulate(as.numElements())(c => as.getArray(c).toDoubleArray())
    }
    require(out.nonEmpty && out.forall(s => s.length == out(0).length &&
      s.forall(_.length == out(0)(0).length)),
      s"$prettyName codebook must be rectangular m x k x subDim")
    out
  }

  /** ‖cb[s][c]‖², summed left-to-right like the literal `.map(sq).sum`. */
  @transient protected lazy val n2: Array[Array[Double]] = cb.map(_.map { ct =>
    var s = 0.0; var j = 0
    while (j < ct.length) { s += ct(j) * ct(j); j += 1 }
    s
  })

  protected def subDim: Int = if (cb.isEmpty || cb(0).isEmpty) 0 else cb(0)(0).length

  /** Partial distance of subspace s, centroid c against `v` — truncating
    * like `array_dot(slice(v, ...), ct)` when `v` is short.
    */
  protected final def pd(v: ArrayData, s: Int, c: Int): Double = {
    val ct = cb(s)(c)
    val base = s * subDim
    val n = math.min(ct.length, math.max(0, v.numElements() - base))
    var acc = 0.0
    var j = 0
    while (j < n) { acc += v.getDouble(base + j) * ct(j); j += 1 }
    -2.0 * acc + n2(s)(c)
  }

  /** Shared codegen prologue: bind cb/n2 as reference objects. */
  protected final def refs(ctx: CodegenContext): (String, String) =
    (ctx.addReferenceObj("pqCb", cb, "double[][][]"),
      ctx.addReferenceObj("pqN2", n2, "double[][]"))
}

/** argmin codes: array<int> of length m — the PQ ENCODE kernel. */
case class PQCodes(left: Expression, right: Expression) extends PQKernelBase {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Int](cb.length)
    var s = 0
    while (s < cb.length) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < cb(s).length) {
        val d = pd(v, s, c)
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val (cbRef, n2Ref) = refs(ctx)
      val (m, k, d) = (cb.length, if (cb.isEmpty) 0 else cb(0).length, subDim)
      val out = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val dist = ctx.freshName("dist")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val n = ctx.freshName("n"); val base = ctx.freshName("base")
      s"""
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  int $base = $s * $d;
         |  int $n = java.lang.Math.min($d, java.lang.Math.max(0, $v.numElements() - $base));
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += $v.getDouble($base + $j) * $cbRef[$s][$c][$j];
         |    }
         |    double $dist = -2.0 * $acc + $n2Ref[$s][$c];
         |    if ($dist < $best) { $best = $dist; $bestC = $c; }
         |  }
         |  $out[$s] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PQCodes =
    copy(left = newLeft, right = newRight)
}

/** All partial distances: array<array<double>> of shape m × k — the
  * per-query LUT kernel for asymmetric-distance search.
  */
case class PQPartialDists(left: Expression, right: Expression) extends PQKernelBase {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_partial_dists"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    new GenericArrayData(Array.tabulate(cb.length) { s =>
      new GenericArrayData(Array.tabulate(cb(s).length)(c => pd(v, s, c))): Any
    })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val (cbRef, n2Ref) = refs(ctx)
      val (m, k, d) = (cb.length, if (cb.isEmpty) 0 else cb(0).length, subDim)
      val out = ctx.freshName("rows")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n"); val base = ctx.freshName("base")
      s"""
         |Object[] $out = new Object[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[] $row = new double[$k];
         |  int $base = $s * $d;
         |  int $n = java.lang.Math.min($d, java.lang.Math.max(0, $v.numElements() - $base));
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += $v.getDouble($base + $j) * $cbRef[$s][$c][$j];
         |    }
         |    $row[$c] = -2.0 * $acc + $n2Ref[$s][$c];
         |  }
         |  $out[$s] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PQPartialDists =
    copy(left = newLeft, right = newRight)
}
