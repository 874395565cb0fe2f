package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two double arrays.
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order
  * chain in the similarity operators. The HOF chain allocates an
  * intermediate array and interprets two lambdas per element; this compiles
  * to a tight fused loop inside WholeStageCodegen (~10× on the cosine
  * pair-scan at sf0.1). Summation is sequential left-to-right, exactly like
  * the HOF chain and the DuckDB oracle's list_sum/list_transform — results
  * are bit-identical, so oracle-checked queries can use it freely.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two ARRAY<DOUBLE>, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** A foldable (literal) operand hoisted to a primitive double[] once —
    * `lit(Array[Double])` arrives as a GenericArrayData over BOXED
    * java.lang.Doubles, so the SRP hyperplane dots were paying an unbox
    * + megamorphic ArrayData dispatch per element (r16: measured ~25 µs
    * per 64-dim dot in the q_sim_cosine_dup_srp sig build — ~60 ns after
    * hoisting). Right side only: every registry call site puts the
    * constant hyperplane/centroid on the right. */
  private lazy val rightConst: Array[Double] =
    if (right.foldable) {
      right.eval(null) match {
        case null => null
        case a: ArrayData => a.toDoubleArray()
      }
    } else null

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (rightConst != null) {
      val n = math.min(x.numElements(), rightConst.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * rightConst(i); i += 1 }
      s
    } else {
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      if (rightConst != null) {
        val ref = ctx.addReferenceObj("graftDotConst", rightConst, "double[]")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $ref.length);
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $ref[$i];
           |}
           |${ev.value} = $s;
         """.stripMargin
      } else
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
