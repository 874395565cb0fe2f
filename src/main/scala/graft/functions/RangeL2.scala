package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Squared L2 distance over a 1-based inclusive index range, computed
  * natively: `graft_l2(a, b, lo, hi)` ≡
  * `aggregate(sequence(lo, hi), 0.0D, (acc, i) ->
  *    acc + (element_at(a, i) - element_at(b, i))^2)`.
  *
  * Why (r16): Spark's higher-order `aggregate` is a CodegenFallback —
  * the lambda interprets per element AND materializes the `sequence`
  * array per row, so the PQ/IVF ops (q_vec_pq, q_sim_ivfpq) paid
  * interpreted lambda dispatch n×k×8 times per query. This loop runs
  * the IDENTICAL left-to-right fold (same FP op order: one
  * `acc + (x-y)*(x-y)` per step), so results are bit-identical to the
  * HOF spelling and to the DuckDB oracle's `list_sum(list_transform(...))`
  * rebuild.
  *
  * Contract: `lo`/`hi` are 1-based inclusive and must address valid,
  * non-null elements of both arrays — exactly what the HOF spelling
  * required of its call sites (an OOB `element_at` would have thrown
  * under ANSI there too). `hi < lo` yields 0.0 like the empty sequence.
  */
case class RangeL2(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_l2 expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>, INT, INT), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable
  override def prettyName: String = "graft_l2"

  override protected def nullSafeEval(a: Any, b: Any,
                                      lo: Any, hi: Any): Any =
    RangeL2Util.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
                   lo.asInstanceOf[Int], hi.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, lo, hi) =>
      s"graft.functions.RangeL2Util.l2($a, $b, $lo, $hi)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): RangeL2 =
    copy(first = newFirst, second = newSecond,
         third = newThird, fourth = newFourth)
}

object RangeL2Util {
  /** Left-to-right fold of (a[i]-b[i])² for i in [lo, hi], 1-based —
    * the exact FP op order of the HOF spelling it replaces. */
  def l2(a: ArrayData, b: ArrayData, lo: Int, hi: Int): Double = {
    var s = 0.0
    var i = lo
    while (i <= hi) {
      val d = a.getDouble(i - 1) - b.getDouble(i - 1)
      s += d * d
      i += 1
    }
    s
  }
}
