package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sign-random-projection band codes, computed natively.
  *
  * `graft_srp_codes(v, tables, bits, dims)` → `array<string>` of
  * `tables` codes, code t = the `bits` characters
  * `'1' if v · h(t,j) >= 0 else '0'` for j = 0..bits-1, with hyperplane
  * component d of h(t,j) = ±1 by the first hex digit of
  * md5("srp:t:j:d") — the exact derivation [[graft.ops.LlmOps]] used to
  * spell inline as `concat(when(graft_dot(v, lit(h)) >= 0, "1")…)`, and
  * the one the DuckDB oracle rebuilds in SQL, so codes are
  * bit-identical to both.
  *
  * Why an expression instead of the 64-dot inline tree (r16): the
  * inline spelling generated one whole-stage method holding 64 unrolled
  * dot loops over boxed literal arrays — past the JIT's huge-method
  * threshold, so it ran interpreted at ~12-25 µs per dot (measured:
  * the 500-row sig build cost 0.8-1.0 s, and it runs twice per query
  * through the hot-bucket pass). This compiles to ONE static call over
  * a primitive sign matrix: ~4 µs per ROW for the full 8×8 code set. */
object SrpCodesUtil {
  def signs(tables: Int, bits: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables * bits) { tj =>
      val t = tj / bits
      val j = tj % bits
      Array.tabulate(dims) { d =>
        val h = md.digest(s"srp:$t:$j:$d".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xF) < 8) 1.0 else -1.0
      }
    }
  }

  /** One row's code set: tables UTF8Strings of `bits` '0'/'1' chars. */
  def codes(v: ArrayData, signs: Array[Array[Double]],
            tables: Int, bits: Int): GenericArrayData = {
    val dims = if (signs.isEmpty) 0 else signs(0).length
    val n = math.min(v.numElements(), dims)
    val out = new Array[Any](tables)
    val buf = new Array[Byte](bits)
    var t = 0
    while (t < tables) {
      var j = 0
      while (j < bits) {
        val hp = signs(t * bits + j)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * hp(i); i += 1 }
        buf(j) = if (s >= 0) '1' else '0'
        j += 1
      }
      out(t) = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, bits))
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class SrpCodes(child: Expression, tables: Int, bits: Int, dims: Int)
    extends UnaryExpression {

  require(tables > 0 && bits > 0 && dims > 0,
    "graft_srp_codes needs positive tables/bits/dims")

  @transient private lazy val signMatrix: Array[Array[Double]] =
    SrpCodesUtil.signs(tables, bits, dims)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_codes expects ARRAY<DOUBLE>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_srp_codes"

  override protected def nullSafeEval(v: Any): Any =
    SrpCodesUtil.codes(v.asInstanceOf[ArrayData], signMatrix, tables, bits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpSigns", signMatrix, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SrpCodesUtil.codes($v, $ref, $tables, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpCodes =
    copy(child = newChild)
}
