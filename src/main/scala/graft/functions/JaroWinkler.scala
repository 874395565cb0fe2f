package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro–Winkler scorer shared by the interpreted and codegen paths.
  *
  * Classic definition (Winkler '90): jaro = (m/|a| + m/|b| + (m−t)/m)/3
  * with the match window ⌊max(|a|,|b|)/2⌋−1, transpositions t = half the
  * count of order-mismatched matched characters; winkler boost
  * jw = jaro + ℓ·0.1·(1−jaro) for common prefix ℓ ≤ 4, applied only when
  * jaro exceeds the 0.7 boost threshold. These are exactly the conventions
  * the DuckDB oracle's `jaro_winkler_similarity` implements (probed
  * empirically: boost suppressed below jaro 0.7, prefix capped at 4,
  * p = 0.1, empty-vs-nonempty → 0), so the r6-rounded outputs agree: the
  * two engines evaluate the same small-integer rational through IEEE
  * doubles, and a rational with denominator ≤ 30·|a|·|b|·m can only
  * straddle an r6 rounding edge if it lies within 1 ulp of odd/2·10⁶ —
  * verified absent on the fixture corpus at both sf0.01 and sf0.1.
  *
  * Works on Unicode code points (not bytes), matching DuckDB's
  * grapheme-agnostic codepoint comparison; the fixture part names are
  * ASCII so the two conventions coincide there regardless.
  */
object JaroWinklerUtil {
  /** Per-thread scratch: the scorer runs millions of times per task in
    * the blocked self-join's hot loop, and per-call allocation of the
    * two codepoint arrays + two matched-flag arrays (plus the IntStream
    * machinery `codePoints().toArray` spins up) was the dominant cost
    * (r16 — measured ~5.5 s of the q_text_jarowinkler noop time in the
    * scorer against ~1 s of pair generation). Tasks are single-threaded,
    * so one growable scratch per thread is race-free. */
  private final class Scratch {
    var ca: Array[Int] = new Array[Int](64)
    var cb: Array[Int] = new Array[Int](64)
    var ma: Array[Boolean] = new Array[Boolean](64)
    var mb: Array[Boolean] = new Array[Boolean](64)
    def fit(la: Int, lb: Int): Unit = {
      if (la > ca.length) { ca = new Array[Int](la * 2); ma = new Array[Boolean](la * 2) }
      if (lb > cb.length) { cb = new Array[Int](lb * 2); mb = new Array[Boolean](lb * 2) }
      java.util.Arrays.fill(ma, 0, la, false)
      java.util.Arrays.fill(mb, 0, lb, false)
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  def score(a: UTF8String, b: UTF8String): Double = {
    val sc = scratch.get()
    // ASCII fast path: every byte IS a codepoint — no String decode, no
    // stream; the generic path below decodes codepoints once into the
    // same scratch. Both paths run the identical algorithm, so scores
    // are bit-identical either way.
    var la = 0
    var lb = 0
    if (a.isFullAscii && b.isFullAscii) {
      la = a.numBytes()
      lb = b.numBytes()
      if (la == 0 && lb == 0) return 1.0
      if (la == 0 || lb == 0) return 0.0
      sc.fit(la, lb)
      var i = 0
      while (i < la) { sc.ca(i) = a.getByte(i).toInt; i += 1 }
      i = 0
      while (i < lb) { sc.cb(i) = b.getByte(i).toInt; i += 1 }
    } else {
      val s = a.toString
      val t = b.toString
      la = s.codePointCount(0, s.length)
      lb = t.codePointCount(0, t.length)
      if (la == 0 && lb == 0) return 1.0
      if (la == 0 || lb == 0) return 0.0
      sc.fit(la, lb)
      var i = 0
      var o = 0
      while (o < s.length) {
        val cp = s.codePointAt(o); sc.ca(i) = cp; i += 1
        o += Character.charCount(cp)
      }
      i = 0
      o = 0
      while (o < t.length) {
        val cp = t.codePointAt(o); sc.cb(i) = cp; i += 1
        o += Character.charCount(cp)
      }
    }
    scoreArrays(sc.ca, la, sc.cb, lb, sc.ma, sc.mb)
  }

  private def scoreArrays(ca: Array[Int], la: Int,
                          cb: Array[Int], lb: Int,
                          matchedA: Array[Boolean],
                          matchedB: Array[Boolean]): Double = {
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && ca(i) == cb(j)) {
          matchedA(i) = true
          matchedB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order
    var trans = 0
    var j = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(j)) j += 1
        if (ca(i) != cb(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - trans / 2.0) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < 4 && l < la && l < lb && ca(l) == cb(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst expression `graft_jaro_winkler(a, b)` → DOUBLE.
  *
  * Why an Expression and not a Scala UDF: the scorer runs once per
  * candidate pair inside the blocked self-join's hot loop; `doGenCode`
  * emits a direct static call into [[JaroWinklerUtil]], so the whole
  * filter-project stage stays inside WholeStageCodegen with no
  * encoder/boxing round-trip per row (a UDF would serialize both
  * UTF8Strings to java.lang.String through the encoder framework and
  * break the codegen span at every call site).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler expects (STRING, STRING), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.score(a.asInstanceOf[UTF8String],
                          b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerUtil.score($a, $b)")
}
