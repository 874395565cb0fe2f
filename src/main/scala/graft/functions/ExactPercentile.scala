package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
                DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable primitive double buffer — the whole point of this aggregate:
  * Spark's own `percentile` accumulates into an
  * `OpenHashMap[AnyRef, Long]`, which BOXES every value, hashes it, and
  * finally sorts boxed tuples — measured 2.85 s for one 600 k-value
  * group at sf0.1 (the q_agg_eqdepth boundary aggregate, one final
  * task). On mostly-distinct doubles (prices), the map buys no
  * compression and costs ~40 B/entry plus per-row hashing; a flat
  * primitive array is 8 B/value, appends in O(1) with zero allocation
  * per row, and sorts with `java.util.Arrays.sort(double[])`. */
final class PctBuffer {
  var arr: Array[Double] = new Array[Double](64)
  var n: Int = 0
  def add(v: Double): Unit = {
    if (n == arr.length) {
      val bigger = new Array[Double](arr.length << 1)
      System.arraycopy(arr, 0, bigger, 0, n)
      arr = bigger
    }
    arr(n) = v
    n += 1
  }
}

/** `graft_exact_pct(value, percentage | array(percentages))` — EXACT
  * percentile over doubles, bit-identical to Spark's `percentile` (same
  * sort order, same `(higher - pos) * v_lo + (pos - lower) * v_hi`
  * interpolation on `pos = p * (n - 1)`, same early returns, NULL on
  * empty input), but accumulating into a flat primitive buffer instead
  * of a boxed value→count hash map (see [[PctBuffer]]). Swap-in
  * replacement wherever the values are mostly distinct — the registry's
  * exact-percentile queries (q_agg_mad / q_agg_eqdepth /
  * q_agg_percentile) all aggregate prices, which are ~97% distinct at
  * every fixture SF, so the map's duplicate-compression never pays its
  * boxing. Like `percentile` itself this holds one group's values in
  * one buffer — the same sf-bounded contract, with the `_approx` twins
  * as the 100 TB operating point. */
case class ExactPercentile(
    child: Expression,
    percentages: Seq[Double],
    returnsArray: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PctBuffer] with UnaryLike[Expression] {

  require(percentages.nonEmpty &&
          percentages.forall(p => p >= 0.0 && p <= 1.0),
    "graft_exact_pct percentages must lie in [0, 1]")

  override def prettyName: String = "graft_exact_pct"
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (returnsArray) ArrayType(DoubleType, containsNull = false)
    else DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_exact_pct needs a DOUBLE value column, got ${child.dataType.sql}")
  }

  override def createAggregationBuffer(): PctBuffer = new PctBuffer

  override def update(buf: PctBuffer, input: InternalRow): PctBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: PctBuffer, other: PctBuffer): PctBuffer = {
    var i = 0
    while (i < other.n) { buf.add(other.arr(i)); i += 1 }
    buf
  }

  override def eval(buf: PctBuffer): Any = {
    if (buf.n == 0) return null
    java.util.Arrays.sort(buf.arr, 0, buf.n)
    // Spark's getPercentile on the accumulated counts, specialized to
    // freq 1: position indexes the sorted values directly
    def at(p: Double): Double = {
      val position = p * (buf.n - 1).toDouble
      val lower = math.floor(position).toInt
      val higher = math.ceil(position).toInt
      val lowerValue = buf.arr(lower)
      if (higher == lower) lowerValue
      else {
        val higherValue = buf.arr(higher)
        if (higherValue == lowerValue) lowerValue
        else (higher - position) * lowerValue +
             (position - lower) * higherValue
      }
    }
    if (returnsArray)
      new GenericArrayData(percentages.map(at).toArray[Any])
    else at(percentages.head)
  }

  override def serialize(buf: PctBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * buf.n + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeDouble(buf.arr(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PctBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new PctBuffer
    if (n > buf.arr.length) buf.arr = new Array[Double](n)
    var i = 0
    while (i < n) { buf.arr(i) = in.readDouble(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ExactPercentile =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ExactPercentile =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): ExactPercentile = copy(child = newChild)
}
