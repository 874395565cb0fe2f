package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
                DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded EXACT top-k buffer under the (score desc, id asc) total
  * order: a k-element heap whose head is the current WORST kept entry.
  * Unlike the SpaceSaving sketch, exact top-k over distinct (id, score)
  * inputs is merge-order-independent, so the aggregate is fully
  * deterministic at any partitioning. */
final class ScoreTopKBuffer(val k: Int) {
  // head = worst kept: lowest score first, then HIGHEST id (so an equal
  // score with a lower id beats the head)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, id) => (s, -id) }
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst.reverse)

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wid) = heap.head
      if (score > ws || (score == ws && id < wid)) {
        heap.dequeue()
        heap.enqueue((score, id))
      }
    }
    ()
  }
}

/** `graft_score_topk(id, score, k)` — exact per-group top-k by score as
  * a native `TypedImperativeAggregate`: each partial buffer is a
  * k-element heap updated in O(log k) per row and merged in O(k log k),
  * so ranking n candidates per group costs O(n log k) heap work with
  * NO sort of the candidate stream and a shuffle that carries k entries
  * per group instead of n. The window spelling
  * (`row_number() OVER (ORDER BY score DESC, id) <= k`) plans a
  * WindowGroupLimit but still SORTS the full candidate stream below it
  * — on the exact k-NN baseline's n² stream that sort was the dominant
  * cost (measured: the q_sim_knn rewrite below). Output rows are
  * identical to the window spelling (ties broken id-asc), so
  * oracle-checked queries can swap it in freely.
  *
  * Returns `array<struct<id:bigint, score:double>>` ordered
  * (score desc, id asc). */
case class ScoreTopK(
    left: Expression,   // id: bigint
    right: Expression,  // score: double
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ScoreTopKBuffer] with BinaryLike[Expression] {

  require(k > 0, "graft_score_topk requires k > 0")

  override def prettyName: String = "graft_score_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): ScoreTopKBuffer =
    new ScoreTopKBuffer(k)

  override def update(buf: ScoreTopKBuffer, input: InternalRow): ScoreTopKBuffer = {
    val id = left.eval(input)
    val s = right.eval(input)
    // non-finite scores are dropped: every registry consumer scores
    // behind the vector loader gate (no NaN/Inf reaches the dot), and
    // heap comparisons against NaN would otherwise keep-or-drop it
    // depending on arrival order — the one place this aggregate could
    // diverge from the window spelling it replaces
    if (id != null && s != null
        && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      buf.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ScoreTopKBuffer, other: ScoreTopKBuffer): ScoreTopKBuffer = {
    other.heap.foreach { case (s, id) => buf.add(s, id) }
    buf
  }

  override def eval(buf: ScoreTopKBuffer): Any = {
    val sorted = buf.heap.toSeq.sortBy { case (s, id) => (-s, id) }
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(id, s)
    }.toArray[Any])
  }

  override def serialize(buf: ScoreTopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ScoreTopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val buf = new ScoreTopKBuffer(kk)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ScoreTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ScoreTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScoreTopK =
    copy(left = newLeft, right = newRight)
}
