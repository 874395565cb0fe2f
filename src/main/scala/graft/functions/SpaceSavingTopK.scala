package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters buffer: item → (count, error). `count`
  * overestimates the true frequency by at most `error` (the classic
  * Metwally/Agrawal/El Abbadi invariant). */
final class SpaceSavingBuffer(val capacity: Int) {
  val entries: mutable.HashMap[String, Array[Long]] = mutable.HashMap.empty

  private def evictMin(): Array[Long] = {
    // min by (count, item) — the item tiebreak makes eviction (and with it
    // the whole sketch) deterministic for a given update sequence
    val (k, v) = entries.minBy { case (item, ce) => (ce(0), item) }
    entries.remove(k)
    v
  }

  def add(item: String, c: Long, e: Long): Unit =
    entries.get(item) match {
      case Some(ce) => ce(0) += c; ce(1) += e
      case None if entries.size < capacity =>
        entries.put(item, Array(c, e))
      case None =>
        // replace the minimum: inherit its count as the error bound
        val m = evictMin()(0)
        entries.put(item, Array(c + m, e + m))
    }
}

/** `graft_topk(item, capacity, k)` — SpaceSaving top-k heavy hitters as a
  * native `TypedImperativeAggregate`: a bounded-memory sketch (`capacity`
  * counters per partial buffer regardless of cardinality) that runs
  * partial/merge/final through Spark's standard aggregation machinery, so
  * heavy-hitter extraction over 100 TB of tokens never materializes the
  * full `groupBy(token)` table. Guarantees (tolerance-tested): every item
  * with true frequency > N/capacity is present; for reported items,
  * `est ≥ true ≥ est − err`.
  *
  * Returns `array<struct<item:string, est:bigint, err:bigint>>` of the k
  * highest-estimate items (est desc, item asc).
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  require(capacity > 0 && k > 0 && k <= capacity,
    "graft_topk requires 0 < k <= capacity")

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    // Sorted fold order removes one source of nondeterminism (iteration
    // order within a partial buffer), but SpaceSaving merges are not
    // associative: once evictions occur (distinct keys per group >
    // capacity), different partition merge ORDERS can still yield
    // different est/err and different top-k membership near ties. The
    // determinism guarantee therefore holds only in the eviction-free
    // regime; beyond it the contract is tolerance-only (the
    // Metwally et al. error bound `est ≥ true ≥ est − err` always holds).
    other.entries.toSeq.sortBy(_._1).foreach { case (item, ce) =>
      buf.add(item, ce(0), ce(1))
    }
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val top = buf.entries.toSeq
      .sortBy { case (item, ce) => (-ce(0), item) }
      .take(k)
      .map { case (item, ce) =>
        InternalRow(UTF8String.fromString(item), ce(0), ce(1))
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.entries.size)
    buf.entries.foreach { case (item, ce) =>
      // length-prefixed UTF-8, not writeUTF: writeUTF throws on items
      // whose encoding exceeds 65535 bytes (one pathological token on a
      // large corpus would crash the aggregation at shuffle time)
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(ce(0)); out.writeLong(ce(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      val item = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.entries.put(item, Array(in.readLong(), in.readLong()))
      n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}
