package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graftshim.FileReadShim
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Offsets ARE commit versions, same as the V1 stream source — the
  * manifest history is a totally ordered replayable log. */
case class LakeOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** One whole data file of one pending version: the work unit of the V2
  * micro-batch scan. At 100 TB a micro-batch plans manifest ARITHMETIC
  * on the driver and ships one task per added file — the same
  * parallelism shape as Spark's own file sources. */
case class LakeFilePartition(path: String, size: Long) extends InputPartition

/** `spark.readStream.table("<lakeCatalog>.ns.t")` — the DataSourceV2
  * micro-batch read (r12, behavior 47): rows mode through the V2
  * catalog. Semantics match the session-catalog rows-mode stream
  * (behavior 46): plain table rows, APPEND-ONLY — a version that removes
  * or hides rows refuses loudly, `option("skipChangeCommits","true")`
  * drops such versions wholesale — and the append-only gate is manifest
  * arithmetic on the driver. Each micro-batch's partitions are the
  * pending versions' ADDED files, read on executors through Spark's own
  * serializable parquet reader closure ([[FileReadShim.parquetReader]] —
  * vectorized scan, column pruning via the builder's pruned schema, and
  * pushed filters as row-group pruning). Exactly-once is the engine's
  * offset log replaying immutable version windows, identical to the V1
  * source. Added files of a non-change version are DV-free by
  * construction (a carried DV names only pre-existing files), so no
  * position filtering is needed on this path. */
class LakeMicroBatchStream(dir: String, dataSchema: StructType,
                           requiredSchema: StructType,
                           pushed: Seq[Filter],
                           startingVersion: Long,
                           skipChangeCommits: Boolean)
    extends MicroBatchStream {

  private def ver(o: Offset): Long = o match {
    case LakeOffset(v) => v
    case other => other.json().trim.toLong
  }

  /** Highest advertised offset — the probe floor (engine drives a stream
    * single-threaded). -1 = unprimed. */
  private var knownMax: Long = -1L

  override def initialOffset(): Offset = LakeOffset(startingVersion)

  override def deserializeOffset(json: String): Offset =
    LakeOffset(json.trim.toLong)

  /** O(pending) discovery — the dense-claim walk above the floor, with
    * the one-listing fallback past vacuumed gaps while unprimed (same
    * discipline as the V1 source, r11/r12). */
  override def latestOffset(): Offset = {
    val floor = math.max(knownMax, startingVersion)
    val walked = LakeTable.versionsAbove(dir, floor)
    val pending =
      if (walked.nonEmpty || knownMax >= 0L) walked
      else LakeTable.versions(dir).filter(_ > floor)
    val off = pending.lastOption.getOrElse(floor)
    knownMax = math.max(knownMax, off)
    LakeOffset(off)
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val from = ver(start)
    val to = ver(end)
    if (to <= from) return Array.empty
    val changed = LakeStreamSource.changeVersions(dir, from, to)
    if (changed.nonEmpty && !skipChangeCommits)
      throw new UnsupportedOperationException(
        s"rows-mode stream on $dir hit non-append commit(s) " +
        s"${changed.mkString("v", ", v", "")}: a table-rows stream " +
        "cannot represent removals — read the change feed " +
        "(readStream.format(\"graft-lake\")) or set " +
        "skipChangeCommits=true to drop such versions")
    val vs = LakeTable.versions(dir)
    val window = (from +: vs.filter(v => v > from && v <= to))
      .distinct.sorted
    val skip = changed.toSet
    window.zip(window.tail).flatMap { case (prev, v) =>
      if (skip.contains(v) || LakeTable.opOf(dir, v) == "optimize") Seq.empty
      else {
        val pf = if (prev == 0L) Set.empty[String]
                 else LakeTable.filesOf(dir, prev).toSet
        LakeTable.filesOf(dir, v).filterNot(pf).map { f =>
          val p = Paths.get(dir, f)
          LakeFilePartition(p.toString, Files.size(p))
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeFileReaderFactory(FileReadShim.parquetReader(
      SparkSession.active, dataSchema, requiredSchema, pushed))

  override def commit(end: Offset): Unit = () // retention is vacuum's job
  override def stop(): Unit = ()
  override def toString: String = s"LakeMicroBatchStream[$dir]"
}

/** Ships Spark's own parquet-reader closure to tasks; each partition
  * reads its one whole file. The V2 scan exec projects every row to
  * unsafe on consumption, so the reader's mutable row reuse is safe. */
private[sources] class LakeFileReaderFactory(
    reader: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[LakeFilePartition]
    new PartitionReader[InternalRow] {
      private val it =
        FileReadShim.rowsOf(reader(FileReadShim.wholeFile(fp.path, fp.size)))
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
