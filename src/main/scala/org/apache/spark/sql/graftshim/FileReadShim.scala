package org.apache.spark.sql.graftshim

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** The `private[sql]` doorway a DataSourceV2 MICRO-BATCH stream needs to
  * read parquet on executors without re-implementing a parquet reader:
  * [[ParquetFileFormat.buildReaderWithPartitionValues]] returns a
  * SERIALIZABLE `PartitionedFile => Iterator[InternalRow]` closure — it
  * broadcasts its own hadoop configuration internally, exactly the
  * function Spark's own `FileSourceScanExec` ships to tasks. The V2
  * stream builds it ONCE on the driver (per micro-batch scan) and each
  * `PartitionReader` applies it to its one file. Vectorized reads hand
  * back `ColumnarBatch`es disguised as `InternalRow`s (Spark's own
  * contract); [[rowsOf]] flattens both shapes. */
object FileReadShim {

  /** Build the executor-side parquet reader for `requiredSchema` over
    * files whose union schema is `dataSchema`. Missing columns null-fill
    * (the additive-evolution read semantics); `filters` prune row
    * groups — correctness never depends on them (the caller re-applies
    * its predicates above). */
  def parquetReader(spark: SparkSession, dataSchema: StructType,
                    requiredSchema: StructType, filters: Seq[Filter])
      : PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema,
      partitionSchema = StructType(Nil),
      requiredSchema = requiredSchema,
      filters = filters,
      // rows, not ColumnarBatches: the vectorized reader still runs
      // underneath, it just hands rows across the boundary — the shape a
      // PartitionReader[InternalRow] needs
      options = Map(
        org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
      hadoopConf =
        spark.sessionState.newHadoopConfWithOptions(Map.empty))

  /** One whole file as a [[PartitionedFile]] (no partition values — the
    * lake's layout column lives IN the data). */
  def wholeFile(path: String, size: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
                    0L, size)

  /** Flatten the reader's output: vectorized readers yield
    * `ColumnarBatch` elements through an `Iterator[InternalRow]` cast
    * (Spark's internal contract); row readers yield rows. */
  def rowsOf(it: Iterator[InternalRow]): Iterator[InternalRow] =
    it.asInstanceOf[Iterator[Any]].flatMap {
      case b: ColumnarBatch =>
        import scala.jdk.CollectionConverters._
        b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }
}
