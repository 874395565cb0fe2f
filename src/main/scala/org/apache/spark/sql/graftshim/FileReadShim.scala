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

/** The WRITE half of the doorway: Spark's own serializable parquet
  * [[org.apache.spark.sql.execution.datasources.OutputWriterFactory]]
  * (from [[ParquetFileFormat.prepareWrite]]) plus the job configuration
  * it parameterized, shipped to V2 streaming `DataWriter`s so executors
  * write real parquet without a second writer implementation. */
object FileWriteShim {
  import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
  import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
  import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
  import org.apache.spark.util.SerializableConfiguration

  /** Driver-side: prepare the factory and the configured job conf.
    * Returns (factory, serializable conf, file extension). */
  def parquetWriterFactory(spark: SparkSession, dataSchema: StructType)
      : (OutputWriterFactory, SerializableConfiguration, String) = {
    val job = Job.getInstance(
      spark.sessionState.newHadoopConfWithOptions(Map.empty))
    val factory =
      new ParquetFileFormat().prepareWrite(spark, job, Map.empty, dataSchema)
    val conf = new SerializableConfiguration(job.getConfiguration)
    val ext = factory.getFileExtension(
      new TaskAttemptContextImpl(job.getConfiguration,
        new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID(
          "graft", 0), TaskType.MAP, 0), 0)))
    (factory, conf, ext)
  }

  /** Executor-side: open one parquet writer at `path`. */
  def newWriter(factory: OutputWriterFactory, path: String,
                dataSchema: StructType,
                conf: SerializableConfiguration,
                partitionId: Int): OutputWriter =
    factory.newInstance(path, dataSchema,
      new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID(
          "graft", 0), TaskType.MAP, partitionId), 0)))
}
