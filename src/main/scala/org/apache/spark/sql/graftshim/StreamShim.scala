package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway a V1 streaming Source needs.
  *
  * `MicroBatchExecution` asserts that the DataFrame a V1
  * `Source.getBatch` returns carries `isStreaming = true` — but the only
  * constructor that sets the flag, `SparkSession.internalCreateDataFrame`,
  * is `private[sql]`. Spark's own file stream source calls it from inside
  * the `sql` package; an external source must do the same, so this object
  * lives under `org.apache.spark.sql` purely to re-export that call. No
  * other internal API is touched, and the data path is unchanged: the
  * batch plan's own `toRdd` (the compiled, whole-stage-codegen'd physical
  * plan — evaluated lazily inside the micro-batch's job) is wrapped as a
  * streaming `LogicalRDD` with the identical schema.
  */
object StreamShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** Execute an already-analyzed LogicalPlan as a DataFrame — the
    * `Dataset.ofRows` doorway (`private[sql]`) the SQL MERGE rewrite
    * command needs to run its captured source plan (r12). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The inverse, for a V1 `Sink.addBatch`: the micro-batch DataFrame the
    * engine hands over is backed by the incremental execution — rebasing
    * it on its own `toRdd` (exactly what `ForeachBatchSink` does before
    * invoking user code) yields a plain batch frame safe to plan fresh
    * jobs against. */
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
