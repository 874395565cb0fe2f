package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator lives in `graft.ops.*` as an [[OpDef]] (implementation +
  * oracle SQL registered in one place, so a query can never be declared
  * without its oracle drifting). This object only folds the registry into
  * the driver's two maps.
  */
object SparkEntry {

  /** The full declared inventory (SURVEY.md §2). Order is registration
    * order; names are unique (enforced eagerly below). */
  val registry: Seq[OpDef] =
    Relational.ops ++ Aggregates.ops ++ Windows.ops ++ Functions.ops ++
      LlmOps.ops ++ Approx.ops ++ Extras.ops ++ Analytics.ops ++
      Tpch.ops ++ Multimodal.ops ++ EventAnalytics.ops ++ Curation.ops ++
      Graph.ops ++ Layout.ops ++ Inference.ops

  require(registry.map(_.name).distinct.size == registry.size,
    "duplicate op names in registry")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_basic")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(o => o.name -> o.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(o => o.oracle.map(sql => o.name -> sql)).toMap
}
