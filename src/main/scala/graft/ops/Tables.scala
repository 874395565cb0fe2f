package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated fixture tables (FIXTURES.md).
  *
  * Schemas are carried by the parquet footers; no inference is needed. At
  * 100 TB these would be partitioned directories (partition pruning applies
  * automatically); the fixtures are single files, so loaders stay trivial.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS). Spark ≤ 4.1.0 rejects that
    * type unless the legacy conf maps it to raw nanos LONG; Spark 4.1.2
    * reads it natively as TIMESTAMP_NTZ and silently ignores the conf.
    * Handle both paths, normalizing to a session-TZ (UTC) TimestampType
    * column floor-truncated to microseconds — exactly what DuckDB's
    * `CAST(ts AS TIMESTAMP)` does on its TIMESTAMP_NS, so both engines
    * see the identical µs value (oracle SQL casts likewise).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType =>
        // NTZ wall time reinterpreted in the UTC session TZ = the same
        // instant the nanos-long path produced
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Loader by table name, routing through the special-cased readers
    * (`events` needs the nanos legacy conf). */
  def byName(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d) else t(s, d, name)
}
