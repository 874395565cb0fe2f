package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator: the Spark implementation plus (optionally) the
  * DuckDB oracle SQL the driver hash-compares against.
  *
  * Conventions (SURVEY.md §5.3 determinism rules):
  *  - every oracle-checked query ends in a total `ORDER BY` that includes a
  *    unique key, replicated exactly on both sides, with explicit null order;
  *  - floating aggregates are rounded identically on both sides;
  *  - no `dropDuplicates`/`first()` without a deterministic tie-break;
  *  - no `collect()`/driver-side state inside an op (100 TB rule).
  */
final case class OpDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpDef {
  /** Oracle-checked op. */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): OpDef =
    OpDef(name, fn, Some(oracle))

  /** No-oracle op (randomized / not SQL-expressible); the driver records a
    * rows-only check, and a ScalaTest property test covers semantics. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): OpDef =
    OpDef(name, fn, None)
}
