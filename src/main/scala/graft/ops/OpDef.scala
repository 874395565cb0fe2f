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

/** Cross-engine deterministic helpers (SURVEY §5.3).
  *
  * `r(c, n)` rounds to n decimals as `floor(x*10^n + 0.5)/10^n` — the same
  * IEEE double ops DuckDB executes when the oracle SQL spells the identical
  * formula, so row-level expressions round bit-identically on both sides
  * (Spark's native `round` uses BigDecimal HALF_UP, DuckDB multiplies in
  * floating point; they disagree near .5*10^-n boundaries).
  */
object Det {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{floor, lit}
  def r(c: Column, scale: Int): Column = {
    val f = math.pow(10.0, scale.toDouble)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }
  def r2(c: Column): Column = r(c, 2)
  def r4(c: Column): Column = r(c, 4)
  def r6(c: Column): Column = r(c, 6)
  /** The DuckDB-side spelling of [[r]]. */
  def sql(e: String, scale: Int): String = {
    val f = "1" + ("0" * scale) + ".0"
    s"floor(($e) * $f + 0.5) / $f"
  }
}

/** Per-invocation temp-view names: SQL-form ops that must register their
  * input plan as a view (rollup/grouping-sets re-resolution, LATERAL,
  * recursive CTE, listagg, range-frame SQL) get a counter-suffixed name so
  * concurrent invocations on one SparkSession — or a caller's own view that
  * happens to share the prefix — can never cross-wire inputs. Views are
  * session-scoped catalog entries; a handful per invocation is negligible
  * and they are replaced, not leaked, across repeated runs of one query
  * only if the name repeats — which the counter prevents by design. */
object Views {
  private val n = new java.util.concurrent.atomic.AtomicLong(0)
  def reg(df: DataFrame, prefix: String): String = {
    val v = s"graft_${prefix}_${n.incrementAndGet()}"
    df.createOrReplaceTempView(v)
    v
  }
}

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
