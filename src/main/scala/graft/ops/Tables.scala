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

  /** The embedding dimension every vector operator assumes (FIXTURES.md:
    * 64-dim unit-norm float lists). */
  val EmbDim = 64

  /** Component-magnitude bound of the hygiene gate. Any meaningfully-
    * normalized embedding satisfies |x| ≤ ‖v‖ ≈ 1; 4 gives generous
    * headroom for mildly denormalized vectors while keeping every
    * downstream exact micro-unit product (the `floor(x·10⁶)`-style BIGINT
    * arithmetic the cross-engine determinism contract rests on) far from
    * 2⁶³ — a 1e30-magnitude component is corrupt data that overflows
    * those products (observed: q_vec_pca_power's ANSI long overflow),
    * not signal. */
  val EmbMaxAbs = 4.0f

  /** The row-level hygiene predicate: non-null, exactly [[EmbDim]] dims,
    * every component non-null, non-NaN, and |x| ≤ [[EmbMaxAbs]] (which
    * excludes ±Inf). */
  private def embWellFormed: org.apache.spark.sql.Column =
    expr(s"""embedding IS NOT NULL AND size(embedding) = $EmbDim
            |AND forall(embedding, x -> x IS NOT NULL AND NOT isnan(x)
            |  AND abs(x) <= CAST($EmbMaxAbs AS FLOAT))""".stripMargin)

  /** Embedding loader with the vector hygiene gate a 100 TB ingestion
    * applies before any similarity math: rows whose vector is null, not
    * exactly [[EmbDim]]-dimensional, or carrying a null/NaN/±Inf/
    * over-magnitude component are REJECTED here, once, at the scan — NaN
    * poisons every downstream dot product, ragged dims silently truncate
    * `graft_dot`'s fused loop, huge magnitudes overflow the exact
    * micro-unit arithmetic, and MLlib's LSH throws outright on malformed
    * vectors mid-shuffle, which at scale means a dead job hours in
    * rather than a counted rejection at ingest (q_vec_quality is the
    * audit face of this gate). The filter is a map-only `forall` over
    * the 64 components — no exchange, negligible against any consumer's
    * join. Zero and non-unit-norm vectors PASS: they are well-formed
    * doubles whose dot products propagate as ordinary (zero or
    * unnormalized) scores — the unit-norm assumption stays a documented
    * data property, not a gate. No-op on the fixture corpus (every
    * fixture vector is well-formed), so all oracle-checked hashes are
    * unchanged; HostileVectorSpec asserts the rejection behavior on a
    * corpus built to break it. */
  def embeddings(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").filter(embWellFormed)

  /** Null/shape-proof embedding projection for Scala-UDF consumers
    * (MLlib's `array_to_vector` and the LSH hash/distance UDFs built on
    * it): whole-stage codegen's SUBEXPRESSION ELIMINATION evaluates a
    * UDF appearing in a pushed-down predicate EAGERLY, before the gate's
    * conjuncts get a chance to short-circuit — observed as
    * `approxSimilarityJoin`'s distance filter NPE-ing on a null
    * embedding the gate provably filters out. Identity on every row the
    * gate admits; a malformed row (already destined to be filtered)
    * presents a well-formed zero vector to any eagerly-evaluated UDF
    * instead of crashing the job. Codegen'd CASE over the same
    * predicate — map-only, no UDF, no shuffle. */
  def embSafe: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, lit, when}
    when(embWellFormed, org.apache.spark.sql.functions.col("embedding"))
      .otherwise(array(Seq.fill(EmbDim)(lit(0.0f)): _*))
  }

  /** Loader by table name, routing through the special-cased readers
    * (`events` needs the nanos legacy conf; `embeddings` carries the
    * vector hygiene gate). */
  def byName(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d)
    else if (name == "embeddings") embeddings(s, d)
    else t(s, d, name)
}
