package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.11 addendum — data-layout operators for scan pruning at rest.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * multi-dimensional clustering (Z-ordering) sorts the fact table along a
  * bit-interleaved curve so that EVERY interleaved dimension's per-file
  * min/max footer range stays narrow, and a predicate on any of them
  * skips most files. The key computation is a pure per-row integer
  * expression (map-only, codegen'd, no shuffle); the layout itself is one
  * `repartitionByRange(zkey)` — the same range-exchange a global sort
  * pays, amortized once at write time. ScaleSpec measures the actual
  * effect: post-layout per-partition extents shrink on BOTH dimensions
  * vs a single-column sort, which narrows only its own.
  */
object Layout {
  import Tables._

  /** Bits interleaved per dimension. 16 covers every fixture key; at
    * larger domains you interleave the high-order bits of the RANGE-RANK
    * of each dimension (rank computed once per layout job), not the raw
    * value — documented rather than simulated, since the fixture keys are
    * already dense from 1. */
  private val Bits = 16

  /** The interleave as engine-portable integer SQL: Spark spells shifts as
    * `shiftleft`/`shiftright`, DuckDB as `<<`/`>>`; both reduce to the
    * same exact BIGINT arithmetic, so the oracle can hash-match. */
  private def zSqlSpark(x: String, y: String): String =
    (0 until Bits).flatMap { i =>
      Seq(s"shiftleft(shiftright(CAST($x AS BIGINT), $i) & 1, ${2 * i})",
          s"shiftleft(shiftright(CAST($y AS BIGINT), $i) & 1, ${2 * i + 1})")
    }.mkString(" + ")

  private def zSqlDuck(x: String, y: String): String =
    (0 until Bits).flatMap { i =>
      Seq(s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})",
          s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Z-value of two dimension columns (low [[Bits]] bits each). */
  def zval(x: String, y: String): Column = expr(zSqlSpark(x, y))

  /** Lay a DataFrame out along the (x, y) Z-curve: range-partition by the
    * interleaved key, sort within partitions. This is the write-side
    * operator a table-format OPTIMIZE would run; downstream scans prune
    * on either dimension's footer ranges.
    *
    * Interleaving is only effective when both dimensions contribute
    * comparable bit widths — a 10-value dimension interleaved raw against
    * a 10⁵-value one degenerates to a single-column sort (the wide
    * dimension's bits dominate every range split). So the layout key
    * min-max-scales each dimension onto a common 8-bit grid first (one
    * 1-row stats pass, broadcast back); under heavy VALUE skew you would
    * scale by range-rank instead — same shape, one extra window over each
    * dimension's distinct values. */
  def zorder(df: DataFrame, x: String, y: String, partitions: Int): DataFrame = {
    val stats = df.agg(
      min(col(x)).cast("double").as("zxmin"), max(col(x)).cast("double").as("zxmax"),
      min(col(y)).cast("double").as("zymin"), max(col(y)).cast("double").as("zymax"))
    df.crossJoin(broadcast(stats))
      .withColumn("zx",
        ((col(x) - col("zxmin")) * lit(255.0) /
          greatest(col("zxmax") - col("zxmin"), lit(1.0))).cast("long"))
      .withColumn("zy",
        ((col(y) - col("zymin")) * lit(255.0) /
          greatest(col("zymax") - col("zymin"), lit(1.0))).cast("long"))
      .withColumn("z", expr(zSqlSpark("zx", "zy")))
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
      .drop("zx", "zy", "zxmin", "zxmax", "zymin", "zymax")
  }

  /** One Hive-partitioned copy of `events` per (sfDir) per JVM —
    * event_date=YYYY-MM-DD directories, the layout every 100 TB fact
    * table ships with. Path-memoized (the write itself is the layout
    * job, paid once); the partitioned READ is what
    * q_layout_partition_prune exercises. */
  private val prunePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private[graft] def partitionedEvents(s: SparkSession, d: String): String =
    prunePaths.computeIfAbsent(d, _ => {
      val dir = TempDirs.create("graft_events_bydate_")
      events(s, d)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(dir)
      dir
    })

  /** One bucketed copy of orders+lineitem per (sfDir) per JVM: 8 buckets
    * hashed on the order key, registered in the session catalog (bucket
    * spec is catalog metadata, so the tables are external parquet under a
    * temp dir). The write is the layout job — co-locating both fact
    * tables on their join key once so every later join is exchange-free. */
  private val bucketTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private[graft] def bucketedTables(s: SparkSession, d: String): (String, String) =
    bucketTables.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val (oT, lT) = (s"graft_orders_b$tag", s"graft_lineitem_b$tag")
      val base = TempDirs.create("graft_bucketed_")
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.format("parquet").option("path", s"$base/orders")
        .bucketBy(8, "o_orderkey").saveAsTable(oT)
      lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.format("parquet").option("path", s"$base/lineitem")
        .bucketBy(8, "l_orderkey").saveAsTable(lT)
      (oT, lT)
    })

  def ops: Seq[OpDef] = Seq(

    /** Bucketed co-located join: orders and lineitem are laid out
      * bucketed on the order key (8 buckets each side, catalog-backed),
      * so the order-level revenue rollup joins WITHOUT shuffling either
      * fact table — each task merges bucket i of both sides, and the
      * post-join per-orderkey aggregate inherits the same hash layout,
      * so it collapses map-side too. At 100 TB this is THE technique
      * for a repeated fact-fact join: both shuffles are paid once at
      * write time and amortized over every subsequent query (vs
      * q_join_salted, which pays them per query). ScaleSpec asserts the
      * plan carries NO hash-partitioned exchange — the only shuffle is
      * the final presentation sort. The oracle joins the unbucketed
      * fixtures; hash-match proves the bucketed layout loses nothing.
      * Exact cent units for the money sum. */
    OpDef(
      "q_layout_bucket_join",
      """SELECT o_orderkey,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val (oT, lT) = bucketedTables(s, d)
      // merge hint: the assert is about the EXCHANGE, so pin the join
      // strategy (broadcast would also be shuffle-free but proves nothing
      // about the layout)
      s.table(oT).hint("merge")
        .join(s.table(lT), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).cast("long").as("n_items"),
             sum(col("l_quantity")).cast("long").as("qty"),
             sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .orderBy("o_orderkey")
    },

    /** Partition pruning, end-to-end: lay `events` out Hive-partitioned
      * by day (once per JVM — the write IS the layout job), then answer
      * a 7-day window query THROUGH the partitioned layout. The date
      * predicate lands in the scan's PartitionFilters, so only 7 of the
      * 30 day-directories are listed or read — at 100 TB this is the
      * difference between scanning ~23 TB and ~0.8 TB before the first
      * row filter even runs. ScaleSpec asserts the pruning on the
      * physical plan (non-empty PartitionFilters, 7 partitions
      * touched); the oracle computes the same aggregate from the
      * unpartitioned fixture, so the hash-match proves the partitioned
      * round-trip loses nothing. Sums are exact per-row micro-units
      * (the snapshot-diff discipline), never a double accumulation. */
    OpDef(
      "q_layout_partition_prune",
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS value_micros
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      s.read.parquet(partitionedEvents(s, d))
        .filter(col("event_date").between(lit("2024-01-08").cast("date"),
                                          lit("2024-01-14").cast("date")))
        .groupBy(col("event_date"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(floor(col("value") * lit(1000000.0) + lit(0.5))
                 .cast("long")).cast("long").as("value_micros"))
        .select(col("event_date"), col("event_type"), col("n"),
                col("value_micros"))
        .orderBy("event_date", "event_type")
    },

    // Z-order locality summary over lineitem's (part, supplier) plane:
    // bucket the curve into 4096-key segments and report each bucket's
    // row count and per-dimension extents — the min/max footer metadata a
    // clustered file would carry. Map + one bounded groupBy (≤ 2^20
    // buckets however large the corpus); the oracle runs the identical
    // integer arithmetic so every value hash-matches.
    OpDef(
      "q_layout_zorder",
      s"""WITH z AS (
         |  SELECT l_partkey, l_suppkey,
         |         ${zSqlDuck("l_partkey", "l_suppkey")} AS z
         |  FROM lineitem)
         |SELECT z // 4096 AS z_bucket, count(*) AS n,
         |       min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         |       min(l_suppkey) AS smin, max(l_suppkey) AS smax
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
                zval("l_partkey", "l_suppkey").as("z"))
        .groupBy(expr("z div 4096").as("z_bucket"))
        .agg(count(lit(1)).as("n"),
             min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
             min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
        .orderBy("z_bucket")
    },

    /** Small-file compaction planner — the OPTIMIZE/bin-packing pass every
      * table format (Delta/Iceberg/Hudi) runs against a 100 TB table that
      * ingests thousands of small files a day. "Files" here are the daily
      * write partitions of `orders` (one per o_orderdate day, carrying its
      * row count); the planner assigns date-adjacent files to target-size
      * compaction bins by exclusive-prefix-sum streaming binning — bin =
      * prior_rows div target — which is deterministic, one-pass, and keeps
      * each bin within one file of the target (the greedy first-fit result
      * on an ordered stream). The windows run over the FILE-METADATA table
      * (≤ one row per day/file), which is millions of rows when the data is
      * 100 TB — planner input scales with file count, not data volume, so a
      * single-partition running sum is the right tool here even though it
      * would be wrong over the fact table itself. Output is the compaction
      * manifest: per bin, how many files merge, total rows, and the date
      * range the rewritten file will cover (its new min/max footer). */
    OpDef(
      "q_layout_compaction",
      """WITH files AS (
        |  SELECT CAST(date_trunc('day', CAST(o_orderdate AS TIMESTAMP))
        |              AS DATE) AS day,
        |         count(*) AS n_rows
        |  FROM orders GROUP BY 1),
        |binned AS (
        |  SELECT day, CAST(n_rows AS BIGINT) AS n_rows,
        |    CAST(coalesce(sum(n_rows) OVER (ORDER BY day ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         AS BIGINT) // 400 AS bin
        |  FROM files)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(n_rows) AS BIGINT) AS n_rows,
        |  min(day) AS day_first, max(day) AS day_last
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin
    ) { (s, d) =>
      val files = orders(s, d)
        .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("day"))
        .agg(count(lit(1)).as("n_rows"))
      val prior = org.apache.spark.sql.expressions.Window
        .orderBy(col("day").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      files
        .withColumn("prior",
          coalesce(sum(col("n_rows")).over(prior), lit(0L)).cast("long"))
        .withColumn("bin", expr("prior div 400"))
        .groupBy("bin")
        .agg(count(lit(1)).cast("long").as("n_files"),
             sum(col("n_rows")).cast("long").as("n_rows"),
             min("day").as("day_first"), max("day").as("day_last"))
        .orderBy("bin")
    },

    /** Write-audit-publish table read — the transactional-commit
      * capability (`graft.sources.LakeTable`) exercised end-to-end as an
      * oracle-checked query: commit v1 (orders before 1997, per-customer
      * counts/cents), commit v2 over it (all orders — the "backfill"),
      * then attempt a v3 whose audit REJECTS (an empty snapshot fails
      * the q_dq_checks-style gate: non-empty + non-null keys), and read
      * THROUGH the manifest. The result must be exactly v2's content —
      * the rejected commit left no reader-visible trace, and the v1
      * files still on disk are invisible because readers only follow the
      * derived live version (highest marked manifest — r9). Totals are exact BIGINT cents (the
      * q_dq_snapshot_diff discipline), so the oracle — which computes
      * v2's aggregate straight from `orders` — hash-matches the bytes
      * that ACTUALLY traveled through parquet staging, audit re-read,
      * and manifest-routed scan. Crash-atomicity (a kill between any
      * two protocol stages leaves the old manifest live) is LakeSpec's
      * job; this op pins the happy path + audit-reject path into the
      * driver's correctness gate. */
    OpDef(
      "q_lake_read",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_")
      def snap(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
      def gate(df: DataFrame): Option[String] = {
        val bad = df.agg(
          count(lit(1)).as("n"),
          count(when(col("custkey").isNull, 1)).as("nulls")).head
        if (bad.getLong(0) == 0L) Some("empty snapshot")
        else if (bad.getLong(1) > 0L) Some("null merge keys")
        else None
      }
      val o = orders(s, d)
      val v1 = LakeTable.commit(s, dir,
        snap(o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))))(gate)
      require(v1 == Right(1L), s"v1 commit failed: $v1")
      val v2 = LakeTable.commit(s, dir, snap(o))(gate)
      require(v2 == Right(2L), s"v2 commit failed: $v2")
      // the audit gate must block a bad backfill without touching state
      val v3 = LakeTable.commit(s, dir, snap(o).filter(lit(false)))(gate)
      require(v3.isLeft, "empty snapshot must fail the audit gate")
      require(LakeTable.currentVersion(dir).contains(2L), "v2 must stay live")
      LakeTable.read(s, dir).orderBy("custkey")
    },

    /** TIME TRAVEL through the manifest history: commit v1 (pre-1997
      * orders), commit the v2 backfill over it, then read **VERSION 1
      * back** while v2 is live — the Delta `VERSION AS OF` / Iceberg
      * snapshot-read capability, which on the write-audit-publish
      * layout is just following an older immutable manifest instead of
      * the derived live version. The oracle computes v1's aggregate straight from
      * `orders`, so the hash-match proves the historical read returns
      * EXACTLY the bytes committed then, unaffected by the newer
      * version. Retention is [[graft.sources.LakeTable.vacuum]]'s job
      * (LakeSpec: reclaimed versions stop time-traveling, retained
      * ones keep working, the live version is untouched). */
    OpDef(
      "q_lake_timetravel",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_tt_")
      def snap(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
      val o = orders(s, d)
      val v1 = LakeTable.commit(s, dir,
        snap(o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))))(
        _ => None)
      require(v1 == Right(1L), s"v1 commit failed: $v1")
      val v2 = LakeTable.commit(s, dir, snap(o))(_ => None)
      require(v2 == Right(2L), s"v2 commit failed: $v2")
      LakeTable.readVersion(s, dir, 1L).orderBy("custkey")
    },

    /** SCHEMA EVOLUTION through the commit audit (r8): v1 commits the
      * narrow per-customer rollup, v2 backfills WITH AN ADDED COLUMN
      * (additive evolution — allowed, recorded in the manifest), then a
      * column DROP and a TYPE CHANGE are both rejected by the audit
      * before anything publishes. The live read reconciles columns by
      * the manifest-recorded schema; time travel hands v1 back with its
      * own narrower schema. The oracle computes v2's widened aggregate
      * straight from `orders`, so the hash-match proves the evolved
      * table round-trips exactly — the Delta/Iceberg `mergeSchema`
      * contract a lakehouse user hits right after their first MERGE. */
    OpDef(
      "q_lake_evolved",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_evo_")
      val o = orders(s, d)
      def narrow(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"))
      val wide = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
      val v1 = LakeTable.commit(s, dir, narrow(
        o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))))(
        _ => None)
      require(v1 == Right(1L), s"v1 commit failed: $v1")
      // the additive backfill evolves the schema
      val v2 = LakeTable.commit(s, dir, wide)(_ => None)
      require(v2 == Right(2L), s"additive evolution must commit: $v2")
      // a drop and a type change are both gate-rejected
      require(LakeTable.commit(s, dir, wide.drop("n_orders"))(_ => None)
                .swap.exists(_.contains("drops column")),
              "a column drop must be rejected")
      require(LakeTable.commit(s, dir,
                wide.withColumn("cents", col("cents").cast("int")))(_ => None)
                .swap.exists(_.contains("changes column")),
              "a type change must be rejected")
      require(LakeTable.currentVersion(dir).contains(2L), "v2 must stay live")
      // v1 time-travels with its own, narrower schema
      require(LakeTable.readVersion(s, dir, 1L).columns.toSeq
                == Seq("custkey", "n_orders"),
              "v1 must keep its pre-evolution schema")
      LakeTable.read(s, dir).orderBy("custkey")
    },

    /** OPTIMIZE as an ACTION (r8): ingest the per-customer rollup as 16
      * deliberately small files, run [[graft.sources.LakeTable.optimize]]
      * — which rewrites the live version into the PLANNED number of
      * range-clustered bins through the same write-audit-publish commit
      * as any other version — and read the compacted table back through
      * the manifest. The oracle computes the rollup straight from
      * `orders`, so the hash-match is the conservation proof: the
      * rewrite changed the file layout and nothing else. Requires pin
      * the layout effect (post-optimize file count == planned bins) and
      * history (the small-file version still time-travels). Crash
      * atomicity mid-optimize is LakeSpec's job. */
    OpDef(
      "q_lake_optimize",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_opt_")
      val snap = orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
      val v1 = LakeTable.commit(s, dir, snap.repartition(16))(_ => None)
      require(v1 == Right(1L), s"small-file ingest failed: $v1")
      require(LakeTable.currentFiles(dir).size == 16,
              "the ingest must produce the small files OPTIMIZE exists for")
      val n = LakeTable.read(s, dir).count()
      val target = math.max(1L, (n + 3L) / 4L) // plan ≈4 bins at any SF
      val bins = math.max(1L, (n + target - 1L) / target).toInt
      val v2 = LakeTable.optimize(s, dir, target, Seq("custkey"))
      require(v2 == Right(2L), s"optimize must commit v2: $v2")
      require(LakeTable.currentFiles(dir).size == bins,
              s"16 small files must compact to the $bins planned bins, " +
              s"got ${LakeTable.currentFiles(dir).size}")
      require(LakeTable.readVersion(s, dir, 1L).count() == n,
              "the pre-compaction version must stay time-travelable")
      LakeTable.read(s, dir).orderBy("custkey")
    },

    /** Partial-rewrite MERGE (r8): the 100 TB upsert path. v1 lays the
      * per-customer rollup out range-banded (`custkey div 32` in the
      * file paths via the `_layout=` staging convention), with the
      * low-band rows DELIBERATELY stale (counted from pre-1997 orders
      * only); the merge batch carries the corrected low-band rows and
      * [[graft.sources.LakeTable.mergePartial]] rewrites ONLY the files
      * whose layout value the batch touches — every other band's files
      * carry over into the new manifest verbatim, zero data movement
      * (requires pin the carried/rewritten file split). The oracle
      * computes the fully-correct rollup straight from `orders`, so the
      * hash-match proves the pruned rewrite loses nothing — stale rows
      * corrected, untouched bands byte-identical through carry-over. */
    OpDef(
      "q_lake_merge_partial",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_pm_")
      val o = orders(s, d)
      // scale-adaptive band width: ~8 bands at every SF (a fixed width
      // means 1 band at sf0.001 or 469 partition dirs at sf0.1 — the
      // first breaks the carry-over requires, the second pays hundreds
      // of tiny file writes; real tables size partitions the same way)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val full = roll(o)
      // v1: band 0 stale (pre-1997 slice), every other band correct
      val v1Table = full.filter(col("band") =!= 0)
        .unionByName(roll(o.filter(
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
          .filter(col("band") === 0))
      require(LakeTable.commit(s, dir, v1Table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val v1Files = LakeTable.currentFiles(dir)
      // the merge batch: corrected band-0 rows only
      val v2 = LakeTable.mergePartial(s, dir, full.filter(col("band") === 0),
                                      Seq("custkey"), "band")(_ => None)
      require(v2 == Right(2L), s"partial merge failed: $v2")
      val v2Files = LakeTable.currentFiles(dir)
      val carried = v2Files.filter(v1Files.contains)
      require(carried.nonEmpty, "untouched bands must carry over")
      require(carried.forall(f =>
                LakeTable.layoutValueOf(f).exists(_ != "0")),
              "band 0 must be rewritten, not carried")
      LakeTable.read(s, dir)
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** Multi-column PARTITIONED BY (r14, verdict ask #2): the table is
      * laid out by a TWO-column tuple — `_layout=<band>/_layout2=<par>`
      * path segments composed in declaration order — and a partial
      * merge touching exactly ONE (band, parity) tuple rewrites only
      * that tuple's files while every other tuple carries over verbatim
      * (requires pin both directions: untouched tuples carried
      * byte-identical, the touched tuple rewritten). The touched-value
      * routing, the carry planner, and the staged grouping all key on
      * the full tuple, so at 100 TB a 2-column layout prunes a MERGE's
      * rewrite set to the intersection of both dimensions — the
      * composite-partition discipline every warehouse table with
      * (date, region)-style layouts runs on. The oracle computes the
      * corrected rollup straight from `orders`, so the hash-match
      * proves the tuple-pruned rewrite lost nothing. */
    OpDef(
      "q_lake_multipart",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_mp_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
        .withColumn("parity", expr("custkey % 2"))
      val full = roll(o)
      val inTuple = col("band") === 0 && col("parity") === 0
      // v1: the (band 0, parity 0) tuple is stale (pre-1997 slice),
      // every other tuple correct
      val v1Table = full.filter(!inTuple)
        .unionByName(roll(o.filter(
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
          .filter(inTuple))
      require(LakeTable.commit(s, dir, v1Table,
                Some("band,parity"))(_ => None) == Right(1L),
              "v1 commit failed")
      val v1Files = LakeTable.currentFiles(dir)
      require(v1Files.forall(f =>
                LakeTable.layoutValuesOf(f).length == 2),
              "every staged file composes both layout segments")
      val v2 = LakeTable.mergePartial(s, dir, full.filter(inTuple),
                 Seq("custkey"), "band,parity")(_ => None)
      require(v2 == Right(2L), s"multi-column partial merge failed: $v2")
      val v2Files = LakeTable.currentFiles(dir)
      val untouched = v1Files.filter(f =>
        LakeTable.layoutValuesOf(f) != Seq("0", "0"))
      require(untouched.forall(v2Files.contains),
              "untouched (band, parity) tuples must carry verbatim")
      require(!v2Files.exists(f => v1Files.contains(f) &&
                LakeTable.layoutValuesOf(f) == Seq("0", "0")),
              "the touched tuple must be rewritten, not carried")
      LakeTable.read(s, dir)
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** Manifest-stats data skipping (r8): the version is committed with
      * per-file (min, max) custkey stats recorded in the manifest, and
      * the range query routes through
      * [[graft.sources.LakeTable.readWhere]] — the file-skip decision
      * runs on manifest METADATA only (no file opened), the requires pin
      * that files were actually skipped, and the row-level filter on top
      * closes the superset. At 100 TB this is the first line of scan
      * pruning a lakehouse query hits, before parquet footers are even
      * fetched; Delta/Iceberg record exactly these per-file column
      * ranges. The oracle computes the same range aggregate straight
      * from `orders`, so the hash-match proves skipping lost nothing. */
    OpDef(
      "q_lake_skipping",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders WHERE o_custkey BETWEEN 1 AND 100
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_skip_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val table = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      require(LakeTable.commit(s, dir, table, Some("band"),
                               Seq("custkey"))(_ => None) == Right(1L),
              "stats-bearing commit failed")
      val kept = LakeTable.filesWhere(dir, "custkey", 1L, 100L)
      require(kept.nonEmpty
                && kept.size < LakeTable.currentFiles(dir).size,
              s"stats must skip files: kept ${kept.size} of " +
              s"${LakeTable.currentFiles(dir).size}")
      // UNDECLARED-column skipping (r15, verdict ask #5): `cents` is
      // not in statsBy, yet the commit-time footer pass recorded its
      // min/max automatically (Delta's first-32-columns rule) — a probe
      // below every file's range must scan FEWER files than the table
      // holds (here: none; pruning on declared columns is unchanged)
      require(LakeTable.filesWhere(dir, "cents", -10L, -1L).isEmpty,
              "footer stats on an undeclared column must prune")
      LakeTable.readWhere(s, dir, "custkey", 1L, 100L)
        .filter(col("custkey").between(1L, 100L))
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** The lake through Spark's STANDARD source API (r8):
      * `spark.read.format("graft-lake")` resolves the committed version
      * via the manifest (schema included — no footer race with a
      * concurrent commit), `versionAsOf` time-travels, and a range
      * filter on the stats column prunes files through the
      * `PrunedFilteredScan` push-down BEFORE any footer is opened, with
      * Spark re-applying the filter row-level on top (pruning is a
      * superset by construction). The requires pin that the v1
      * time-travel read and the file pruning both actually happened;
      * the oracle computes the same range aggregate straight from
      * `orders`, so the hash-match proves the standard-API path returns
      * exactly the committed bytes. */
    OpDef(
      "q_lake_source",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders WHERE o_custkey BETWEEN 1 AND 100
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.{LakeRelation, LakeTable}
      val dir = TempDirs.create("graft_lake_srcop_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      require(LakeTable.commit(s, dir,
                roll(o.filter(col("o_orderdate") <
                  lit("1997-01-01").cast("timestamp"))),
                Some("band"), Seq("custkey"))(_ => None) == Right(1L))
      require(LakeTable.commit(s, dir, roll(o), Some("band"),
                Seq("custkey"))(_ => None) == Right(2L))
      require(s.read.format("graft-lake").option("path", dir)
                .option("versionAsOf", "1").load().count()
                < LakeTable.read(s, dir).count(),
              "versionAsOf must reach the narrower v1")
      val out = s.read.format("graft-lake").option("path", dir).load()
        .filter(col("custkey").between(1L, 100L))
        .select("custkey", "n_orders", "cents").orderBy("custkey")
      out.count() // one probe action so the prune seam below is set
      val scanned = Option(LakeRelation.lastScanFiles.get()).getOrElse(Nil)
      require(scanned.nonEmpty
                && scanned.size < LakeTable.currentFiles(dir).size,
              s"the range filter must prune files: ${scanned.size} of " +
              s"${LakeTable.currentFiles(dir).size}")
      out
    },

    /** INCREMENTAL MANIFEST LOG lifecycle (r15, verdict ask #1): the
      * whole delta/checkpoint protocol exercised end to end under an
      * oracle. The table builds a history long enough to cross the
      * checkpoint interval — v1 snapshot, then single-band partial
      * merges whose manifests are ADD/REMOVE DELTAS (O(touched files),
      * requires-pinned far smaller than the v1 snapshot and never
      * re-listing carried files) — then a DV MERGE-delete tombstones
      * every custkey ≡ 0 (mod 7), and a keep-3 vacuum reclaims the
      * early history, forcing the chain guard to anchor the lowest
      * retained version with a checkpoint. The requires pin the delta
      * form, the checkpoint cadence, the post-vacuum anchor, and that
      * a COLD resolution (cache cleared — a fresh JVM's view) still
      * time-travels the oldest retained version. The oracle computes
      * the end state straight from `orders`, so the hash-match proves
      * the fold of checkpoint + delta suffix loses nothing. At 100 TB
      * this is the difference between O(live-file) and O(touched-file)
      * commit metadata — the checkpoint interval is pinned to 3 here
      * (sys prop, restored) so the cadence is exercised at test scale. */
    OpDef(
      "q_lake_manifest_log",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders WHERE (o_custkey % 3) = 0 AND (o_custkey % 7) <> 0
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val prevIv = sys.props.put("graft.lake.checkpointInterval", "3")
      try {
        val dir = TempDirs.create("graft_lake_mlogop_")
        val o = orders(s, d)
        val width = math.max(32L,
          o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
        val table = o
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
               sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                   .cast("long")).cast("long").as("cents"))
          .withColumn("band", expr(s"custkey div $width"))
          .filter(col("custkey") % 3 === 0)
        require(LakeTable.commit(s, dir, table, Some("band"))(_ => None)
                  == Right(1L), "v1 commit failed")
        def raw(v: Long): String = new String(java.nio.file.Files
          .readAllBytes(java.nio.file.Paths.get(dir,
            s"manifest-v$v.json")), "UTF-8")
        // synthetic-key appends build the delta chain: each manifest
        // carries ONLY the appended file, never re-listing the live set
        import s.implicits._
        for (i <- 1 to 4) {
          val k = 900000000L + i
          require(LakeTable.append(s, dir,
                    Seq((k, 1L, 1L, k / width)).toDF(
                      "custkey", "n_orders", "cents", "band")
                      .coalesce(1))(_ => None) == Right(i + 1L),
                  s"append ${i + 1} failed")
        }
        require(raw(2L).contains("\"delta\":1"),
                "an append must write a delta manifest")
        require(raw(2L).length * 4 < raw(1L).length,
                s"delta ${raw(2L).length} B vs snapshot " +
                s"${raw(1L).length} B: O(touched), not O(live)")
        // checkpoint cadence: interval 3 anchors the chain at v4
        require(java.nio.file.Files.exists(
                  java.nio.file.Paths.get(dir, "checkpoint-v4.json")),
                "the depth-K chain must have written a checkpoint")
        // merge-on-read tombstones (%7 keys AND the synthetic rows),
        // then reclaim the early history — every retained version must
        // stay resolvable across the reclaimed chain
        val doomed = table.filter(col("custkey") % 7 === 0)
          .select("custkey")
          .unionAll((1 to 4).map(i => 900000000L + i).toDF("custkey"))
        require(LakeTable.deleteMatchedDv(s, dir, doomed,
                  Seq("custkey"))(_ => None) == Right(6L),
                "the DV delete failed")
        LakeTable.vacuum(dir, keepVersions = 3)
        LakeTable.clearResolveCache() // a fresh JVM's cold view
        require(LakeTable.versions(dir) == Seq(4L, 5L, 6L),
                "keep-3 vacuum must retain exactly the suffix")
        require(LakeTable.readVersion(s, dir, 4L).count()
                  == table.count() + 3L,
                "the oldest retained version must time-travel cold")
        LakeTable.read(s, dir)
          .select("custkey", "n_orders", "cents").orderBy("custkey")
      } finally {
        prevIv match {
          case Some(p) =>
            sys.props.put("graft.lake.checkpointInterval", p); ()
          case None =>
            sys.props.remove("graft.lake.checkpointInterval"); ()
        }
      }
    },

    /** CDC CHANGE FEED over the lake (r9): the manifest history replayed
      * as a retract/add stream. The table travels v1 (stale band 0) →
      * partial MERGE (band-0 correction) → OPTIMIZE (layout rewrite) →
      * partial CDC apply (tombstones); the query then reads
      * [[graft.sources.LakeTable.changesBetween]] and FOLDS each
      * version's deletes-then-inserts over the v1 snapshot with
      * exceptAll/unionAll — the exact computation a downstream
      * subscriber runs. The requires pin that the OPTIMIZE version
      * contributed ZERO rows to the feed (its manifest records
      * op=optimize — compaction moves bytes, not rows) and that the fold
      * reproduces the live version row-for-row; the oracle computes the
      * end state straight from `orders`, so the hash-match proves the
      * feed loses nothing and invents nothing. At 100 TB each version's
      * diff is manifest arithmetic and the feed reads only the files the
      * touched layout values rewrote. */
    OpDef(
      "q_lake_changes",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders WHERE (o_custkey % 10) <> 3
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_feed_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val full = roll(o)
      // v1: band 0 stale, every other band correct (the merge fixture)
      val v1Table = full.filter(col("band") =!= 0)
        .unionByName(roll(o.filter(
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
          .filter(col("band") === 0))
      require(LakeTable.commit(s, dir, v1Table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      require(LakeTable.mergePartial(s, dir, full.filter(col("band") === 0),
                Seq("custkey"), "band")(_ => None) == Right(2L),
              "the correction merge failed")
      require(LakeTable.optimize(s, dir, Long.MaxValue, Seq.empty,
                Some("band")) == Right(3L), "optimize failed")
      val tombstones = full.filter(col("custkey") % 10 === 3)
        .withColumn("op", lit("D"))
      require(LakeTable.applyCdcPartial(s, dir, tombstones,
                Seq("custkey"), "band")(_ => None) == Right(4L),
              "the CDC apply failed")
      val feed = LakeTable.changesBetween(s, dir, 1L, 4L)
      require(feed.filter(col("_commit_version") === 3L).count() == 0L,
              "the OPTIMIZE version must emit zero logical changes")
      // the subscriber's fold in its ASSOCIATIVE form: final multiplicity
      // of a row = v1 count + Σ inserts − Σ deletes (retractions in this
      // feed only ever remove rows that exist, so the per-version order
      // drops out of the END state — the one aggregation a subscriber
      // materializing only the final table runs; the order-sensitive
      // per-version replay is LakeSpec's pin). One shuffle instead of a
      // per-version exceptAll chain — and the shape that holds at any
      // version count.
      val cols = Seq("custkey", "n_orders", "cents", "band")
      def w(df: DataFrame, weight: Int) =
        df.select(cols.map(col): _*).withColumn("_w", lit(weight))
      val state = w(LakeTable.readVersion(s, dir, 1L), 1)
        .unionAll(w(feed.filter(col("_change_type") === "insert"), 1))
        .unionAll(w(feed.filter(col("_change_type") === "delete"), -1))
        .groupBy(cols.map(col): _*)
        .agg(sum(col("_w")).as("_m"))
        .filter(col("_m") > 0)
        .select(cols.map(col): _*)
      // fold == live, checked as one signed-multiplicity aggregation
      require(w(state, 1).unionAll(w(LakeTable.read(s, dir), -1))
                .groupBy(cols.map(col): _*)
                .agg(sum(col("_w")).as("_m"))
                .filter(col("_m") =!= 0).isEmpty,
              "the folded feed must reproduce the live version exactly")
      state.select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** The change feed consumed through the REGISTERED streaming source
      * (r10): the same merge → OPTIMIZE → tombstone history as
      * q_lake_changes, but the subscriber is a real
      * `readStream.format("graft-lake")` query — versions as offsets,
      * micro-batches landing in a parquet append sink (the distributed
      * spelling: no rows ever cross the driver), drained with
      * `processAllAvailable`. The fold over the STREAMED rows (signed
      * multiplicity, startingVersion 0 so v1's snapshot arrives as
      * inserts — no batch seed at all) must reproduce the live table
      * row-for-row (required), and the oracle computes the end state
      * straight from `orders` — the hash-match proves the streaming
      * source delivers exactly the feed, no loss, no invention, no
      * OPTIMIZE noise. The one-shot replay here is the oracle-checkable
      * slice; liveness (commits landing mid-stream), restart resume, and
      * tail-only starts are LakeStreamSpec's pins.
      *
      * Cost ladder (sf0.1, BENCH_DETAIL_r10, same host run): the suite's
      * heaviest at 3.8 s, of which q_lake_changes' identical table build
      * + feed fold accounts for ~3.4 s (four full commit protocols:
      * stage → audit → publish each for commit/merge/OPTIMIZE/CDC, plus
      * two full-table audit aggregations) — the streaming machinery
      * itself (query start/stop, offset log, parquet sink write + read
      * back) is the remaining ~0.4 s. The cost is protocol, not plan;
      * at 100 TB the same four commits move only the touched layout
      * values while this fixture's table is small enough that protocol
      * overhead dominates. */
    OpDef(
      "q_lake_stream",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders WHERE (o_custkey % 10) <> 3
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_stream_")
      val stage = TempDirs.create("graft_lake_stream_sink_")
      val cp = TempDirs.create("graft_lake_stream_cp_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val full = roll(o)
      val v1Table = full.filter(col("band") =!= 0)
        .unionByName(roll(o.filter(
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
          .filter(col("band") === 0))
      require(LakeTable.commit(s, dir, v1Table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      require(LakeTable.mergePartial(s, dir, full.filter(col("band") === 0),
                Seq("custkey"), "band")(_ => None) == Right(2L),
              "the correction merge failed")
      require(LakeTable.optimize(s, dir, Long.MaxValue, Seq.empty,
                Some("band")) == Right(3L), "optimize failed")
      val tombstones = full.filter(col("custkey") % 10 === 3)
        .withColumn("op", lit("D"))
      require(LakeTable.applyCdcPartial(s, dir, tombstones,
                Seq("custkey"), "band")(_ => None) == Right(4L),
              "the CDC apply failed")
      val q = s.readStream.format("graft-lake").option("path", dir).load()
        .writeStream.format("parquet")
        .option("path", stage).option("checkpointLocation", cp)
        .start()
      try q.processAllAvailable() finally q.stop()
      val feed = s.read.parquet(stage)
      require(feed.filter(col("_commit_version") === 3L).isEmpty,
              "the OPTIMIZE version must stream zero logical changes")
      val cols = Seq("custkey", "n_orders", "cents", "band")
      def w(df: DataFrame, weight: Int) =
        df.select(cols.map(col): _*).withColumn("_w", lit(weight))
      val state = w(feed.filter(col("_change_type") === "insert"), 1)
        .unionAll(w(feed.filter(col("_change_type") === "delete"), -1))
        .groupBy(cols.map(col): _*)
        .agg(sum(col("_w")).as("_m"))
        .filter(col("_m") > 0)
        .select(cols.map(col): _*)
      require(w(state, 1).unionAll(w(LakeTable.read(s, dir), -1))
                .groupBy(cols.map(col): _*)
                .agg(sum(col("_w")).as("_m"))
                .filter(col("_m") =!= 0).isEmpty,
              "the streamed fold must reproduce the live version exactly")
      state.select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** Incremental MATERIALIZED-VIEW maintenance from the change feed
      * (r9): the classic downstream consumer of a CDC stream. A per-band
      * aggregate (customers, order and cent sums) is seeded ONCE from v1
      * and then maintained purely from [[graft.sources.LakeTable
      * .changesBetween]] — inserts add, retractions subtract (count/sum
      * are self-maintainable under retract/add; the base table is NEVER
      * rescanned after the seed, which is the whole point of IVM at
      * 100 TB: maintenance cost ∝ changed rows, not table size). The
      * table travels the same merge → OPTIMIZE → CDC-tombstone history
      * as q_lake_changes (the compaction contributes nothing); a
      * fully-deleted group must vanish from the view (multiplicity
      * filter), and the requires pin the maintained view equal to a
      * direct re-aggregation of the live table. The oracle computes the
      * end-state aggregate straight from `orders`, so the hash-match
      * proves incremental maintenance drifted by nothing. */
    OpDef(
      "q_lake_mv",
      """WITH w AS (
        |  SELECT GREATEST(32, (SELECT max(o_custkey) FROM orders) // 8 + 1)
        |    AS width),
        |r AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders WHERE (o_custkey % 10) <> 3 GROUP BY 1)
        |SELECT CAST(custkey // (SELECT width FROM w) AS BIGINT) AS band,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(n_orders) AS BIGINT) AS orders_sum,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM r GROUP BY 1 ORDER BY band""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_mv_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val full = roll(o)
      val v1Table = full.filter(col("band") =!= 0)
        .unionByName(roll(o.filter(
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
          .filter(col("band") === 0))
      require(LakeTable.commit(s, dir, v1Table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      require(LakeTable.mergePartial(s, dir, full.filter(col("band") === 0),
                Seq("custkey"), "band")(_ => None) == Right(2L),
              "correction merge failed")
      require(LakeTable.optimize(s, dir, Long.MaxValue, Seq.empty,
                Some("band")) == Right(3L), "optimize failed")
      require(LakeTable.applyCdcPartial(s, dir,
                full.filter(col("custkey") % 10 === 3)
                  .withColumn("op", lit("D")),
                Seq("custkey"), "band")(_ => None) == Right(4L),
              "CDC apply failed")
      def viewOf(df: DataFrame) = df.groupBy("band").agg(
        count(lit(1)).cast("long").as("n_customers"),
        sum(col("n_orders")).cast("long").as("orders_sum"),
        sum(col("cents")).cast("long").as("cents_sum"))
      // seed once from v1, then maintain from the FEED alone
      val seed = viewOf(LakeTable.readVersion(s, dir, 1L))
      val signed = LakeTable.changesBetween(s, dir, 1L, 4L)
        .withColumn("_w",
          when(col("_change_type") === "insert", 1L).otherwise(-1L))
      val delta = signed.groupBy("band").agg(
        sum(col("_w")).cast("long").as("dc"),
        sum(col("n_orders") * col("_w")).cast("long").as("dn"),
        sum(col("cents") * col("_w")).cast("long").as("ds"))
      val mv = seed.join(delta, Seq("band"), "full_outer")
        .select(col("band"),
          (coalesce(col("n_customers"), lit(0L))
             + coalesce(col("dc"), lit(0L))).as("n_customers"),
          (coalesce(col("orders_sum"), lit(0L))
             + coalesce(col("dn"), lit(0L))).as("orders_sum"),
          (coalesce(col("cents_sum"), lit(0L))
             + coalesce(col("ds"), lit(0L))).as("cents_sum"))
        .filter(col("n_customers") > 0)
      // the maintained view must equal a direct re-aggregation
      val direct = viewOf(LakeTable.read(s, dir))
      require(mv.exceptAll(direct).isEmpty && direct.exceptAll(mv).isEmpty,
              "incremental maintenance must equal the direct aggregate")
      mv.orderBy("band")
    },

    /** RESTORE to an earlier version (r9) — Delta's `RESTORE TABLE ...
      * VERSION AS OF` as pure manifest arithmetic: v1 commits the correct
      * rollup, v2 OVERWRITES it with corrupted numbers (the bad deploy),
      * and [[graft.sources.LakeTable.restore]] re-publishes v1's exact
      * file list as v3 — ZERO data movement (requires pin file-list
      * identity), the corrupted v2 stays time-travel-readable for
      * forensics, and the change feed replays the restore as the
      * retract/add pair it logically is. The oracle computes the correct
      * rollup straight from `orders`, so the hash-match proves the
      * restore returned the table to exactly the pre-corruption bytes. */
    OpDef(
      "q_lake_restore",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_restore_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val good = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      require(LakeTable.commit(s, dir, good, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val v1Files = LakeTable.currentFiles(dir)
      // the bad deploy: every count corrupted, published as v2
      require(LakeTable.commit(s, dir,
                good.withColumn("n_orders", col("n_orders") + lit(999L)),
                Some("band"))(_ => None) == Right(2L), "v2 commit failed")
      val v3 = LakeTable.restore(s, dir, 1L)
      require(v3 == Right(3L), s"restore must publish v3: $v3")
      require(LakeTable.currentFiles(dir) == v1Files,
              "restore is manifest arithmetic: v3 must reference v1's " +
              "files verbatim, zero data movement")
      require(LakeTable.readVersion(s, dir, 2L)
                .filter(col("n_orders") > lit(999L)).count() > 0L,
              "the corrupted v2 must stay time-travel-readable")
      // restoring a reclaimed version is refused, not half-applied
      require(LakeTable.restore(s, dir, 99L).isLeft,
              "restoring an unknown version must be refused")
      LakeTable.read(s, dir)
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** ZERO-COPY CLONE (r12) — Delta's `CREATE TABLE ... CLONE` as
      * manifest arithmetic plus hard links:
      * [[graft.sources.LakeTable.cloneTable]] births a second table whose
      * v1 references the source's live bytes (O(files) metadata ops,
      * zero data movement — requires pin the file-list identity), with
      * stats and DELETION VECTORS carried verbatim. The op then proves
      * total post-birth independence by diverging both sides: a DV
      * delete lands on the source BEFORE the clone (its hidden rows must
      * stay hidden in the clone), a second DV delete lands on the CLONE
      * only, and an append lands on the SOURCE only (invisible in the
      * clone). The read-back is the clone's final state; the oracle
      * computes it straight from `orders`, so the hash-match proves the
      * clone is byte-exact and the divergence leaked nothing either
      * way. At 100 TB a clone costs a manifest listing — the capability
      * behind dev/staging copies and experiment branches of production
      * tables. */
    OpDef(
      "q_lake_clone",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders
        |WHERE o_custkey % 10 <> 0 AND o_custkey % 7 <> 3
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val base = TempDirs.create("graft_lake_clone_")
      val srcDir = s"$base/src"
      val dstDir = s"$base/dst"
      val snap = orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
      require(LakeTable.commit(s, srcDir, snap)(_ => None) == Right(1L),
              "v1 commit failed")
      // a DV delete BEFORE the clone: the vector must carry into it
      require(LakeTable.deleteWhereDv(s, srcDir,
                col("custkey") % 10 === 0)(_ => None) == Right(2L),
              "source DV delete failed")
      val srcFiles = LakeTable.currentFiles(srcDir)
      require(LakeTable.cloneTable(srcDir, dstDir) == Right(1L),
              "clone must publish the clone's own v1")
      require(LakeTable.currentFiles(dstDir) == srcFiles,
              "clone is metadata + links: its v1 must reference the " +
              "source's file list verbatim")
      require(LakeTable.cloneTable(srcDir, dstDir).isLeft,
              "cloning onto a non-fresh target must refuse")
      // diverge: a clone-only DV delete ...
      require(LakeTable.deleteWhereDv(s, dstDir,
                col("custkey") % 7 === 3)(_ => None) == Right(2L),
              "clone DV delete failed")
      // ... and a source-only append, invisible in the clone
      require(LakeTable.append(s, srcDir,
                snap.limit(1).withColumn("custkey", lit(-1L)))(_ => None)
                == Right(3L), "source append failed")
      LakeTable.read(s, dstDir).orderBy("custkey")
    },

    /** DATE-typed manifest-stats skipping through the standard source
      * (r9): the table is laid out by order YEAR with per-file (min, max)
      * recorded for the DATE column (`statsBy` typed encoding — epoch
      * days), and a date-range filter through
      * `spark.read.format("graft-lake")` prunes the out-of-range years'
      * files before any footer is opened (requires pin the prune). Dates
      * are the single most common prune key in practice — every
      * time-partitioned fact table queries "last N days" — and the r8
      * long-only stats could not serve them. The oracle computes the same
      * range aggregate straight from `orders`, so the hash-match proves
      * typed pruning lost nothing. */
    OpDef(
      "q_lake_skipping_date",
      """SELECT CAST(o_orderdate AS DATE) AS od,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE)
        |        BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
        |GROUP BY 1 ORDER BY od""".stripMargin
    ) { (s, d) =>
      import graft.sources.{LakeRelation, LakeTable}
      val dir = TempDirs.create("graft_lake_skipdate_")
      val table = orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("od"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("yr", year(col("od")).cast("long"))
      require(LakeTable.commit(s, dir, table, Some("yr"),
                               Seq("od"))(_ => None) == Right(1L),
              "date-stats commit failed")
      val out = s.read.format("graft-lake").option("path", dir).load()
        .filter(col("od").between(lit("1996-01-01").cast("date"),
                                  lit("1996-06-30").cast("date")))
        .select("od", "n_orders", "cents").orderBy("od")
      out.count() // probe action so the prune seam below is populated
      val scanned = Option(LakeRelation.lastScanFiles.get()).getOrElse(Nil)
      require(scanned.nonEmpty
                && scanned.size < LakeTable.currentFiles(dir).size,
              s"the date range must prune files: ${scanned.size} of " +
              s"${LakeTable.currentFiles(dir).size}")
      out
    },

    /** SQL DML over the lake (r11, verdict ask #2): the full
      * catalog-table lifecycle a SQL-only user runs — `CREATE TABLE ...
      * USING graft-lake`, then `INSERT INTO ... SELECT` (the zero-rewrite
      * append: v2's manifest carries v1's files verbatim, required
      * below), read the end state back THROUGH SQL. The v1 seed is the
      * pre-1997 per-customer rollup; the insert adds the 1997+ era's
      * rows, so the oracle — the same rollup grouped by (custkey, era)
      * straight from `orders` — hash-matches only if `INSERT INTO`
      * committed exactly the selected rows through write-audit-publish
      * and the catalog read resolved the NEW live version (the relation
      * re-derives the live version per scan precisely so cached catalog
      * resolutions don't freeze at CREATE time). INSERT OVERWRITE,
      * time-travel-refusal, and multi-insert sequencing are
      * SourceFormatSpec's pins. */
    OpDef(
      "q_lake_sql_insert",
      """SELECT o_custkey AS custkey,
        |  CAST(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
        |       THEN 0 ELSE 1 END AS BIGINT) AS era,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1, 2 ORDER BY custkey, era""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_dml_")
      val o = orders(s, d)
      def roll(df: DataFrame, era: Long) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("era", lit(era))
      val cut = lit("1997-01-01").cast("timestamp")
      require(LakeTable.commit(s, dir,
                roll(o.filter(col("o_orderdate") < cut), 0L))(_ => None)
                == Right(1L), "v1 seed commit failed")
      // unique CATALOG name (not Views.reg — a same-named temp view would
      // shadow the table in INSERT/SELECT resolution)
      val t = "graft_dml_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"CREATE TABLE $t USING `graft-lake` OPTIONS (path '$dir')")
      try {
        val inc = Views.reg(roll(o.filter(col("o_orderdate") >= cut), 1L),
                            "dml_inc")
        val before = LakeTable.currentFiles(dir).toSet
        s.sql(s"INSERT INTO $t SELECT custkey, n_orders, cents, era " +
              s"FROM $inc")
        require(LakeTable.currentVersion(dir).contains(2L),
                "INSERT INTO must publish v2")
        require(before.subsetOf(LakeTable.currentFiles(dir).toSet),
                "INSERT INTO must be a zero-rewrite append (carry v1)")
        s.sql(s"SELECT custkey, era, n_orders, cents FROM $t " +
              "ORDER BY custkey, era")
      } finally s.sql(s"DROP TABLE $t")
    },

    /** DELETION-VECTOR delete through the manifest (r11, verdict ask
      * #9): commit the per-customer rollup, [[graft.sources.LakeTable
      * .deleteWhereDv]] every custkey ≡ 3 (mod 10) — which publishes a
      * POSITION SIDECAR and leaves every data file byte-identical
      * (required below) — and read the live table back through the
      * vector filter. The oracle computes the post-delete rollup
      * straight from `orders`, so the hash-match proves the sidecar
      * anti-join hides exactly the deleted rows and nothing else; the
      * requires pin the zero-rewrite property and v1's intact time
      * travel. Feed retractions, stacking, OPTIMIZE purge, vacuum
      * retention, and the DV-aware partial merge are LakeSpec's pins. At 100 TB
      * this is the fine-grained delete that costs O(deleted positions)
      * instead of rewriting every touched file — the GDPR/right-to-be-
      * forgotten path every lakehouse grows eventually. */
    OpDef(
      "q_lake_dv",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders WHERE (o_custkey % 10) <> 3
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_dv_")
      val o = orders(s, d)
      // scale-adaptive band width, the q_lake_merge_partial discipline:
      // ~8 bands at every SF (a fixed `div 32` wrote 469 partition dirs
      // at sf0.1 — hundreds of tiny files for one query, 13.7 s of the
      // r11 bench; real tables size partitions the same way)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val table = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      require(LakeTable.commit(s, dir, table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val filesV1 = LakeTable.currentFiles(dir)
      require(LakeTable.deleteWhereDv(s, dir,
                col("custkey") % 10 === 3)(_ => None) == Right(2L),
              "DV delete failed")
      require(LakeTable.currentFiles(dir) == filesV1,
              "a DV delete must leave every data file in place")
      // cheap time-travel pin: both counts are parquet footer metadata
      // (no recompute of the rollup — the r11 body's table.count() +
      // readVersion().count() re-ran the whole agg); exact v1-equality
      // is LakeSpec's pin
      require(LakeTable.readVersion(s, dir, 1L).count() >
                LakeTable.read(s, dir).count(),
              "v1 must time-travel past the deletion vector")
      LakeTable.read(s, dir)
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** SQL `CREATE TABLE AS SELECT` through the DSv2 catalog (r12): the
      * SQL-first table birth. CREATE records the declared layout column
      * and stats columns as the table's `pending.json` write defaults
      * (this layout cannot publish an empty version — schema lives in
      * non-empty manifests), and the CTAS write itself publishes v1
      * CARRYING them (requires pin the `_layout=` paths and the
      * recorded per-file custkey stats); a later plain `INSERT INTO`
      * appends v2 under the same defaults. The oracle computes the full
      * rollup straight from `orders`, so the hash-match proves CREATE,
      * CTAS write, defaults-carrying append, and the catalog read path
      * compose end-to-end. At 100 TB the declared defaults are what
      * keep every SQL INSERT prunable: layout for partial merges, stats
      * for data skipping, with no engine-API call anywhere. */
    OpDef(
      "q_lake_sql_create",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val table = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val view = Views.reg(table, "sqlcreate")
      s.sql(s"CREATE TABLE $cat.default.$tbl PARTITIONED BY (band) " +
        "TBLPROPERTIES ('statsBy'='custkey') AS " +
        s"SELECT * FROM $view WHERE custkey % 2 = 0")
      require(LakeTable.currentVersion(dir).contains(1L),
              "CTAS must publish v1")
      require(LakeTable.currentFiles(dir).forall(_.contains("_layout=")),
              "CTAS must honor the declared layout column")
      require(LakeTable.statsOf(dir, 1L).keys.exists(_._2 == "custkey"),
              "CTAS must record the declared statsBy column")
      s.sql(s"INSERT INTO $cat.default.$tbl " +
        s"SELECT * FROM $view WHERE custkey % 2 = 1")
      require(LakeTable.currentVersion(dir).contains(2L),
              "INSERT after CTAS must append v2")
      s.table(s"$cat.default.$tbl")
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** SQL `COPY INTO` (r14) — Delta's idempotent batch file ingestion:
      * the cron-safe loading pattern every warehouse runs. Source
      * parquet files land in two waves; the FIRST copy loads wave one,
      * the SECOND loads exactly the new files (requires pin the counts),
      * and a RE-RUN loads nothing and mints no version — the copied-set
      * rides the manifest like any watermark, so orchestrator retries
      * and crash-replays never double-load. At 100 TB this is the
      * idempotence contract that makes file-drop ingestion exactly-once
      * without an external ledger. The oracle computes the rollup
      * straight from `orders`, so the hash-match proves both waves
      * landed exactly once. */
    OpDef(
      "q_lake_sql_copy",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val rollup = orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
      val src = TempDirs.create("graft_copy_src_")
      rollup.filter(col("custkey") % 2 === 0)
        .write.parquet(s"$src/wave1")
      s.sql(s"CREATE TABLE $cat.default.$tbl " +
        "(custkey BIGINT, n_orders BIGINT, cents BIGINT)")
      def copy() = s.sql(s"COPY INTO $cat.default.$tbl FROM '$src' " +
        "FILEFORMAT = PARQUET").head
      val c1 = copy()
      require(c1.getLong(0) > 0L, "wave one must load files")
      val vAfter1 = LakeTable.currentVersion(dir)
      // IDEMPOTENT: the re-run loads nothing and publishes nothing
      val c2 = copy()
      require(c2.getLong(0) == 0L && c2.getLong(1) == 0L,
              "a COPY INTO re-run must load nothing")
      require(LakeTable.currentVersion(dir) == vAfter1,
              "a no-op COPY INTO must not mint a version")
      // wave two: only the NEW files load
      rollup.filter(col("custkey") % 2 === 1)
        .write.parquet(s"$src/wave2")
      val c3 = copy()
      require(c3.getLong(0) > 0L, "wave two must load the new files")
      require(copy().getLong(0) == 0L, "and then it is loaded")
      s.table(s"$cat.default.$tbl").orderBy("custkey")
    },

    /** SQL `ALTER TABLE ... ADD COLUMNS` through the DSv2 catalog
      * (r12): schema evolution as a METADATA-ONLY commit — v1 holds the
      * pre-evolution rows (custkey, n_orders for even custkeys), the
      * ALTER publishes v2 with the SAME file list and the extended
      * recorded schema (requires pin file-list identity — zero data
      * movement, the write amplification a full-table null-column
      * rewrite would cost at 100 TB), and the post-ALTER insert lands
      * odd custkeys WITH the new `cents` column. Readers null-fill the
      * old rows; the oracle spells the same null pattern with a CASE,
      * so the hash-match proves the evolved read is exact across both
      * eras. RENAME COLUMN (r13) is metadata-only too, via COLUMN
      * MAPPING: the files and the manifest's recorded schema keep the
      * physical name forever, a display map rides the commit, every
      * pre-rename file stays readable (requires pin file-list identity
      * across the rename AND that old rows read back under the new
      * name — the hash-match covers both eras' rows under the renamed
      * column). Drops/type changes refuse — the evolution contract,
      * now reachable from SQL. */
    OpDef(
      "q_lake_sql_alter",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CASE WHEN o_custkey % 2 = 1
        |    THEN CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
        |              AS BIGINT)) AS BIGINT)
        |    ELSE NULL END AS cents_total
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val table = orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
      val view = Views.reg(table, "sqlalter")
      // n_orders is born INT: the widening leg below proves the v1
      // files' INT32 encoding up-casts at read after ALTER COLUMN TYPE
      s.sql(s"CREATE TABLE $cat.default.$tbl " +
        "(custkey BIGINT, n_orders INT)")
      s.sql(s"INSERT INTO $cat.default.$tbl " +
        s"SELECT custkey, CAST(n_orders AS INT) FROM $view " +
        "WHERE custkey % 2 = 0")
      val filesV1 = LakeTable.currentFiles(dir)
      // ALTER COLUMN TYPE widening (r14): metadata-only via the
      // column-mapping seam — files keep INT32 forever, readers up-cast
      // at the scan boundary, fresh inserts land INT64, time travel
      // shows each version's own type, DESCRIBE DETAIL the logical one
      s.sql(s"ALTER TABLE $cat.default.$tbl " +
        "ALTER COLUMN n_orders TYPE BIGINT")
      require(LakeTable.currentVersion(dir).contains(2L),
              "TYPE widening must publish a metadata version")
      require(LakeTable.currentFiles(dir) == filesV1,
              "TYPE widening must be metadata-only: identical file list")
      require(LakeTable.readVersion(s, dir, 1L)
                .schema("n_orders").dataType ==
              org.apache.spark.sql.types.IntegerType,
              "time travel shows v1 under its own (narrow) type")
      require(s.table(s"$cat.default.$tbl")
                .schema("n_orders").dataType ==
              org.apache.spark.sql.types.LongType,
              "the live logical type is the widened one")
      require(s.sql(s"DESCRIBE DETAIL $cat.default.$tbl").collect()
                .exists(_.toString.contains("n_orders BIGINT")),
              "DESCRIBE DETAIL reports the widened logical type")
      s.sql(s"ALTER TABLE $cat.default.$tbl ADD COLUMNS (cents BIGINT)")
      require(LakeTable.currentVersion(dir).contains(3L),
              "ALTER must publish a metadata version")
      s.sql(s"INSERT INTO $cat.default.$tbl " +
        s"SELECT custkey, n_orders, cents FROM $view WHERE custkey % 2 = 1")
      // RENAME COLUMN (r13): metadata-only via column mapping — file
      // list identical, both eras' rows readable under the new name,
      // time travel still shows each version's own names
      val filesV4 = LakeTable.currentFiles(dir)
      s.sql(s"ALTER TABLE $cat.default.$tbl " +
        "RENAME COLUMN cents TO cents_total")
      require(LakeTable.currentVersion(dir).contains(5L),
              "RENAME must publish a metadata version")
      require(LakeTable.currentFiles(dir) == filesV4,
              "RENAME must be metadata-only: identical file list")
      require(LakeTable.readVersion(s, dir, 4L)
                .columns.contains("cents"),
              "time travel across the rename keeps the old name")
      // DROP COLUMN (r13): also metadata-only via column mapping — the
      // throwaway column leaves the recorded schema (readers stop
      // requesting it, zero data movement) and its physical name
      // tombstones against resurrection
      s.sql(s"ALTER TABLE $cat.default.$tbl ADD COLUMNS (tmp BIGINT)")
      val filesV6 = LakeTable.currentFiles(dir)
      s.sql(s"ALTER TABLE $cat.default.$tbl DROP COLUMN tmp")
      require(LakeTable.currentVersion(dir).contains(7L),
              "DROP must publish a metadata version")
      require(LakeTable.currentFiles(dir) == filesV6,
              "DROP must be metadata-only: identical file list")
      s.table(s"$cat.default.$tbl").orderBy("custkey")
    },

    /** SQL `OPTIMIZE` / `VACUUM` via the injected parser (r12) — the
      * admin statements Spark has no grammar for, added the way Delta
      * adds its own (`SparkSessionExtensions.injectParser`; everything
      * else delegates to Spark's parser untouched). The table is built
      * and mutated ENTIRELY in SQL: CTAS births it laid out by band,
      * INSERT appends (small-file growth), DELETE publishes a deletion
      * vector, `OPTIMIZE <t>` compacts AND purges the vector (requires
      * pin the DV-free compacted manifest + preserved layout), and
      * `VACUUM <t> RETAIN 1 VERSIONS` reclaims all history under the
      * live version (requires pin the single retained version). The
      * oracle computes the post-delete rollup straight from `orders`,
      * so the hash-match proves compaction conserved rows exactly and
      * vacuum reclaimed only history. At 100 TB these two statements
      * ARE the table-maintenance loop a SQL-first operator runs. */
    OpDef(
      "q_lake_sql_optimize",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders
        |WHERE o_custkey % 10 <> 0
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val table = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val view = Views.reg(table, "sqloptimize")
      s.sql(s"CREATE TABLE $cat.default.$tbl PARTITIONED BY (band) " +
        "TBLPROPERTIES ('statsBy'='custkey') AS " +
        s"SELECT * FROM $view WHERE custkey % 2 = 0")
      s.sql(s"INSERT INTO $cat.default.$tbl " +
        s"SELECT * FROM $view WHERE custkey % 2 = 1")
      s.sql(s"DELETE FROM $cat.default.$tbl WHERE custkey % 10 = 0")
      require(LakeTable.dvOf(dir,
                LakeTable.currentVersion(dir).get).nonEmpty,
              "the SQL DELETE must publish a deletion vector")
      val ov = s.sql(s"OPTIMIZE $cat.default.$tbl").head.getLong(0)
      require(LakeTable.currentVersion(dir).contains(ov),
              "OPTIMIZE must publish the compacted version")
      require(LakeTable.dvOf(dir, ov).isEmpty,
              "OPTIMIZE is the DV purge: no vector may survive it")
      require(LakeTable.currentFiles(dir).forall(_.contains("_layout=")),
              "OPTIMIZE must preserve the CREATE-time layout")
      val vac = s.sql(s"VACUUM $cat.default.$tbl RETAIN 1 VERSIONS").head
      require(vac.getLong(0) > 0L, "VACUUM must reclaim the history")
      require(LakeTable.versions(dir) == Seq(ov),
              "only the live version may survive RETAIN 1")
      s.table(s"$cat.default.$tbl")
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** SQL `INSERT INTO ... REPLACE WHERE` (r12) — Delta's
      * `replaceWhere`, the IDEMPOTENT BACKFILL: one atomic commit
      * deletes every live row of band 2 (a position sidecar — requires
      * pin that every pre-existing file carries verbatim, zero rewrite)
      * and inserts the recomputed rows, write amplification ∝ the
      * replaced range, never table size. Incoming rows outside the
      * range REFUSE before anything stages (the leak validation —
      * without it a backfill could silently write into ranges it did
      * not replace; pinned in SourceFormatSpec along with the
      * `writeTo(...).overwrite(cond)` spelling). The oracle recomputes
      * the post-backfill state straight from `orders` with the same
      * width arithmetic, so the hash-match proves the replaced range
      * holds exactly the new rows and every other band is bit-exact. */
    OpDef(
      "q_lake_sql_replace",
      """WITH r AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |w AS (SELECT greatest(32, CAST(max(custkey) // 8 + 1 AS BIGINT))
        |        AS width FROM r)
        |SELECT custkey, n_orders,
        |  CASE WHEN custkey // width = 2 THEN cents * 2
        |       ELSE cents END AS cents,
        |  CAST(custkey // width AS BIGINT) AS band
        |FROM r, w ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val table = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val view = Views.reg(table, "sqlreplace")
      s.sql(s"CREATE TABLE $cat.default.$tbl AS SELECT * FROM $view")
      val filesV1 = LakeTable.currentFiles(dir).toSet
      // the backfill: band 2 recomputed (cents doubled), one commit
      s.sql(s"INSERT INTO $cat.default.$tbl REPLACE WHERE band = 2 " +
        s"SELECT custkey, n_orders, cents * 2 AS cents, band " +
        s"FROM $view WHERE band = 2")
      require(LakeTable.currentVersion(dir).contains(2L),
              "REPLACE WHERE must publish one version")
      require(filesV1.subsetOf(LakeTable.currentFiles(dir).toSet),
              "REPLACE WHERE must carry every pre-existing file verbatim")
      s.table(s"$cat.default.$tbl").orderBy("custkey")
    },

    /** SQL `DELETE FROM` through the DataSourceV2 catalog (r12, verdict
      * ask #4 — the engine's first DSv2 surface): the rollup commits at
      * `<warehouse>/default/<tbl>`, the session registers
      * [[graft.sources.LakeCatalog]] once per JVM, and plain SQL
      * `DELETE FROM graft_lake.default.<tbl> WHERE custkey < 100` binds
      * through `SupportsDelete` to the DELETION-VECTOR delete — Spark
      * translates the condition to source filters at ANALYSIS time
      * (un-pushable scalar conditions route through the analyzer-rule
      * rewrite to the same commit instead, r12; only subqueries refuse
      * — a DELETE can never half-apply either way). The
      * requires pin the zero-rewrite property (same files, version
      * bumped); the read back goes through `spark.table(...)` — the V2
      * read path — so the hash-match proves catalog resolution, the
      * V1Scan shim, and the DV filter compose. The oracle computes the
      * post-delete rollup straight from `orders`. At 100 TB this is the
      * GDPR delete a SQL-first user runs verbatim: O(deleted positions),
      * no file rewritten. */
    OpDef(
      "q_lake_sql_delete",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders WHERE o_custkey >= 100
        |GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      // one warehouse per JVM: Spark caches the catalog instance at first
      // resolution, so the warehouse must not move between invocations —
      // per-invocation isolation comes from the table NAME instead
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val table = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      require(LakeTable.commit(s, dir, table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val filesV1 = LakeTable.currentFiles(dir)
      s.sql(s"DELETE FROM $cat.default.$tbl WHERE custkey < 100")
      require(LakeTable.currentVersion(dir).contains(2L),
              "SQL DELETE must publish v2")
      require(LakeTable.currentFiles(dir) == filesV1,
              "SQL DELETE must be zero-rewrite (deletion vectors)")
      s.table(s"$cat.default.$tbl")
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** SQL `UPDATE` over the lake (r12): plain
      * `UPDATE <catalog>.default.<tbl> SET ... WHERE ...` rewritten by
      * the [[graft.GraftExtensions]]-injected analyzer rule into the
      * merge-on-read DV update ([[graft.sources.LakeTable
      * .updateWhereDv]]) — one atomic commit, matched rows hidden by a
      * position sidecar, updated copies in fresh files, zero
      * pre-existing files rewritten (required inline). Unlike the
      * DSv2 DELETE binding, the condition need not be
      * source-filter-pushable (the rule carries scalar expressions by
      * their SQL — `custkey % 10 = 3` here); out-of-scope shapes
      * (nested fields, subqueries) fall through to Spark's own
      * row-level-operation error, so nothing half-applies. The oracle
      * computes the post-update rollup straight from `orders`; the
      * hash-match proves the SQL surface, the rewrite rule, and the DV
      * commit compose end-to-end. */
    OpDef(
      "q_lake_sql_update",
      """SELECT custkey,
        |  CAST(CASE WHEN custkey % 7 = 0 THEN n_orders * 2
        |       ELSE n_orders END AS BIGINT) AS n_orders,
        |  cents
        |FROM (
        |  SELECT o_custkey AS custkey,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |) ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val table = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      require(LakeTable.commit(s, dir, table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val filesV1 = LakeTable.currentFiles(dir).toSet
      s.sql(s"UPDATE $cat.default.$tbl SET n_orders = n_orders * 2 " +
            "WHERE custkey % 7 = 0")
      require(LakeTable.currentVersion(dir).contains(2L),
              "SQL UPDATE must publish v2")
      require(filesV1.subsetOf(LakeTable.currentFiles(dir).toSet),
              "SQL UPDATE must keep every pre-existing file (DV path)")
      s.table(s"$cat.default.$tbl")
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** DELETION-VECTOR MERGE (r12): the merge-on-read upsert —
      * [[graft.sources.LakeTable.mergeDv]] replaces same-key rows and
      * inserts new keys in ONE atomic commit that rewrites NOTHING: a
      * position sidecar hides matched target rows, the source lands as
      * fresh layout-aware files, every pre-existing file byte-identical
      * (required inline). The operating-point complement of
      * q_lake_merge_partial: the partial rewrite wins when a batch
      * CLUSTERS in few layout values (files stay compact), this wins
      * when it SCATTERS — a low-selectivity upsert touching every band
      * would pay |touched files| rewrite amplification there and pays
      * only |source| here. v1 carries DELIBERATELY STALE rows for
      * custkey ≡ 3 (mod 10) (rolled from the pre-1997 slice — some such
      * keys are absent entirely, so the merge exercises BOTH replace and
      * insert); the source carries the corrected rows; the oracle is the
      * fully-correct rollup straight from `orders`, so the hash-match
      * proves the sidecar+fresh-file composition loses nothing. */
    OpDef(
      "q_lake_dv_merge",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_dvm_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val full = roll(o)
      val hit = col("custkey") % 10 === 3
      val v1Table = full.filter(!hit)
        .unionByName(roll(o.filter(
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
          .filter(hit))
      require(LakeTable.commit(s, dir, v1Table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val filesV1 = LakeTable.currentFiles(dir).toSet
      require(LakeTable.mergeDv(s, dir, full.filter(hit), Seq("custkey"),
                layoutBy = Some("band"))(_ => None) == Right(2L),
              "DV merge failed")
      require(filesV1.subsetOf(LakeTable.currentFiles(dir).toSet),
              "a DV merge must keep every pre-existing file in place")
      LakeTable.read(s, dir)
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** SQL `MERGE INTO` over the lake (r12): the canonical upsert —
      * `WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *`
      * on equality keys — rewritten by the extensions-injected analyzer
      * rule into [[graft.sources.LakeTable.mergeDv]]'s one-commit
      * merge-on-read upsert (zero pre-existing files rewritten, required
      * inline). Same stale-slice fixture as q_lake_dv_merge, driven
      * entirely through SQL against the DSv2 catalog table with the
      * source as a temp view; out-of-scope MERGE shapes (conditional
      * clauses, non-identity assignments) fall through to Spark's own
      * error — SourceFormatSpec pins that nothing half-applies. */
    OpDef(
      "q_lake_sql_merge",
      """SELECT o_custkey AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val full = roll(o)
      val hit = col("custkey") % 10 === 3
      val v1Table = full.filter(!hit)
        .unionByName(roll(o.filter(
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
          .filter(hit))
      require(LakeTable.commit(s, dir, v1Table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val filesV1 = LakeTable.currentFiles(dir).toSet
      val src = Views.reg(full.filter(hit), "dvm_src")
      s.sql(s"MERGE INTO $cat.default.$tbl AS t USING $src AS sr " +
            "ON t.custkey = sr.custkey " +
            "WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *")
      require(LakeTable.currentVersion(dir).contains(2L),
              "SQL MERGE must publish v2")
      require(filesV1.subsetOf(LakeTable.currentFiles(dir).toSet),
              "SQL MERGE must keep every pre-existing file (DV path)")
      s.table(s"$cat.default.$tbl")
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** GENERAL SQL `MERGE INTO` (r13): conditional WHEN clauses, partial
      * assignments, and a conditional partial INSERT — the shapes beyond
      * the canonical upsert, rewritten by the analyzer rule into
      * [[graft.sources.LakeTable.mergeConditionalDv]]'s ONE merge-on-read
      * DV commit (first-applicable-clause semantics; zero pre-existing
      * files rewritten, required inline). Fixture: v1 holds a stale
      * rollup slice for `custkey%10=3` customers and OMITS the
      * `custkey%10=7` ones; the source carries both slices fresh. The
      * MERGE refreshes grown stale customers (`s.n_orders >
      * t.n_orders`), ages out the unchanged ones (the fall-through
      * DELETE clause), and back-inserts only even missing customers —
      * every clause branch exercised, and the oracle recomputes the
      * survivor set relationally in DuckDB, so the hash-match proves the
      * conditional CASE routing, the hide set, and the insert filter all
      * at once. At 100 TB the plan is one key-equi-join plus two
      * anti-joins, write cost ∝ touched rows (sidecar + fresh files) —
      * never table size. */
    OpDef(
      "q_lake_sql_merge_cond",
      """WITH full_r AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |stale AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |t AS (
        |  SELECT * FROM full_r
        |  WHERE custkey % 10 <> 3 AND custkey % 10 <> 7
        |  UNION ALL
        |  SELECT * FROM stale WHERE custkey % 10 = 3),
        |s AS (SELECT * FROM full_r WHERE custkey % 10 IN (3, 7))
        |SELECT custkey, n_orders, cents FROM t
        |WHERE custkey NOT IN (SELECT custkey FROM s)
        |UNION ALL
        |SELECT t.custkey, s.n_orders, s.cents
        |FROM t JOIN s ON t.custkey = s.custkey
        |WHERE s.n_orders > t.n_orders
        |UNION ALL
        |SELECT custkey, n_orders, cents FROM s
        |WHERE custkey NOT IN (SELECT custkey FROM t)
        |  AND custkey % 2 = 0
        |ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val cat = "graft_lake"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          TempDirs.create("graft_lake_wh_"))
      }
      val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tbl = "t_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      val dir = java.nio.file.Paths.get(wh, "default", tbl).toString
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      def roll(df: DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      val full = roll(o)
      val hit3 = col("custkey") % 10 === 3
      val hit7 = col("custkey") % 10 === 7
      val v1Table = full.filter(!hit3 && !hit7)
        .unionByName(roll(o.filter(
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
          .filter(hit3))
      require(LakeTable.commit(s, dir, v1Table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val filesV1 = LakeTable.currentFiles(dir).toSet
      val src = Views.reg(full.filter(hit3 || hit7), "dvmc_src")
      s.sql(s"MERGE INTO $cat.default.$tbl AS t USING $src AS s " +
            "ON t.custkey = s.custkey " +
            "WHEN MATCHED AND s.n_orders > t.n_orders THEN UPDATE SET " +
            "n_orders = s.n_orders, cents = s.cents " +
            "WHEN MATCHED THEN DELETE " +
            "WHEN NOT MATCHED AND s.custkey % 2 = 0 THEN INSERT " +
            "(custkey, n_orders, cents, band) VALUES " +
            "(s.custkey, s.n_orders, s.cents, s.band)")
      require(LakeTable.currentVersion(dir).contains(2L),
              "general SQL MERGE must publish v2")
      require(filesV1.subsetOf(LakeTable.currentFiles(dir).toSet),
              "general SQL MERGE must keep every pre-existing file")
      s.table(s"$cat.default.$tbl")
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    },

    /** DELETION-VECTOR UPDATE (r12): merge-on-read UPDATE in ONE atomic
      * commit — [[graft.sources.LakeTable.updateWhereDv]] publishes a
      * position sidecar hiding every matched live row PLUS freshly
      * staged files carrying the updated copies; every pre-existing
      * data file stays byte-identical (required inline: the v1 file
      * set is a strict subset of v2's). Write cost ∝ matched rows,
      * never touched-file size — the update analogue of q_lake_dv's
      * delete, and the path a 100 TB table takes for a low-selectivity
      * UPDATE where copy-on-write would rewrite whole files for a few
      * rows each. The oracle computes the post-update rollup straight
      * from `orders` (CASE on the same predicate), so the hash-match
      * proves the sidecar+fresh-files composition updates exactly the
      * matching rows and nothing else; conservation, feed replay
      * (retract-old + insert-new), time travel, and merge interleave
      * are LakeSpec's pins. */
    OpDef(
      "q_lake_dv_update",
      """SELECT custkey,
        |  n_orders,
        |  CAST(CASE WHEN custkey % 10 = 3 THEN cents + 7 ELSE cents END
        |       AS BIGINT) AS cents
        |FROM (
        |  SELECT o_custkey AS custkey,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |) ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      import graft.sources.LakeTable
      val dir = TempDirs.create("graft_lake_dvu_")
      val o = orders(s, d)
      val width = math.max(32L,
        o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
      val table = o
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
        .withColumn("band", expr(s"custkey div $width"))
      require(LakeTable.commit(s, dir, table, Some("band"))(_ => None)
                == Right(1L), "v1 commit failed")
      val filesV1 = LakeTable.currentFiles(dir).toSet
      require(LakeTable.updateWhereDv(s, dir, col("custkey") % 10 === 3,
                Seq("cents" -> (col("cents") + lit(7L))),
                layoutBy = Some("band"))(_ => None)
                == Right(2L), "DV update failed")
      require(filesV1.subsetOf(LakeTable.currentFiles(dir).toSet),
              "a DV update must keep every pre-existing file in place")
      LakeTable.read(s, dir)
        .select("custkey", "n_orders", "cents").orderBy("custkey")
    }
  )
}
