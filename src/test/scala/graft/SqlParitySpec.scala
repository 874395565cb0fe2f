package graft

import graft.SparkEntry.{oracleSql, queries}
import graft.ops.Tables

/** SURVEY §5.2 layer 2 — self-oracle parity: the ANSI subset of the oracle
  * SQL runs unmodified on Spark's own SQL frontend (E2 entry point) and
  * must produce exactly the DataFrame API's rows. Catches DataFrame/SQL
  * drift before the driver's DuckDB pass does, and demonstrates that the
  * oracle corpus is portable SQL, not DuckDB-only. */
class SqlParitySpec extends SparkTestBase {

  // queries whose oracle SQL is pure ANSI (no string_split / '//' / epoch /
  // list_* / struct_pack / json operators / time_bucket)
  private val ansiQueries = Seq(
    "q_agg_basic", "q_agg_distinct", "q_agg_filter", "q_agg_stats",
    "q_distinct", "q_filter_compound", "q_join_inner", "q_join_semi",
    "q_join_anti", "q_join_cross", "q_topk", "q_limit_offset",
    "q_union_all", "q_union_distinct", "q_intersect", "q_except",
    "q_win_rank", "q_win_topk_group", "q_agg_pivot", "q_tpch_q3",
    "q_tpch_q5", "q_tpch_q10", "q_agg_salted", "q_sort_multi",
    "q_scd2_build", "q_events_transitions", "q_agg_moments",
    "q_join_right", "q_agg_bitagg", "q_agg_grouping", "q_join_asof_fwd",
    "q_dq_checks", "q_events_anomaly", "q_tpch_q4", "q_tpch_q12", "q_agg_geomean",
    "q_merge_upsert", "q_graph_cooccur",
    "q_layout_bucket_join", "q_layout_partition_prune",
    "q_lake_read", "q_lake_timetravel")

  test("ANSI oracle SQL reproduces the DataFrame results on Spark SQL") {
    // events goes through its loader (ns→µs normalization + legacy conf);
    // registering the raw file would throw on the TIMESTAMP(NANOS) column
    Tables.names.filterNot(_ == "events").foreach { t =>
      Tables.t(spark, sf, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, sf).createOrReplaceTempView("events")
    // Spark SQL parses decimal literals (10000.0) as DECIMAL where the
    // DataFrame lit() is DOUBLE — numerically identical, so compare values
    // after normalizing number types
    def norm(rows: Seq[org.apache.spark.sql.Row]): Seq[Seq[Any]] =
      rows.map(_.toSeq.map {
        case d: java.math.BigDecimal => d.doubleValue()
        case x: Double => x
        case n: Number => n.longValue()
        case other => other
      })
    ansiQueries.foreach { name =>
      val viaSql = norm(spark.sql(oracleSql(name)).collect().toSeq)
      val viaDf = norm(queries(name)(spark, sf).collect().toSeq)
      assert(viaSql == viaDf, s"$name: SQL vs DataFrame drift")
    }
  }
}
