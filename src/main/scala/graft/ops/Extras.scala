package graft.ops

import org.apache.spark.sql.functions._

/** Coverage beyond SURVEY §2's core inventory: pivot, exact percentiles,
  * correlation/covariance, ordered string aggregation, generator (UDTF)
  * surface, and deterministic hash-sampling — operators a training-data
  * pipeline reaches for constantly.
  */
object Extras {
  import Tables._

  val ops: Seq[OpDef] = Seq(

    // pivot: one column per event_type (explicit value list → stable
    // schema; Spark pivots with map-side partial aggs, no extra shuffle
    // vs a plain groupBy)
    OpDef(
      "q_agg_pivot",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click')    AS click,
        |  count(*) FILTER (WHERE event_type = 'error')    AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  count(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // exact interpolated percentiles (Spark percentile ≡ DuckDB
    // quantile_cont)
    OpDef(
      "q_agg_percentile",
      """SELECT o_orderstatus,
        |  floor((quantile_cont(o_totalprice, 0.25)) * 10000.0 + 0.5) / 10000.0 AS p25,
        |  floor((quantile_cont(o_totalprice, 0.50)) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor((quantile_cont(o_totalprice, 0.75)) * 10000.0 + 0.5) / 10000.0 AS p75
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(Det.r4(expr("percentile(o_totalprice, 0.25)")).as("p25"),
             Det.r4(expr("percentile(o_totalprice, 0.50)")).as("p50"),
             Det.r4(expr("percentile(o_totalprice, 0.75)")).as("p75"))
        .orderBy("o_orderstatus")
    },

    OpDef(
      "q_agg_corr",
      """SELECT l_returnflag,
        |  floor((corr(l_quantity, l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS corr_qp,
        |  floor((covar_samp(l_quantity, l_extendedprice)) * 100.0 + 0.5) / 100.0 AS cov_qp,
        |  floor((covar_pop(l_quantity, l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS cov_qd
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(Det.r6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
             Det.r2(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cov_qp"),
             Det.r6(covar_pop(col("l_quantity"), col("l_discount"))).as("cov_qd"))
        .orderBy("l_returnflag")
    },

    // ordered string aggregation
    OpDef(
      "q_agg_stragg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin
    ) { (s, d) =>
      nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
               .as("nations_csv"))
        .orderBy("r_name")
    },

    // generator / UDTF surface: posexplode ≡ unnest-with-position
    OpDef(
      "q_explode_pos",
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS tok
        |FROM docs, unnest(range(1, len(toks) + 1)) AS t(i)
        |ORDER BY doc_id, pos""".stripMargin
    ) { (s, d) =>
      documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
                posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .orderBy("doc_id", "pos")
    },

    // deterministic hash-sampling: a reproducible 1-in-10 sample keyed on
    // md5 (portable across engines/runs, unlike TABLESAMPLE/rand) — at
    // 100 TB this is the sampling primitive that stays stable across
    // retries and engines
    OpDef(
      "q_sample_hash",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE strpos('0123456789abcdef',
        |             substring(md5(l_orderkey || '-' || l_linenumber), 1, 1)) - 1 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(expr("instr('0123456789abcdef', " +
          "substring(md5(concat(l_orderkey, '-', l_linenumber)), 1, 1)) - 1 = 0"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }
  )
}
