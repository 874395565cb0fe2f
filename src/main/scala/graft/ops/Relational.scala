package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.1–§2.3, §2.6–§2.7 — scans, filters/projections, joins, sorts/top-k,
  * set operations.
  *
  * Scale notes (100 TB):
  *  - filters/projections are declared on the scan so Catalyst pushes them
  *    into the parquet reader (PushedFilters / pruned ReadSchema);
  *  - dimension joins are `broadcast()`-hinted (no shuffle of the fact
  *    side); large equi-joins shuffle on the join key only (sort-merge),
  *    with AQE skew-split left enabled;
  *  - top-k compiles to TakeOrderedAndProject (per-partition heap + driver
  *    merge of k rows, never a global sort).
  */
object Relational {
  import Tables._

  val ops: Seq[OpDef] = Seq(

    // ---------------------------------------------------------- §2.1 scans
    OpDef(
      "q_scan_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    OpDef(
      "q_scan_pushdown",
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1999-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    OpDef(
      "q_json_decode",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .select(col("event_id"),
                from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .orderBy("event_id")
    },

    // -------------------------------------------- §2.2 filters/projections
    OpDef(
      "q_filter_compound",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderstatus IN ('F','P')
        |  AND (o_orderpriority = '1-URGENT'
        |       OR o_totalprice BETWEEN 50000 AND 150000)
        |  AND NOT (o_custkey % 7 = 0)
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .filter(col("o_orderstatus").isin("F", "P") &&
                (col("o_orderpriority") === "1-URGENT" ||
                 col("o_totalprice").between(50000, 150000)) &&
                !(col("o_custkey") % 7 === 0))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    OpDef(
      "q_filter_like",
      """SELECT p_partkey, p_name, p_brand, p_type
        |FROM part
        |WHERE p_name LIKE '%bolt%'
        |   OR (p_type LIKE 'PROMO%' AND regexp_matches(p_brand, 'Brand#1[0-9]'))
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      part(s, d)
        .filter(col("p_name").like("%bolt%") ||
                (col("p_type").like("PROMO%") &&
                 col("p_brand").rlike("Brand#1[0-9]")))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey")
    },

    OpDef(
      "q_filter_null",
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
        |FROM orders
        |WHERE nullif(o_orderstatus, 'P') IS NULL
        |   OR nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F'
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .withColumn("st", nullif(col("o_orderstatus"), lit("P")))
        .filter(col("st").isNull || (col("st") <=> "F"))
        .select("o_orderkey", "st")
        .orderBy("o_orderkey")
    },

    OpDef(
      "q_project_expr",
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000.0 + 0.5) / 10000.0 AS charge,
        |  CASE WHEN l_discount > 0.05 THEN 'HIGH'
        |       WHEN l_discount > 0.02 THEN 'MID'
        |       ELSE 'LOW' END AS disc_band
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Det.r4(col("l_extendedprice") * (lit(1) - col("l_discount")) *
                 (lit(1) + col("l_tax"))).as("charge"),
          when(col("l_discount") > 0.05, "HIGH")
            .when(col("l_discount") > 0.02, "MID")
            .otherwise("LOW").as("disc_band"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    OpDef(
      "q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---------------------------------------------------------- §2.3 joins
    OpDef(
      "q_join_inner",
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    },

    OpDef(
      "q_join_broadcast",
      """SELECT p_brand, floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(Det.r4(sum(col("l_extendedprice"))).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },

    OpDef(
      "q_join_left",
      """SELECT c_custkey, o_orderkey
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_totalprice > 400000
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .join(orders(s, d),
              col("c_custkey") === col("o_custkey") &&
              col("o_totalprice") > 400000,
              "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    },

    OpDef(
      "q_join_right",
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT JOIN customer
        |  ON c_custkey = o_custkey AND o_totalprice > 400000
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // right outer: Spark plans it as the mirrored left-outer with the
      // build side swapped — declared so the full outer-join matrix
      // (left/right/full) is first-class surface
      orders(s, d)
        .join(customer(s, d),
              col("c_custkey") === col("o_custkey") &&
              col("o_totalprice") > 400000,
              "right")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    },

    OpDef(
      "q_join_full",
      """WITH p AS (SELECT user_id, count(*) AS purchases FROM events
        |           WHERE event_type = 'purchase' AND value > 300 GROUP BY user_id),
        |     e AS (SELECT user_id, count(*) AS errors FROM events
        |           WHERE event_type = 'error' AND value > 300 GROUP BY user_id)
        |SELECT coalesce(p.user_id, e.user_id) AS user_id, purchases, errors
        |FROM p FULL JOIN e ON p.user_id = e.user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase" && col("value") > 300)
        .groupBy(col("user_id").as("p_uid")).agg(count(lit(1)).as("purchases"))
      val e = ev.filter(col("event_type") === "error" && col("value") > 300)
        .groupBy(col("user_id").as("e_uid")).agg(count(lit(1)).as("errors"))
      p.join(e, col("p_uid") === col("e_uid"), "full")
        .select(coalesce(col("p_uid"), col("e_uid")).as("user_id"),
                col("purchases"), col("errors"))
        .orderBy("user_id")
    },

    OpDef(
      "q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 100000),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    OpDef(
      "q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 100000),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    OpDef(
      "q_join_theta",
      """SELECT e1.user_id AS user_id, count(*) AS pairs_1min
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND CAST(e2.ts AS TIMESTAMP) > CAST(e1.ts AS TIMESTAMP)
        | AND CAST(e2.ts AS TIMESTAMP) <= CAST(e1.ts AS TIMESTAMP) + INTERVAL 1 MINUTE
        |GROUP BY e1.user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      // equi part (user_id) drives the hash/sort-merge join; the time-range
      // residual filters post-match — no cross product at scale.
      val e1 = events(s, d).select(col("user_id"), col("ts").as("ts1"))
      val e2 = events(s, d).select(col("user_id").as("uid2"), col("ts").as("ts2"))
      e1.join(e2,
              col("user_id") === col("uid2") &&
              col("ts2") > col("ts1") &&
              col("ts2") <= col("ts1") + expr("INTERVAL 1 MINUTE"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("pairs_1min"))
        .orderBy("user_id")
    },

    OpDef(
      "q_join_asof",
      """WITH j AS (
        |  SELECT p.event_id, p.user_id, c.event_id AS click_id,
        |         CAST(c.ts AS TIMESTAMP) AS click_ts,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY CAST(c.ts AS TIMESTAMP) DESC,
        |                                     c.event_id DESC) AS rn
        |  FROM events p JOIN events c
        |    ON p.user_id = c.user_id
        |   AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |  WHERE p.event_type = 'purchase' AND c.event_type = 'click')
        |SELECT event_id, user_id, click_id, click_ts
        |FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      // As-of join (latest click at or before each purchase, per user),
      // emulated as equi-join + per-purchase row_number — Spark's DataFrame
      // API has no native as-of. The user_id equi key carries the shuffle;
      // at 100 TB this is a sort-merge join + one window over the match set.
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = events(s, d).filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
                col("ts").as("click_ts"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("click_ts").desc, col("click_id").desc)
      p.join(c, col("user_id") === col("c_uid") && col("click_ts") <= col("ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "user_id", "click_id", "click_ts")
        .orderBy("event_id")
    },

    OpDef(
      "q_join_asof_fwd",
      """WITH j AS (
        |  SELECT c.event_id AS click_id, c.user_id,
        |         p.event_id AS purchase_id, CAST(p.ts AS TIMESTAMP) AS purch_ts,
        |         row_number() OVER (PARTITION BY c.event_id
        |                            ORDER BY CAST(p.ts AS TIMESTAMP) ASC,
        |                                     p.event_id ASC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'click') c
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |    ON p.user_id = c.user_id
        |   AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP))
        |SELECT click_id, user_id, purchase_id, purch_ts
        |FROM j WHERE rn = 1
        |ORDER BY click_id""".stripMargin
    ) { (s, d) =>
      // FORWARD as-of: earliest purchase at or after each click, per user
      // (conversion lead). LEFT join so unconverted clicks surface with
      // NULLs — the "as-of with no match yet" semantic the backward twin
      // (inner) doesn't exercise. Same scale shape: user_id equi shuffle
      // + one per-click window; an unmatched click carries exactly one
      // null row, so rn = 1 selects it.
      val c = events(s, d).filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("event_id").as("purchase_id"),
                col("ts").as("purch_ts"))
      val w = Window.partitionBy(col("click_id"))
        .orderBy(col("purch_ts").asc, col("purchase_id").asc)
      c.join(p, col("user_id") === col("p_uid") && col("purch_ts") >= col("ts"),
             "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("click_id", "user_id", "purchase_id", "purch_ts")
        .orderBy("click_id")
    },

    /** NEAREST as-of (r9): completes the as-of triple — backward
      * (q_join_asof), forward (q_join_asof_fwd), and nearest-in-time:
      * each purchase pairs with the click whose timestamp is CLOSEST in
      * EITHER direction within a 24 h tolerance band (the pandas
      * `merge_asof(direction='nearest', tolerance=...)` semantics — the
      * right default when event order is unreliable, e.g. clock-skewed
      * sources). Distance is exact integer MICROSECONDS (no float
      * comparisons), ties break toward the earlier click then smaller
      * id, LEFT so band-less purchases surface NULL. Same scale shape as
      * its siblings: user_id equi shuffle + one per-purchase window; the
      * tolerance band is what keeps the match set bounded at 100 TB. */
    OpDef(
      "q_join_asof_nearest",
      """WITH j AS (
        |  SELECT p.event_id, p.user_id, c.event_id AS click_id,
        |         abs(epoch_us(CAST(c.ts AS TIMESTAMP))
        |             - epoch_us(CAST(p.ts AS TIMESTAMP))) AS dist_us,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY abs(epoch_us(CAST(c.ts AS TIMESTAMP))
        |                        - epoch_us(CAST(p.ts AS TIMESTAMP))) ASC,
        |                    CAST(c.ts AS TIMESTAMP) ASC,
        |                    c.event_id ASC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id
        |   AND abs(epoch_us(CAST(c.ts AS TIMESTAMP))
        |           - epoch_us(CAST(p.ts AS TIMESTAMP))) <= 86400000000)
        |SELECT event_id, user_id, click_id, CAST(dist_us AS BIGINT) AS dist_us
        |FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
                unix_micros(col("ts").cast("timestamp")).as("p_us"))
      val c = events(s, d).filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
                unix_micros(col("ts").cast("timestamp")).as("c_us"))
      val dist = abs(col("c_us") - col("p_us"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("dist_us").asc, col("c_us").asc, col("click_id").asc)
      p.join(c, col("user_id") === col("c_uid")
               && dist <= lit(86400000000L), "left")
        .withColumn("dist_us", dist.cast("long"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "user_id", "click_id", "dist_us")
        .orderBy("event_id")
    },

    OpDef(
      "q_join_range",
      """WITH ev AS (
        |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |b AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
        |iv AS (SELECT i AS win_id,
        |         lo + i * ((hi - lo) // 20) AS w_start,
        |         lo + i * ((hi - lo) // 20) + ((hi - lo) // 40) AS w_end
        |       FROM b, (SELECT unnest(range(0, 20)) AS i))
        |SELECT win_id, w_start, w_end, count(*) AS n_events
        |FROM iv JOIN ev ON ev.us >= iv.w_start AND ev.us < iv.w_end
        |GROUP BY win_id, w_start, w_end
        |ORDER BY win_id""".stripMargin
    ) { (s, d) =>
      // PURE range join (no equi key): events falling inside data-derived
      // time windows. A naive `a.join(b, a.ts between ...)` plans as a
      // BroadcastNestedLoopJoin — O(|a|·|b|). The scale-safe formulation
      // bucketizes time: each interval explodes to the coarse buckets it
      // overlaps (~2 rows each), each event maps to exactly one bucket,
      // and the join becomes an equi-join on bucket + residual range
      // filter — the standard distributed interval-join technique. All in
      // BIGINT epoch-micros (unix_micros ≡ DuckDB epoch_us, exact).
      //
      // The 1-row global bounds feed in as SCALAR SUBQUERIES (a DataFrame
      // cross-join of a 1-row aggregate plans as BroadcastNestedLoopJoin —
      // even with a constant equi key, which Catalyst folds away); the
      // bounds aggregate is evaluated per reference, which parquet
      // min/max statistics make a metadata-only scan at any scale.
      val v = Views.reg(events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("us")), "range_ev")
      s.sql(
        s"""WITH b AS (
          |  SELECT min(us) AS lo, max(us) AS hi,
          |         (max(us) - min(us)) div 32 + 1 AS bw
          |  FROM $v),
          |iv AS (
          |  SELECT win_id, w_start, w_end,
          |         explode(sequence(w_start div bw, (w_end - 1) div bw)) AS bkt
          |  FROM (SELECT win_id, bw,
          |               lo + win_id * ((hi - lo) div 20) AS w_start,
          |               lo + win_id * ((hi - lo) div 20) + ((hi - lo) div 40)
          |                 AS w_end
          |        FROM b LATERAL VIEW explode(sequence(0L, 19L)) t AS win_id)),
          |evb AS (
          |  SELECT event_id, us, us div (SELECT bw FROM b) AS bkt
          |  FROM $v)
          |SELECT /*+ BROADCAST(iv) */ win_id, w_start, w_end,
          |       count(*) AS n_events
          |FROM evb JOIN iv USING (bkt)
          |WHERE us >= w_start AND us < w_end
          |GROUP BY win_id, w_start, w_end
          |ORDER BY win_id""".stripMargin)
    },

    OpDef(
      "q_join_cross",
      """SELECT r_regionkey, n_nationkey, r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin
    ) { (s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .select("r_regionkey", "n_nationkey", "r_name", "n_name")
        .orderBy("r_regionkey", "n_nationkey")
    },

    // ------------------------------------------------- §2.6 sorts / top-k
    OpDef(
      "q_sort_multi",
      """SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS pri, o_totalprice
        |FROM orders
        |ORDER BY pri ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
                nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("pri"),
                col("o_totalprice"))
        .orderBy(col("pri").asc_nulls_first, col("o_totalprice").desc,
                 col("o_orderkey").asc)
    },

    OpDef(
      "q_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin
    ) { (s, d) =>
      // sort+limit → TakeOrderedAndProjectExec: per-partition top-k heaps,
      // k rows to the driver — no global sort even at 100 TB.
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    OpDef(
      "q_limit_offset",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    },

    // ------------------------------------------------------ §2.7 set ops
    OpDef(
      "q_union_all",
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, value FROM events WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      val a = events(s, d).filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "value")
      val b = events(s, d).filter(col("event_type") === "error")
        .select("event_id", "user_id", "value")
      a.unionByName(b).orderBy("event_id")
    },

    OpDef(
      "q_union_distinct",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val a = events(s, d).filter(col("event_type") === "purchase").select("user_id")
      val b = events(s, d).filter(col("event_type") === "error").select("user_id")
      a.union(b).distinct().orderBy("user_id")
    },

    OpDef(
      "q_intersect",
      """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 250
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 250
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val a = events(s, d)
        .filter(col("event_type") === "purchase" && col("value") > 250)
        .select("user_id")
      val b = events(s, d)
        .filter(col("event_type") === "error" && col("value") > 250)
        .select("user_id")
      a.intersect(b).orderBy("user_id")
    },

    OpDef(
      "q_except",
      """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 250
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 250
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val a = events(s, d)
        .filter(col("event_type") === "purchase" && col("value") > 250)
        .select("user_id")
      val b = events(s, d)
        .filter(col("event_type") === "error" && col("value") > 250)
        .select("user_id")
      a.except(b).orderBy("user_id")
    },

    // recursive CTE (Spark 4): month spine generated by the recursion
    // itself, left-joined to orders so EMPTY months surface with count 0
    // — the gap-fill shape q_gen_datespine builds with sequence(),
    // expressed through the SQL-standard WITH RECURSIVE operator both
    // engines execute natively
    OpDef(
      "q_gen_recursive",
      """WITH RECURSIVE spine(m) AS (
        |  SELECT TIMESTAMP '1995-01-01'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM spine
        |  WHERE m < TIMESTAMP '2001-07-01')
        |SELECT m, count(o_orderkey) AS n_orders
        |FROM spine LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        |GROUP BY m
        |ORDER BY m""".stripMargin
    ) { (s, d) =>
      val v = Views.reg(orders(s, d), "rec_ord")
      s.sql(
        s"""WITH RECURSIVE spine(m) AS (
           |  SELECT TIMESTAMP '1995-01-01'
           |  UNION ALL
           |  SELECT m + INTERVAL 1 MONTH FROM spine
           |  WHERE m < TIMESTAMP '2001-07-01')
           |SELECT m, count(o_orderkey) AS n_orders
           |FROM spine LEFT JOIN $v
           |  ON date_trunc('MONTH', o_orderdate) = m
           |GROUP BY m
           |ORDER BY m""".stripMargin)
    },

    // correlated LATERAL join: per-customer top-2 orders — the "for each
    // row, run a dependent subquery" surface. Catalyst decorrelates the
    // LIMIT-ed inner query into a ranked window join (no per-row
    // re-execution — same plan shape a 100 TB run needs); the oracle
    // spells the decorrelated window equivalent, which is the semantics
    // LATERAL guarantees.
    OpDef(
      "q_join_lateral",
      """SELECT c_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT c_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM customer JOIN orders ON o_custkey = c_custkey)
        |WHERE rn <= 2
        |ORDER BY c_custkey, o_orderkey""".stripMargin
    ) { (s, d) =>
      val vc = Views.reg(customer(s, d), "lat_cust")
      val vo = Views.reg(orders(s, d), "lat_ord")
      s.sql(
        s"""SELECT c_custkey, o_orderkey, o_totalprice
           |FROM $vc,
           |LATERAL (SELECT o_orderkey, o_totalprice
           |         FROM $vo
           |         WHERE o_custkey = c_custkey
           |         ORDER BY o_totalprice DESC, o_orderkey ASC
           |         LIMIT 2)
           |ORDER BY c_custkey, o_orderkey""".stripMargin)
    },

    /** Point-in-time feature join with a staleness bound — the
      * feature-store training-set join: each purchase (label row) picks
      * the user's latest click feature at-or-before the label time AND no
      * older than 24 h; a missing or stale feature surfaces as NULL
      * rather than silently reaching forward in time (leakage) or
      * arbitrarily far back (stale serving skew). q_join_asof is the
      * unbounded backward variant; the staleness predicate is what makes
      * this the PIT shape. Same scale design: user_id equi key carries
      * the shuffle (sort-merge at 100 TB), the time predicates are
      * residual filters, one per-label window over the match set picks
      * rn = 1 — an unmatched label carries exactly one null row. Feature
      * age is exact integer µs → minutes (no float). */
    OpDef(
      "q_join_pit",
      """WITH p AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pus
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS cus
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.event_id, p.user_id, c.click_id, p.pus - c.cus AS age_us,
        |    row_number() OVER (PARTITION BY p.event_id
        |                       ORDER BY c.cus DESC, c.click_id DESC) AS rn
        |  FROM p LEFT JOIN c
        |    ON p.user_id = c.user_id
        |   AND c.cus <= p.pus
        |   AND c.cus >= p.pus - 86400000000)
        |SELECT event_id, user_id, click_id,
        |  CAST(age_us // 60000000 AS BIGINT) AS feat_age_min
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("pus"))
      val c = events(s, d).filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
                unix_micros(col("ts")).as("cus"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("cus").desc, col("click_id").desc)
      p.join(c,
             col("user_id") === col("c_uid")
               && col("cus") <= col("pus")
               && col("cus") >= col("pus") - lit(86400000000L),
             "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("click_id"),
                expr("(pus - cus) div 60000000").as("feat_age_min"))
        .orderBy("event_id")
    }
  )
}
