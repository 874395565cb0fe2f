package graft.ops

import org.apache.spark.sql.functions._

/** Event-stream analytics in the reference genre: funnels, retention
  * cohorts, histograms — the queries a Kafka→Spark pipeline serves daily.
  * All single-pass aggregations over the events table (conditional min/
  * count), so each is one shuffle on its grouping key at any scale.
  */
object EventAnalytics {
  import Tables._

  val ops: Seq[OpDef] = Seq(

    // conversion funnel: signup → click → purchase, ordered by event time
    // per user (conditional-min + ordered-exists, one aggregation pass)
    OpDef(
      "q_events_funnel",
      """WITH m AS (
        |  SELECT user_id,
        |    min(CAST(ts AS TIMESTAMP)) FILTER (WHERE event_type = 'signup') AS t_signup,
        |    min(CAST(ts AS TIMESTAMP)) FILTER (WHERE event_type = 'click') AS t_click,
        |    min(CAST(ts AS TIMESTAMP)) FILTER (WHERE event_type = 'purchase') AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT
        |  count(*) FILTER (WHERE t_signup IS NOT NULL) AS n_signup,
        |  count(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup) AS n_click_after,
        |  count(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup
        |                   AND t_purchase > t_click) AS n_purchase_after
        |FROM m""".stripMargin
    ) { (s, d) =>
      val m = events(s, d)
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
             min(when(col("event_type") === "click", col("ts"))).as("t_click"),
             min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      m.agg(
        count(when(col("t_signup").isNotNull, 1)).as("n_signup"),
        count(when(col("t_signup").isNotNull &&
                   col("t_click") > col("t_signup"), 1)).as("n_click_after"),
        count(when(col("t_signup").isNotNull &&
                   col("t_click") > col("t_signup") &&
                   col("t_purchase") > col("t_click"), 1)).as("n_purchase_after"))
    },

    // day-7 retention by first-seen cohort
    OpDef(
      "q_events_retention",
      """WITH f AS (
        |  SELECT user_id,
        |    CAST(min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT DISTINCT e.user_id
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP)) AS DATE)
        |        = f.cohort_day + 7)
        |SELECT f.cohort_day, count(*) AS n_users,
        |  count(*) FILTER (WHERE r.user_id IS NOT NULL) AS n_retained,
        |  floor((count(*) FILTER (WHERE r.user_id IS NOT NULL) * 1.0 / count(*))
        |        * 10000.0 + 0.5) / 10000.0 AS retention7
        |FROM f LEFT JOIN r ON f.user_id = r.user_id
        |GROUP BY f.cohort_day
        |ORDER BY f.cohort_day""".stripMargin
    ) { (s, d) =>
      val f = events(s, d)
        .groupBy("user_id")
        .agg(min(to_date(date_trunc("day", col("ts")))).as("cohort_day"))
      val r = events(s, d)
        .select(col("user_id").as("r_uid"),
                to_date(date_trunc("day", col("ts"))).as("day"))
        .join(f, col("r_uid") === col("user_id"))
        .filter(col("day") === date_add(col("cohort_day"), 7))
        .select(col("r_uid")).distinct()
      f.join(r, col("user_id") === col("r_uid"), "left")
        .groupBy("cohort_day")
        .agg(count(lit(1)).as("n_users"),
             count(col("r_uid")).as("n_retained"),
             Det.r4(count(col("r_uid")) * lit(1.0) / count(lit(1)))
               .as("retention7"))
        .orderBy("cohort_day")
    },

    // equi-width histogram (manual buckets — portable, unlike width_bucket)
    OpDef(
      "q_agg_histogram",
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  min(o_totalprice) AS lo,
        |  max(o_totalprice) AS hi
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("o_totalprice")).as("lo"),
             max(col("o_totalprice")).as("hi"))
        .orderBy("bucket")
    },

    // deterministic mode: most frequent value, ties broken by min value
    // (engine-native mode() is tie-nondeterministic — two-level agg isn't)
    OpDef(
      "q_agg_mode",
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY cnt DESC, l_quantity ASC) AS rn
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt
        |FROM r WHERE rn = 1
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val c = lineitem(s, d)
        .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      c.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
        .orderBy("l_returnflag")
    },

    // calendar spine + gap fill: every day in the span gets a row even when
    // no events landed on it (the time-series completeness primitive)
    OpDef(
      "q_gen_datespine",
      """WITH spine AS (
        |  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
        |                                     INTERVAL 1 DAY)) AS DATE) AS day),
        |daily AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |         count(*) AS n,
        |         floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total
        |  FROM events GROUP BY 1)
        |SELECT spine.day, coalesce(daily.n, 0) AS n,
        |       coalesce(daily.total, 0.0) AS total
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin
    ) { (s, d) =>
      val spine = s.range(1)
        .select(explode(expr(
          "sequence(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)"))
          .as("day"))
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("n"), Det.r4(sum(col("value"))).as("total"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
                coalesce(col("total"), lit(0.0)).as("total"))
        .orderBy("day")
    },

    // keep-first dedup: earliest event per (user, type) with a total
    // tie-break — the deterministic form of dropDuplicates
    OpDef(
      "q_dedup_keep_first",
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, ts
        |FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin
    ) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    },

    // marketing attribution: each purchase credited to the user's FIRST
    // click ever (first-touch) and the latest click at-or-before the
    // purchase (last-touch) — one running-window pass over the event
    // stream per user, no self-join (the naive formulation joins
    // purchases to clicks and re-aggregates; the window form shuffles
    // the events table once)
    OpDef(
      "q_events_attribution",
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us,
        |  first_click_us, last_click_us
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'click'
        |             THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
        |      OVER (PARTITION BY user_id
        |            ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS first_click_us,
        |    max(CASE WHEN event_type = 'click'
        |             THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
        |      OVER (PARTITION BY user_id
        |            ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_click_us
        |  FROM events)
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val clickUs = when(col("event_type") === "click", unix_micros(col("ts")))
      events(s, d)
        .withColumn("first_click_us", min(clickUs).over(w))
        .withColumn("last_click_us", max(clickUs).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
                unix_micros(col("ts")).as("purchase_us"),
                col("first_click_us"), col("last_click_us"))
        .orderBy("event_id")
    },

    // approximate percentile sketch (no-oracle: engine-specific sketch;
    // OpsSpec asserts tolerance vs the exact percentile)
    OpDef.noOracle("q_agg_approx_pct") { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50_approx"))
        .orderBy("l_returnflag")
    },

    // gaps-and-islands: maximal runs of consecutive active days per user
    // (streak analytics). The classic trick — day_number − row_number is
    // constant within a run — turns run detection into two per-user
    // window passes + one groupBy: everything shuffles on user_id once,
    // no self-join, no sequence generation, so the plan is unchanged at
    // 1000× users.
    OpDef(
      "q_win_islands",
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    datediff('day', DATE '1970-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d)
        |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
        |       count(*) AS n_days
        |FROM r
        |GROUP BY user_id, grp
        |ORDER BY user_id, start_day""".stripMargin
    ) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      events(s, d)
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
        .distinct()
        .select(col("user_id"), col("day"),
                (datediff(col("day"), lit("1970-01-01"))
                   - row_number().over(w)).as("grp"))
        .groupBy("user_id", "grp")
        .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
             count(lit(1)).as("n_days"))
        .select("user_id", "start_day", "end_day", "n_days")
        .orderBy("user_id", "start_day")
    },

    // first-order Markov transition matrix over each user's event
    // sequence: P(next | current) — clickstream path analysis. One lead()
    // window per user (hash shuffle on user_id), then the probability
    // normalization runs over the |event_types|² ≤ 25-row count table —
    // the expensive pass is corpus-sized, the window over it is not.
    OpDef(
      "q_events_transitions",
      """WITH s AS (
        |  SELECT user_id, event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY CAST(ts AS TIMESTAMP) ASC,
        |                                    event_id ASC) AS nxt
        |  FROM events),
        |t AS (SELECT cur, nxt, count(*) AS n FROM s
        |      WHERE nxt IS NOT NULL GROUP BY cur, nxt)
        |SELECT cur, nxt, n,
        |  floor((n * 1.0 / sum(n) OVER (PARTITION BY cur)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS p
        |FROM t
        |ORDER BY cur, nxt""".stripMargin
    ) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("cur"))
      events(s, d)
        .select(col("user_id"), col("event_type").as("cur"),
                lead(col("event_type"), 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
        .select(col("cur"), col("nxt"), col("n"),
                Det.r6(col("n") * lit(1.0) / sum(col("n")).over(wc)).as("p"))
        .orderBy("cur", "nxt")
    },

    // Stationary distribution of the event-type Markov chain (the
    // long-run "where do users end up" companion to q_events_transitions):
    // 12 power-iteration steps v ← r6(vᵀP) from a uniform start, on the
    // SAME rounded transition matrix the transitions op emits. The matrix
    // is event-VOCABULARY-sized (k² ≤ a few thousand cells however big the
    // corpus), so it is cached and broadcast into every step; each step is
    // a k-row map + ≤k²-cell array fold — the only corpus-sized
    // pass is building the matrix. Per-step r6 rounding pins both engines
    // to identical intermediates (a 12-step unrounded float recurrence
    // would let last-ulp sum-order differences compound); the oracle
    // unrolls the same 12 steps as chained CTEs. States are those with
    // outgoing transitions (on this fixture: all of them).
    OpDef(
      "q_events_stationary", {
        val steps = (1 to 12).map { i =>
          s"""v$i AS (
             |  SELECT t.nxt AS st,
             |    floor((sum(v.v * t.p)) * 1000000.0 + 0.5) / 1000000.0 AS v
             |  FROM v${i - 1} v JOIN t ON v.st = t.cur
             |  GROUP BY t.nxt)""".stripMargin
        }.mkString(",\n")
        s"""WITH s AS (
           |  SELECT user_id, event_type AS cur,
           |    lead(event_type) OVER (PARTITION BY user_id
           |                           ORDER BY CAST(ts AS TIMESTAMP) ASC,
           |                                    event_id ASC) AS nxt
           |  FROM events),
           |c AS (SELECT cur, nxt, count(*) AS n FROM s
           |      WHERE nxt IS NOT NULL GROUP BY cur, nxt),
           |t AS (
           |  SELECT cur, nxt,
           |    floor((n * 1.0 / sum(n) OVER (PARTITION BY cur)) * 1000000.0 + 0.5)
           |      / 1000000.0 AS p
           |  FROM c),
           |states AS (SELECT DISTINCT cur AS st FROM t),
           |k AS (SELECT count(*) AS k FROM states),
           |v0 AS (
           |  SELECT st, floor((CAST(1.0 AS DOUBLE) / k.k) * 1000000.0 + 0.5)
           |               / 1000000.0 AS v
           |  FROM states, k),
           |$steps
           |SELECT st AS event_type, v AS pi FROM v12 ORDER BY st""".stripMargin
      }
    ) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("cur"))
      val t = events(s, d)
        .select(col("user_id"), col("event_type").as("cur"),
                lead(col("event_type"), 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
        .select(col("cur"), col("nxt"),
                Det.r6(col("n") * lit(1.0) / sum(col("n")).over(wc)).as("p"))
      // fold the vocabulary-bounded matrix into ONE row and run all 12
      // steps as array higher-order functions: the corpus-sized work ends
      // at the aggregation above; the iteration itself is 12 narrow
      // map-only projections over a k²-cell array — zero shuffles, zero
      // per-step broadcasts (a relational join-per-step formulation
      // measured 9.5 s at sf0.1 purely in tiny-stage scheduling overhead).
      // Holding k² cells in one row is exactly the vocabulary-bounded-
      // state assumption the op already makes.
      var m = t
        .agg(sort_array(collect_list(struct(col("cur"), col("nxt"), col("p"))))
               .as("es"))
        .select(col("es"),
                array_sort(array_distinct(transform(col("es"), e => e("cur"))))
                  .as("sts"))
        .withColumn("v", transform(col("sts"),
          _ => Det.r6(lit(1.0) / size(col("sts")))))
      for (_ <- 1 to 12) {
        m = m.withColumn("v", transform(col("sts"), y =>
          Det.r6(aggregate(
            filter(col("es"), e => e("nxt") === y),
            lit(0.0),
            (acc, e) => acc +
              element_at(col("v"),
                array_position(col("sts"), e("cur")).cast("int")) * e("p")))))
          // lineage barrier: without it CollapseProject fuses all 20 step
          // projections and the lambda-nested reference to the previous v
          // re-evaluates the ENTIRE prior step per (state, edge) element —
          // (k·|es|)^20 evaluations, unbounded runtime. A lazy per-step
          // localCheckpoint materializes each 1-row step exactly once.
          .localCheckpoint(false)
      }
      m.select(explode(arrays_zip(col("sts"), col("v"))).as("z"))
        .select(col("z.sts").as("event_type"), col("z.v").as("pi"))
        .orderBy("event_type")
    },

    // volume anomaly detection: days whose event count deviates ≥ 1σ from
    // the corpus mean (z-score) — the monitoring query every ingestion
    // pipeline runs. The daily-count aggregate is the only corpus-sized
    // pass; the 1-row stats table joins back via broadcast (a 2-column
    // scalar, bounded at any scale).
    OpDef(
      "q_events_anomaly",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1),
        |s AS (SELECT avg(n * 1.0) AS mu, stddev_pop(n * 1.0) AS sd FROM d)
        |SELECT day, n,
        |  floor(((n - mu) / sd) * 10000.0 + 0.5) / 10000.0 AS z
        |FROM d, s
        |WHERE sd > 0 AND abs((n - mu) / sd) >= 1.0
        |ORDER BY day""".stripMargin
    ) { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("n"))
      val stats = daily.agg(avg(col("n") * lit(1.0)).as("mu"),
                            stddev_pop(col("n") * lit(1.0)).as("sd"))
      val z = (col("n") - col("mu")) / col("sd")
      daily.crossJoin(broadcast(stats))
        // sd > 0 guard: a zero-variance corpus has no anomalies — and the
        // engines disagree on 0/0 (Spark Divide → NULL, IEEE DuckDB → NaN),
        // so the guard is also what keeps the oracle hash-stable
        .filter(col("sd") > 0 && abs(z) >= 1.0)
        .select(col("day"), col("n"), Det.r4(z).as("z"))
        .orderBy("day")
    },

    /** Time-series resample + gap-fill with linear interpolation: each
      * user's daily purchase total becomes a dense per-day series over
      * that user's own [first, last] purchase window, gaps filled by
      * interpolating between the bracketing observed days — the
      * regularization step before any sequence model sees the data.
      *
      * Scale shape: the spine explodes ≤ 30 rows per user (the fixture's
      * event window) from the per-user min/max aggregate — row growth is
      * bounded by users × span, never events × span; fills come from two
      * ignore-nulls windows per user (prev/next observation), each
      * partition bounded by one user's span. Determinism: daily totals
      * are r4-rounded BEFORE interpolation, so the interpolation
      * arithmetic (rounded endpoints, exact integer day offsets) is
      * identical IEEE doubles on both engines, then r4 again on output. */
    OpDef(
      "q_events_interp",
      """WITH du AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS v
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, 2),
        |span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM du GROUP BY user_id HAVING count(*) >= 2),
        |spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM span),
        |j AS (
        |  SELECT s.user_id, s.day, du.v FROM spine s
        |  LEFT JOIN du ON s.user_id = du.user_id AND s.day = du.day),
        |w AS (
        |  SELECT user_id, day, v,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY day
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT user_id, day,
        |  CAST((v IS NULL) AS BIGINT) AS filled,
        |  floor((CASE WHEN v IS NOT NULL THEN v
        |         ELSE pv + (nv - pv) * (day - pd) * 1.0 / (nd - pd) END)
        |        * 10000.0 + 0.5) / 10000.0 AS val
        |FROM w ORDER BY user_id, day""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val du = events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
                 to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(Det.r4(sum(col("value"))).as("v"))
      val span = du.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"),
             count(lit(1)).as("nd"))
        .filter(col("nd") >= 2)
      val spine = span.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"),
                         expr("INTERVAL 1 DAY"))).as("day"))
      val j = spine.join(du, Seq("user_id", "day"), "left")
      val wb = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val back = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsDay = when(col("v").isNotNull, col("day"))
      val w = j
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
        .withColumn("pd", last(obsDay, ignoreNulls = true).over(back))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
        .withColumn("nd", first(obsDay, ignoreNulls = true).over(fwd))
      w.select(col("user_id"), col("day"),
        col("v").isNull.cast("long").as("filled"),
        Det.r4(when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * datediff(col("day"), col("pd")) * lit(1.0)
            / datediff(col("nd"), col("pd")))).as("val"))
        .orderBy("user_id", "day")
    },

    /** 7-tap exponentially-weighted moving average over the daily volume
      * series — the time-series smoother, spelled as a FIXED-DEPTH lag
      * kernel (Σ 0.5^k·lag(v,k) / Σ available weights) rather than the
      * textbook recurrence: a recurrence is inherently sequential, while
      * the kernel form is one window pass with 7 lags, identical algebra
      * on both engines (weights are exact powers of two; daily totals are
      * r4-rounded before the kernel so both engines convolve the same
      * doubles). The window input is the bounded DAILY table — the
      * corpus-sized stream is reduced by groupBy first, so the
      * unpartitioned window never sees raw events. */
    OpDef(
      "q_win_ewma",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS v
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT day, v,
        |    lag(v, 1) OVER (ORDER BY day) AS v1,
        |    lag(v, 2) OVER (ORDER BY day) AS v2,
        |    lag(v, 3) OVER (ORDER BY day) AS v3,
        |    lag(v, 4) OVER (ORDER BY day) AS v4,
        |    lag(v, 5) OVER (ORDER BY day) AS v5,
        |    lag(v, 6) OVER (ORDER BY day) AS v6
        |  FROM d)
        |SELECT day, v,
        |  floor(((v
        |    + CASE WHEN v1 IS NULL THEN 0.0 ELSE 0.5 * v1 END
        |    + CASE WHEN v2 IS NULL THEN 0.0 ELSE 0.25 * v2 END
        |    + CASE WHEN v3 IS NULL THEN 0.0 ELSE 0.125 * v3 END
        |    + CASE WHEN v4 IS NULL THEN 0.0 ELSE 0.0625 * v4 END
        |    + CASE WHEN v5 IS NULL THEN 0.0 ELSE 0.03125 * v5 END
        |    + CASE WHEN v6 IS NULL THEN 0.0 ELSE 0.015625 * v6 END)
        |   / (1.0
        |    + CASE WHEN v1 IS NULL THEN 0.0 ELSE 0.5 END
        |    + CASE WHEN v2 IS NULL THEN 0.0 ELSE 0.25 END
        |    + CASE WHEN v3 IS NULL THEN 0.0 ELSE 0.125 END
        |    + CASE WHEN v4 IS NULL THEN 0.0 ELSE 0.0625 END
        |    + CASE WHEN v5 IS NULL THEN 0.0 ELSE 0.03125 END
        |    + CASE WHEN v6 IS NULL THEN 0.0 ELSE 0.015625 END))
        |   * 10000.0 + 0.5) / 10000.0 AS ewma
        |FROM w ORDER BY day""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(Det.r4(sum(col("value"))).as("v"))
      val w = Window.orderBy(col("day"))
      val lags = (1 to 6).map(k => lag(col("v"), k).over(w).as(s"v$k"))
      val d2 = daily.select(col("day") +: col("v") +: lags: _*)
      val ws = Seq(0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625)
      val num = (1 to 6).foldLeft(col("v")) { (acc, k) =>
        acc + when(col(s"v$k").isNull, lit(0.0))
                .otherwise(lit(ws(k - 1)) * col(s"v$k"))
      }
      val den = (1 to 6).foldLeft(lit(1.0)) { (acc, k) =>
        acc + when(col(s"v$k").isNull, lit(0.0)).otherwise(lit(ws(k - 1)))
      }
      d2.select(col("day"), col("v"), Det.r4(num / den).as("ewma"))
        .orderBy("day")
    },

    /** Holt double-exponential (level + linear trend) smoothing of the
      * daily value series — the forecasting upgrade of q_win_ewma: EWMA
      * tracks a level only and lags any trending series; Holt carries an
      * explicit trend state (α=0.5 level blend, β=0.3 trend blend,
      * l₁ = x₁, b₁ = 0).
      *
      * The recurrence has no window-function closed form (unlike
      * q_win_cusum's running-min trick), so it folds. Scale shape: the
      * series is CALENDAR-bounded (one row per day — 30 at any corpus
      * size), so the entire fold runs inside one collected array row;
      * per-day prefixes are re-folded (O(days²) ≈ 900 steps, still
      * calendar-bounded) to emit every intermediate state without a
      * driver loop. Cross-engine exactness: daily inputs are r4-quantized
      * BEFORE the fold, and the Spark lambda spells the blend arithmetic
      * character-for-character as the DuckDB recursive CTE
      * (0.5·x + 0.5·(l+b); 0.3·(l′−l) + 0.7·b, l′ re-spelled inline), so
      * both engines run the identical IEEE op sequence. */
    OpDef(
      "q_win_holt",
      """WITH RECURSIVE d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS v
        |  FROM events GROUP BY 1),
        |i AS (SELECT day, v, row_number() OVER (ORDER BY day) AS rn FROM d),
        |h(rn, day, v, l, b) AS (
        |  SELECT rn, day, v, v, CAST(0.0 AS DOUBLE) FROM i WHERE rn = 1
        |  UNION ALL
        |  SELECT i.rn, i.day, i.v,
        |    0.5 * i.v + 0.5 * (h.l + h.b),
        |    0.3 * ((0.5 * i.v + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b
        |  FROM h JOIN i ON i.rn = h.rn + 1)
        |SELECT day, v,
        |  floor(l * 10000.0 + 0.5) / 10000.0 AS level,
        |  floor(b * 10000.0 + 0.5) / 10000.0 AS trend
        |FROM h ORDER BY day""".stripMargin
    ) { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(Det.r4(sum(col("value"))).as("v"))
      daily
        .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("xs"))
        // the size guard is load-bearing on an EMPTY series: Spark's
        // sequence(1, 0) counts DOWN to [1, 0] and would emit two
        // null-day rows where the recursive oracle returns zero (the
        // q_win_holtwinters guard, applied at threshold 1)
        .select(explode(expr(
          """CASE WHEN size(xs) >= 1 THEN
            |transform(sequence(1, size(xs)), i -> named_struct(
            |  'day', element_at(xs, i).day,
            |  'v', element_at(xs, i).v,
            |  'st', aggregate(slice(xs, 2, i - 1),
            |    named_struct('l', element_at(xs, 1).v,
            |                 'b', CAST(0.0 AS DOUBLE)),
            |    (acc, x) -> named_struct(
            |      'l', 0.5 * x.v + 0.5 * (acc.l + acc.b),
            |      'b', 0.3 * ((0.5 * x.v + 0.5 * (acc.l + acc.b)) - acc.l)
            |           + 0.7 * acc.b))))
            |ELSE array() END""".stripMargin)).as("r"))
        .select(col("r.day").as("day"), col("r.v").as("v"),
                Det.r4(col("r.st.l")).as("level"),
                Det.r4(col("r.st.b")).as("trend"))
        .orderBy("day")
    },

    /** Lag-1..7 autocorrelation of the daily value series — the
      * seasonality/persistence diagnostic read before fitting any
      * forecaster (a weekly cycle shows as a lag-7 peak). Each lag pairs
      * the CALENDAR-bounded daily series with its k-shifted self via one
      * ordered window (30 rows — never corpus-sized), then one Pearson
      * aggregate per lag; 7 branches union to a 7-row output. Pearson is
      * spelled covar_pop/nullif(σ·σ, 0) — NOT Spark's corr() — both for
      * the DuckDB-identical NULL on constant series and because ANSI
      * corr throws on zero variance while emitting the row (the
      * q_text_zipf lesson). Inputs are r4-quantized daily sums, and both
      * engines fold the same day-ordered single partition, so the
      * moment sums agree. */
    OpDef(
      "q_events_autocorr", {
        val branches = (1 to 7).map { k =>
          s"""  SELECT $k AS lag_k, count(*) AS n_pairs,
             |    covar_pop(v, vk) / nullif(stddev_pop(v) * stddev_pop(vk), 0)
             |      AS r
             |  FROM (SELECT v, lag(v, $k) OVER (ORDER BY day) AS vk FROM d)
             |  WHERE vk IS NOT NULL HAVING count(*) > 0""".stripMargin
        }.mkString("\n  UNION ALL\n")
        s"""WITH d AS (
           |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
           |           AS day,
           |    floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS v
           |  FROM events GROUP BY 1),
           |u AS (
           |$branches)
           |SELECT CAST(lag_k AS BIGINT) AS lag_k,
           |  CAST(n_pairs AS BIGINT) AS n_pairs,
           |  floor(r * 10000.0 + 0.5) / 10000.0 AS autocorr
           |FROM u ORDER BY lag_k""".stripMargin
      }
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(Det.r4(sum(col("value"))).as("v"))
      val w = Window.orderBy(col("day"))
      (1 to 7).map { k =>
        daily.select(col("v"), lag(col("v"), k).over(w).as("vk"))
          .filter(col("vk").isNotNull)
          .groupBy(lit(k.toLong).as("lag_k"))
          .agg(count(lit(1)).as("n_pairs"),
               Det.r4(covar_pop(col("v"), col("vk"))
                      / nullif(stddev_pop(col("v")) * stddev_pop(col("vk")),
                               lit(0.0))).as("autocorr"))
      }.reduce(_ unionAll _)
        .select(col("lag_k"), col("n_pairs").cast("long").as("n_pairs"),
                col("autocorr"))
        .orderBy("lag_k")
    },

    /** RFM segmentation: recency / frequency / monetary scores per user
      * (fixed calibrated thresholds — NOT quintile windows, so scoring is
      * a map-only projection after one bounded per-user aggregate; see
      * q_agg_eqdepth for the boundary-broadcast way to derive data-driven
      * cuts at scale). Monetary totals are r4-rounded BEFORE the
      * threshold compare so a float-sum ordering difference can never
      * flip a segment between engines. Output is one row per RFM segment
      * — bounded by 27 — with its population and the average raw
      * signals. */
    OpDef(
      "q_events_rfm",
      """WITH p AS (
        |  SELECT user_id,
        |    DATE '2024-01-31'
        |      - CAST(date_trunc('day', max(CAST(ts AS TIMESTAMP))) AS DATE)
        |      AS rec,
        |    count(*) AS freq,
        |    floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS mon
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id),
        |s AS (
        |  SELECT user_id, rec, freq, mon,
        |    (CASE WHEN rec <= 2 THEN 3 WHEN rec <= 5 THEN 2 ELSE 1 END)
        |      * 100
        |    + (CASE WHEN freq >= 16 THEN 3 WHEN freq >= 10 THEN 2 ELSE 1
        |       END) * 10
        |    + (CASE WHEN mon >= 750.0 THEN 3 WHEN mon >= 400.0 THEN 2
        |       ELSE 1 END) AS segment
        |  FROM p)
        |SELECT CAST(segment AS BIGINT) AS segment, count(*) AS n_users,
        |  floor((avg(rec * 1.0)) * 10000.0 + 0.5) / 10000.0 AS avg_rec,
        |  floor((avg(freq * 1.0)) * 10000.0 + 0.5) / 10000.0 AS avg_freq,
        |  floor((avg(mon)) * 10000.0 + 0.5) / 10000.0 AS avg_mon
        |FROM s GROUP BY segment ORDER BY segment""".stripMargin
    ) { (s, d) =>
      val p = events(s, d).filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(datediff(lit("2024-01-31").cast("date"),
                      to_date(date_trunc("day", max(col("ts"))))).as("rec"),
             count(lit(1)).as("freq"), Det.r4(sum(col("value"))).as("mon"))
      val seg =
        (when(col("rec") <= 2, 3).when(col("rec") <= 5, 2).otherwise(1)
           * 100
         + when(col("freq") >= 16, 3).when(col("freq") >= 10, 2).otherwise(1)
           * 10
         + when(col("mon") >= 750.0, 3).when(col("mon") >= 400.0, 2)
             .otherwise(1)).cast("long")
      p.select(seg.as("segment"), col("rec"), col("freq"), col("mon"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_users"),
             Det.r4(avg(col("rec") * lit(1.0))).as("avg_rec"),
             Det.r4(avg(col("freq") * lit(1.0))).as("avg_freq"),
             Det.r4(avg(col("mon"))).as("avg_mon"))
        .orderBy("segment")
    },

    /** Daily-volume trend + 3-day forecast by ordinary least squares —
      * the capacity-planning regression every ingestion dashboard runs.
      * The corpus-sized work is ONE daily-count aggregate (map-side
      * combine); the OLS moments (n, Σx, Σy, Σxy, Σx²) reduce the
      * day-table to a 1-row broadcast frame, fitted values are map-only,
      * and the 3 forecast rows explode from the same stats row. Days are
      * indexed from the observed min date so x stays small.
      *
      * Determinism: x and y are integers, so every OLS moment is an
      * EXACT BIGINT sum; slope/intercept are one-shot double expressions
      * on identical integer inputs, r6-rounded, and fitted values use the
      * ROUNDED coefficients (round-before-dependent-arithmetic). */
    OpDef(
      "q_events_trend",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day, count(*) AS y
        |  FROM events GROUP BY 1),
        |dm AS (SELECT min(day) AS d0 FROM d),
        |dx AS (SELECT day, CAST(day - dm.d0 AS BIGINT) AS x, y FROM d, dm),
        |st AS (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(max(x) AS BIGINT) AS xmax
        |  FROM dx),
        |co AS (
        |  SELECT n, sx, sy, xmax,
        |    floor(((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
        |          * 1000000.0 + 0.5) / 1000000.0 AS slope
        |  FROM st),
        |co2 AS (
        |  SELECT xmax, slope,
        |    floor((sy * 1.0 / n - slope * (sx * 1.0 / n))
        |          * 1000000.0 + 0.5) / 1000000.0 AS icept
        |  FROM co),
        |fit AS (
        |  SELECT dx.day, dx.x, CAST(dx.y AS BIGINT) AS y,
        |    floor((c.icept + c.slope * dx.x) * 1000000.0 + 0.5) / 1000000.0
        |      AS yhat,
        |    CAST(0 AS BIGINT) AS is_fc
        |  FROM dx, co2 c),
        |fc AS (
        |  SELECT dm.d0 + CAST(c.xmax + k.k AS INTEGER) AS day,
        |    c.xmax + k.k AS x, CAST(NULL AS BIGINT) AS y,
        |    floor((c.icept + c.slope * (c.xmax + k.k)) * 1000000.0 + 0.5)
        |      / 1000000.0 AS yhat,
        |    CAST(1 AS BIGINT) AS is_fc
        |  FROM co2 c, dm, (SELECT unnest(range(1, 4)) AS k) k)
        |SELECT day, x, y, yhat, is_fc FROM fit
        |UNION ALL
        |SELECT day, x, y, yhat, is_fc FROM fc
        |ORDER BY x""".stripMargin
    ) { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("y"))
      val dm = daily.agg(min(col("day")).as("d0"))
      val dx = daily.crossJoin(broadcast(dm))
        .select(col("day"), datediff(col("day"), col("d0")).cast("long").as("x"),
                col("y"))
      val st = dx.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
                      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
                      sum(col("x") * col("x")).as("sxx"), max(col("x")).as("xmax"))
      val co = st.select(col("n"), col("sx"), col("sy"), col("xmax"),
        Det.r6((col("n") * col("sxy") - col("sx") * col("sy")) * lit(1.0)
               / (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"))
      val co2 = co.select(col("xmax"), col("slope"),
        Det.r6(col("sy") * lit(1.0) / col("n")
               - col("slope") * (col("sx") * lit(1.0) / col("n"))).as("icept"))
        .crossJoin(broadcast(dm))
      val fit = dx.crossJoin(broadcast(co2.select("slope", "icept")))
        .select(col("day"), col("x"), col("y").cast("long").as("y"),
                Det.r6(col("icept") + col("slope") * col("x")).as("yhat"),
                lit(0L).as("is_fc"))
      val fc = co2
        .select(col("d0"), col("xmax"), col("slope"), col("icept"),
                explode(sequence(lit(1L), lit(3L))).as("k"))
        .select(date_add(col("d0"), (col("xmax") + col("k")).cast("int")).as("day"),
                (col("xmax") + col("k")).as("x"),
                lit(null).cast("long").as("y"),
                Det.r6(col("icept") + col("slope") * (col("xmax") + col("k")))
                  .as("yhat"),
                lit(1L).as("is_fc"))
      fit.unionByName(fc).orderBy("x")
    },

    /** 7-day rolling correlation between the purchase and error daily
      * series — the "do failures track load?" ops metric. NOT the
      * engine-native corr-over-window (whose internal accumulation order
      * differs between engines): the five moment sums are window sums of
      * INTEGERS (exact at any order), and the correlation formula runs
      * once per row on identical inputs, NULL-guarded for zero-variance
      * windows (the q_agg_moments discipline). The window is over the
      * bounded daily table, never raw events. */
    OpDef(
      "q_win_rolling_corr",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS x,
        |    count(*) FILTER (WHERE event_type = 'error') AS y
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT day, x, y,
        |    count(*) OVER w AS n,
        |    CAST(sum(x) OVER w AS BIGINT) AS sx,
        |    CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(y * y) OVER w AS BIGINT) AS syy
        |  FROM d
        |  WINDOW w AS (ORDER BY day ASC
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    floor(((n * sxy - sx * sy) * 1.0
        |           / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)))
        |          * 10000.0 + 0.5) / 10000.0 END AS corr7
        |FROM m ORDER BY day""".stripMargin
    ) { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(when(col("event_type") === "purchase", 1)).as("x"),
             count(when(col("event_type") === "error", 1)).as("y"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day").asc).rowsBetween(-6, 0)
      val m = daily.select(col("day"), col("x"), col("y"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("y")).over(w).as("sxy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      m.select(col("day"), col("x").cast("long").as("x"),
        col("y").cast("long").as("y"),
        when(vx > 0 && vy > 0,
          Det.r4((col("n") * col("sxy") - col("sx") * col("sy")) * lit(1.0)
                 / sqrt(vx * lit(1.0) * vy))).as("corr7"))
        .orderBy("day")
    },

    /** Maximum-drawdown profile of daily event volume — the
      * peak-to-trough resilience metric (how far below its historical
      * peak is today's traffic?): running cummax over the bounded daily
      * series, per-day drawdown fraction. Integer peak/value ⇒ the only
      * float op is one rounded division per row. */
    OpDef(
      "q_win_drawdown",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day, count(*) AS v
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT day, v,
        |    CAST(max(v) OVER (ORDER BY day ASC
        |                      ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND CURRENT ROW) AS BIGINT) AS peak
        |  FROM d)
        |SELECT day, CAST(v AS BIGINT) AS v, peak,
        |  floor(((peak - v) * 1.0 / peak) * 1000000.0 + 0.5) / 1000000.0
        |    AS drawdown
        |FROM p ORDER BY day""".stripMargin
    ) { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      daily.select(col("day"), col("v"),
                   max(col("v")).over(w).cast("long").as("peak"))
        .select(col("day"), col("v").cast("long").as("v"), col("peak"),
          Det.r6((col("peak") - col("v")) * lit(1.0) / col("peak"))
            .as("drawdown"))
        .orderBy("day")
    },

    /** Full cohort retention matrix — q_events_retention generalized from
      * the single day-7 column to the standard triangle artifact: for
      * each first-seen cohort, the distinct users active at every offset
      * 0..7 days, with rates against the cohort's own day-0 size. One
      * distinct-(user, day) pass; the per-cohort size table is bounded by
      * the number of cohorts → broadcast join for the rate column. */
    OpDef(
      "q_events_cohort_matrix",
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1),
        |m AS (
        |  SELECT f.cohort_day, act.day - f.cohort_day AS off,
        |         count(*) AS n_users
        |  FROM act JOIN f ON act.user_id = f.user_id
        |  WHERE act.day - f.cohort_day BETWEEN 0 AND 7
        |  GROUP BY 1, 2),
        |sz AS (SELECT cohort_day, n_users AS base FROM m WHERE off = 0)
        |SELECT m.cohort_day, CAST(m.off AS BIGINT) AS off,
        |  CAST(m.n_users AS BIGINT) AS n_users,
        |  floor((m.n_users * 1.0 / sz.base) * 10000.0 + 0.5) / 10000.0
        |    AS retention
        |FROM m JOIN sz ON m.cohort_day = sz.cohort_day
        |ORDER BY m.cohort_day, off""".stripMargin
    ) { (s, d) =>
      val act = events(s, d)
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
        .distinct()
      val f = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      val m = act.join(f, Seq("user_id"))
        .select(col("cohort_day"),
                datediff(col("day"), col("cohort_day")).cast("long").as("off"))
        .filter(col("off").between(0, 7))
        .groupBy("cohort_day", "off").agg(count(lit(1)).as("n_users"))
      val sz = m.filter(col("off") === 0)
        .select(col("cohort_day"), col("n_users").as("base"))
      m.join(broadcast(sz), Seq("cohort_day"))
        .select(col("cohort_day"), col("off"),
                col("n_users").cast("long").as("n_users"),
                Det.r4(col("n_users") * lit(1.0) / col("base")).as("retention"))
        .orderBy("cohort_day", "off")
    },

    /** Top common 3-step event paths — the sequence-mining primitive
      * behind "how do users actually reach checkout?": consecutive
      * event-type triples per user (two leads over one per-user window),
      * counted and top-10'd. The window is bounded by per-user history;
      * the path table is bounded by |event types|³; the top-10 is
      * TakeOrderedAndProject, never a global sort. */
    OpDef(
      "q_events_paths",
      """WITH s AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)),
        |p AS (
        |  SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |  FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1)
        |SELECT path, n FROM p ORDER BY n DESC, path ASC LIMIT 10""".stripMargin
    ) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .select(col("user_id"), col("event_type").as("e1"),
                lead(col("event_type"), 1).over(w).as("e2"),
                lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc)
        .limit(10)
    },

    /** Time-constrained conversion funnel — q_events_funnel counts users
      * who EVER advanced; real funnel analysis bounds each step by a
      * window (here: first purchase within 24 HOURS of the user's first
      * click), which is what separates attribution from coincidence. Two
      * per-user aggregates joined on user_id, then two 1-row frames cross
      * joined — everything after the scans is user-bounded.
      *
      * Determinism: timestamps are µs-exact on both engines (the Tables
      * loader contract), so delays are exact BIGINT µs and their sums
      * are associative; rates and mean delay round once at the end. */
    OpDef(
      "q_events_window_funnel",
      """WITH c AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS ct
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |p0 AS (
        |  SELECT e.user_id,
        |    epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(c.ct) AS delay_us
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND CAST(e.ts AS TIMESTAMP) > c.ct
        |    AND CAST(e.ts AS TIMESTAMP) <= c.ct + INTERVAL 24 HOUR),
        |p AS (SELECT user_id, min(delay_us) AS delay_us FROM p0 GROUP BY 1),
        |s1 AS (SELECT count(*) AS n_click FROM c),
        |s2 AS (SELECT count(*) AS n_conv,
        |              CAST(sum(delay_us) AS BIGINT) AS sdelay FROM p)
        |SELECT n_click, n_conv,
        |  floor((n_conv * 1.0 / n_click) * 1000000.0 + 0.5) / 1000000.0
        |    AS conv_rate,
        |  floor((sdelay * 1.0 / n_conv / 1000000.0) * 10000.0 + 0.5) / 10000.0
        |    AS avg_delay_s
        |FROM s1, s2""".stripMargin
    ) { (s, d) =>
      val ev = events(s, d)
      val c = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("ct"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pt"))
        .join(c, Seq("user_id"))
        .filter(col("pt") > col("ct") &&
                col("pt") <= col("ct") + expr("INTERVAL 24 HOUR"))
        .select(col("user_id"),
                (unix_micros(col("pt")) - unix_micros(col("ct"))).as("delay_us"))
        .groupBy("user_id").agg(min(col("delay_us")).as("delay_us"))
      c.agg(count(lit(1)).as("n_click"))
        .crossJoin(p.agg(count(lit(1)).as("n_conv"),
                         sum(col("delay_us")).as("sdelay")))
        .select(col("n_click"), col("n_conv"),
          Det.r6(col("n_conv") * lit(1.0) / col("n_click")).as("conv_rate"),
          Det.r4(col("sdelay") * lit(1.0) / col("n_conv") / lit(1000000.0))
            .as("avg_delay_s"))
    },

    /** Day-of-week seasonal decomposition of daily event volume — the
      * classical-decomposition companion to q_events_trend (trend) and
      * q_win_ewma (smoothing): seasonal component = that weekday's mean
      * minus the overall mean, deseasonalized series = observed minus
      * seasonal. One daily aggregate; the overall mean is a 1-row
      * broadcast, the weekday means a ≤7-row broadcast — nothing
      * downstream of the first aggregate scales with the corpus.
      *
      * Determinism: daily counts are integers, so the mean's internal
      * double sums are integer-valued — exact at any accumulation order
      * (the q_events_anomaly argument); means are r4-rounded before the
      * subtraction chain. DuckDB's Sunday=0 `dayofweek` is shifted +1 to
      * Spark's Sunday=1 convention in the oracle. */
    OpDef(
      "q_win_seasonal",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day, count(*) AS y
        |  FROM events GROUP BY 1),
        |mu AS (
        |  SELECT floor((sum(y * 1.0) / count(*)) * 10000.0 + 0.5) / 10000.0
        |           AS mu
        |  FROM d),
        |dw AS (
        |  SELECT dayofweek(day) + 1 AS dow,
        |    floor((sum(y * 1.0) / count(*)) * 10000.0 + 0.5) / 10000.0
        |      AS dow_avg
        |  FROM d GROUP BY 1)
        |SELECT d.day, CAST(dw.dow AS BIGINT) AS dow, CAST(d.y AS BIGINT) AS y,
        |  dw.dow_avg,
        |  dw.dow_avg - mu.mu AS seasonal,
        |  d.y - (dw.dow_avg - mu.mu) AS deseason
        |FROM d JOIN dw ON dayofweek(d.day) + 1 = dw.dow CROSS JOIN mu
        |ORDER BY d.day""".stripMargin
    ) { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("y"))
      val mu = daily.agg(
        Det.r4(sum(col("y") * lit(1.0)) / count(lit(1))).as("mu"))
      val dw = daily.groupBy(dayofweek(col("day")).as("dow"))
        .agg(Det.r4(sum(col("y") * lit(1.0)) / count(lit(1))).as("dow_avg"))
      daily.select(col("day"), dayofweek(col("day")).as("dow"), col("y"))
        .join(broadcast(dw), Seq("dow"))
        .crossJoin(broadcast(mu))
        .select(col("day"), col("dow").cast("long").as("dow"),
                col("y").cast("long").as("y"), col("dow_avg"),
                (col("dow_avg") - col("mu")).as("seasonal"),
                (col("y") - (col("dow_avg") - col("mu"))).as("deseason"))
        .orderBy("day")
    },

    /** Welch's two-sample t-test between experiment cohorts (user_id
      * parity over purchase values) — the A/B significance primitive.
      * One corpus pass reduces each cohort to (n, Σv, Σv²) with values
      * pre-quantized to BIGINT centi-units, so the moments are EXACT
      * integer sums (the double formulation would hash-diverge on
      * partial-agg order; Σv² stays exact to ~4·10⁹ rows at this value
      * range). Means/variances are one-shot double expressions on the
      * integer moments, r4-rounded BEFORE the t/df arithmetic. Output is
      * one bounded row — the shape a 100 TB A/B readout must have. */
    OpDef(
      "q_agg_ttest",
      """WITH p AS (
        |  SELECT user_id % 2 AS variant,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vi
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT variant, count(*) AS n, CAST(sum(vi) AS BIGINT) AS sv,
        |         CAST(sum(vi * vi) AS BIGINT) AS sq
        |  FROM p GROUP BY variant),
        |m AS (
        |  SELECT variant, n,
        |    floor((sv * 1.0 / n / 100.0) * 10000.0 + 0.5) / 10000.0 AS mean,
        |    floor(((sq - sv * 1.0 * sv / n) / (n - 1) / 10000.0)
        |          * 10000.0 + 0.5) / 10000.0 AS var
        |  FROM g),
        |w AS (
        |  SELECT
        |    max(CASE WHEN variant = 0 THEN n END) AS n0,
        |    max(CASE WHEN variant = 1 THEN n END) AS n1,
        |    max(CASE WHEN variant = 0 THEN mean END) AS mean0,
        |    max(CASE WHEN variant = 1 THEN mean END) AS mean1,
        |    max(CASE WHEN variant = 0 THEN var END) AS var0,
        |    max(CASE WHEN variant = 1 THEN var END) AS var1
        |  FROM m)
        |SELECT n0, n1, mean0, mean1, var0, var1,
        |  floor(((mean0 - mean1) / sqrt(var0 / n0 + var1 / n1))
        |        * 10000.0 + 0.5) / 10000.0 AS t_stat,
        |  floor(((var0 / n0 + var1 / n1) * (var0 / n0 + var1 / n1)
        |         / ((var0 / n0) * (var0 / n0) / (n0 - 1)
        |            + (var1 / n1) * (var1 / n1) / (n1 - 1)))
        |        * 100.0 + 0.5) / 100.0 AS df
        |FROM w""".stripMargin
    ) { (s, d) =>
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("vi"))
      val g = p.groupBy("variant")
        .agg(count(lit(1)).as("n"), sum(col("vi")).as("sv"),
             sum(col("vi") * col("vi")).as("sq"))
      val m = g.select(col("variant"), col("n"),
        Det.r4(col("sv") * lit(1.0) / col("n") / lit(100.0)).as("mean"),
        Det.r4((col("sq") - col("sv") * lit(1.0) * col("sv") / col("n"))
               / (col("n") - 1) / lit(10000.0)).as("var"))
      val w = m.agg(
        max(when(col("variant") === 0, col("n"))).as("n0"),
        max(when(col("variant") === 1, col("n"))).as("n1"),
        max(when(col("variant") === 0, col("mean"))).as("mean0"),
        max(when(col("variant") === 1, col("mean"))).as("mean1"),
        max(when(col("variant") === 0, col("var"))).as("var0"),
        max(when(col("variant") === 1, col("var"))).as("var1"))
      val se0 = col("var0") / col("n0")
      val se1 = col("var1") / col("n1")
      w.select(col("n0"), col("n1"), col("mean0"), col("mean1"),
        col("var0"), col("var1"),
        Det.r4((col("mean0") - col("mean1")) / sqrt(se0 + se1)).as("t_stat"),
        Det.r((se0 + se1) * (se0 + se1)
              / (se0 * se0 / (col("n0") - 1) + se1 * se1 / (col("n1") - 1)), 2)
          .as("df"))
    },

    /** CUSUM change-point detection over daily event volume — the
      * sequential monitoring twin to q_events_anomaly's pointwise z-score:
      * a z-score misses a sustained small shift, CUSUM accumulates it.
      * The recurrence S_t = max(0, S_{t-1} + (v_t − target)) has the
      * closed form S_t = R_t − min(0, min_{j≤t} R_j) over the running
      * residual sum R, so it runs as two stacked windows instead of a
      * sequential loop. The residuals are exact BIGINT micro-units
      * (target = mean daily volume, floor-quantized once), so every
      * window sum is order-exact and the only float op is the final
      * rounded division. Both windows are over the bounded DAILY table
      * (≤ days-of-history rows), never raw events — the unpartitioned
      * window is safe at any corpus size. */
    OpDef(
      "q_win_cusum",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day, count(*) AS v
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(floor(avg(v) * 1000000.0 + 0.5) AS BIGINT) AS tgt
        |      FROM d),
        |r AS (
        |  SELECT day, v, tgt, CAST(v AS BIGINT) * 1000000 - tgt AS resid
        |  FROM d, t),
        |c AS (
        |  SELECT day, v, tgt,
        |    CAST(sum(resid) OVER (ORDER BY day ASC ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS run
        |  FROM r),
        |s AS (
        |  SELECT day, v, tgt, run,
        |    least(CAST(0 AS BIGINT),
        |          CAST(min(run) OVER (ORDER BY day ASC
        |                              ROWS UNBOUNDED PRECEDING) AS BIGINT))
        |      AS lo
        |  FROM c)
        |SELECT day, CAST(v AS BIGINT) AS v,
        |  floor(((run - lo) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0
        |    AS cusum,
        |  CAST(CASE WHEN run - lo > 2 * tgt THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_change
        |FROM s ORDER BY day""".stripMargin
    ) { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("v"))
      val tgt = daily.agg(
        floor(avg(col("v")) * lit(1000000.0) + lit(0.5)).cast("long").as("tgt"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      daily.crossJoin(broadcast(tgt))
        .select(col("day"), col("v"), col("tgt"),
                (col("v").cast("long") * lit(1000000L) - col("tgt")).as("resid"))
        .withColumn("run", sum(col("resid")).over(w).cast("long"))
        .withColumn("lo", least(lit(0L), min(col("run")).over(w).cast("long")))
        .select(col("day"), col("v").cast("long").as("v"),
          Det.r6((col("run") - col("lo")) / lit(1000000.0)).as("cusum"),
          when(col("run") - col("lo") > lit(2) * col("tgt"), 1L).otherwise(0L)
            .as("is_change"))
        .orderBy("day")
    },

    /** CUPED variance-reduced A/B readout (Deng et al. 2013, WSDM) — the
      * experimentation-platform standard: adjust each user's in-experiment
      * metric by their PRE-period covariate (y′ = y − θ(x − x̄)), which
      * removes the between-user variance the pre-period explains without
      * biasing the treatment contrast. Pre/post split at the corpus
      * time-range midpoint (1-row broadcast); x = pre-period activity
      * count, y = post-period purchase count — both exact integers, so
      * every moment sum (n, Σx, Σy, Σxy, Σx², Σy²) is order-exact BIGINT.
      * θ = cov(x,y)/var(x) and x̄ round once BEFORE the per-cohort
      * formulas (the q_agg_moments discipline), then raw/adjusted means
      * and variances derive from cohort-level integer sums only. Output
      * is 2 rows; everything after the per-user aggregate is
      * cohort-bounded. */
    OpDef(
      "q_agg_cuped",
      """WITH b AS (
        |  SELECT (min(epoch_us(CAST(ts AS TIMESTAMP)))
        |          + max(epoch_us(CAST(ts AS TIMESTAMP)))) // 2 AS mid
        |  FROM events),
        |u AS (
        |  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
        |    CAST(count(*) FILTER (WHERE epoch_us(CAST(ts AS TIMESTAMP)) < mid)
        |         AS BIGINT) AS x,
        |    CAST(count(*) FILTER (WHERE event_type = 'purchase'
        |                          AND epoch_us(CAST(ts AS TIMESTAMP)) >= mid)
        |         AS BIGINT) AS y
        |  FROM events, b GROUP BY user_id, mid),
        |g AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |         sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM u),
        |th AS (
        |  SELECT
        |    CASE WHEN n * sxx - sx * sx > 0 THEN
        |      floor(((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
        |            * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END AS theta,
        |    floor((sx * 1.0 / n) * 1000000.0 + 0.5) / 1000000.0 AS mx
        |  FROM g),
        |c AS (
        |  SELECT variant, count(*) AS nc, sum(x) AS sxc, sum(y) AS syc,
        |         sum(y * y) AS syyc, sum(x * y) AS sxyc, sum(x * x) AS sxxc
        |  FROM u GROUP BY variant)
        |SELECT variant, CAST(nc AS BIGINT) AS n_users,
        |  floor((syc * 1.0 / nc) * 10000.0 + 0.5) / 10000.0 AS mean_raw,
        |  floor(((syc * 1.0 - theta * (sxc - nc * mx)) / nc) * 10000.0 + 0.5)
        |    / 10000.0 AS mean_adj,
        |  floor(((syyc - syc * 1.0 * syc / nc) / (nc - 1)) * 10000.0 + 0.5)
        |    / 10000.0 AS var_raw,
        |  floor(((syyc - 2.0 * theta * sxyc + theta * theta * sxxc
        |          - (syc - theta * sxc) * (syc - theta * sxc) / nc) / (nc - 1))
        |        * 10000.0 + 0.5) / 10000.0 AS var_adj
        |FROM c, th ORDER BY variant""".stripMargin
    ) { (s, d) =>
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      // integer `div`, not `/`: epoch-µs sums (~3.5e18) exceed double's
      // 2^53 exact range, and DuckDB's `//` is exact integer division
      val b = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx_"))
        .select(expr("(mn + mx_) div 2").as("mid"))
      val u = ev.crossJoin(broadcast(b))
        .groupBy(col("user_id"), (col("user_id") % 2).cast("long").as("variant"))
        .agg(count(when(col("us") < col("mid"), 1)).as("x"),
             count(when(col("event_type") === "purchase"
                        && col("us") >= col("mid"), 1)).as("y"))
      val g = u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
                    sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
                    sum(col("x") * col("x")).as("sxx"))
      val th = g.select(
        when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
          Det.r6((col("n") * col("sxy") - col("sx") * col("sy")) * lit(1.0)
                 / (col("n") * col("sxx") - col("sx") * col("sx"))))
          .otherwise(lit(0.0)).as("theta"),
        Det.r6(col("sx") * lit(1.0) / col("n")).as("mx"))
      val c = u.groupBy("variant")
        .agg(count(lit(1)).as("nc"), sum(col("x")).as("sxc"),
             sum(col("y")).as("syc"), sum(col("y") * col("y")).as("syyc"),
             sum(col("x") * col("y")).as("sxyc"),
             sum(col("x") * col("x")).as("sxxc"))
      c.crossJoin(broadcast(th))
        .select(col("variant"), col("nc").as("n_users"),
          Det.r4(col("syc") * lit(1.0) / col("nc")).as("mean_raw"),
          Det.r4((col("syc") * lit(1.0)
                  - col("theta") * (col("sxc") - col("nc") * col("mx")))
                 / col("nc")).as("mean_adj"),
          Det.r4((col("syyc") - col("syc") * lit(1.0) * col("syc") / col("nc"))
                 / (col("nc") - 1)).as("var_raw"),
          Det.r4((col("syyc") - lit(2.0) * col("theta") * col("sxyc")
                  + col("theta") * col("theta") * col("sxxc")
                  - (col("syc") - col("theta") * col("sxc"))
                    * (col("syc") - col("theta") * col("sxc")) / col("nc"))
                 / (col("nc") - 1)).as("var_adj"))
        .orderBy("variant")
    },

    /** Kaplan–Meier survival curve for time-to-first-purchase after
      * signup — the churn/conversion time-to-event readout, with users
      * who never purchase RIGHT-CENSORED at the observation horizon
      * (dropping them would bias survival down; KM is the standard
      * estimator that doesn't). Per-user durations in exact integer days;
      * the lifetable is bounded by distinct duration days, at_risk is a
      * reverse running INTEGER sum, and the cumulative product runs in
      * log space with each per-day ln(factor) floor-quantized to nano
      * units BEFORE the window sum — float window sums are
      * accumulation-order-fragile across engines (the q_win_rolling_corr
      * lesson), integer ones are exact. Factors are r6-rounded before ln
      * (the Det discipline); exp/ln cross-engine parity is already load-
      * bearing for q_agg_geomean and q_mix_temperature. */
    OpDef(
      "q_events_survival",
      """WITH g AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS gmax
        |           FROM events),
        |su AS (SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS ts0
        |       FROM events WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT e.user_id,
        |              min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS tp
        |       FROM events e JOIN su ON e.user_id = su.user_id
        |       WHERE e.event_type = 'purchase'
        |         AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= su.ts0
        |       GROUP BY 1),
        |dur AS (
        |  SELECT su.user_id,
        |    CASE WHEN pu.tp IS NOT NULL
        |         THEN (pu.tp - su.ts0) // 86400000000
        |         ELSE (g.gmax - su.ts0) // 86400000000 END AS dday,
        |    CASE WHEN pu.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id, g),
        |d AS (
        |  SELECT dday, count(*) AS n_total, sum(ev) AS n_event,
        |         count(*) - sum(ev) AS n_censor
        |  FROM dur GROUP BY 1),
        |r AS (
        |  SELECT dday, n_event, n_censor,
        |    CAST(sum(n_total) OVER (ORDER BY dday DESC
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS at_risk
        |  FROM d),
        |f AS (
        |  SELECT dday, at_risk, n_event, n_censor,
        |    CAST(floor(ln(greatest(
        |           floor((1.0 - n_event * 1.0 / at_risk) * 1000000.0 + 0.5)
        |             / 1000000.0, 1e-12)) * 1000000000.0 + 0.5) AS BIGINT)
        |      AS lnf
        |  FROM r),
        |s AS (
        |  SELECT dday, at_risk, n_event, n_censor,
        |    CAST(sum(lnf) OVER (ORDER BY dday ASC ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS lsum
        |  FROM f)
        |SELECT CAST(dday AS BIGINT) AS dday, at_risk,
        |  CAST(n_event AS BIGINT) AS n_event,
        |  CAST(n_censor AS BIGINT) AS n_censor,
        |  floor(exp(lsum / 1000000000.0) * 10000.0 + 0.5) / 10000.0
        |    AS survival
        |FROM s ORDER BY dday""".stripMargin
    ) { (s, d) =>
      val W = org.apache.spark.sql.expressions.Window
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val g = ev.agg(max(col("us")).as("gmax"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("us")).as("ts0"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("us"))
        .join(su, col("p_uid") === col("user_id"))
        .filter(col("us") >= col("ts0"))
        .groupBy("p_uid").agg(min(col("us")).as("tp"))
      val dur = su.join(pu, col("user_id") === col("p_uid"), "left")
        .crossJoin(broadcast(g))
        .select(
          when(col("tp").isNotNull, expr("(tp - ts0) div 86400000000"))
            .otherwise(expr("(gmax - ts0) div 86400000000")).as("dday"),
          when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"))
      val dd = dur.groupBy("dday")
        .agg(count(lit(1)).as("n_total"), sum(col("ev")).as("n_event"),
             (count(lit(1)) - sum(col("ev"))).as("n_censor"))
      val wDesc = W.orderBy(col("dday").desc)
        .rowsBetween(W.unboundedPreceding, 0)
      val wAsc = W.orderBy(col("dday").asc)
        .rowsBetween(W.unboundedPreceding, 0)
      dd.withColumn("at_risk", sum(col("n_total")).over(wDesc).cast("long"))
        .withColumn("lnf",
          floor(log(greatest(
            Det.r6(lit(1.0) - col("n_event") * lit(1.0) / col("at_risk")),
            lit(1e-12))) * lit(1000000000.0) + lit(0.5)).cast("long"))
        .withColumn("lsum", sum(col("lnf")).over(wAsc).cast("long"))
        .select(col("dday").cast("long").as("dday"), col("at_risk"),
                col("n_event").cast("long").as("n_event"),
                col("n_censor").cast("long").as("n_censor"),
                Det.r4(exp(col("lsum") / lit(1000000000.0))).as("survival"))
        .orderBy("dday")
    },

    /** DAU / WAU / stickiness — the product-analytics headline series.
      * WAU is a 7-day DISTINCT count, which has no distributive window
      * form; the distributed trick is coverage expansion: each distinct
      * (user, day) activity row contributes to the 7 window-end days it
      * covers (a bounded ×7 map-side explode), after which WAU is a
      * plain per-day distinct count — shuffle-bounded, no repeated
      * 7-day re-scans, the same shape at any history length. Counts are
      * exact integers; the stickiness ratio rounds once. */
    OpDef(
      "q_events_dau_wau",
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |cover AS (
        |  SELECT user_id, day + CAST(i AS INTEGER) AS wday
        |  FROM ud, UNNEST(range(0, 7)) AS t(i)),
        |wau AS (
        |  SELECT wday AS day, count(DISTINCT user_id) AS wau
        |  FROM cover WHERE wday IN (SELECT day FROM days) GROUP BY 1),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1)
        |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
        |  CAST(wau.wau AS BIGINT) AS wau,
        |  floor((dau.dau * 1.0 / wau.wau) * 10000.0 + 0.5) / 10000.0
        |    AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY dau.day""".stripMargin
    ) { (s, d) =>
      val ud = events(s, d)
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
        .distinct()
      val days = ud.select(col("day").as("spine_day")).distinct()
      val cover = ud
        .select(col("user_id"),
                explode(sequence(lit(0), lit(6))).as("i"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("i")).as("wday"))
      val wau = cover.join(days, col("wday") === col("spine_day"), "left_semi")
        .groupBy(col("wday").as("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
                Det.r4(col("dau") * lit(1.0) / col("wau")).as("stickiness"))
        .orderBy("day")
    },

    /** Hour-of-day × day-of-week activity heatmap — the capacity/on-call
      * planning artifact (when does traffic actually arrive?). One
      * corpus aggregation into a ≤ 168-cell matrix + a 1-row total
      * broadcast for the share column. DuckDB numbers Sunday 0 where
      * Spark numbers it 1, so the oracle shifts (+1) — the
      * q_win_seasonal dialect note. */
    OpDef(
      "q_events_heatmap",
      """WITH h AS (
        |  SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
        |         hour(CAST(ts AS TIMESTAMP)) AS hod, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM h)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
        |  CAST(n AS BIGINT) AS n,
        |  floor((n * 1.0 / tot) * 1000000.0 + 0.5) / 1000000.0 AS share
        |FROM h, t ORDER BY dow, hod""".stripMargin
    ) { (s, d) =>
      val h = events(s, d)
        .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
                 hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n"))
      val t = h.agg(sum(col("n")).cast("long").as("tot"))
      h.crossJoin(broadcast(t))
        .select(col("dow"), col("hod"), col("n"),
                Det.r6(col("n") * lit(1.0) / col("tot")).as("share"))
        .orderBy("dow", "hod")
    },

    /** Rolling-baseline z-score anomalies — q_events_anomaly scores each
      * day against the GLOBAL mean, which drifts with the series itself;
      * the production monitor compares against a trailing window (28
      * days here, current day excluded — the day being judged must not
      * contaminate its own baseline). Window moments are INTEGER sums
      * (order-exact); z is NULL until 7 baseline days exist and for
      * zero-variance baselines (the moments guard); the flag compares on
      * the ROUNDED z. Windows run over the bounded daily table. */
    OpDef(
      "q_win_zscore_roll",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day, count(*) AS v
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT day, CAST(v AS BIGINT) AS v,
        |    count(*) OVER w AS n,
        |    CAST(sum(v) OVER w AS BIGINT) AS s,
        |    CAST(sum(v * v) OVER w AS BIGINT) AS sq
        |  FROM d
        |  WINDOW w AS (ORDER BY day ASC
        |               ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT day, v,
        |    CASE WHEN n >= 7 AND n * sq - s * s > 0 THEN
        |      floor(((v - s * 1.0 / n)
        |             / sqrt((sq - s * 1.0 * s / n) / (n - 1)))
        |            * 10000.0 + 0.5) / 10000.0 END AS zscore
        |  FROM m)
        |SELECT day, v, zscore,
        |  CAST(CASE WHEN zscore IS NOT NULL AND abs(zscore) > 3.0
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_anom
        |FROM z ORDER BY day""".stripMargin
    ) { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day").asc).rowsBetween(-28, -1)
      val m = daily.select(col("day"), col("v").cast("long").as("v"),
        count(lit(1)).over(w).as("n"),
        sum(col("v")).over(w).cast("long").as("s"),
        sum(col("v") * col("v")).over(w).cast("long").as("sq"))
      val varOk = col("n") >= 7 && col("n") * col("sq") - col("s") * col("s") > 0
      m.select(col("day"), col("v"),
          when(varOk,
            Det.r4((col("v") - col("s") * lit(1.0) / col("n"))
                   / sqrt((col("sq") - col("s") * lit(1.0) * col("s") / col("n"))
                          / (col("n") - 1)))).as("zscore"))
        .withColumn("is_anom",
          when(col("zscore").isNotNull && abs(col("zscore")) > 3.0, 1L)
            .otherwise(0L))
        .orderBy("day")
    },

    /** Customer-lifetime-value curve — the acquisition-economics view the
      * retention matrix doesn't give: cumulative revenue per acquired
      * customer as a function of account age. Age is quarters since each
      * customer's FIRST order (one partitioned min-window over orders);
      * revenue sums run in exact BIGINT cents so cross-engine accumulation
      * order cannot perturb the total (o_totalprice epoch-cent sums exceed
      * double's contiguous-integer range at warehouse scale — the CUPED
      * lesson). The curve itself lives on the bounded quarter axis (≤ a few
      * dozen rows at any corpus size): one shuffle to the per-customer
      * window, one bounded groupBy, one window over quarters, and the
      * cohort denominator travels as a broadcast 1-row frame. */
    OpDef(
      "q_events_ltv",
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS DATE)
        |      AS day,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |aged AS (
        |  SELECT cents,
        |    CAST(datediff('day', min(day) OVER (PARTITION BY o_custkey), day)
        |         AS BIGINT) // 90 AS age_q
        |  FROM o),
        |byq AS (
        |  SELECT age_q, count(*) AS n_orders, CAST(sum(cents) AS BIGINT)
        |    AS cents
        |  FROM aged GROUP BY age_q),
        |cum AS (
        |  SELECT age_q, CAST(n_orders AS BIGINT) AS n_orders,
        |    CAST(sum(cents) OVER (ORDER BY age_q ASC ROWS UNBOUNDED
        |         PRECEDING) AS BIGINT) AS cum_cents
        |  FROM byq),
        |nc AS (SELECT count(DISTINCT o_custkey) AS n_customers FROM orders)
        |SELECT age_q, n_orders,
        |  cum_cents / 100.0 AS cum_rev,
        |  floor((cum_cents / 100.0 / n_customers) * 10000.0 + 0.5) / 10000.0
        |    AS ltv
        |FROM cum, nc ORDER BY age_q""".stripMargin
    ) { (s, d) =>
      val o = orders(s, d).select(
        col("o_custkey"),
        to_date(date_trunc("day", col("o_orderdate"))).as("day"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
      val perCust = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
      val aged = o
        .withColumn("first_day", min(col("day")).over(perCust))
        .select(col("cents"),
                expr("CAST(datediff(day, first_day) AS BIGINT) div 90")
                  .as("age_q"))
      val byq = aged.groupBy("age_q")
        .agg(count(lit(1)).cast("long").as("n_orders"),
             sum(col("cents")).cast("long").as("cents"))
      val wq = org.apache.spark.sql.expressions.Window
        .orderBy(col("age_q").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val nc = orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("n_customers"))
      byq
        .withColumn("cum_cents", sum(col("cents")).over(wq).cast("long"))
        .crossJoin(broadcast(nc))
        .select(col("age_q"), col("n_orders"),
          (col("cum_cents") / lit(100.0)).as("cum_rev"),
          Det.r4(col("cum_cents") / lit(100.0) / col("n_customers"))
            .as("ltv"))
        .orderBy("age_q")
    },

    /** 30-minute-gap sessionization + per-user session stats — the batch
      * twin of the streaming flatMapGroupsWithState sessionizer (S:209):
      * a new session starts where the gap to the previous event exceeds
      * 1800 s; session ids are the running sum of start flags (two stacked
      * windows per user, the q_win_islands construction on event time
      * instead of days). Durations accumulate in exact epoch-µs BIGINTs;
      * only the final averages divide in floating point.
      *
      * Scale shape: both windows and both groupBys key on user_id — one
      * shuffle partitioning reused end-to-end, no global sort; per-user
      * event counts bound every window. */
    OpDef(
      "q_events_sessions",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN us - lag(us) OVER w > 1800000000 OR
        |              lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS start
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |                      ORDER BY us ASC, event_id ASC)),
        |s AS (
        |  SELECT user_id, event_id, us,
        |    sum(start) OVER (PARTITION BY user_id
        |                     ORDER BY us ASC, event_id ASC) AS sess
        |  FROM f),
        |per AS (
        |  SELECT user_id, sess, count(*) AS n_events,
        |         max(us) - min(us) AS dur_us
        |  FROM s GROUP BY user_id, sess)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  floor((sum(n_events) * 1.0 / count(*)) * 10000.0 + 0.5) / 10000.0
        |    AS avg_events,
        |  floor((sum(dur_us) / count(*) / 1000000.0) * 10000.0 + 0.5)
        |    / 10000.0 AS avg_secs,
        |  CAST(max(dur_us) // 1000000 AS BIGINT) AS max_secs
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
      val run = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("start",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L
               || lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("sess", sum(col("start")).over(run))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n_events"),
             (max(col("us")) - min(col("us"))).as("dur_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
             sum(col("n_events")).cast("long").as("n_events"),
             Det.r4(sum(col("n_events")) * lit(1.0) / count(lit(1)))
               .as("avg_events"),
             Det.r4(sum(col("dur_us")) / count(lit(1)) / lit(1000000.0))
               .as("avg_secs"),
             // integer division (`div`), not double `/` + cast: mirrors the
             // oracle's `//` exactly and stays exact past the 2^53 double
             // granularity (ADVICE r5)
             expr("max(dur_us) div 1000000").cast("long").as("max_secs"))
        .orderBy("user_id")
    },

    /** OHLC candles — the canonical time-series downsample (metrics
      * dashboards, market data): per-day open/high/low/close of the event
      * value stream in ONE aggregation pass via min_by/max_by. First/last
      * need a total order; ties in event time are broken by event_id
      * through a zero-padded fixed-width string key (lexicographic ==
      * numeric), the only composite-key spelling both engines' arg-min
      * aggregates accept. Map-side partials carry one candle per (task,
      * day) — no window, no sort, any scale; the streaming twin (tumbling
      * window, same min_by/max_by) is pinned equal in StreamingSpec.
      * DOMAIN ASSUMPTION (ADVICE r5): lexicographic == numeric requires
      * non-negative epochs (a '-' sign sorts before digits) and
      * event_id < 1e10 — both hold for the fixtures and any post-1970
      * telemetry; pre-1970 data would need an epoch offset before lpad. */
    OpDef(
      "q_events_ohlc",
      """WITH e AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |         lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR),
        |              20, '0')
        |           || lpad(CAST(event_id AS VARCHAR), 10, '0') AS k,
        |         value
        |  FROM events)
        |SELECT day, CAST(count(*) AS BIGINT) AS n,
        |  arg_min(value, k) AS open, max(value) AS high,
        |  min(value) AS low, arg_max(value, k) AS close
        |FROM e GROUP BY day ORDER BY day""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .select(to_date(date_trunc("day", col("ts"))).as("day"),
                concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
                       lpad(col("event_id").cast("string"), 10, "0")).as("k"),
                col("value"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
             min_by(col("value"), col("k")).as("open"),
             max(col("value")).as("high"),
             min(col("value")).as("low"),
             max_by(col("value"), col("k")).as("close"))
        .orderBy("day")
    },

    /** 1-D Kalman filter (random-walk state, noisy observation) over the
      * daily value series — the ADAPTIVE-gain sibling of q_win_ewma/
      * q_win_holt: the blend weight K_t = (p+Q)/((p+Q)+R) is computed from
      * the running error variance instead of being a fixed constant, so
      * the filter trusts observations more while its uncertainty is high
      * and settles toward a steady-state gain. Q=0.5 (process variance),
      * R=2.0 (observation variance), x₁=v₁, p₁=1.0.
      *
      * Same scale/determinism shape as q_win_holt: the recurrence is
      * inherently sequential but CALENDAR-bounded (one row per day), so it
      * folds inside one collected array row with O(days²) prefix re-folds;
      * daily inputs are r4-quantized before the fold and the Spark lambda
      * spells the gain/update arithmetic character-for-character as the
      * DuckDB recursive CTE, so both engines run the identical IEEE
      * sequence. */
    OpDef(
      "q_win_kalman",
      """WITH RECURSIVE d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS v
        |  FROM events GROUP BY 1),
        |i AS (SELECT day, v, row_number() OVER (ORDER BY day) AS rn FROM d),
        |kf(rn, day, v, x, p) AS (
        |  SELECT rn, day, v, v, CAST(1.0 AS DOUBLE) FROM i WHERE rn = 1
        |  UNION ALL
        |  SELECT i.rn, i.day, i.v,
        |    kf.x + ((kf.p + 0.5) / ((kf.p + 0.5) + 2.0)) * (i.v - kf.x),
        |    (1.0 - ((kf.p + 0.5) / ((kf.p + 0.5) + 2.0))) * (kf.p + 0.5)
        |  FROM kf JOIN i ON i.rn = kf.rn + 1)
        |SELECT day, v,
        |  floor(x * 10000.0 + 0.5) / 10000.0 AS est,
        |  floor(p * 1000000.0 + 0.5) / 1000000.0 AS perr
        |FROM kf ORDER BY day""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(Det.r4(sum(col("value"))).as("v"))
        .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("xs"))
        // size guard as in q_win_holt: sequence(1, 0) counts down on an
        // empty series and would emit null-day rows the oracle lacks
        .select(explode(expr(
          """CASE WHEN size(xs) >= 1 THEN
            |transform(sequence(1, size(xs)), i -> named_struct(
            |  'day', element_at(xs, i).day,
            |  'v', element_at(xs, i).v,
            |  'st', aggregate(slice(xs, 2, i - 1),
            |    named_struct('x', element_at(xs, 1).v,
            |                 'p', CAST(1.0 AS DOUBLE)),
            |    (acc, e) -> named_struct(
            |      'x', acc.x + ((acc.p + 0.5) / ((acc.p + 0.5) + 2.0))
            |           * (e.v - acc.x),
            |      'p', (1.0 - ((acc.p + 0.5) / ((acc.p + 0.5) + 2.0)))
            |           * (acc.p + 0.5)))))
            |ELSE array() END""".stripMargin)).as("r"))
        .select(col("r.day").as("day"), col("r.v").as("v"),
                Det.r4(col("r.st.x")).as("est"),
                Det.r6(col("r.st.p")).as("perr"))
        .orderBy("day")
    },

    /** Holt–Winters additive triple-exponential smoothing (level + trend +
      * weekly seasonal, α=0.3 β=0.2 γ=0.15, period 7) — completing the
      * EWMA → Holt → Holt–Winters forecasting ladder: q_win_seasonal
      * DESCRIBES the weekly cycle post-hoc; this op TRACKS it online
      * alongside level and trend. Seeds: l₇ = mean(v₁..v₇) computed as an
      * exact BIGINT micro-unit sum (integer addition is associative, so
      * scan order cannot perturb the seed), b₇ = 0, s₁..₇ = vᵢ − l₇;
      * recursion runs day 8 onward.
      *
      * The 7-slot seasonal register rides inside the fold state as an
      * array (oldest first): each step reads s[1] (the 7-back index),
      * shifts, and appends the refreshed index — the Spark lambda's
      * slice/concat spells the identical list surgery as the DuckDB
      * recursive CTE's s[2:7] || [..], and every blend is
      * character-identical, so both engines run the same IEEE sequence.
      * Calendar-bounded like q_win_holt (the CASE guard returns an empty
      * series when fewer than 8 days exist — Spark's sequence(8, n) would
      * otherwise COUNT DOWN for n < 8). */
    OpDef(
      "q_win_holtwinters",
      """WITH RECURSIVE d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS v
        |  FROM events GROUP BY 1),
        |i AS (SELECT day, v, row_number() OVER (ORDER BY day) AS rn FROM d),
        |seed AS (
        |  SELECT CAST(sum(CAST(floor(v * 10000.0 + 0.5) AS BIGINT))
        |              AS DOUBLE) / 10000.0 / 7.0 AS l0
        |  FROM i WHERE rn <= 7),
        |anch AS (
        |  SELECT 7 AS rn, max(i.day) AS day,
        |    max(CASE WHEN i.rn = 7 THEN i.v END) AS v,
        |    max(seed.l0) AS l, CAST(0.0 AS DOUBLE) AS b,
        |    list(i.v - seed.l0 ORDER BY i.day) AS s
        |  FROM i CROSS JOIN seed WHERE i.rn <= 7),
        |hw(rn, day, v, l, b, s) AS (
        |  SELECT rn, day, v, l, b, s FROM anch
        |  UNION ALL
        |  SELECT i.rn, i.day, i.v,
        |    0.3 * (i.v - hw.s[1]) + 0.7 * (hw.l + hw.b),
        |    0.2 * ((0.3 * (i.v - hw.s[1]) + 0.7 * (hw.l + hw.b)) - hw.l)
        |      + 0.8 * hw.b,
        |    list_concat(hw.s[2:7],
        |      [0.15 * (i.v - (0.3 * (i.v - hw.s[1]) + 0.7 * (hw.l + hw.b)))
        |       + 0.85 * hw.s[1]])
        |  FROM hw JOIN i ON i.rn = hw.rn + 1)
        |SELECT day, v,
        |  floor(l * 10000.0 + 0.5) / 10000.0 AS level,
        |  floor(b * 10000.0 + 0.5) / 10000.0 AS trend,
        |  floor(s[7] * 10000.0 + 0.5) / 10000.0 AS seasonal
        |FROM hw WHERE rn >= 8 ORDER BY day""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(Det.r4(sum(col("value"))).as("v"))
        .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("xs"))
        .withColumn("l0", expr(
          """CAST(aggregate(slice(xs, 1, 7), CAST(0 AS BIGINT),
            |  (a, e) -> a + CAST(floor(e.v * 10000.0 + 0.5) AS BIGINT))
            |  AS DOUBLE) / 10000.0 / 7.0""".stripMargin))
        .withColumn("s0", expr("transform(slice(xs, 1, 7), e -> e.v - l0)"))
        .select(explode(expr(
          """CASE WHEN size(xs) >= 8 THEN
            |  transform(sequence(8, size(xs)), i -> named_struct(
            |    'day', element_at(xs, i).day,
            |    'v', element_at(xs, i).v,
            |    'st', aggregate(slice(xs, 8, i - 7),
            |      named_struct('l', l0, 'b', CAST(0.0 AS DOUBLE), 's', s0),
            |      (acc, e) -> named_struct(
            |        'l', 0.3 * (e.v - element_at(acc.s, 1))
            |             + 0.7 * (acc.l + acc.b),
            |        'b', 0.2 * ((0.3 * (e.v - element_at(acc.s, 1))
            |                     + 0.7 * (acc.l + acc.b)) - acc.l)
            |             + 0.8 * acc.b,
            |        's', concat(slice(acc.s, 2, 6),
            |          array(0.15 * (e.v - (0.3 * (e.v - element_at(acc.s, 1))
            |                               + 0.7 * (acc.l + acc.b)))
            |                + 0.85 * element_at(acc.s, 1)))))))
            |ELSE array() END""".stripMargin)).as("r"))
        .select(col("r.day").as("day"), col("r.v").as("v"),
                Det.r4(col("r.st.l")).as("level"),
                Det.r4(col("r.st.b")).as("trend"),
                Det.r4(expr("element_at(r.st.s, 7)")).as("seasonal"))
        .orderBy("day")
    },

    /** Offline single change-point localization (AMOC — at-most-one-change)
      * of the daily value series: t* = argmax_t |n·Σ_{i≤t}vᵢ − t·Σvᵢ|, the
      * scaled CUSUM-departure statistic. q_win_cusum DETECTS drift online
      * with a reset recursion; this op LOCATES the single best split point
      * retrospectively — the segmentation primitive binary-segmentation
      * recurses on.
      *
      * Everything runs in exact BIGINT micro-units: daily sums are
      * micro-quantized once, and the statistic n·cum − rn·tot is pure
      * integer arithmetic (|n·cum| ≤ 30·Σ|vm| — orders of magnitude below
      * BIGINT range at any SF), so both engines rank identical integers;
      * the earliest day breaks ties. The window and argmax run over the
      * CALENDAR-bounded daily table, never raw events. */
    OpDef(
      "q_events_changepoint",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    CAST(floor((sum(value)) * 10000.0 + 0.5) AS BIGINT) AS vm
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(vm) AS BIGINT) AS tot FROM d),
        |c AS (SELECT day, vm,
        |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
        |        CAST(sum(vm) OVER (ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum
        |      FROM d),
        |s AS (SELECT c.day, c.rn, c.cum, t.n, t.tot,
        |        abs(t.n * c.cum - c.rn * t.tot) AS stat
        |      FROM c CROSS JOIN t WHERE c.rn < t.n)
        |SELECT day AS split_day, rn AS n_before, n - rn AS n_after, stat,
        |  floor((CAST(cum AS DOUBLE) / 10000.0 / CAST(rn AS DOUBLE))
        |        * 10000.0 + 0.5) / 10000.0 AS mean_before,
        |  floor((CAST(tot - cum AS DOUBLE) / 10000.0
        |         / CAST(n - rn AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
        |    AS mean_after
        |FROM s ORDER BY stat DESC, day LIMIT 1""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(floor(sum(col("value")) * lit(10000.0) + lit(0.5))
               .cast("long").as("vm"))
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("vm")).as("tot"))
      val w = Window.orderBy(col("day"))
      daily
        .select(col("day"), col("vm"),
                row_number().over(w).cast("long").as("rn"),
                sum(col("vm")).over(
                  w.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow)).as("cum"))
        .crossJoin(broadcast(tot))
        .filter(col("rn") < col("n"))
        .select(col("day").as("split_day"), col("rn").as("n_before"),
                (col("n") - col("rn")).as("n_after"),
                abs(col("n") * col("cum") - col("rn") * col("tot")).as("stat"),
                Det.r4(col("cum").cast("double") / lit(10000.0)
                       / col("rn").cast("double")).as("mean_before"),
                Det.r4((col("tot") - col("cum")).cast("double") / lit(10000.0)
                       / (col("n") - col("rn")).cast("double"))
                  .as("mean_after"))
        .orderBy(col("stat").desc, col("split_day")).limit(1)
    },

    /** Strict local-maximum (peak) detection with single-neighbor
      * prominence over the daily value series — the spike-shortlist
      * primitive (q_events_anomaly thresholds a global band; this flags
      * every day strictly above BOTH neighbors, however modest). One
      * lag+lead window over the calendar-bounded daily table; prominence
      * = v − max(neighbors) on r4-quantized inputs, so the subtraction is
      * bit-identical across engines. Endpoints (no both-side neighbor)
      * are excluded by the NULL guards. */
    OpDef(
      "q_events_peaks",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS v
        |  FROM events GROUP BY 1),
        |w AS (SELECT day, v,
        |        lag(v) OVER (ORDER BY day) AS pv,
        |        lead(v) OVER (ORDER BY day) AS nv
        |      FROM d)
        |SELECT day, v,
        |  floor((v - greatest(pv, nv)) * 10000.0 + 0.5) / 10000.0
        |    AS prominence
        |FROM w
        |WHERE pv IS NOT NULL AND nv IS NOT NULL AND v > pv AND v > nv
        |ORDER BY day""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("day"))
      events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(Det.r4(sum(col("value"))).as("v"))
        .select(col("day"), col("v"),
                lag(col("v"), 1).over(w).as("pv"),
                lead(col("v"), 1).over(w).as("nv"))
        .filter(col("pv").isNotNull && col("nv").isNotNull &&
                col("v") > col("pv") && col("v") > col("nv"))
        .select(col("day"), col("v"),
                Det.r4(col("v") - greatest(col("pv"), col("nv")))
                  .as("prominence"))
        .orderBy("day")
    },

    /** Theil–Sen robust trend: the MEDIAN of all pairwise daily slopes —
      * the estimator that survives up to ~29% outlier days where
      * q_events_trend's least-squares slope is dragged by a single spike
      * (the robust-statistics companion to q_agg_mad / q_dq_outlier_iqr,
      * applied to trend). Slopes are computed on the micro-quantized
      * daily sums (the changepoint discipline) and r6-rounded BEFORE
      * ranking, so both engines sort identical doubles; the lower median
      * at rank (n+1) div 2 with the (slope, i, j) total order is the
      * deterministic median spelling (no averaging of middle elements —
      * an even-count mean would reintroduce float-sum order).
      *
      * Scale: the pairwise join is over the CALENDAR-bounded daily table
      * (d days ⇒ d(d−1)/2 pairs — 435 at a 30-day fixture, ~66k at a
      * 1-year horizon), never raw events; it broadcasts one daily table
      * against the other (declared in the ScaleSpec BNLJ allowlist as a
      * calendar-bounded pairwise build). The heavy work — folding 100 TB
      * of events into d daily rows — is one partial-aggregated groupBy. */
    OpDef(
      "q_events_theilsen",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    CAST(floor((sum(value)) * 10000.0 + 0.5) AS BIGINT) AS vm
        |  FROM events GROUP BY 1),
        |i AS (SELECT day, vm,
        |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
        |      FROM d),
        |prs AS (
        |  SELECT a.rn AS ri, b.rn AS rj,
        |    floor(((b.vm - a.vm) / 10000.0
        |           / date_diff('day', a.day, b.day))
        |          * 1000000.0 + 0.5) / 1000000.0 AS slope
        |  FROM i a JOIN i b ON b.rn > a.rn),
        |r AS (SELECT slope, ri, rj,
        |        CAST(row_number() OVER (ORDER BY slope, ri, rj) AS BIGINT)
        |          AS rk,
        |        CAST(count(*) OVER () AS BIGINT) AS n_pairs
        |      FROM prs)
        |SELECT n_pairs, ri, rj, slope AS sen_slope
        |FROM r WHERE rk = (n_pairs + 1) // 2""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(floor(sum(col("value")) * lit(10000.0) + lit(0.5))
               .cast("long").as("vm"))
      val i = daily.select(col("day"), col("vm"),
        row_number().over(Window.orderBy(col("day"))).cast("long").as("rn"))
      val a = i.select(col("rn").as("ri"), col("day").as("da"),
                       col("vm").as("va"))
      val b = i.select(col("rn").as("rj"), col("day").as("db"),
                       col("vm").as("vb"))
      val prs = a.join(broadcast(b), col("rj") > col("ri"))
        .select(col("ri"), col("rj"),
                Det.r6((col("vb") - col("va")) / lit(10000.0)
                         / datediff(col("db"), col("da"))).as("slope"))
      val wAll = Window.orderBy(col("slope"), col("ri"), col("rj"))
      prs
        .select(col("slope"), col("ri"), col("rj"),
                row_number().over(wAll).cast("long").as("rk"),
                count(lit(1)).over(
                  Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing))
                  .cast("long").as("n_pairs"))
        .filter(col("rk") === expr("(n_pairs + 1) div 2"))
        .select(col("n_pairs"), col("ri"), col("rj"),
                col("slope").as("sen_slope"))
    },

    /** Mann–Kendall trend TEST over the daily series (r9) — the
      * significance companion to q_events_theilsen's Sen slope (the
      * slope says how steep; MK says whether a monotone trend exists at
      * all): S = Σ_{i<j} sign(v_j − v_i) in pure integers over the same
      * calendar-bounded pair expansion, the tie-corrected variance kept
      * as the EXACT integer 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)
      * (tie groups from the micro-quantized daily values), and the
      * normalized Z = (S∓1)/√(var18/18) — the one floating step, both
      * engines running the identical IEEE sqrt+divide, r6-rounded — with
      * the 5% two-sided call at |Z| > 1.96. Pairs are bounded by days²
      * (the theilsen discipline), ties by distinct daily values; at
      * 100 TB the only corpus-sized work is the daily fold. */
    OpDef(
      "q_win_mannkendall",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    CAST(floor((sum(value)) * 10000.0 + 0.5) AS BIGINT) AS vm
        |  FROM events GROUP BY 1),
        |i AS (SELECT day, vm,
        |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
        |      FROM d),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN b.vm > a.vm THEN 1
        |                       WHEN b.vm < a.vm THEN -1 ELSE 0 END)
        |              AS BIGINT) AS s_stat
        |  FROM i a JOIN i b ON b.rn > a.rn),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM i),
        |ties AS (
        |  SELECT COALESCE(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
        |    AS tc
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM i GROUP BY vm)
        |  WHERE t > 1),
        |v AS (
        |  SELECT n.n_days, s.s_stat,
        |    n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tc
        |      AS var18
        |  FROM n, s, ties)
        |SELECT n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
        |  floor((CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18 / 18.0)
        |              WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18 / 18.0)
        |              ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS z,
        |  CASE WHEN s_stat > 0
        |         AND (s_stat - 1) / sqrt(var18 / 18.0) > 1.96
        |       THEN 'increasing'
        |       WHEN s_stat < 0
        |         AND (s_stat + 1) / sqrt(var18 / 18.0) < -1.96
        |       THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM v""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(floor(sum(col("value")) * lit(10000.0) + lit(0.5))
               .cast("long").as("vm"))
      val i = daily.select(col("day"), col("vm"),
        row_number().over(Window.orderBy(col("day"))).cast("long").as("rn"))
      val a = i.select(col("rn").as("ri"), col("vm").as("va"))
      val b = i.select(col("rn").as("rj"), col("vm").as("vb"))
      val sStat = a.join(broadcast(b), col("rj") > col("ri"))
        .agg(sum(when(col("vb") > col("va"), 1L)
                   .when(col("vb") < col("va"), -1L)
                   .otherwise(0L)).cast("long").as("s_stat"))
      val nDays = i.agg(count(lit(1)).cast("long").as("n_days"))
      val tc = i.groupBy("vm").agg(count(lit(1)).cast("long").as("t"))
        .filter(col("t") > 1L)
        .agg(coalesce(sum(col("t") * (col("t") - 1L)
                            * (lit(2L) * col("t") + 5L)).cast("long"),
                      lit(0L)).as("tc"))
      val zExpr = (sgn: Long) =>
        (col("s_stat") - lit(sgn)) / sqrt(col("var18") / lit(18.0))
      broadcast(nDays).crossJoin(broadcast(sStat)).crossJoin(broadcast(tc))
        .withColumn("var18",
          (col("n_days") * (col("n_days") - 1L)
             * (lit(2L) * col("n_days") + 5L) - col("tc")).cast("long"))
        .select(col("n_days"), col("s_stat"), col("var18"),
          Det.r6(when(col("s_stat") > 0L, zExpr(1L))
                   .when(col("s_stat") < 0L, zExpr(-1L))
                   .otherwise(lit(0.0))).as("z"),
          when(col("s_stat") > 0L && zExpr(1L) > lit(1.96), "increasing")
            .when(col("s_stat") < 0L && zExpr(-1L) < lit(-1.96), "decreasing")
            .otherwise("no_trend").as("trend"))
    },

    /** Forecast backtest on the daily series: seasonal-naive (v[t−7])
      * scored against naive (v[t−1]) over every day where BOTH lags
      * exist — the evaluation harness the Holt/Holt-Winters/Kalman
      * forecasting ladder is judged by (a model that can't beat
      * seasonal-naive isn't a model). MASE is the scale-free headline
      * (sae_snaive/sae_naive; < 1 ⇒ weekly seasonality is real signal),
      * WAPE the magnitude-normalized companion. Every error sum runs on
      * the micro-quantized BIGINT daily values — exact, associative,
      * engine-order-proof — and only the two final ratios touch doubles
      * (one correctly-rounded division each, NULL-guarded against a
      * constant series). One daily groupBy + two lag windows + a 1-row
      * aggregate: the 100 TB cost is the events fold, nothing else. */
    OpDef(
      "q_eval_forecast",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day,
        |    CAST(floor((sum(value)) * 10000.0 + 0.5) AS BIGINT) AS vm
        |  FROM events GROUP BY 1),
        |l AS (SELECT day, vm,
        |        lag(vm, 1) OVER (ORDER BY day) AS p1,
        |        lag(vm, 7) OVER (ORDER BY day) AS p7
        |      FROM d),
        |e AS (SELECT * FROM l WHERE p7 IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_eval,
        |  CAST(sum(abs(vm - p1)) AS BIGINT) AS sae_naive,
        |  CAST(sum(abs(vm - p7)) AS BIGINT) AS sae_snaive,
        |  floor((sum(abs(vm - p7)) * 1.0 / nullif(sum(abs(vm - p1)), 0))
        |        * 1000000.0 + 0.5) / 1000000.0 AS mase,
        |  floor((sum(abs(vm - p7)) * 1.0 / nullif(sum(abs(vm)), 0))
        |        * 1000000.0 + 0.5) / 1000000.0 AS wape_snaive
        |FROM e""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("day"))
      events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(floor(sum(col("value")) * lit(10000.0) + lit(0.5))
               .cast("long").as("vm"))
        .select(col("day"), col("vm"),
                lag(col("vm"), 1).over(w).as("p1"),
                lag(col("vm"), 7).over(w).as("p7"))
        .filter(col("p7").isNotNull)
        .agg(count(lit(1)).cast("long").as("n_eval"),
             sum(abs(col("vm") - col("p1"))).cast("long").as("sae_naive"),
             sum(abs(col("vm") - col("p7"))).cast("long").as("sae_snaive"),
             Det.r6(sum(abs(col("vm") - col("p7"))) * lit(1.0)
                      / nullif(sum(abs(col("vm") - col("p1"))), lit(0)))
               .as("mase"),
             Det.r6(sum(abs(col("vm") - col("p7"))) * lit(1.0)
                      / nullif(sum(abs(col("vm"))), lit(0)))
               .as("wape_snaive"))
    }
  )
}
