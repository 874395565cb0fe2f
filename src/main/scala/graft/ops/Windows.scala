package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.5 analytic windows + §2.10 batch twins of the streaming time windows.
  *
  * Scale notes: every window here partitions by a key (custkey / user_id /
  * status) so the sort is per-partition after a hash shuffle — no global
  * sort. The time-window twins use the exact `window()` expression that the
  * streaming path uses, so batch results are oracle-checkable while the
  * streaming variant reuses the same code (Structured Streaming's unified
  * API).
  */
object Windows {
  import Tables._

  val ops: Seq[OpDef] = Seq(

    OpDef(
      "q_win_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn,
        |  rank()       OVER w AS rk,
        |  dense_rank() OVER w AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, rn""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                row_number().over(w).cast("long").as("rn"),
                rank().over(w).cast("long").as("rk"),
                dense_rank().over(w).cast("long").as("drk"))
        .orderBy("o_custkey", "rn")
    },

    OpDef(
      "q_win_topk_group",
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM r WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    OpDef(
      "q_win_lag",
      """SELECT user_id, event_id, value,
        |  lag(value)  OVER w AS prev_value,
        |  lead(value) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
                lag(col("value"), 1).over(w).as("prev_value"),
                lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    },

    OpDef(
      "q_win_running",
      """SELECT user_id, event_id,
        |  floor((sum(value) OVER (PARTITION BY user_id
        |                          ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |        * 10000.0 + 0.5) / 10000.0 AS running_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"),
                Det.r4(sum(col("value")).over(w)).as("running_value"))
        .orderBy("user_id", "event_id")
    },

    OpDef(
      "q_win_moving",
      """SELECT user_id, event_id,
        |  floor((avg(value) OVER (PARTITION BY user_id
        |                          ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |        * 10000.0 + 0.5) / 10000.0 AS moving_avg3
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-2, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"),
                Det.r4(avg(col("value")).over(w)).as("moving_avg3"))
        .orderBy("user_id", "event_id")
    },

    OpDef(
      "q_win_range",
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
        |FROM orders
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin
    ) { (s, d) =>
      // value-range frame over a double column: SQL form (the DataFrame
      // rangeBetween(Long, Long) boundary would type-clash with DoubleType)
      val v = Views.reg(orders(s, d), "winrange_src")
      s.sql(
        s"""SELECT o_orderstatus, o_orderkey, o_totalprice,
           |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
           |                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
           |FROM $v
           |ORDER BY o_orderstatus, o_orderkey""".stripMargin)
    },

    OpDef(
      "q_win_analytic",
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  ntile(4)  OVER w AS quartile,
        |  floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
        |  floor((cume_dist()    OVER w) * 1000000.0 + 0.5) / 1000000.0 AS cdist,
        |  first_value(c_custkey) OVER w AS poorest,
        |  last_value(c_custkey)  OVER (PARTITION BY c_nationkey
        |                               ORDER BY c_acctbal ASC, c_custkey ASC
        |                               ROWS BETWEEN UNBOUNDED PRECEDING
        |                                        AND UNBOUNDED FOLLOWING) AS richest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
                ntile(4).over(w).cast("long").as("quartile"),
                Det.r6(percent_rank().over(w)).as("pct_rank"),
                Det.r6(cume_dist().over(w)).as("cdist"),
                first(col("c_custkey")).over(w).as("poorest"),
                last(col("c_custkey")).over(wFull).as("richest"))
        .orderBy("c_custkey")
    },

    // ------------------- §2.10 batch twins of streaming time windows -----
    OpDef(
      "q_win_tumble_batch",
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS win_start,
        |  event_type,
        |  count(*) AS n, floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin
    ) { (s, d) =>
      // identical expression runs on readStream (streaming/StreamOps.scala)
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.r4(sum(col("value"))).as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
                col("n"), col("total"))
        .orderBy("win_start", "event_type")
    },

    OpDef(
      "q_win_session_batch",
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |      OVER (PARTITION BY user_id
        |            ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM o),
        |s AS (
        |  SELECT user_id, event_id, us,
        |    sum(new_sess) OVER (PARTITION BY user_id
        |                        ORDER BY us ASC, event_id ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_seq
        |  FROM f)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events,
        |  CAST(make_timestamp(min(us)) AS TIMESTAMP) AS sess_start,
        |  CAST(make_timestamp(max(us)) AS TIMESTAMP) AS sess_end
        |FROM s
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin
    ) { (s, d) =>
      // batch sessionization: gap > 10 min starts a new session
      // (lag → flag → running sum), the oracle-checkable twin of
      // streaming session_window. Everything is per-user-partition window
      // work after one hash shuffle — no global sort.
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"),
                unix_micros(col("ts")).as("us"),
                lag(unix_micros(col("ts")), 1).over(wOrd).as("prev_us"))
        .select(col("user_id"), col("event_id"), col("us"),
                when(col("prev_us").isNull ||
                     col("us") - col("prev_us") > 600000000L, 1L)
                  .otherwise(0L).as("new_sess"))
        .withColumn("session_seq", sum(col("new_sess")).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("us").asc, col("event_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
             timestamp_micros(min(col("us"))).as("sess_start"),
             timestamp_micros(max(col("us"))).as("sess_end"))
        .select(col("user_id"), col("session_seq").cast("long").as("session_seq"),
                col("n_events"), col("sess_start"), col("sess_end"))
        .orderBy("user_id", "session_seq")
    },

    OpDef(
      "q_win_slide_batch",
      """WITH e AS (
        |  SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
        |           - (k * INTERVAL 15 MINUTE) AS win_start, value
        |  FROM events, unnest([0, 1, 2, 3]) AS t(k))
        |SELECT win_start, count(*) AS n,
        |       floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total
        |FROM e
        |GROUP BY win_start
        |ORDER BY win_start""".stripMargin
    ) { (s, d) =>
      // 1-hour window sliding by 15 min: each event lands in 4 windows.
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), Det.r4(sum(col("value"))).as("total"))
        .select(col("window.start").as("win_start"), col("n"), col("total"))
        .orderBy("win_start")
    },

    /** Hampel filter — rolling-median/MAD outlier flag over each user's
      * event values (±3-row window): robust to the very outliers a rolling
      * mean/stddev would absorb (the q_win_zscore_roll failure mode on
      * heavy tails). The window list is bounded (≤ 7 elements) so the
      * exact median runs as array HOFs on the sorted frame — no
      * percentile aggregate, whose accumulation DuckDB and Spark
      * interpolate differently. Median/MAD/flag arithmetic is spelled
      * identically on both sides (sorted-array picks, (a+b)/2.0, literal
      * 4.4478 = 3·1.4826 as one constant) so every intermediate double is
      * bit-identical and the unrounded comparison agrees cross-engine;
      * only the reported med/mad columns are display-rounded.
      *
      * Scale shape: one per-user window sort (hash shuffle on user_id),
      * frame bounded by ±3 rows — map-local per partition after the
      * shuffle, any corpus size. */
    OpDef(
      "q_win_hampel",
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |l AS (
        |  SELECT event_id, user_id, value,
        |    list_sort(list(value) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS s
        |  FROM e),
        |m AS (
        |  SELECT event_id, user_id, value, s,
        |    CASE WHEN len(s) % 2 = 1 THEN s[(len(s) + 1) // 2]
        |         ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) / 2.0 END AS med
        |  FROM l),
        |d AS (
        |  SELECT event_id, user_id, value, med,
        |    list_sort(list_transform(s, x -> abs(x - med))) AS ds
        |  FROM m)
        |SELECT event_id, user_id, value,
        |  floor(med * 10000.0 + 0.5) / 10000.0 AS med,
        |  floor((CASE WHEN len(ds) % 2 = 1 THEN ds[(len(ds) + 1) // 2]
        |         ELSE (ds[len(ds) // 2] + ds[len(ds) // 2 + 1]) / 2.0 END)
        |        * 10000.0 + 0.5) / 10000.0 AS mad,
        |  abs(value - med) > 4.4478 *
        |    (CASE WHEN len(ds) % 2 = 1 THEN ds[(len(ds) + 1) // 2]
        |     ELSE (ds[len(ds) // 2] + ds[len(ds) // 2 + 1]) / 2.0 END)
        |    AS is_outlier
        |FROM d ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.Column
      def pick(a: Column): Column = {
        val n = size(a)
        when(n % 2 === 1, element_at(a, ((n + 1) / 2).cast("int")))
          .otherwise((element_at(a, (n / 2).cast("int"))
                        + element_at(a, (n / 2 + 1).cast("int"))) / lit(2.0))
      }
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
        .rowsBetween(-3, 3)
      events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
                unix_micros(col("ts")).as("us"))
        .withColumn("s", array_sort(collect_list(col("value")).over(w)))
        .withColumn("med", pick(col("s")))
        .withColumn("ds",
          array_sort(transform(col("s"), x => abs(x - col("med")))))
        .select(col("event_id"), col("user_id"), col("value"),
                Det.r4(col("med")).as("med"),
                Det.r4(pick(col("ds"))).as("mad"),
                (abs(col("value") - col("med"))
                   > lit(4.4478) * pick(col("ds"))).as("is_outlier"))
        .orderBy("event_id")
    },

    /** Sweep-line interval concurrency — peak number of simultaneously
      * open orders (30-day fulfillment windows) per customer nation: the
      * classic max-overlap question (sessions in flight, concurrent
      * rentals, active connections) answered without interval self-joins.
      * Each interval becomes a +1/−1 event pair and one running-sum
      * window per nation replays the timeline; half-open semantics order
      * the −1 before the +1 at equal timestamps (delta ASC tie-break),
      * with the order key completing a total order so every running value
      * is deterministic.
      *
      * Scale shape: O(2n) events, one hash shuffle on the partition key
      * and a per-group sort — never the O(n²) interval join; the key
      * (here nation) is whatever dimension bounds a group's event count
      * at 100 TB (day-sharded keys compose the same way as
      * q_pack_sequences documents). */
    OpDef(
      "q_win_sweepline",
      """WITH o AS (
        |  SELECT c.c_nationkey AS nk, o.o_orderkey, o.o_orderdate
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |pts AS (
        |  SELECT nk, o_orderkey, o_orderdate AS t, 1 AS delta FROM o
        |  UNION ALL
        |  SELECT nk, o_orderkey, o_orderdate + INTERVAL 30 DAY, -1 FROM o),
        |r AS (
        |  SELECT nk, t,
        |    sum(delta) OVER (PARTITION BY nk
        |                     ORDER BY t ASC, delta ASC, o_orderkey ASC)
        |      AS run
        |  FROM pts),
        |p AS (SELECT nk, max(run) AS peak FROM r GROUP BY nk),
        |n AS (SELECT nk, count(*) AS n_orders FROM o GROUP BY nk)
        |SELECT r.nk, CAST(max(n.n_orders) AS BIGINT) AS n_orders,
        |       CAST(p.peak AS BIGINT) AS peak, min(r.t) AS peak_at
        |FROM r JOIN p ON r.nk = p.nk AND r.run = p.peak
        |     JOIN n ON r.nk = n.nk
        |GROUP BY r.nk, p.peak ORDER BY r.nk""".stripMargin
    ) { (s, d) =>
      val o = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"), col("o_orderkey"),
                col("o_orderdate"))
      val peaks = sweepline(o.select(
        col("nk").as("k"), col("o_orderkey").as("id"),
        col("o_orderdate").as("s"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("e")))
      val n = o.groupBy(col("nk")).agg(count(lit(1)).as("n_orders"))
      peaks.join(n, peaks("k") === n("nk"))
        .select(col("nk"), col("n_orders").cast("long").as("n_orders"),
                col("peak").cast("long").as("peak"), col("peak_at"))
        .orderBy("nk")
    }
  )

  /** Sweep-line peak concurrency for half-open intervals: input columns
    * (k, id, s, e) with id unique per key; returns (k, peak, peak_at)
    * where peak_at is the earliest instant the peak is reached. −1 events
    * sort before +1 at equal time (half-open [s, e)), and id completes
    * the total order so every intermediate running value — and therefore
    * the max — is deterministic. One shuffle on k, per-group sort,
    * nothing quadratic (property-tested vs brute force in PropertySpec,
    * fixture-replayed in OpsSpec). */
  def sweepline(iv: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pts = iv.select(col("k"), col("id"), col("s").as("t"),
                        lit(1).as("delta"))
      .unionAll(iv.select(col("k"), col("id"), col("e").as("t"),
                          lit(-1).as("delta")))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("delta").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val r = pts.select(col("k"), col("t"), sum(col("delta")).over(w).as("run"))
    val p = r.groupBy("k").agg(max(col("run")).as("peak"))
    r.join(p, Seq("k")).filter(col("run") === col("peak"))
      .groupBy("k", "peak").agg(min(col("t")).as("peak_at"))
      .select("k", "peak", "peak_at")
  }
}
