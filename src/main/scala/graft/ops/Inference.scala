package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.{documents, events, part}

/** §2.11 (round 10) — statistical inference & fuzzy matching: the
  * hypothesis-test / model-diagnostic sheet a data-quality or
  * experimentation pipeline runs beside the existing t-test/chi-sq/drift
  * family, plus native fuzzy string matching.
  *
  * Shared determinism discipline (SURVEY §5.3): every test statistic is
  * computed from EXACT integer sufficient statistics (cent-/milli-
  * quantized BIGINT sums — associative, hence identical under Spark's
  * partial aggregation and DuckDB's scan order) and only the final
  * scalar formula runs in IEEE doubles, spelled identically on both
  * engines, then r6-rounded. Nothing here materializes per-row state on
  * the driver; each op is one or two shuffles over keyed aggregates.
  */
object Inference {

  private val Day = "CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)"

  /** q_text_jarowinkler's per-block skew cap (r11): a p_size block with
    * more members than this sub-blocks on the first name token, bounding
    * the block self-join at sub-block² instead of block². Mirrored
    * LITERALLY (`> 1000`) in the oracle CTE so both engines cap
    * identically — change both together. */
  private[graft] val jwBlockCap = 1000L

  val ops: Seq[OpDef] = Seq(

    /** Mann–Whitney U (Wilcoxon rank-sum) per day: purchase vs click
      * value distributions — the nonparametric two-sample test you reach
      * for when t-test normality is implausible (revenue-ish amounts are
      * heavy-tailed). Pooled ranking per day via one rank() window over
      * cent-quantized values; tie handling is the textbook average-rank,
      * carried EXACTLY as 2·avgrank = 2·rank + tiecount − 1 in BIGINT so
      * the rank-sum needs no fractional arithmetic. The tie-corrected
      * normal approximation z = (U₁ − n₁n₂/2) / √var with
      * var = (n₁n₂/12)·((N+1) − Σ(t³−t)/(N(N−1))) evaluates in doubles
      * from the five exact integers (r1x2, n₁, n₂, Σ(t³−t)) — identical
      * IEEE ops both engines, r6-rounded; the significance call compares
      * the ROUNDED z against 1.959964 so both engines gate on the same
      * value. At 100 TB the ranking is a per-day (partitioned) sort —
      * embarrassingly parallel across days, no global sort; the window
      * never leaves the day's partition. */
    OpDef(
      "q_agg_mwu",
      s"""WITH ev AS (
        |  SELECT $Day AS day, event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |rk AS (
        |  SELECT day, event_type, cents,
        |    CAST(rank() OVER (PARTITION BY day ORDER BY cents) AS BIGINT)
        |      AS rnk,
        |    CAST(count(*) OVER (PARTITION BY day, cents) AS BIGINT) AS c
        |  FROM ev),
        |g AS (
        |  SELECT day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |                  THEN 2 * rnk + c - 1 ELSE 0 END) AS BIGINT)
        |      AS r1x2,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n2
        |  FROM rk GROUP BY day),
        |t AS (
        |  SELECT day, CAST(sum(c * c * c - c) AS BIGINT) AS ties
        |  FROM (SELECT DISTINCT day, cents, c FROM rk) dv GROUP BY day),
        |v AS (
        |  SELECT g.day, g.n1, g.n2,
        |    CAST(g.r1x2 - g.n1 * (g.n1 + 1) AS DOUBLE) / 2.0 AS u1,
        |    CASE WHEN g.n1 = 0 OR g.n2 = 0 THEN NULL
        |         ELSE (g.n1 * 1.0 * g.n2 / 12.0)
        |              * ((g.n1 + g.n2 + 1.0)
        |                 - t.ties * 1.0
        |                   / ((g.n1 + g.n2) * 1.0 * (g.n1 + g.n2 - 1.0)))
        |    END AS varr
        |  FROM g JOIN t ON g.day = t.day),
        |z AS (
        |  SELECT day, n1, n2, u1,
        |    CASE WHEN varr IS NULL OR varr <= 0 THEN NULL
        |         ELSE floor(((u1 - n1 * 1.0 * n2 / 2.0) / sqrt(varr))
        |                    * 1000000.0 + 0.5) / 1000000.0
        |    END AS z
        |  FROM v)
        |SELECT day, n1, n2, u1, z, abs(z) > 1.959964 AS significant
        |FROM z ORDER BY day""".stripMargin
    ) { (s, d) =>
      val ev = events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(to_date(date_trunc("day", col("ts"))).as("day"),
                col("event_type"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("cents"))
      val wRank = Window.partitionBy("day").orderBy("cents")
      val wTie = Window.partitionBy("day", "cents")
      val rk = ev.select(col("day"), col("event_type"), col("cents"),
        rank().over(wRank).cast("long").as("rnk"),
        count(lit(1)).over(wTie).as("c"))
      val g = rk.groupBy("day").agg(
        sum(when(col("event_type") === "purchase",
                 lit(2L) * col("rnk") + col("c") - lit(1L)).otherwise(0L))
          .as("r1x2"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n1"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n2"))
      val t = rk.select("day", "cents", "c").distinct()
        .groupBy("day")
        .agg(sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
      val u1 = (col("r1x2") - col("n1") * (col("n1") + lit(1L)))
        .cast("double") / lit(2.0)
      val mu = col("n1") * lit(1.0) * col("n2") / lit(2.0)
      val nn = col("n1") + col("n2")
      // degenerate guards (one-sided day; all values tied → var 0): NULL
      // z instead of the ANSI divide-by-zero both engines would raise
      val variance = when(col("n1") === 0 || col("n2") === 0,
          lit(null).cast("double"))
        .otherwise((col("n1") * lit(1.0) * col("n2") / lit(12.0)) *
          ((nn + lit(1.0)) -
           col("ties") * lit(1.0) / (nn * lit(1.0) * (nn - lit(1.0)))))
      val z = when(variance.isNull || variance <= 0.0,
          lit(null).cast("double"))
        .otherwise(Det.r6((u1 - mu) / sqrt(variance)))
      g.join(t, Seq("day"))
        .select(col("day"), col("n1"), col("n2"), u1.as("u1"), z.as("z"))
        .withColumn("significant", abs(col("z")) > lit(1.959964))
        .orderBy("day")
    },

    /** Grouped OLS: per event type, regress the daily total value (in
      * dollars) on the epoch day — slope/intercept/R² per group, the
      * per-segment trend sheet behind every metrics dashboard (and the
      * parametric companion to q_events_theilsen's robust Sen slope).
      * Sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as
      * EXACT BIGINTs over (epoch-day, daily-cents) pairs — y stays in
      * cents through the sums, so the closed forms divide exact integers;
      * only the final slope/intercept/R² arithmetic is floating point,
      * spelled identically in the oracle. Two shuffles total (daily
      * rollup, then 5-group rollup); group count bounds the output.
      * Quantization headroom: Σy² ≤ days·(daily cents)² needs daily
      * revenue below ~½ trillion cents at BIGINT — rescale the quantum
      * per-domain beyond that (same rule as the t-test/CUPED family). */
    OpDef(
      "q_agg_regr",
      s"""WITH dly AS (
        |  SELECT event_type,
        |    CAST($Day - DATE '1970-01-01' AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM dly GROUP BY 1),
        |c AS (
        |  SELECT event_type, n, sx, sy, sxy, sxx, syy,
        |    CASE WHEN n * 1.0 * sxx - sx * 1.0 * sx = 0 THEN NULL
        |         ELSE (n * 1.0 * sxy - sx * 1.0 * sy)
        |              / (n * 1.0 * sxx - sx * 1.0 * sx)
        |    END AS slope_c
        |  FROM g)
        |SELECT event_type, n,
        |  floor((slope_c / 100.0) * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |  floor(((sy * 1.0 - slope_c * sx) / n / 100.0) * 1000000.0 + 0.5)
        |    / 1000000.0 AS intercept,
        |  CASE WHEN (n * 1.0 * sxx - sx * 1.0 * sx)
        |            * (n * 1.0 * syy - sy * 1.0 * sy) <= 0 THEN NULL
        |       ELSE floor(((n * 1.0 * sxy - sx * 1.0 * sy)
        |              * (n * 1.0 * sxy - sx * 1.0 * sy)
        |              / ((n * 1.0 * sxx - sx * 1.0 * sx)
        |                 * (n * 1.0 * syy - sy * 1.0 * sy)))
        |             * 1000000.0 + 0.5) / 1000000.0
        |  END AS r2
        |FROM c ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      val dly = events(s, d)
        .select(col("event_type"),
                datediff(to_date(date_trunc("day", col("ts"))),
                         lit("1970-01-01")).cast("long").as("x"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("cents"))
        .groupBy("event_type", "x")
        .agg(sum(col("cents")).as("y"))
      val g = dly.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val sNum = col("n") * lit(1.0) * col("sxy") -
        col("sx") * lit(1.0) * col("sy")
      val sDen = col("n") * lit(1.0) * col("sxx") -
        col("sx") * lit(1.0) * col("sx")
      val sDenY = col("n") * lit(1.0) * col("syy") -
        col("sy") * lit(1.0) * col("sy")
      // single-day group (zero x variance) → NULL slope/intercept;
      // constant-y group additionally → NULL r²
      val slopeC = when(sDen === 0.0, lit(null).cast("double"))
        .otherwise(sNum / sDen)
      g.withColumn("slope_c", slopeC)
        .select(col("event_type"), col("n"),
          Det.r6(col("slope_c") / lit(100.0)).as("slope"),
          Det.r6((col("sy") * lit(1.0) - col("slope_c") * col("sx")) /
                 col("n") / lit(100.0)).as("intercept"),
          when(sDen * sDenY <= 0.0, lit(null).cast("double"))
            .otherwise(Det.r6(sNum * sNum / (sDen * sDenY))).as("r2"))
        .orderBy("event_type")
    },

    /** One-way ANOVA across the five event types on cent-quantized
      * values: does ANY type's mean differ? — the k-group generalization
      * of q_agg_ttest, run before pairwise tests to control the error
      * budget. Per-group exact (n, Σv, Σv²) BIGINTs; the cross-group
      * reductions Σsᵢ²/nᵢ (the only non-integer term) are milli-quantized
      * to BIGINT PER GROUP before the outer sum, so the final SSB/SSW
      * assembly is again order-free exact arithmetic — summing raw
      * doubles across groups would be accumulation-order-dependent under
      * Spark's partial aggregation. F = (SSB/(k−1))/(SSW/(N−k)) in
      * dollars² (÷10⁴ from cents²), r6. One shuffle to 5 groups, then a
      * single-row reduce. */
    OpDef(
      "q_agg_anova",
      """WITH p AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vi
        |  FROM events),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(vi) AS BIGINT) AS sv,
        |    CAST(sum(vi * vi) AS BIGINT) AS sq
        |  FROM p GROUP BY 1),
        |q AS (
        |  SELECT event_type, n, sv, sq,
        |    CAST(floor((sv * 1.0 * sv / n) * 1000.0 + 0.5) AS BIGINT)
        |      AS cf_milli
        |  FROM g),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(sv) AS BIGINT) AS s, CAST(sum(sq) AS BIGINT) AS q,
        |    CAST(sum(cf_milli) AS BIGINT) AS cf
        |  FROM q)
        |SELECT k, n,
        |  floor(((cf / 1000.0 - s * 1.0 * s / n) / 10000.0)
        |        * 1000000.0 + 0.5) / 1000000.0 AS ssb,
        |  floor(((q * 1.0 - cf / 1000.0) / 10000.0) * 1000000.0 + 0.5)
        |    / 1000000.0 AS ssw,
        |  CASE WHEN k < 2 OR n <= k OR q * 1.0 - cf / 1000.0 = 0 THEN NULL
        |       ELSE floor((((cf / 1000.0 - s * 1.0 * s / n) / (k - 1.0))
        |              / ((q * 1.0 - cf / 1000.0) / (n * 1.0 - k)))
        |             * 1000000.0 + 0.5) / 1000000.0
        |  END AS f_stat
        |FROM tot""".stripMargin
    ) { (s, d) =>
      val g = events(s, d)
        .select(col("event_type"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("vi"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("vi")).as("sv"),
             sum(col("vi") * col("vi")).as("sq"))
      val q = g.withColumn("cf_milli",
        floor(col("sv") * lit(1.0) * col("sv") / col("n") * lit(1000.0) +
              lit(0.5)).cast("long"))
      val tot = q.agg(
        count(lit(1)).as("k"), sum(col("n")).as("n"),
        sum(col("sv")).as("s"), sum(col("sq")).as("q"),
        sum(col("cf_milli")).as("cf"))
      val ssbC = col("cf") / lit(1000.0) -
        col("s") * lit(1.0) * col("s") / col("n")
      val sswC = col("q") * lit(1.0) - col("cf") / lit(1000.0)
      // degenerate guards (one group; all rows identical within groups →
      // SSW 0): NULL F instead of an ANSI divide-by-zero
      tot.select(col("k"), col("n"),
        Det.r6(ssbC / lit(10000.0)).as("ssb"),
        Det.r6(sswC / lit(10000.0)).as("ssw"),
        when(col("k") < 2 || col("n") <= col("k") || sswC === 0.0,
             lit(null).cast("double"))
          .otherwise(Det.r6((ssbC / (col("k") - lit(1.0))) /
                            (sswC / (col("n") * lit(1.0) - col("k")))))
          .as("f_stat"))
    },

    /** Cohen's kappa between two independent document-quality gates
      * (length ≥ 300 chars vs whitespace-count ≥ 40), per language — the
      * inter-rater agreement metric every labeling/filter-ensemble
      * pipeline reports: raw agreement po corrected by the agreement pe
      * two gates with these marginals would reach by chance. Whitespace
      * count doubles as a script probe, so the per-language rows show the
      * length gate and the "wordiness" gate agreeing on space-delimited
      * languages and decoupling on zh. Pure 2×2 contingency integers per
      * language; kappa = (po − pe)/(1 − pe) in doubles from the four
      * BIGINT cells, r6, NULL when pe = 1 (degenerate marginals make
      * chance-correction undefined). Map-side gates, one 5-group shuffle. */
    OpDef(
      "q_eval_kappa",
      """WITH f AS (
        |  SELECT lang,
        |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ga,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) >= 40
        |         THEN 1 ELSE 0 END AS gb
        |  FROM documents),
        |c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(ga * gb) AS BIGINT) AS n11,
        |    CAST(sum(ga * (1 - gb)) AS BIGINT) AS n10,
        |    CAST(sum((1 - ga) * gb) AS BIGINT) AS n01,
        |    CAST(sum((1 - ga) * (1 - gb)) AS BIGINT) AS n00
        |  FROM f GROUP BY lang),
        |k AS (
        |  SELECT lang, n, n11, n10, n01, n00,
        |    (n11 + n00) * 1.0 / n AS po,
        |    ((n11 + n10) * 1.0 * (n11 + n01)
        |     + (n01 + n00) * 1.0 * (n10 + n00)) / (n * 1.0 * n) AS pe
        |  FROM c)
        |SELECT lang, n, n11, n10, n01, n00,
        |  floor(po * 1000000.0 + 0.5) / 1000000.0 AS po,
        |  floor(pe * 1000000.0 + 0.5) / 1000000.0 AS pe,
        |  CASE WHEN 1.0 - pe = 0 THEN NULL
        |       ELSE floor(((po - pe) / (1.0 - pe)) * 1000000.0 + 0.5)
        |            / 1000000.0 END AS kappa
        |FROM k ORDER BY lang""".stripMargin
    ) { (s, d) =>
      val f = documents(s, d).select(col("lang"),
        when(col("n_chars") >= 300, 1L).otherwise(0L).as("ga"),
        when(length(col("text")) - length(regexp_replace(col("text"),
               lit(" "), lit(""))) >= 40, 1L).otherwise(0L).as("gb"))
      val c = f.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(col("ga") * col("gb")).as("n11"),
        sum(col("ga") * (lit(1L) - col("gb"))).as("n10"),
        sum((lit(1L) - col("ga")) * col("gb")).as("n01"),
        sum((lit(1L) - col("ga")) * (lit(1L) - col("gb"))).as("n00"))
      val po = (col("n11") + col("n00")) * lit(1.0) / col("n")
      val pe = ((col("n11") + col("n10")) * lit(1.0) *
                (col("n11") + col("n01")) +
                (col("n01") + col("n00")) * lit(1.0) *
                (col("n10") + col("n00"))) /
               (col("n") * lit(1.0) * col("n"))
      c.withColumn("po_raw", po).withColumn("pe_raw", pe)
        .select(col("lang"), col("n"), col("n11"), col("n10"), col("n01"),
          col("n00"),
          Det.r6(col("po_raw")).as("po"), Det.r6(col("pe_raw")).as("pe"),
          when(lit(1.0) - col("pe_raw") === 0.0, lit(null).cast("double"))
            .otherwise(Det.r6((col("po_raw") - col("pe_raw")) /
                              (lit(1.0) - col("pe_raw")))).as("kappa"))
        .orderBy("lang")
    },

    /** Bollinger bands over the per-type daily revenue series: 20-day
      * trailing mean ± 2σ (population, window EXCLUDES the current day so
      * the band is a genuine one-step-ahead envelope), flagging each
      * day's close as above/below/inside — the classic volatility
      * breakout monitor, reused verbatim for metric anomaly paging. The
      * window carries exact BIGINT (Σ, Σ², n) in cents; mean/σ derive per
      * row as (20·Σ² − Σ²)/20² with one IEEE sqrt, and the breakout
      * COMPARES IN CENTS against the unrounded band (both engines
      * evaluate the identical doubles) while the reported band edges are
      * r6 dollars. Rows before a full 20-day history are dropped, not
      * emitted with a shrunken window. Partitioned by event_type — the
      * window never crosses the 5-way partition, so at 100 TB this is a
      * per-key linear pass over the daily rollup, not a global sort. */
    OpDef(
      "q_win_bollinger",
      s"""WITH dly AS (
        |  SELECT event_type, $Day AS day,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, y,
        |    CAST(sum(y) OVER win AS BIGINT) AS s,
        |    CAST(sum(y * y) OVER win AS BIGINT) AS sq,
        |    CAST(count(*) OVER win AS BIGINT) AS c
        |  FROM dly
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |b AS (
        |  SELECT event_type, day, y, s,
        |    sqrt((20.0 * sq - s * 1.0 * s) / 400.0) AS sd
        |  FROM w WHERE c = 20)
        |SELECT event_type, day, y / 100.0 AS value,
        |  floor((s / 20.0 / 100.0) * 1000000.0 + 0.5) / 1000000.0 AS mean,
        |  floor(((s / 20.0 + 2.0 * sd) / 100.0) * 1000000.0 + 0.5)
        |    / 1000000.0 AS upper,
        |  floor(((s / 20.0 - 2.0 * sd) / 100.0) * 1000000.0 + 0.5)
        |    / 1000000.0 AS lower,
        |  CASE WHEN y * 1.0 > s / 20.0 + 2.0 * sd THEN 'up'
        |       WHEN y * 1.0 < s / 20.0 - 2.0 * sd THEN 'down'
        |       ELSE 'in' END AS breakout
        |FROM b ORDER BY event_type, day""".stripMargin
    ) { (s, d) =>
      val dly = events(s, d)
        .select(col("event_type"),
                to_date(date_trunc("day", col("ts"))).as("day"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("cents"))
        .groupBy("event_type", "day")
        .agg(sum(col("cents")).as("y"))
      val win = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-20, -1)
      val w = dly.select(col("event_type"), col("day"), col("y"),
        sum(col("y")).over(win).as("s"),
        sum(col("y") * col("y")).over(win).as("sq"),
        count(lit(1)).over(win).as("c"))
        .filter(col("c") === 20)
      val sd = sqrt((lit(20.0) * col("sq") - col("s") * lit(1.0) * col("s"))
                    / lit(400.0))
      w.withColumn("sd", sd)
        .select(col("event_type"), col("day"),
          (col("y") / lit(100.0)).as("value"),
          Det.r6(col("s") / lit(20.0) / lit(100.0)).as("mean"),
          Det.r6((col("s") / lit(20.0) + lit(2.0) * col("sd")) / lit(100.0))
            .as("upper"),
          Det.r6((col("s") / lit(20.0) - lit(2.0) * col("sd")) / lit(100.0))
            .as("lower"),
          when(col("y") * lit(1.0) >
                 col("s") / lit(20.0) + lit(2.0) * col("sd"), "up")
            .when(col("y") * lit(1.0) <
                    col("s") / lit(20.0) - lit(2.0) * col("sd"), "down")
            .otherwise("in").as("breakout"))
        .orderBy("event_type", "day")
    },

    /** Kruskal–Wallis H per day across ALL five event types — the k-group
      * generalization of q_agg_mwu (rank ANOVA), the test run when
      * q_agg_anova's normality assumption is off the table. Same pooled
      * per-day ranking and exact 2·avgrank BIGINT carry as the U test;
      * the per-type rank-sum squares R²ᵢ/nᵢ (the only non-integer terms)
      * are milli-quantized to BIGINT PER TYPE before the cross-type sum —
      * the q_agg_anova accumulation-order trick — then
      * H = (12/(N(N+1)))·(Σ/4) − 3(N+1), tie-corrected by
      * 1 − ΣT/(N³−N), r6, with the significance call against the
      * χ²(4 df, 5%) = 9.487729 critical value on the ROUNDED h. Per-day
      * partitioned ranking, a 5-type rollup, then a per-day reduce —
      * nothing global. */
    OpDef(
      "q_agg_kruskal",
      s"""WITH ev AS (
        |  SELECT $Day AS day, event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |rk AS (
        |  SELECT day, event_type, cents,
        |    CAST(rank() OVER (PARTITION BY day ORDER BY cents) AS BIGINT)
        |      AS rnk,
        |    CAST(count(*) OVER (PARTITION BY day, cents) AS BIGINT) AS c
        |  FROM ev),
        |grp AS (
        |  SELECT day, event_type, CAST(count(*) AS BIGINT) AS ni,
        |    CAST(sum(2 * rnk + c - 1) AS BIGINT) AS rx2
        |  FROM rk GROUP BY day, event_type),
        |cf AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ni) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(rx2 * 1.0 * rx2 / ni * 1000.0 + 0.5)
        |                  AS BIGINT)) AS BIGINT) AS sq_milli
        |  FROM grp GROUP BY day),
        |t AS (
        |  SELECT day, CAST(sum(c * c * c - c) AS BIGINT) AS ties
        |  FROM (SELECT DISTINCT day, cents, c FROM rk) dv GROUP BY day),
        |h AS (
        |  SELECT cf.day, cf.k, cf.n,
        |    CASE WHEN cf.n < 2 OR t.ties = cf.n * cf.n * cf.n - cf.n
        |         THEN NULL
        |         ELSE floor((((12.0 / (cf.n * 1.0 * (cf.n + 1.0)))
        |                * (cf.sq_milli / 1000.0 / 4.0)
        |                - 3.0 * (cf.n + 1.0))
        |               / (1.0 - t.ties * 1.0
        |                        / (cf.n * 1.0 * cf.n * cf.n - cf.n)))
        |              * 1000000.0 + 0.5) / 1000000.0
        |    END AS h
        |  FROM cf JOIN t ON cf.day = t.day)
        |SELECT day, k, n, h, h > 9.487729 AS significant
        |FROM h ORDER BY day""".stripMargin
    ) { (s, d) =>
      val ev = events(s, d)
        .select(to_date(date_trunc("day", col("ts"))).as("day"),
                col("event_type"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("cents"))
      val wRank = Window.partitionBy("day").orderBy("cents")
      val wTie = Window.partitionBy("day", "cents")
      val rk = ev.select(col("day"), col("event_type"), col("cents"),
        rank().over(wRank).cast("long").as("rnk"),
        count(lit(1)).over(wTie).as("c"))
      val grp = rk.groupBy("day", "event_type").agg(
        count(lit(1)).as("ni"),
        sum(lit(2L) * col("rnk") + col("c") - lit(1L)).as("rx2"))
      val cf = grp.groupBy("day").agg(
        count(lit(1)).as("k"), sum(col("ni")).as("n"),
        sum(floor(col("rx2") * lit(1.0) * col("rx2") / col("ni") *
                  lit(1000.0) + lit(0.5)).cast("long")).as("sq_milli"))
      val t = rk.select("day", "cents", "c").distinct()
        .groupBy("day")
        .agg(sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
      val hRaw = (lit(12.0) / (col("n") * lit(1.0) * (col("n") + lit(1.0)))) *
        (col("sq_milli") / lit(1000.0) / lit(4.0)) -
        lit(3.0) * (col("n") + lit(1.0))
      // degenerate guards (singleton day; all values tied → the tie
      // correction zeroes out): NULL instead of an ANSI divide-by-zero
      val h = when(col("n") < 2 ||
          col("ties") === col("n") * col("n") * col("n") - col("n"),
          lit(null).cast("double"))
        .otherwise(Det.r6(hRaw / (lit(1.0) - col("ties") * lit(1.0) /
          (col("n") * lit(1.0) * col("n") * col("n") - col("n")))))
      cf.join(t, Seq("day"))
        .select(col("day"), col("k"), col("n"), h.as("h"))
        .withColumn("significant", col("h") > lit(9.487729))
        .orderBy("day")
    },

    /** Spearman rank correlation per event type between the daily event
      * COUNT and the daily total VALUE — "do busier days make more
      * money, monotonically?" — the robust companion to q_agg_corr's
      * Pearson (rank correlation is invariant to the heavy right tail
      * that drags a product-moment estimate around). Both series rank
      * within their type via the same exact 2·avgrank BIGINT carry (the
      * common ×2 scale cancels in the correlation in exact arithmetic,
      * and both engines run the identical IEEE assembly from identical
      * integers, so it cancels bit-for-bit here too); ρ is then Pearson
      * on the rank pairs from six exact BIGINT sums, r6. One daily
      * rollup shuffle, two within-type rank windows, a 5-row reduce. */
    OpDef(
      "q_agg_spearman",
      s"""WITH dly AS (
        |  SELECT event_type, $Day AS day,
        |    CAST(count(*) AS BIGINT) AS xc,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS yc
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type,
        |    CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY xc)
        |         + count(*) OVER (PARTITION BY event_type, xc) - 1
        |         AS BIGINT) AS a,
        |    CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY yc)
        |         + count(*) OVER (PARTITION BY event_type, yc) - 1
        |         AS BIGINT) AS b
        |  FROM dly),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
        |    CAST(sum(a * b) AS BIGINT) AS sab,
        |    CAST(sum(a * a) AS BIGINT) AS saa,
        |    CAST(sum(b * b) AS BIGINT) AS sbb
        |  FROM rk GROUP BY 1)
        |SELECT event_type, n,
        |  CASE WHEN (n * 1.0 * saa - sa * 1.0 * sa)
        |            * (n * 1.0 * sbb - sb * 1.0 * sb) <= 0 THEN NULL
        |       ELSE floor(((n * 1.0 * sab - sa * 1.0 * sb)
        |              / sqrt((n * 1.0 * saa - sa * 1.0 * sa)
        |                     * (n * 1.0 * sbb - sb * 1.0 * sb)))
        |             * 1000000.0 + 0.5) / 1000000.0
        |  END AS rho
        |FROM g ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      val dly = events(s, d)
        .select(col("event_type"),
                to_date(date_trunc("day", col("ts"))).as("day"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("cents"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("xc"), sum(col("cents")).as("yc"))
      def x2rank(v: String) =
        (lit(2L) * rank().over(Window.partitionBy("event_type").orderBy(v))
           .cast("long") +
         count(lit(1)).over(Window.partitionBy("event_type", v)) - lit(1L))
      val rk = dly.select(col("event_type"),
        x2rank("xc").as("a"), x2rank("yc").as("b"))
      val g = rk.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("a") * col("b")).as("sab"),
        sum(col("a") * col("a")).as("saa"),
        sum(col("b") * col("b")).as("sbb"))
      // a constant series (all ranks tied) zeroes a variance term: NULL
      // rho instead of 0/0
      val varProd = (col("n") * lit(1.0) * col("saa") -
                     col("sa") * lit(1.0) * col("sa")) *
                    (col("n") * lit(1.0) * col("sbb") -
                     col("sb") * lit(1.0) * col("sb"))
      g.select(col("event_type"), col("n"),
        when(varProd <= 0.0, lit(null).cast("double"))
          .otherwise(Det.r6((col("n") * lit(1.0) * col("sab") -
                             col("sa") * lit(1.0) * col("sb")) /
                            sqrt(varProd))).as("rho"))
        .orderBy("event_type")
    },

    /** Kendall's τ-b per event type between daily count and daily
      * revenue — the third leg of the correlation family (q_agg_corr's
      * Pearson, q_agg_spearman's ρ): concordant-minus-discordant pair
      * counting, the estimator whose ±1 bounds survive ANY monotone
      * transform and whose tie treatment (τ-b denominator) is exact
      * combinatorics. Pure integers end-to-end: C − D sums ±1 over the
      * calendar-bounded pair expansion (days², the q_win_mannkendall
      * shape — an equi-join on event_type with a day inequality, never a
      * corpus product), tie terms n₁ = Σt(t−1)/2 from per-value counts,
      * and one final sqrt over exact BIGINTs, r6. */
    OpDef(
      "q_agg_kendall",
      s"""WITH dly AS (
        |  SELECT event_type, $Day AS day,
        |    CAST(count(*) AS BIGINT) AS xc,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS yc
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    CAST(sum(CASE WHEN (a.xc - b.xc) * (a.yc - b.yc) > 0
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN (a.xc - b.xc) * (a.yc - b.yc) < 0
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM dly a JOIN dly b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |n AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM dly
        |  GROUP BY 1),
        |tx AS (
        |  SELECT event_type,
        |    CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n1
        |  FROM (SELECT event_type, xc, CAST(count(*) AS BIGINT) AS t
        |        FROM dly GROUP BY 1, 2) g GROUP BY 1),
        |ty AS (
        |  SELECT event_type,
        |    CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n2
        |  FROM (SELECT event_type, yc, CAST(count(*) AS BIGINT) AS t
        |        FROM dly GROUP BY 1, 2) g GROUP BY 1)
        |SELECT p.event_type, n.n, p.c, p.d,
        |  CASE WHEN (n.n * (n.n - 1) / 2 - tx.n1) * 1.0
        |            * (n.n * (n.n - 1) / 2 - ty.n2) <= 0 THEN NULL
        |       ELSE floor(((p.c - p.d) * 1.0
        |              / sqrt((n.n * (n.n - 1) / 2 - tx.n1) * 1.0
        |                     * (n.n * (n.n - 1) / 2 - ty.n2)))
        |             * 1000000.0 + 0.5) / 1000000.0
        |  END AS tau
        |FROM p
        |JOIN n ON p.event_type = n.event_type
        |JOIN tx ON p.event_type = tx.event_type
        |JOIN ty ON p.event_type = ty.event_type
        |ORDER BY p.event_type""".stripMargin
    ) { (s, d) =>
      val dly = events(s, d)
        .select(col("event_type"),
                to_date(date_trunc("day", col("ts"))).as("day"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("cents"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("xc"), sum(col("cents")).as("yc"))
      val a = dly.select(col("event_type"), col("day").as("da"),
                         col("xc").as("xa"), col("yc").as("ya"))
      val b = dly.select(col("event_type"), col("day").as("db"),
                         col("xc").as("xb"), col("yc").as("yb"))
      val p = a.join(b, Seq("event_type"))
        .filter(col("da") < col("db"))
        .groupBy("event_type")
        .agg(
          sum(when((col("xa") - col("xb")) * (col("ya") - col("yb")) > 0, 1L)
            .otherwise(0L)).as("c"),
          sum(when((col("xa") - col("xb")) * (col("ya") - col("yb")) < 0, 1L)
            .otherwise(0L)).as("d"))
      val n = dly.groupBy("event_type").agg(count(lit(1)).as("n"))
      def tieTerm(v: String, out: String) = dly
        .groupBy("event_type", v).agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - lit(1L)) / lit(2L)).cast("long")
          .as(out))
      val half = col("n") * (col("n") - lit(1L)) / lit(2L)
      // a fully-tied margin zeroes its denominator term: NULL tau
      val denProd = (half - col("n1")) * lit(1.0) * (half - col("n2"))
      p.join(n, Seq("event_type"))
        .join(tieTerm("xc", "n1"), Seq("event_type"))
        .join(tieTerm("yc", "n2"), Seq("event_type"))
        .select(col("event_type"), col("n"), col("c"), col("d"),
          when(denProd <= 0.0, lit(null).cast("double"))
            .otherwise(Det.r6((col("c") - col("d")) * lit(1.0) /
                              sqrt(denProd))).as("tau"))
        .orderBy("event_type")
    },

    /** Ljung–Box portmanteau test (h = 7 lags) on the daily total-revenue
      * series: "is what's left white noise?" — the residual-diagnostic
      * gate run after any forecast fit (the q_win_holt/holtwinters
      * family) and the formal version of eyeballing q_events_autocorr's
      * sheet. Exactness trick: center-and-scale by n WITHOUT leaving
      * integers — cᵗ = n·yₜ − Σy is an exact BIGINT multiple of the
      * centered value, and the n² factors cancel in ρ̂ₖ = Σcₜcₜ₋ₖ / Σcₜ²,
      * so numerator and denominator are exact integer sums (headroom:
      * Σ(cₜcₜ₋ₖ) needs n·(n·maxdev)² < 2⁶³ — rescale the cent quantum
      * past ~10⁹-cent daily deviations, the q_agg_regr rule). Each lag's
      * ρ̂ₖ²/(n−k) term evaluates in doubles from those integers and is
      * nano-quantized to BIGINT before the 7-term sum (order-proof),
      * then Q = n(n+2)·Σ, r6, with the χ²(7, 5%) = 14.06714 call on the
      * rounded q. One daily rollup, one broadcast of the two scalar
      * moments, seven window lags over ≤ n rows. */
    OpDef(
      "q_events_ljungbox", {
        val branches = (1 to 7).map { k =>
          s"""  SELECT $k AS k,
             |    CAST(sum(cv * cvk) AS BIGINT) AS num
             |  FROM (SELECT cv, lag(cv, $k) OVER (ORDER BY day) AS cvk
             |        FROM c)
             |  WHERE cvk IS NOT NULL""".stripMargin
        }.mkString("\n  UNION ALL\n")
        s"""WITH d AS (
           |  SELECT $Day AS day,
           |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
           |         AS BIGINT) AS y
           |  FROM events GROUP BY 1),
           |s AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(y) AS BIGINT) AS sv
           |  FROM d),
           |c AS (SELECT d.day, s.n * d.y - s.sv AS cv FROM d, s),
           |den AS (SELECT CAST(sum(cv * cv) AS BIGINT) AS s2 FROM c),
           |lags AS (
           |$branches),
           |terms AS (
           |  SELECT CAST(sum(CAST(CASE WHEN den.s2 = 0 OR s.n <= k
           |                       THEN NULL
           |                       ELSE floor((num * 1.0 * num)
           |                              / (den.s2 * 1.0 * den.s2)
           |                              / (s.n - k) * 1000000000.0 + 0.5)
           |                       END AS BIGINT)) AS BIGINT) AS tsum
           |  FROM lags, den, s),
           |q AS (
           |  SELECT s.n, CAST(7 AS BIGINT) AS h,
           |    CASE WHEN den.s2 = 0 THEN NULL
           |         ELSE floor((s.n * (s.n + 2.0)
           |                     * (terms.tsum / 1000000000.0))
           |              * 1000000.0 + 0.5) / 1000000.0
           |    END AS q_stat
           |  FROM s, terms, den)
           |SELECT n, h, q_stat, q_stat > 14.06714 AS significant
           |FROM q""".stripMargin
      }
    ) { (s, d) =>
      val daily = events(s, d)
        .select(to_date(date_trunc("day", col("ts"))).as("day"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("cents"))
        .groupBy("day").agg(sum(col("cents")).as("y"))
      val mom = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sv"))
      val c = daily.crossJoin(broadcast(mom))
        .select(col("day"), col("n"), (col("n") * col("y") - col("sv"))
          .as("cv"))
      val den = c.agg(sum(col("cv") * col("cv")).as("s2"))
      val w = Window.orderBy("day")
      val lags = (1 to 7).map { k =>
        c.select(col("cv"), lag(col("cv"), k).over(w).as("cvk"))
          .filter(col("cvk").isNotNull)
          .select(lit(k.toLong).as("k"), col("cv"), col("cvk"))
          .groupBy("k").agg(sum(col("cv") * col("cvk")).as("num"))
      }.reduce(_ unionAll _)
      // degenerate guards: a constant series zeroes s2, a series shorter
      // than the lag count zeroes (n − k) — NULL per-lag terms and a
      // NULL Q instead of an ANSI divide-by-zero
      val terms = lags.crossJoin(broadcast(den))
        .crossJoin(broadcast(mom.select(col("n"))))
        .select(when(col("s2") === 0L || col("n") <= col("k"),
                     lit(null).cast("long"))
          .otherwise(floor(col("num") * lit(1.0) * col("num") /
                           (col("s2") * lit(1.0) * col("s2")) /
                           (col("n") - col("k")) * lit(1000000000.0) +
                           lit(0.5)).cast("long")).as("t"))
        .agg(sum(col("t")).as("tsum"))
      mom.crossJoin(broadcast(terms)).crossJoin(broadcast(den))
        .select(col("n"), lit(7L).as("h"),
          when(col("s2") === 0L, lit(null).cast("double"))
            .otherwise(Det.r6(col("n") * (col("n") + lit(2.0)) *
                              (col("tsum") / lit(1000000000.0))))
            .as("q_stat"))
        .withColumn("significant", col("q_stat") > lit(14.06714))
    },

    /** Per-language token-distribution KL divergence vs the whole corpus —
      * the text-domain twin of q_dq_psi's numeric drift: how far does
      * each language's unigram distribution sit from the global mix? The
      * curation dial this feeds is domain/language REBALANCING (the same
      * quantity DSIR-style importance weights exponentiate). Support is
      * the global top-200 tokens plus one OTHER bucket keyed by bucket ID
      * (rank, 0 for OTHER — an integer join key, so no sentinel-token
      * collision), which (a) bounds every distribution at 201 cells
      * regardless of vocabulary, and (b) keeps q > 0 everywhere while
      * absent-in-lang cells contribute their correct 0. Each cell's
      * p·ln(p/q) evaluates in doubles from four exact BIGINT counts and
      * nano-quantizes BEFORE the per-lang sum (order-proof, ≤ 201
      * terms); KL r6. Token spelling is the corpus-wide space-split
      * convention (q_text_tokens). The only corpus-sized work is the
      * token explode + two bounded aggregations; the top-K table is a
      * vocab-bounded broadcast. */
    OpDef(
      "q_text_kl",
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |gl AS (SELECT tok, CAST(count(*) AS BIGINT) AS cg FROM toks
        |       GROUP BY tok),
        |top AS (
        |  SELECT tok, rn FROM (
        |    SELECT tok, row_number() OVER (ORDER BY cg DESC, tok ASC) AS rn
        |    FROM gl) r WHERE rn <= 200),
        |b AS (
        |  SELECT t.lang, COALESCE(top.rn, 0) AS bid
        |  FROM toks t LEFT JOIN top ON t.tok = top.tok),
        |lc AS (SELECT lang, bid, CAST(count(*) AS BIGINT) AS cl FROM b
        |       GROUP BY 1, 2),
        |lt AS (SELECT lang, CAST(sum(cl) AS BIGINT) AS tl FROM lc
        |       GROUP BY 1),
        |gc AS (SELECT bid, CAST(sum(cl) AS BIGINT) AS cg FROM lc
        |       GROUP BY 1),
        |gt AS (SELECT CAST(sum(cg) AS BIGINT) AS tg FROM gc),
        |terms AS (
        |  SELECT lc.lang,
        |    CAST(floor(((lc.cl * 1.0 / lt.tl)
        |                * ln((lc.cl * 1.0 / lt.tl)
        |                     / (gc.cg * 1.0 / gt.tg)))
        |               * 1000000000.0 + 0.5) AS BIGINT) AS t
        |  FROM lc
        |  JOIN lt ON lc.lang = lt.lang
        |  JOIN gc ON lc.bid = gc.bid, gt)
        |SELECT terms.lang, lt.tl AS n_tokens,
        |  floor((CAST(sum(terms.t) AS BIGINT) / 1000000000.0)
        |        * 1000000.0 + 0.5) / 1000000.0 AS kl
        |FROM terms JOIN lt ON terms.lang = lt.lang
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val toks = documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      val gl = toks.groupBy("tok").agg(count(lit(1)).as("cg"))
      val top = gl.select(col("tok"),
          row_number().over(Window.orderBy(col("cg").desc, col("tok").asc))
            .as("rn"))
        .filter(col("rn") <= 200)
      val b = toks.join(broadcast(top), Seq("tok"), "left")
        .select(col("lang"), coalesce(col("rn"), lit(0)).as("bid"))
      val lc = b.groupBy("lang", "bid").agg(count(lit(1)).as("cl"))
      val lt = lc.groupBy("lang").agg(sum(col("cl")).as("tl"))
      val gc = lc.groupBy("bid").agg(sum(col("cl")).as("cg"))
      val gt = gc.agg(sum(col("cg")).as("tg"))
      val p = col("cl") * lit(1.0) / col("tl")
      val q = col("cg") * lit(1.0) / col("tg")
      val terms = lc.join(lt, Seq("lang")).join(gc, Seq("bid"))
        .crossJoin(broadcast(gt))
        .select(col("lang"), col("tl"),
          floor(p * log(p / q) * lit(1000000000.0) + lit(0.5)).cast("long")
            .as("t"))
      terms.groupBy(col("lang"), col("tl").as("n_tokens"))
        .agg(Det.r6(sum(col("t")) / lit(1000000000.0)).as("kl"))
        .orderBy("lang")
    },

    /** Deterministic Poisson bootstrap CI for the mean purchase value —
      * the resampling-based uncertainty readout (the metric band a
      * dashboard draws when no closed form exists), in the shape that
      * actually distributes: each of 100 replicas weights every row by
      * an independent Poisson(1) draw (the classic streaming/online
      * bootstrap — no per-replica resample pass, one 100× map-side
      * explode with per-replica partial aggregation; at 100 TB this is
      * the bag-of-little-bootstraps layout). Determinism: the "draw" is
      * the corpus-wide md5 RNG (u = hex4/65536 — a rational both engines
      * compare exactly) pushed through the fixed Poisson(1) CDF
      * thresholds, replica means divide exact BIGINT sums, and the 95%
      * band is exact rank selection (3rd/98th of 100, ties by replica
      * id) — no interpolation, no float accumulation anywhere. */
    OpDef(
      "q_agg_bootstrap",
      """WITH p AS (
        |  SELECT event_id,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vi
        |  FROM events WHERE event_type = 'purchase'),
        |rep AS (SELECT CAST(r AS BIGINT) AS r FROM UNNEST(range(1, 101)) t(r)),
        |u AS (
        |  SELECT rep.r, p.vi,
        |    CAST('0x' || substring(md5('bs' || CAST(p.event_id AS VARCHAR)
        |                                || ':' || CAST(rep.r AS VARCHAR)),
        |                           1, 4) AS BIGINT) / 65536.0 AS u
        |  FROM p, rep),
        |pw AS (
        |  SELECT r, vi,
        |    CAST(CASE WHEN u < 0.367879 THEN 0 WHEN u < 0.735759 THEN 1
        |              WHEN u < 0.919699 THEN 2 WHEN u < 0.981012 THEN 3
        |              WHEN u < 0.996340 THEN 4 WHEN u < 0.999406 THEN 5
        |              ELSE 6 END AS BIGINT) AS w
        |  FROM u),
        |m AS (
        |  SELECT r, CAST(sum(w * vi) AS BIGINT) AS sv,
        |    CAST(sum(w) AS BIGINT) AS sw
        |  FROM pw GROUP BY r),
        |ranked AS (
        |  SELECT sv * 1.0 / sw / 100.0 AS mr,
        |    row_number() OVER (ORDER BY sv * 1.0 / sw / 100.0, r) AS rk
        |  FROM m WHERE sw > 0),
        |f AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vi) AS BIGINT) AS sv
        |  FROM p)
        |SELECT f.n,
        |  floor((f.sv * 1.0 / f.n / 100.0) * 1000000.0 + 0.5) / 1000000.0
        |    AS mean,
        |  floor((SELECT mr FROM ranked WHERE rk = 3) * 1000000.0 + 0.5)
        |    / 1000000.0 AS ci_lo,
        |  floor((SELECT mr FROM ranked WHERE rk = 98) * 1000000.0 + 0.5)
        |    / 1000000.0 AS ci_hi
        |FROM f""".stripMargin
    ) { (s, d) =>
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"),
                floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
                  .as("vi"))
      // fan the purchase rows out to the session's shuffle parallelism
      // before the 100× replica explode (r16, guide §2.5 input skew): the
      // fixture table is ONE file → one scan task, so the n×100 md5 draws
      // all ran single-threaded; the pre-explode shuffle moves only the
      // n small (event_id, vi) rows
      val u = p.repartition(s.sessionState.conf.numShufflePartitions)
        .select(col("vi"),
          explode(sequence(lit(1L), lit(100L))).as("r"), col("event_id"))
        .withColumn("u",
          expr("CAST(conv(substring(md5(concat('bs', " +
               "CAST(event_id AS STRING), ':', CAST(r AS STRING))), 1, 4), " +
               "16, 10) AS BIGINT)") / lit(65536.0))
      val pw = u.select(col("r"), col("vi"),
        when(col("u") < 0.367879, 0L).when(col("u") < 0.735759, 1L)
          .when(col("u") < 0.919699, 2L).when(col("u") < 0.981012, 3L)
          .when(col("u") < 0.996340, 4L).when(col("u") < 0.999406, 5L)
          .otherwise(6L).as("w"))
      val m = pw.groupBy("r")
        .agg(sum(col("w") * col("vi")).as("sv"), sum(col("w")).as("sw"))
      val mr = col("sv") * lit(1.0) / col("sw") / lit(100.0)
      // a replica whose Poisson weights all landed 0 (possible only on a
      // tiny corpus) has no mean: drop it rather than divide by zero
      val ranked = m.filter(col("sw") > 0L).select(mr.as("mr"),
        row_number().over(Window.orderBy(mr, col("r"))).as("rk"))
      val f = p.agg(count(lit(1)).as("n"), sum(col("vi")).as("sv"))
      // the CI bounds attach as ONE 1-row global aggregate (max-of-when
      // rank selection), not filtered-frame crossJoins: a degenerate
      // corpus where fewer than 98 replicas survive the sw>0 filter must
      // yield NULL bounds on a present row — exactly DuckDB's empty
      // scalar-subquery semantics — never drop the output row (ADVICE r10)
      val ci = ranked.agg(
        Det.r6(max(when(col("rk") === 3, col("mr")))).as("ci_lo"),
        Det.r6(max(when(col("rk") === 98, col("mr")))).as("ci_hi"))
      f.crossJoin(broadcast(ci))
        .select(col("n"),
          Det.r6(col("sv") * lit(1.0) / col("n") / lit(100.0)).as("mean"),
          col("ci_lo"), col("ci_hi"))
    },

    /** Difference-in-differences on the natural experiment grid (variant
      * = user parity as in q_agg_ttest, period = first half of January
      * vs the rest): the causal-inference workhorse for "did the change
      * move the metric beyond the ambient drift both arms share?". The
      * estimate is pure arithmetic on four exact cell moments
      * (cent-quantized BIGINT sums), the standard error the
      * unequal-variance four-cell composition (each cell's sample
      * variance from its exact (n, Σv, Σv²)), t = DiD/SE r6 — the same
      * exactness discipline as the t-test/CUPED family, one 4-cell
      * shuffle total. */
    OpDef(
      "q_events_did",
      s"""WITH p AS (
        |  SELECT user_id % 2 AS variant,
        |    CASE WHEN $Day < DATE '2024-01-16' THEN 0 ELSE 1 END AS period,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vi
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT variant, period, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(vi) AS BIGINT) AS sv, CAST(sum(vi * vi) AS BIGINT) AS sq
        |  FROM p GROUP BY 1, 2),
        |w AS (
        |  SELECT
        |    max(CASE WHEN variant = 0 AND period = 0 THEN n END) AS n00,
        |    max(CASE WHEN variant = 0 AND period = 1 THEN n END) AS n01,
        |    max(CASE WHEN variant = 1 AND period = 0 THEN n END) AS n10,
        |    max(CASE WHEN variant = 1 AND period = 1 THEN n END) AS n11,
        |    max(CASE WHEN variant = 0 AND period = 0 THEN sv END) AS s00,
        |    max(CASE WHEN variant = 0 AND period = 1 THEN sv END) AS s01,
        |    max(CASE WHEN variant = 1 AND period = 0 THEN sv END) AS s10,
        |    max(CASE WHEN variant = 1 AND period = 1 THEN sv END) AS s11,
        |    max(CASE WHEN variant = 0 AND period = 0 THEN sq END) AS q00,
        |    max(CASE WHEN variant = 0 AND period = 1 THEN sq END) AS q01,
        |    max(CASE WHEN variant = 1 AND period = 0 THEN sq END) AS q10,
        |    max(CASE WHEN variant = 1 AND period = 1 THEN sq END) AS q11
        |  FROM g),
        |e AS (
        |  SELECT n00, n01, n10, n11,
        |    ((s11 * 1.0 / n11 - s10 * 1.0 / n10)
        |     - (s01 * 1.0 / n01 - s00 * 1.0 / n00)) / 100.0 AS did,
        |    CASE WHEN n00 <= 1 OR n01 <= 1 OR n10 <= 1 OR n11 <= 1
        |         THEN NULL
        |         ELSE sqrt(((q00 - s00 * 1.0 * s00 / n00) / (n00 - 1)) / n00
        |              + ((q01 - s01 * 1.0 * s01 / n01) / (n01 - 1)) / n01
        |              + ((q10 - s10 * 1.0 * s10 / n10) / (n10 - 1)) / n10
        |              + ((q11 - s11 * 1.0 * s11 / n11) / (n11 - 1)) / n11)
        |           / 100.0
        |    END AS se
        |  FROM w)
        |SELECT n00, n01, n10, n11,
        |  floor(did * 1000000.0 + 0.5) / 1000000.0 AS did,
        |  floor(se * 1000000.0 + 0.5) / 1000000.0 AS se,
        |  CASE WHEN se = 0 THEN NULL
        |       ELSE floor((did / se) * 1000000.0 + 0.5) / 1000000.0
        |  END AS t_stat
        |FROM e""".stripMargin
    ) { (s, d) =>
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"),
          when(to_date(date_trunc("day", col("ts"))) <
                 lit("2024-01-16").cast("date"), 0L).otherwise(1L)
            .as("period"),
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("vi"))
      val g = p.groupBy("variant", "period")
        .agg(count(lit(1)).as("n"), sum(col("vi")).as("sv"),
             sum(col("vi") * col("vi")).as("sq"))
      def cell(v: Int, pd: Int, c: String, out: String) =
        max(when(col("variant") === v && col("period") === pd, col(c)))
          .as(out)
      val w = g.agg(
        cell(0, 0, "n", "n00"), cell(0, 1, "n", "n01"),
        cell(1, 0, "n", "n10"), cell(1, 1, "n", "n11"),
        cell(0, 0, "sv", "s00"), cell(0, 1, "sv", "s01"),
        cell(1, 0, "sv", "s10"), cell(1, 1, "sv", "s11"),
        cell(0, 0, "sq", "q00"), cell(0, 1, "sq", "q01"),
        cell(1, 0, "sq", "q10"), cell(1, 1, "sq", "q11"))
      def mean(sv: String, n: String) = col(sv) * lit(1.0) / col(n)
      def varTerm(q: String, sv: String, n: String) =
        ((col(q) - col(sv) * lit(1.0) * col(sv) / col(n)) /
         (col(n) - lit(1L))) / col(n)
      val did = ((mean("s11", "n11") - mean("s10", "n10")) -
                 (mean("s01", "n01") - mean("s00", "n00"))) / lit(100.0)
      // a 0/1-row cell makes its sample variance undefined: NULL SE
      // instead of an ANSI divide-by-zero
      val se = when(col("n00") <= 1 || col("n01") <= 1 ||
                    col("n10") <= 1 || col("n11") <= 1,
                    lit(null).cast("double"))
        .otherwise(sqrt(varTerm("q00", "s00", "n00") +
                        varTerm("q01", "s01", "n01") +
                        varTerm("q10", "s10", "n10") +
                        varTerm("q11", "s11", "n11")) / lit(100.0))
      w.withColumn("did_raw", did).withColumn("se_raw", se)
        .select(col("n00"), col("n01"), col("n10"), col("n11"),
          Det.r6(col("did_raw")).as("did"),
          Det.r6(col("se_raw")).as("se"),
          // degenerate zero-variance cells: the ratio is undefined (and
          // ANSI Spark would throw on the double division) → NULL
          when(col("se_raw") === 0.0, lit(null).cast("double"))
            .otherwise(Det.r6(col("did_raw") / col("se_raw")))
            .as("t_stat"))
    },

    /** Fuzzy part-name matching via the native [[graft.functions.JaroWinkler]]
      * expression: within (brand, size) blocks — the record-linkage
      * blocking that bounds candidate pairs by block geometry, never
      * |part|² — score every name pair and keep near-matches. The scorer
      * is a Catalyst expression with `doGenCode` (a direct static call
      * inside WholeStageCodegen; a Scala UDF here would break the span
      * and pay an encoder round-trip per pair). Oracle is DuckDB's own
      * `jaro_winkler_similarity` — same convention (p = 0.1, prefix ≤ 4,
      * boost only above jaro 0.7), both sides r6-rounded; the match
      * filter runs on the ROUNDED score so both engines admit identical
      * pair sets. NEAR matches only — identical names are excluded
      * (exact identity is q_dedup_exact's job; what survives is the
      * "old anvil"/"cold anvil" typo-distance linkage this scorer
      * exists for). Blocked by p_size (50 blocks); at 100 TB the block
      * self-join is the standard LSH-style bounded expansion — the op's
      * cost is Σ block², with the Σ ENFORCED (r11, verdict ask #3): a
      * block larger than [[jwBlockCap]] members gains a SECONDARY
      * blocking key (the first name token), so a skewed or adversarial
      * hot block sub-blocks instead of going quadratic — the dedup
      * family's hot-gram/band-cap discipline applied to record linkage.
      * The cap is mirrored in the oracle CTE (both engines compute the
      * identical window count and sub-key), so parity holds whether or
      * not the cap binds; on the TPC-H fixtures (~400 parts per size at
      * sf0.1) it is inert. Cross-first-token matches inside an over-cap
      * block are the documented loss, same trade as every blocking key;
      * HostileCorpusSpec pins the single-hot-block behavior. */
    OpDef(
      "q_text_jarowinkler",
      """WITH bl AS (
        |  SELECT p_partkey, p_name, p_size,
        |    CASE WHEN count(*) OVER (PARTITION BY p_size) > 1000
        |         THEN split_part(p_name, ' ', 1) ELSE '' END AS sub
        |  FROM part),
        |pr AS (
        |  SELECT a.p_partkey AS p1, b.p_partkey AS p2,
        |    a.p_name AS name1, b.p_name AS name2,
        |    floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000.0
        |          + 0.5) / 1000000.0 AS jw
        |  FROM bl a JOIN bl b
        |    ON a.p_size = b.p_size AND a.sub = b.sub
        |   AND a.p_partkey < b.p_partkey
        |   AND a.p_name <> b.p_name)
        |SELECT p1, p2, name1, name2, jw
        |FROM pr WHERE jw >= 0.9
        |ORDER BY jw DESC, p1, p2""".stripMargin
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val p0 = part(s, d).select(col("p_partkey"), col("p_name"),
                                 col("p_size"))
      // per-block member counts attach via a broadcast (bounded by the
      // block-key cardinality — the same planner-metadata scale as any
      // format's file stats); over-cap blocks get the secondary key
      val counts = p0.groupBy("p_size").agg(count(lit(1)).as("bn"))
      val p = p0.join(broadcast(counts), Seq("p_size"))
        .withColumn("sub",
          when(col("bn") > lit(jwBlockCap),
               split_part(col("p_name"), lit(" "), lit(1)))
            .otherwise(lit("")))
      // fan the STREAM side out to the session's shuffle parallelism
      // (r16): the scoring loop emits Σ block² pairs — orders of
      // magnitude more work than input rows — so sizing its task count
      // from the input bytes (one small file = ONE task; measured: the
      // whole 3.9M-pair JW loop ran single-threaded, 2.4 s of a 2.7 s
      // plan) starves it at any scale where the input underestimates
      // the blow-up. Round-robin repartition costs one tiny shuffle of
      // the dimension rows.
      val fan = s.sessionState.conf.numShufflePartitions
      val a = p.repartition(fan)
        .select(col("p_partkey").as("p1"), col("p_name").as("name1"),
                       col("p_size").as("s1"), col("sub").as("sub1"))
      val b = p.select(col("p_partkey").as("p2"), col("p_name").as("name2"),
                       col("p_size").as("s2"), col("sub").as("sub2"))
      a.join(b, col("s1") === col("s2") && col("sub1") === col("sub2") &&
               col("p1") < col("p2") &&
               col("name1") =!= col("name2"))
        .withColumn("jw", Det.r6(expr("graft_jaro_winkler(name1, name2)")))
        .filter(col("jw") >= 0.9)
        .select(col("p1"), col("p2"), col("name1"), col("name2"), col("jw"))
        .orderBy(col("jw").desc, col("p1"), col("p2"))
    }
  )
}
