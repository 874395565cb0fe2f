package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders

/** §2.4 — aggregations. Spark plans partial (map-side) + final
  * (post-shuffle) HashAggregateExec automatically, so at 100 TB the shuffle
  * carries only per-group partial states, never raw rows. Rollup/cube expand
  * to grouping sets before the same partial/final pipeline.
  */
object Aggregates {
  import Tables._

  /** Discount-weighted average price: SUM(price*w)/SUM(w) as a typed
    * Aggregator (q_agg_udaf). Buffer is a pair of running sums → partial
    * aggregation and merge work across partitions like any built-in. */
  private case class WAvgBuf(var num: Double, var den: Double)
  private object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
    def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf = {
      b.num += a._1 * a._2; b.den += a._2; b
    }
    def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf = {
      x.num += y.num; x.den += y.den; x
    }
    def finish(r: WAvgBuf): Double = if (r.den == 0.0) 0.0 else r.num / r.den
    def bufferEncoder = Encoders.product[WAvgBuf]
    def outputEncoder = Encoders.scalaDouble
  }

  val ops: Seq[OpDef] = Seq(

    // ----- q_agg_basic: TPC-H Q1-style pricing summary (the flagship) -----
    OpDef(
      "q_agg_basic",
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        |  floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS sum_base_price,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 AS sum_disc_price,
        |  floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        |  floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Det.r4(sum(col("l_quantity"))).as("sum_qty"),
          Det.r4(sum(col("l_extendedprice"))).as("sum_base_price"),
          Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price"),
          Det.r4(avg(col("l_quantity"))).as("avg_qty"),
          Det.r4(avg(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc_nulls_last,
                 col("l_linestatus").asc_nulls_last)
    },

    OpDef(
      "q_agg_distinct",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")
    },

    OpDef(
      "q_agg_filter",
      """SELECT o_orderpriority,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_all"),
             count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
             count(when(col("o_totalprice") > 200000, 1)).as("n_big"))
        .orderBy("o_orderpriority")
    },

    OpDef(
      "q_agg_rollup",
      """SELECT r_name, n_name, count(*) AS n_supp,
        |       floor((sum(s_acctbal)) * 10000.0 + 0.5) / 10000.0 AS total_bal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // SQL path: the DataFrame rollup over this join plan trips Spark's
      // ambiguous-self-join detector when re-resolving the grouping columns
      val v = Views.reg(supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "s_acctbal"), "rollup_src")
      s.sql(
        s"""SELECT r_name, n_name, count(*) AS n_supp,
           |       floor((sum(s_acctbal)) * 1e4 + 0.5) / 1e4 AS total_bal
           |FROM $v
           |GROUP BY ROLLUP (r_name, n_name)
           |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    },

    OpDef(
      "q_agg_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       floor((sum(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
             Det.r4(sum(col("o_totalprice"))).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)
    },

    OpDef(
      "q_agg_gsets",
      """SELECT r_name, n_name,
        |       CAST(grouping(r_name) AS INTEGER) AS g_r,
        |       CAST(grouping(n_name) AS INTEGER) AS g_n,
        |       count(*) AS n
        |FROM nation
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val v = Views.reg(nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey")),
        "gsets_src")
      s.sql(
        s"""SELECT r_name, n_name,
           |       CAST(grouping(r_name) AS INT) AS g_r,
           |       CAST(grouping(n_name) AS INT) AS g_n,
           |       count(*) AS n
           |FROM $v
           |GROUP BY GROUPING SETS ((r_name), (n_name), ())
           |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    },

    OpDef(
      "q_agg_stats",
      """SELECT o_orderstatus,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  floor((avg(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        |  floor((stddev_samp(o_totalprice)) * 100.0 + 0.5) / 100.0 AS sd_price,
        |  floor((var_samp(o_totalprice) / 1000000.0) * 100.0 + 0.5) / 100.0 AS var_price_m
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(min(col("o_totalprice")).as("min_price"),
             max(col("o_totalprice")).as("max_price"),
             Det.r4(avg(col("o_totalprice"))).as("avg_price"),
             Det.r2(stddev_samp(col("o_totalprice"))).as("sd_price"),
             Det.r2(var_samp(col("o_totalprice")) / lit(1000000.0)).as("var_price_m"))
        .orderBy("o_orderstatus")
    },

    OpDef(
      "q_agg_collect",
      """SELECT r_name, array_to_string(list_sort(list(n_name)), ',') AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin
    ) { (s, d) =>
      // collect_list is the exercise; the projection serializes the sorted
      // list to a scalar string (oracle-checked outputs must be scalar-only)
      nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy("r_name")
    },

    // Approximate distinct (HLL++). No oracle: DuckDB's approx sketch
    // differs; a ScalaTest asserts tolerance vs the exact count instead.
    OpDef.noOracle("q_agg_hll") { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
        .orderBy("l_returnflag")
    },

    OpDef(
      "q_agg_udaf",
      """SELECT l_returnflag,
        |  floor((sum(l_extendedprice * l_quantity) / sum(l_quantity)) * 10000.0 + 0.5) / 10000.0
        |    AS qty_weighted_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val wavg = udaf(WeightedAvg)
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(Det.r4(wavg(col("l_extendedprice"), col("l_quantity")))
               .as("qty_weighted_price"))
        .orderBy("l_returnflag")
    },

    // bitwise aggregates (AND/OR/XOR fold over a group) — bitmap-style
    // audit ops; plain hash aggregation, map-side partial like any
    // algebraic agg, so the shuffle moves one row per (flag, partition)
    OpDef(
      "q_agg_bitagg",
      """SELECT l_returnflag,
        |  bit_and(l_orderkey) AS and_ok,
        |  bit_or(l_partkey)   AS or_pk,
        |  bit_xor(l_suppkey)  AS xor_sk,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(bit_and(col("l_orderkey")).as("and_ok"),
             bit_or(col("l_partkey")).as("or_pk"),
             bit_xor(col("l_suppkey")).as("xor_sk"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // geometric mean via exp(avg(ln x)) — the right average for
    // multiplicative quantities (growth rates, ratios); spelled as the
    // same log-space composition in both engines, defined only over the
    // strictly positive domain (l_quantity >= 1 in the fixture, guarded
    // anyway so degenerate data errors neither engine)
    OpDef(
      "q_agg_geomean",
      """SELECT l_returnflag,
        |  floor((exp(avg(ln(l_quantity)))) * 10000.0 + 0.5) / 10000.0
        |    AS geo_qty,
        |  floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS arith_qty,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_quantity > 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") > 0)
        .groupBy("l_returnflag")
        .agg(Det.r4(exp(avg(log(col("l_quantity"))))).as("geo_qty"),
             Det.r4(avg(col("l_quantity"))).as("arith_qty"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // distribution shape in ONE pass: skewness and excess kurtosis from
    // raw power sums (m-th central moments expanded into E[x^k]) — the
    // spelling both engines execute identically, where the native
    // skewness()/kurtosis() builtins disagree cross-engine on
    // sample-vs-population correction. Prices are pre-scaled by 1e-5
    // (shape stats are scale-invariant) so the x⁴ sums stay O(1) and the
    // central-moment cancellation keeps ~12 clean digits. Map-side
    // partial like any algebraic aggregate.
    OpDef(
      "q_agg_moments",
      """WITH s AS (
        |  SELECT l_returnflag AS flag,
        |    avg(l_extendedprice / 100000.0) AS mu,
        |    avg(pow(l_extendedprice / 100000.0, 2.0)) AS s2,
        |    avg(pow(l_extendedprice / 100000.0, 3.0)) AS s3,
        |    avg(pow(l_extendedprice / 100000.0, 4.0)) AS s4
        |  FROM lineitem GROUP BY 1)
        |SELECT flag,
        |  CASE WHEN s2 - mu*mu > 0 THEN
        |    floor(((s3 - 3*mu*s2 + 2*mu*mu*mu)
        |           / pow(s2 - mu*mu, 1.5)) * 10000.0 + 0.5) / 10000.0 END AS skew,
        |  CASE WHEN s2 - mu*mu > 0 THEN
        |    floor(((s4 - 4*mu*s3 + 6*mu*mu*s2 - 3*mu*mu*mu*mu)
        |           / pow(s2 - mu*mu, 2.0) - 3.0) * 10000.0 + 0.5) / 10000.0 END
        |    AS kurt_excess
        |FROM s
        |ORDER BY flag""".stripMargin
    ) { (s, d) =>
      val x = col("l_extendedprice") / lit(100000.0)
      val (mu, s2, s3, s4) = (col("mu"), col("s2"), col("s3"), col("s4"))
      lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(avg(x).as("mu"), avg(pow(x, 2.0)).as("s2"),
             avg(pow(x, 3.0)).as("s3"), avg(pow(x, 4.0)).as("s4"))
        .select(col("flag"),
                // zero-variance guard: a constant-valued group yields 0/0,
                // where Spark gives NULL but DuckDB gives IEEE NaN (which
                // sorts GREATER) — NULL-out on BOTH sides like the sibling
                // division guards in q_events_anomaly / q_text_zipf
                when(s2 - mu * mu > 0,
                     Det.r4((s3 - lit(3) * mu * s2 + lit(2) * mu * mu * mu)
                            / pow(s2 - mu * mu, 1.5))).as("skew"),
                when(s2 - mu * mu > 0,
                     Det.r4((s4 - lit(4) * mu * s3 + lit(6) * mu * mu * s2
                             - lit(3) * mu * mu * mu * mu)
                            / pow(s2 - mu * mu, 2.0) - lit(3.0)))
                  .as("kurt_excess"))
        .orderBy("flag")
    },

    // mergeable HLL sketches (DataSketches, Spark 4 built-ins): partial
    // sketches per sub-group union-merged up to the parent group — THE
    // 100 TB incremental pattern: persist per-shard/per-day sketch bytes,
    // re-estimate any rollup without rescanning the corpus. The op proves
    // merge correctness by computing each flag's distinct-part estimate
    // both directly and via union of per-(flag,status) partials — the
    // sketch algebra makes them identical. No DuckDB oracle (sketch
    // binaries are engine-specific); ApproxSpec pins direct == merged and
    // ±5% of exact.
    OpDef.noOracle("q_agg_hll_sketch") { (s, d) =>
      val li = lineitem(s, d)
      val sub = li.groupBy("l_returnflag", "l_linestatus")
        .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
      val merged = sub.groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")
               .as("est_merged"))
      val direct = li.groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))")
               .as("est_direct"))
      direct.join(merged, Seq("l_returnflag"))
        .orderBy("l_returnflag")
    },

    // grouping()/grouping_id() over a rollup: lets a consumer tell "NULL
    // because subtotal row" from "NULL because the data is NULL" — both
    // engines number grouping_id the same way ((g1<<1)|g2 for two cols).
    // Spark's grouping() is TINYINT; cast to BIGINT on both sides.
    OpDef(
      "q_agg_grouping",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
        |    AS gid,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
        |         l_linestatus NULLS FIRST""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
             grouping(col("l_linestatus")).cast("long").as("g_status"),
             grouping_id().cast("long").as("gid"),
             count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"),
                col("g_status"), col("gid"), col("n"))
        .orderBy(col("g_flag"), col("g_status"),
                 col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)
    },

    /** Robust per-group outlier stats: exact median, MAD (median absolute
      * deviation), and the count of |x − med| > 3·MAD outliers — the
      * robust-z-score screen a data-quality pass runs where mean/stddev
      * would be dragged by the very outliers it hunts.
      *
      * Two aggregation rounds are inherent (the deviation needs the
      * median first); the 3-row median table broadcasts back onto
      * lineitem. Determinism: the median/MAD are r4-rounded BEFORE the
      * dependent arithmetic, so the deviation column and the 3·MAD
      * threshold are identical IEEE doubles on both engines and the
      * outlier comparison can never straddle a rounding boundary. Spark's
      * exact `percentile` and DuckDB's `quantile_cont` both
      * linear-interpolate at p·(n−1).
      *
      * Scale: exact percentile buffers each group's values — the honest
      * cost of exact medians; the 100 TB operating point is the registry
      * twin q_agg_mad_approx (GK-sketch approx_percentile, fixed-size
      * state, error-enveloped in ApproxSpec) with everything else
      * unchanged. */
    OpDef(
      "q_agg_mad",
      """WITH med AS (
        |  SELECT l_returnflag,
        |    floor(quantile_cont(l_extendedprice, 0.5) * 10000.0 + 0.5)
        |      / 10000.0 AS med
        |  FROM lineitem GROUP BY l_returnflag),
        |dev AS (
        |  SELECT l.l_returnflag, m.med,
        |    abs(l.l_extendedprice - m.med) AS dev
        |  FROM lineitem l JOIN med m USING (l_returnflag)),
        |mad AS (
        |  SELECT l_returnflag, med,
        |    floor(quantile_cont(dev, 0.5) * 10000.0 + 0.5) / 10000.0 AS mad
        |  FROM dev GROUP BY l_returnflag, med)
        |SELECT d.l_returnflag, count(*) AS n, m.med, m.mad,
        |  CAST(count(*) FILTER (WHERE d.dev > 3.0 * m.mad) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad m
        |  ON d.l_returnflag = m.l_returnflag
        |GROUP BY d.l_returnflag, m.med, m.mad
        |ORDER BY d.l_returnflag""".stripMargin
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val li = lineitem(s, d)
      // graft_exact_pct ≡ percentile bit-for-bit (same sort + interpolation)
      // minus the boxed value→count map — r16: the two exact-percentile
      // aggs were ~80% of this query's cost, all of it boxing/hashing
      val med = li.groupBy("l_returnflag")
        .agg(Det.r4(expr("graft_exact_pct(l_extendedprice, 0.5)")).as("med"))
      val dev = li.join(broadcast(med), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("med"),
                abs(col("l_extendedprice") - col("med")).as("dev"))
      val mad = dev.groupBy("l_returnflag", "med")
        .agg(Det.r4(expr("graft_exact_pct(dev, 0.5)")).as("mad"))
      dev.join(broadcast(mad.drop("med")), Seq("l_returnflag"))
        .groupBy("l_returnflag", "med", "mad")
        .agg(count(lit(1)).as("n"),
             count(when(col("dev") > lit(3.0) * col("mad"), lit(1)))
               .as("n_outliers"))
        .select("l_returnflag", "n", "med", "mad", "n_outliers")
        .orderBy("l_returnflag")
    },

    /** Equal-depth (decile) histogram — the feature-binning twin of the
      * fixed-width q_agg_histogram. NOT an ntile window: a global ntile
      * is a corpus-wide total sort through effectively one task. Instead,
      * the 9 decile boundaries come from ONE exact-percentile aggregate
      * (1-row frame, broadcast), and bin assignment is a map-only
      * count-of-boundaries-below per row — the shape that scales, since
      * the sort is replaced by a bounded agg + scan. The 100 TB operating
      * point is the registry twin q_agg_eqdepth_approx (approx_percentile
      * boundaries, error-enveloped in ApproxSpec), everything else
      * unchanged.
      *
      * Determinism: boundaries are r4-rounded before the comparison, so
      * both engines count `price > boundary` on identical doubles; bin
      * populations then differ from n/10 only by genuine ties. */
    OpDef(
      "q_agg_eqdepth",
      """WITH b AS (
        |  SELECT list_transform(
        |    quantile_cont(l_extendedprice,
        |      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    q -> floor(q * 10000.0 + 0.5) / 10000.0) AS bs
        |  FROM lineitem),
        |binned AS (
        |  SELECT CAST(len(list_filter(b.bs, x -> l.l_extendedprice > x))
        |              AS BIGINT) AS bin,
        |         l.l_extendedprice AS price
        |  FROM lineitem l, b)
        |SELECT bin, count(*) AS n,
        |  min(price) AS mn, max(price) AS mx,
        |  floor((avg(price)) * 10000.0 + 0.5) / 10000.0 AS avg_price
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val li = lineitem(s, d)
      // graft_exact_pct (r16): the single-task boundary aggregate was
      // 2.85 s of OpenHashMap boxing at sf0.1; the primitive buffer
      // computes the identical nine boundaries in one sort
      val b = li.agg(transform(
        expr("graft_exact_pct(l_extendedprice, " +
             "array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D, 0.9D))"),
        q => Det.r4(q)).as("bs"))
      li.crossJoin(broadcast(b))
        .select(size(filter(col("bs"), x => col("l_extendedprice") > x))
                  .cast("long").as("bin"),
                col("l_extendedprice").as("price"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), min(col("price")).as("mn"),
             max(col("price")).as("mx"),
             Det.r4(avg(col("price"))).as("avg_price"))
        .orderBy("bin")
    },

    /** The designated 100 TB twin of q_agg_mad: identical two-round
      * shape with both exact percentiles swapped for Spark's GK-sketch
      * `approx_percentile` at accuracy 10000 — per-group state is a
      * fixed-size sketch instead of a buffered value list, so the
      * aggregate map-side-combines and never spills with group size.
      * No-oracle (the sketch's picked-from-data medians are
      * engine-specific); ApproxSpec pins the med/mad/outlier envelopes
      * against the exact form. */
    OpDef.noOracle("q_agg_mad_approx") { (s, d) =>
      val li = lineitem(s, d)
      val med = li.groupBy("l_returnflag")
        .agg(Det.r4(expr("approx_percentile(l_extendedprice, 0.5, 10000)"))
               .as("med"))
      val dev = li.join(broadcast(med), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("med"),
                abs(col("l_extendedprice") - col("med")).as("dev"))
      val mad = dev.groupBy("l_returnflag", "med")
        .agg(Det.r4(expr("approx_percentile(dev, 0.5, 10000)")).as("mad"))
      dev.join(broadcast(mad.drop("med")), Seq("l_returnflag"))
        .groupBy("l_returnflag", "med", "mad")
        .agg(count(lit(1)).as("n"),
             count(when(col("dev") > lit(3.0) * col("mad"), lit(1)))
               .as("n_outliers"))
        .select("l_returnflag", "n", "med", "mad", "n_outliers")
        .orderBy("l_returnflag")
    },

    /** The designated 100 TB twin of q_agg_eqdepth: the 9 decile
      * boundaries come from one `approx_percentile` sketch (bounded
      * state at any corpus size) and bin assignment stays the map-only
      * boundaries-below count. No-oracle; ApproxSpec pins each decile's
      * population against the exact form's. */
    OpDef.noOracle("q_agg_eqdepth_approx") { (s, d) =>
      val li = lineitem(s, d)
      val b = li.agg(transform(
        expr("approx_percentile(l_extendedprice, " +
             "array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9), 10000)"),
        q => Det.r4(q)).as("bs"))
      li.crossJoin(broadcast(b))
        .select(size(filter(col("bs"), x => col("l_extendedprice") > x))
                  .cast("long").as("bin"),
                col("l_extendedprice").as("price"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), min(col("price")).as("mn"),
             max(col("price")).as("mx"),
             Det.r4(avg(col("price"))).as("avg_price"))
        .orderBy("bin")
    },

    /** Weighted mean — revenue per unit by brand: sum(price·qty)/sum(qty)
      * against the naive avg of per-line unit prices, the classic
      * aggregation-bias contrast. Both moments accumulate as exact BIGINTs
      * (prices pre-quantized to cents, quantities integral by fixture
      * domain) so accumulation order cannot perturb the result; one
      * map-side-combined aggregation at any scale. */
    OpDef(
      "q_agg_weighted",
      """WITH l AS (
        |  SELECT p.p_brand,
        |    CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
        |    CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS qty
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT p_brand,
        |  CAST(sum(qty) AS BIGINT) AS units,
        |  floor((sum(cents) / (100.0 * count(*))) * 10000.0 + 0.5) / 10000.0
        |    AS naive_avg_price,
        |  floor((sum(cents * qty) / (100.0 * sum(qty))) * 10000.0 + 0.5)
        |    / 10000.0 AS weighted_unit_price
        |FROM l GROUP BY p_brand ORDER BY p_brand""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
                floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
                  .cast("long").as("cents"),
                floor(col("l_quantity") + lit(0.5)).cast("long").as("qty"))
        .groupBy("p_brand")
        .agg(sum(col("qty")).cast("long").as("units"),
             Det.r4(sum(col("cents")) / (lit(100.0) * count(lit(1))))
               .as("naive_avg_price"),
             Det.r4(sum(col("cents") * col("qty"))
                      / (lit(100.0) * sum(col("qty"))))
               .as("weighted_unit_price"))
        .orderBy("p_brand")
    }
  )
}
