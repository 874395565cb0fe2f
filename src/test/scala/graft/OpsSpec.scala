package graft

import graft.SparkEntry.{queries, oracleSql, registry}
import org.apache.spark.sql.functions._

/** Registry invariants + golden/property checks on sf0.001 (SURVEY §5.2). */
class OpsSpec extends SparkTestBase {

  test("registry: names unique, every oracle key is declared") {
    assert(registry.map(_.name).distinct.size == registry.size)
    assert(oracleSql.keySet.subsetOf(queries.keySet))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and is non-degenerate on sf0.001") {
    // every op must at least produce a schema and (for this fixture) rows;
    // queries whose filters may legitimately select zero rows are exempted
    val mayBeEmpty = Set("q_join_full", "q_join_anti", "q_intersect", "q_except",
                         "q_dedup_simhash", "q_dedup_lsh", "q_dedup_lsh_fast",
                         "q_sim_cosine_dup",
                         "q_sim_cosine_dup_lsh", "q_dedup_semantic_lsh",
                         "q_sim_cosine_dup_srp")
    queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows on sf0.001")
    }
  }

  test("q_agg_basic matches a hand-computed slice") {
    val li = graft.ops.Tables.lineitem(spark, sf)
    val expected = li.filter(col("l_returnflag") === "A").count()
    val got = queries("q_agg_basic")(spark, sf)
      .filter(col("l_returnflag") === "A")
      .agg(sum("count_order")).collect().head.getLong(0)
    assert(got == expected)
  }

  test("pagerank conserves rank mass and concentrates it on supplier hubs") {
    val pr = queries("q_graph_pagerank")(spark, sf).collect()
    // integer micro-unit recurrence: each of the 6 steps loses at most
    // 0.5e-6 per node to div-rounding, so total mass stays within
    // nodes·steps·1e-6 of 1.0
    val total = pr.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < pr.length * 6 * 1e-6 + 1e-4,
      s"rank mass drifted: $total over ${pr.length} nodes")
    // the fixture has ~15× fewer suppliers than customers, so the
    // symmetrized purchase graph concentrates rank on the supplier side
    val (supp, cust) = pr.partition(_.getString(0).startsWith("s"))
    assert(supp.nonEmpty && cust.nonEmpty)
    val avgS = supp.map(_.getDouble(1)).sum / supp.length
    val avgC = cust.map(_.getDouble(1)).sum / cust.length
    assert(avgS > 2 * avgC,
      f"supplier hubs should out-rank customers: s=$avgS%.6f c=$avgC%.6f")
  }

  test("degree histogram conserves nodes and edges on both sides") {
    val cs = graft.ops.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.ops.Tables.orders(spark, sf)
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct().cache()
    val edges = cs.count()
    val h = queries("q_graph_degree")(spark, sf).collect()
    def side(s: String) = h.filter(_.getString(0) == s)
    // Σ n_nodes per side = distinct node count on that side
    assert(side("c").map(_.getLong(2)).sum == cs.select("cust").distinct().count())
    assert(side("s").map(_.getLong(2)).sum == cs.select("supp").distinct().count())
    // Σ degree·n_nodes per side = |E| (each edge counted once per side)
    assert(side("c").map(r => r.getLong(1) * r.getLong(2)).sum == edges)
    assert(side("s").map(r => r.getLong(1) * r.getLong(2)).sum == edges)
    cs.unpersist()
  }

  test("pca power component captures at least any single axis's energy") {
    val e = graft.ops.Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .cache()
    // E[pc1²] of the projection vs the strongest coordinate axis: after 8
    // power steps the learned direction must dominate every axis-aligned
    // one (the Rayleigh quotient is maximal at the top eigenvector; slack
    // covers the per-step r6 re-gridding)
    val pc = queries("q_vec_pca_power")(spark, sf)
      .agg(avg(col("pc1") * col("pc1"))).collect().head.getDouble(0)
    val axisMax = e
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(avg(col("x") * col("x")).as("m2"))
      .agg(max("m2")).collect().head.getDouble(0)
    assert(pc >= axisMax * 0.98,
      f"pc1 energy $pc%.6f below best axis $axisMax%.6f")
    // projections are bounded by the max vector norm (w has unit norm)
    val maxNorm = e.select(sqrt(aggregate(col("v"), lit(0.0),
      (a, x) => a + x * x)).as("n")).agg(max("n")).collect().head.getDouble(0)
    val maxProj = queries("q_vec_pca_power")(spark, sf)
      .agg(max(abs(col("pc1")))).collect().head.getDouble(0)
    assert(maxProj <= maxNorm * (1.0 + 1e-4))
    e.unpersist()
  }

  test("url dedup collapses exactly the planted variant groups") {
    val docs = graft.ops.Tables.documents(spark, sf)
    val out = queries("q_dedup_url")(spark, sf).collect()
    // canonicalization is total: every doc lands in exactly one group
    assert(out.map(_.getAs[Long]("n_variants")).sum == docs.count())
    // the noise axes (case/slash/utm) are keyed off doc_id but the
    // canonical identity is doc_id % 100 — so exactly that many groups
    val expected = docs.select((col("doc_id") % 100).as("g"))
      .distinct().count()
    assert(out.length == expected, s"${out.length} groups != $expected")
    // no canonical form retains tracking params, uppercase, or a
    // pre-query trailing slash
    out.foreach { r =>
      val c = r.getString(0)
      assert(!c.contains("utm_") && c == c.toLowerCase)
      assert(!c.contains("/?"), s"trailing slash survived: $c")
    }
  }

  test("trend fit satisfies OLS normal equations; forecast extends the index") {
    val rows = queries("q_events_trend")(spark, sf).collect()
    val (fc, fit) = rows.partition(_.getAs[Long]("is_fc") == 1)
    assert(fc.length == 3)
    // residual orthogonality (Σr = 0, Σr·x = 0) within coefficient
    // rounding slack — the defining property of the least-squares fit
    val resid = fit.map(r => (r.getAs[Long]("x").toDouble,
      r.getAs[Long]("y") - r.getAs[Double]("yhat")))
    val n = fit.length
    assert(math.abs(resid.map(_._2).sum) < 1e-3 * n * 30,
      s"sum resid = ${resid.map(_._2).sum}")
    assert(math.abs(resid.map(t => t._1 * t._2).sum) < 1e-3 * n * n * 30)
    // forecast days continue the index with null observations
    val xs = rows.map(_.getAs[Long]("x")).sorted
    assert(xs.zip(xs.tail).forall { case (a, b) => b == a + 1 })
    assert(fc.forall(r => r.isNullAt(r.fieldIndex("y"))))
  }

  test("welch t-test matches a direct double-precision computation") {
    val r = queries("q_agg_ttest")(spark, sf).collect().head
    val vals = graft.ops.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).as("v"), col("value"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    def stats(v: Long) = {
      val xs = vals.filter(_._1 == v).map(_._2)
      val m = xs.sum / xs.length
      (xs.length, m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (n0, m0, s0) = stats(0); val (n1, m1, s1) = stats(1)
    assert(r.getAs[Long]("n0") == n0 && r.getAs[Long]("n1") == n1)
    // centi-quantization + r4 rounding keep the op within tight tolerance
    // of the exact double computation
    assert(math.abs(r.getAs[Double]("mean0") - m0) < 0.02)
    assert(math.abs(r.getAs[Double]("mean1") - m1) < 0.02)
    val t = (m0 - m1) / math.sqrt(s0 / n0 + s1 / n1)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 0.01,
      s"t ${r.getAs[Double]("t_stat")} vs exact $t")
    val df = r.getAs[Double]("df")
    assert(df >= math.min(n0, n1) - 1 && df <= n0 + n1 - 2)
  }

  test("parse_url family inverts the constructed url") {
    val out = queries("q_fn_url")(spark, sf)
    // extraction is exact: host/path/query reassemble the original url
    val bad = out.filter(
      concat(col("proto"), lit("://"), col("host"), col("path"),
             lit("?"), col("query")) =!= col("url")).count()
    assert(bad == 0)
    assert(out.filter(col("domain") =!= "example").count() == 0)
    assert(out.filter(col("q_lang").isNull || col("q_ref").isNull).count() == 0)
  }

  test("novelty: first doc scores 1.0 and novel-gram counts conserve") {
    val out = queries("q_text_novelty")(spark, sf).cache()
    // the earliest doc has no predecessors: everything it says is novel
    val first = out.orderBy("doc_id").limit(1).collect().head
    assert(first.getAs[Double]("novelty") == 1.0)
    // each distinct gram is novel in exactly one doc (its first)
    val g = graft.ops.LlmOps.grams(graft.ops.Tables.documents(spark, sf))
    assert(out.agg(sum("n_novel")).collect().head.getLong(0)
           == g.select("g").distinct().count())
    assert(out.filter(col("novelty") < 0 || col("novelty") > 1).count() == 0)
    out.unpersist()
  }

  test("chi-square matches the direct computation; df from table shape") {
    val r = queries("q_agg_chisq")(spark, sf).collect().head
    val cells = graft.ops.Tables.documents(spark, sf)
      .groupBy("lang", "source").count().collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val langs = cells.keys.map(_._1).toSeq.distinct
    val srcs = cells.keys.map(_._2).toSeq.distinct
    val n = cells.values.sum.toDouble
    val chi2 = (for { l <- langs; s <- srcs
                      o = cells.getOrElse((l, s), 0L).toDouble
                      e = cells.filter(_._1._1 == l).values.sum *
                          cells.filter(_._1._2 == s).values.sum / n
                      if o > 0 } yield (o - e) * (o - e) / e).sum
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 0.01,
      s"chi2 ${r.getAs[Double]("chi2")} vs exact $chi2")
    assert(r.getAs[Long]("df") == (langs.size - 1L) * (srcs.size - 1L))
    // only observed cells enter the op (zero cells contribute E, not 0):
    // the op counts observed cells, the full-grid df comes from distincts
    assert(r.getAs[Long]("n_cells") == cells.size)
  }

  test("seasonal decomposition: additive identity and near-zero mean effect") {
    val rows = queries("q_win_seasonal")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("dow") >= 1 && r.getAs[Long]("dow") <= 7)
      // y == deseason + seasonal exactly (one subtraction, no rounding)
      assert(math.abs(r.getAs[Long]("y") -
        (r.getAs[Double]("deseason") + r.getAs[Double]("seasonal"))) < 1e-9)
    }
    // day-weighted seasonal effects cancel by construction (each day
    // carries its dow's mean-vs-overall offset; weighting by the dow's
    // day count recovers Σ(dow_mean − mu)·n_dow ≈ 0 within r4 slack)
    val s = rows.map(_.getAs[Double]("seasonal")).sum
    assert(math.abs(s) < rows.length * 2e-4 + 0.02, s"seasonal sum $s")
  }

  test("pq: 8-field codes and subspace-wise coding dominates whole-vector coding") {
    val out = queries("q_vec_pq")(spark, sf).cache()
    out.collect().foreach { r =>
      val parts = r.getAs[String]("code").split("-")
      assert(parts.length == 8 && parts.forall(p => p.toInt >= 0))
      assert(r.getAs[Double]("err") >= 0.0)
    }
    // Σ_s min_c d_s(c) ≤ min_c Σ_s d_s(c): per-subspace free choice can
    // never lose to forcing one centroid for the whole vector — compare
    // against the single-nearest-full-centroid error (rounding slack 8e-6)
    val el = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
    val cent = el
      .select(col("label").as("cl"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cl", "pos").agg(avg(col("x")).as("cx"))
      .groupBy("cl")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
             p => p.getField("cx")).as("cv"))
    val full = el.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        expr("aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE), (acc, i) -> " +
             "acc + (element_at(v, i) - element_at(cv, i)) " +
             "* (element_at(v, i) - element_at(cv, i)))").as("d"))
      .groupBy("vec_id").agg(min(col("d")).as("best_full"))
    val viol = out.join(full, Seq("vec_id"))
      .filter(col("err") > col("best_full") + 8e-6).count()
    assert(viol == 0, s"$viol vectors where PQ lost to whole-vector coding")
    out.unpersist()
  }

  test("windowed funnel: rate arithmetic and delay bounds hold") {
    val r = queries("q_events_window_funnel")(spark, sf).collect().head
    val (nc, nv) = (r.getAs[Long]("n_click"), r.getAs[Long]("n_conv"))
    assert(nv <= nc && nv > 0)
    assert(math.abs(r.getAs[Double]("conv_rate") - nv.toDouble / nc) < 1e-5)
    val delay = r.getAs[Double]("avg_delay_s")
    assert(delay > 0 && delay <= 86400, s"mean delay $delay outside (0, 24h]")
    // the windowed funnel can never out-convert the unconstrained one
    val anyPurchase = graft.ops.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(nv <= anyPurchase)
  }

  test("cluster topics: top-3 per cluster, ranked by score") {
    val rows = queries("q_text_cluster_topics")(spark, sf).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    assert(byLabel.size == 10, s"${byLabel.size} clusters")
    byLabel.values.foreach { rs =>
      assert(rs.length == 3)
      val ordered = rs.sortBy(_.getAs[Long]("rnk"))
      val scores = ordered.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("path mining: triple counts conserve against per-user history lengths") {
    val rows = queries("q_events_paths")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[String]("path").split(">").length == 3)
      assert(r.getAs[Long]("n") > 0)
    }
    // counts descend (deterministic top-10 ordering)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // total triples across ALL paths = Σ_user max(0, |history| − 2); the
    // top-10 can't exceed that
    val total = graft.ops.Tables.events(spark, sf)
      .groupBy("user_id").count()
      .agg(sum(greatest(col("count") - 2, lit(0L)))).collect().head.getLong(0)
    assert(ns.sum <= total)
  }

  test("skyline: no internal dominance; every excluded part is dominated") {
    val sky = queries("q_agg_skyline")(spark, sf).collect()
      .map(r => (r.getAs[Long]("p_partkey"),
                 r.getAs[Double]("price"), r.getAs[Long]("psize")))
    // no skyline member dominates another (strictly cheaper AND bigger)
    for (a <- sky; b <- sky if a._1 != b._1)
      assert(!(a._2 < b._2 && a._3 > b._3),
        s"${a._1} dominates ${b._1} inside the skyline")
    // completeness: strict 2-D dominance chains terminate on the frontier,
    // so every non-member must be dominated by some skyline member
    val all = graft.ops.Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2).toLong))
    val skyIds = sky.map(_._1).toSet
    all.filterNot(p => skyIds(p._1)).foreach { p =>
      assert(sky.exists(s => s._2 < p._2 && s._3 > p._3),
        s"excluded part ${p._1} is not dominated")
    }
  }

  test("benford: digit totals conserve and both distributions sum to 1") {
    val rows = queries("q_dq_benford")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    val orders = graft.ops.Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= 1.0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == orders)
    assert(math.abs(rows.map(_.getAs[Double]("obs")).sum - 1.0) < 1e-4)
    // Benford masses for digits PRESENT sum to ≤ 1 (== 1 when all 9 occur)
    val expSum = rows.map(_.getAs[Double]("expected")).sum
    assert(expSum <= 1.0 + 1e-4)
    if (rows.length == 9) assert(math.abs(expSum - 1.0) < 1e-4)
  }

  test("gini matches a direct computation and stays in [0, 1)") {
    val out = queries("q_agg_gini")(spark, sf).collect()
      .map(r => r.getAs[Int]("nation") -> r.getAs[Double]("gini")).toMap
    assert(out.values.forall(g => g >= 0.0 && g < 1.0))
    // direct recomputation for the largest nation
    val sp = graft.ops.Tables.customer(spark, sf)
      .join(graft.ops.Tables.orders(spark, sf),
            col("c_custkey") === col("o_custkey"))
      .groupBy("c_nationkey", "c_custkey")
      .agg(sum("o_totalprice").as("x")).collect()
      .map(r => (r.getInt(0), r.getDouble(2)))
    val (nation, xs0) = sp.groupBy(_._1).maxBy(_._2.length)
    val xs = xs0.map(_._2).sorted
    val n = xs.length
    val direct = (2.0 * xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
                  - (n + 1) * xs.sum) / (n * xs.sum)
    assert(math.abs(out(nation) - direct) < 1e-3,
      s"nation $nation gini ${out(nation)} vs direct $direct")
  }

  test("psi: buckets conserve, shares normalize, contributions non-negative") {
    val rows = queries("q_dq_psi")(spark, sf).collect()
    val cut = lit("1998-01-01").cast("timestamp")
    val o = graft.ops.Tables.orders(spark, sf)
    assert(rows.map(_.getAs[Long]("n_a")).sum
           == o.filter(col("o_orderdate") < cut).count())
    assert(rows.map(_.getAs[Long]("n_b")).sum
           == o.filter(col("o_orderdate") >= cut).count())
    // smoothed shares normalize (10 buckets × add-1 over total+10)
    assert(math.abs(rows.map(_.getAs[Double]("pa")).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getAs[Double]("pb")).sum - 1.0) < 1e-3)
    // (pa−pb) and ln(pa/pb) always share sign ⇒ contrib ≥ 0
    assert(rows.forall(_.getAs[Double]("contrib") >= -1e-6))
  }

  test("cohort matrix: day-0 identity and day-7 column equals q_events_retention") {
    val m = queries("q_events_cohort_matrix")(spark, sf).collect()
    m.filter(_.getAs[Long]("off") == 0)
      .foreach(r => assert(r.getAs[Double]("retention") == 1.0))
    assert(m.forall(r => r.getAs[Double]("retention") <= 1.0))
    // cross-operator consistency: the matrix's day-7 user counts must be
    // exactly the day-7 retention op's n_retained per cohort
    val day7 = m.filter(_.getAs[Long]("off") == 7)
      .map(r => r.getAs[java.sql.Date]("cohort_day").toString
             -> r.getAs[Long]("n_users")).toMap
    queries("q_events_retention")(spark, sf).collect().foreach { r =>
      val c = r.getAs[java.sql.Date]("cohort_day").toString
      val ret = r.getAs[Long]("n_retained")
      assert(day7.getOrElse(c, 0L) == ret,
        s"cohort $c: matrix ${day7.getOrElse(c, 0L)} != retention op $ret")
    }
  }

  test("rolling correlation bounded in [-1, 1] and matches a direct window calc") {
    val rows = queries("q_win_rolling_corr")(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("corr7")))
        assert(math.abs(r.getAs[Double]("corr7")) <= 1.0 + 1e-9)
    }
    // recompute the last day's trailing-7 correlation directly
    val tail = rows.takeRight(7).map(r =>
      (r.getAs[Long]("x").toDouble, r.getAs[Long]("y").toDouble))
    val n = tail.length
    val (sx, sy) = (tail.map(_._1).sum, tail.map(_._2).sum)
    val sxy = tail.map(t => t._1 * t._2).sum
    val sxx = tail.map(t => t._1 * t._1).sum
    val syy = tail.map(t => t._2 * t._2).sum
    val den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    if (den > 0) {
      val direct = (n * sxy - sx * sy) / den
      assert(math.abs(rows.last.getAs[Double]("corr7") - direct) < 1e-3)
    }
  }

  test("drawdown: peak is a running max, drawdown zero exactly at new peaks") {
    val rows = queries("q_win_drawdown")(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    var peak = Long.MinValue
    rows.foreach { r =>
      val v = r.getAs[Long]("v")
      peak = math.max(peak, v)
      assert(r.getAs[Long]("peak") == peak)
      val dd = r.getAs[Double]("drawdown")
      assert(dd >= 0.0 && dd < 1.0)
      if (v == peak) assert(dd == 0.0)
      else assert(math.abs(dd - (peak - v).toDouble / peak) < 1e-5)
    }
  }

  test("cusum: closed form equals the sequential recurrence replay") {
    val rows = queries("q_win_cusum")(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    val vs = rows.map(_.getAs[Long]("v"))
    val tgt = math.floor(vs.sum.toDouble / vs.length * 1e6 + 0.5).toLong
    var s = 0L // S_t = max(0, S_{t-1} + resid_t) in exact micro-units
    rows.zip(vs).foreach { case (r, v) =>
      s = math.max(0L, s + v * 1000000L - tgt)
      assert(math.abs(r.getAs[Double]("cusum") - s / 1e6) < 1e-4)
      assert(r.getAs[Long]("is_change") == (if (s > 2 * tgt) 1L else 0L))
    }
  }

  test("cuped: cohorts partition users, raw means match, variance shrinks") {
    val rows = queries("q_agg_cuped")(spark, sf).collect()
    assert(rows.length == 2)
    // per-user pre/post recomputation with the same midpoint split
    val ev = graft.ops.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val Array(mn, mx) =
      ev.agg(min("us"), max("us")).collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = (mn + mx) / 2
    val perUser = ev.groupBy("user_id")
      .agg(count(when(col("us") < mid, 1)).as("x"),
           count(when(col("event_type") === "purchase" && col("us") >= mid, 1))
             .as("y"))
      .collect().map(r => (r.getAs[Long]("user_id"),
                           r.getAs[Long]("x"), r.getAs[Long]("y")))
    assert(rows.map(_.getAs[Long]("n_users")).sum == perUser.length)
    rows.foreach { r =>
      val cohort = perUser.filter(_._1 % 2 == r.getAs[Long]("variant"))
      val direct = cohort.map(_._3).sum.toDouble / cohort.length
      assert(math.abs(r.getAs[Double]("mean_raw") - direct) < 1e-3)
      // the CUPED point: the pre-period covariate explains variance
      assert(r.getAs[Double]("var_adj") <= r.getAs[Double]("var_raw") + 1e-9)
    }
  }

  test("pit join: one row per purchase, age bounded, agrees with asof <= 24h") {
    val pit = queries("q_join_pit")(spark, sf).collect()
    val nPurchases = graft.ops.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(pit.length == nPurchases)
    pit.filter(!_.isNullAt(3)).foreach { r =>
      val age = r.getAs[Long]("feat_age_min")
      assert(age >= 0 && age <= 1440)
    }
    // where the unbounded asof match is within 24 h, pit must agree;
    // where pit is NULL, any asof match must be older than 24 h
    val asof = queries("q_join_asof")(spark, sf)
      .select(col("event_id"), col("click_id"),
              unix_micros(col("click_ts")).as("cus"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("click_id"), r.getAs[Long]("cus"))).toMap
    val pts = graft.ops.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("pus"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("pus")).toMap
    pit.foreach { r =>
      val eid = r.getAs[Long]("event_id")
      asof.get(eid).foreach { case (clickId, cus) =>
        val fresh = pts(eid) - cus <= 86400000000L
        if (fresh) assert(!r.isNullAt(2) && r.getAs[Long]("click_id") == clickId)
        else assert(r.isNullAt(2), s"stale feature served for purchase $eid")
      }
    }
  }

  test("knn classify: prediction is the mode of sim_topk neighbor labels") {
    val cls = queries("q_vec_knn_classify")(spark, sf).collect()
    assert(cls.length == 8)
    val labels = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val nb = queries("q_sim_topk")(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
    cls.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val votes = nb(qid).map(x => labels(x.getAs[Long]("vec_id")))
        .groupBy(identity).map { case (l, v) => (l, v.length) }
      val (expLabel, expVotes) = votes.toSeq.maxBy { case (l, n) => (n, -l) }
      assert(r.getAs[Int]("pred_label") == expLabel)
      assert(r.getAs[Long]("votes") == expVotes)
      assert(r.getAs[Int]("true_label") == labels(qid))
      assert(r.getAs[Long]("votes") >= 1 && r.getAs[Long]("votes") <= 5)
    }
  }

  test("freshness: freshest source lags zero, counts total, stale flag consistent") {
    val rows = queries("q_dq_freshness")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag_min")).min == 0L)
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      graft.ops.Tables.events(spark, sf).count())
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag_min")
      assert(r.getAs[Long]("is_stale") == (if (lag > 60) 1L else 0L))
    }
  }

  test("mix epochs: bounds and the served-tokens identity hold") {
    val rows = queries("q_mix_epochs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = 2 * rows.map(_.getAs[Long]("avail")).sum
    rows.foreach { r =>
      val (avail, target, ep, eff) = (r.getAs[Long]("avail"),
        r.getAs[Long]("target_toks"), r.getAs[Long]("epochs"),
        r.getAs[Long]("eff_toks"))
      assert(target == budget / rows.length)
      assert(ep >= 1 && ep <= 4)
      assert(ep == math.min(4L, (target + avail - 1) / avail))
      assert(eff == math.min(target, ep * avail))
    }
  }

  test("triangles: corner sum divisible by 3 and equals brute force on sf0.001") {
    val rows = queries("q_graph_triangles")(spark, sf).collect()
    assert(rows.length ==
      graft.ops.Tables.supplier(spark, sf).select("s_suppkey").distinct().count())
    val cornerSum = rows.map(_.getAs[Long]("n_triangles")).sum
    assert(cornerSum % 3 == 0)
    // brute force: rebuild the thresholded edge set independently and count
    val ps = graft.ops.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
    val byPart = ps.groupBy(_._1).filter(_._2.length <= 64)
      .mapValues(_.map(_._2).sorted)
    val support = scala.collection.mutable.Map[(Long, Long), Long]()
    byPart.values.foreach { ss =>
      for (i <- ss.indices; j <- i + 1 until ss.length)
        support((ss(i), ss(j))) = support.getOrElse((ss(i), ss(j)), 0L) + 1
    }
    val n = support.size.toLong
    val s = support.values.sum
    val sq = support.values.map(v => v * v).sum
    val thr = math.floor((s.toDouble / n
      + 2 * math.sqrt((sq - s.toDouble * s / n) / n)) * 1e6 + 0.5).toLong
    // NOT `support.collect { ... => pair }` — a tuple-returning partial
    // function on a Map rebuilds a Map, silently overwriting edges that
    // share a source node
    val edges = support.filter { case (_, sup) => sup * 1000000L > thr }
      .keySet.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var tris = 0L
    for (i <- nodes.indices; j <- i + 1 until nodes.length;
         k <- j + 1 until nodes.length) {
      val (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if (edges(a -> b) && edges(a -> c) && edges(b -> c)) tris += 1
    }
    assert(cornerSum == 3 * tris)
  }

  test("survival: starts at first-factor, monotone, at-risk accounts everyone") {
    val rows = queries("q_events_survival")(spark, sf).collect()
      .sortBy(_.getAs[Long]("dday"))
    assert(rows.nonEmpty)
    val nSignup = graft.ops.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("at_risk") == nSignup)
    // replay the KM product from the lifetable itself
    var sPrev = 1.0
    rows.foreach { r =>
      val factor = 1.0 - r.getAs[Long]("n_event").toDouble / r.getAs[Long]("at_risk")
      sPrev = sPrev * factor
      val got = r.getAs[Double]("survival")
      assert(math.abs(got - sPrev) < 1e-3)
      assert(got >= 0.0 && got <= 1.0)
    }
    // monotone non-increasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("survival") <= a.getAs[Double]("survival") + 1e-9)
    }
    // everyone leaves the risk set exactly once
    assert(rows.map(r => r.getAs[Long]("n_event") + r.getAs[Long]("n_censor")).sum
      == nSignup)
  }

  test("snapshot diff: append-only classes are consistent") {
    val rows = queries("q_dq_snapshot_diff")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("status")).toSet.subsetOf(
      Set("added", "changed", "unchanged")), "append-only input cannot remove")
    rows.foreach { r =>
      val (on, nn) = (r.getAs[Long]("old_n"), r.getAs[Long]("new_n"))
      val (oc, nc) = (r.getAs[Long]("old_cents"), r.getAs[Long]("new_cents"))
      assert(on <= nn && oc <= nc, "append-only snapshots only grow")
      r.getAs[String]("status") match {
        case "added"     => assert(on == 0L)
        case "unchanged" => assert(on == nn && oc == nc)
        case "changed"   => assert(on > 0 && (on != nn || oc != nc))
      }
    }
  }

  test("vec outliers: threshold replays from the output's own distances") {
    val rows = queries("q_vec_outliers")(spark, sf).collect()
    assert(rows.length ==
      graft.ops.Tables.embeddings(spark, sf).count())
    rows.groupBy(_.getAs[Int]("label")).foreach { case (_, rs) =>
      val di = rs.map(r => math.floor(r.getAs[Double]("dist2") * 1e6 + 0.5).toLong)
      val n = di.length.toLong
      val s = di.sum
      val sq = di.map(v => v * v).sum
      val thr = math.floor(s.toDouble / n
        + 2 * math.sqrt((sq - s.toDouble * s / n) / n) + 0.5).toLong
      rs.zip(di).foreach { case (r, d) =>
        assert(r.getAs[Long]("is_outlier") == (if (d > thr) 1L else 0L))
        assert(r.getAs[Double]("dist2") >= 0.0)
      }
      // mean+2σ can flag at most 25% of any distribution (Chebyshev: 1/k²)
      assert(rs.count(_.getAs[Long]("is_outlier") == 1L) <= rs.length / 4.0)
    }
  }

  test("dau/wau: weekly dominates daily and replays from user-days") {
    val rows = queries("q_events_dau_wau")(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    val ud = graft.ops.Tables.events(spark, sf)
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toLocalDate))
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter { case (_, ad) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(7))
      }.map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau)
      assert(r.getAs[Long]("wau") == wau)
      assert(wau >= dau)
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("code detect: fractions bounded, flag replays from its own signals") {
    val rows = queries("q_text_code_detect")(spark, sf).collect()
    assert(rows.length == graft.ops.Tables.documents(spark, sf)
      .filter(length(col("text")) > 0).count())
    rows.foreach { r =>
      Seq("sym_frac", "dig_frac", "up_frac").foreach { c =>
        val v = r.getAs[Double](c); assert(v >= 0.0 && v <= 1.0)
      }
      val expect = if (r.getAs[Double]("sym_frac") > 0.02
                       || r.getAs[Double]("dig_frac") > 0.15) 1L else 0L
      assert(r.getAs[Long]("is_codelike") == expect)
    }
  }

  test("matryoshka: recall identity and agreement with sim_topk's full ranking") {
    val rows = queries("q_vec_matryoshka")(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept >= 0 && kept <= 5)
      assert(math.abs(r.getAs[Double]("recall5") - kept / 5.0) < 1e-9)
      assert(Set(0L, 1L)(r.getAs[Long]("top1_kept")))
    }
  }

  test("pareto curve: monotone prefixes, totals close, agrees with budget_select") {
    val rows = queries("q_budget_pareto")(spark, sf).collect()
      .sortBy(-_.getAs[Double]("quality"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("cum_docs") > a.getAs[Long]("cum_docs"))
      assert(b.getAs[Long]("cum_toks") > a.getAs[Long]("cum_toks"))
      // adding lower-quality groups can only drag the prefix mean down
      assert(b.getAs[Double]("prefix_quality")
        <= a.getAs[Double]("prefix_quality") + 1e-4)
    }
    assert(rows.last.getAs[Long]("cum_docs") ==
      graft.ops.Tables.documents(spark, sf).count())
    // the budget_select prefix is exactly this curve cut at tokens/4
    val budget = rows.last.getAs[Long]("cum_toks") / 4
    val expectSel = rows.filter(_.getAs[Long]("cum_toks") <= budget)
      .map(_.getAs[Double]("quality")).toSet
    val gotSel = queries("q_budget_select")(spark, sf).collect()
      .map(_.getAs[Double]("quality")).toSet
    assert(gotSel == expectSel)
  }

  test("heatmap: cells bounded, counts and shares total") {
    val rows = queries("q_events_heatmap")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ==
      graft.ops.Tables.events(spark, sf).count())
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      assert(r.getAs[Long]("dow") >= 1 && r.getAs[Long]("dow") <= 7)
      assert(r.getAs[Long]("hod") >= 0 && r.getAs[Long]("hod") <= 23)
    }
  }

  test("rolling z-score: baseline excludes the judged day and replays exactly") {
    val rows = queries("q_win_zscore_roll")(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    val vs = rows.map(_.getAs[Long]("v"))
    rows.zipWithIndex.foreach { case (r, i) =>
      val base = vs.slice(math.max(0, i - 28), i) // 28 preceding, current excluded
      val n = base.length
      if (n >= 7) {
        val s = base.sum; val sq = base.map(x => x * x).sum
        if (n.toLong * sq - s * s > 0) {
          val mean = s.toDouble / n
          val sd = math.sqrt((sq - s.toDouble * s / n) / (n - 1))
          val z = math.floor((vs(i) - mean) / sd * 1e4 + 0.5) / 1e4
          assert(math.abs(r.getAs[Double]("zscore") - z) < 1e-9)
          assert(r.getAs[Long]("is_anom") == (if (math.abs(z) > 3.0) 1L else 0L))
        }
      } else assert(r.isNullAt(2) && r.getAs[Long]("is_anom") == 0L)
    }
  }

  test("exact dedup is idempotent and total") {
    val docs = graft.ops.Tables.documents(spark, sf)
    val deduped = queries("q_dedup_exact")(spark, sf)
    assert(deduped.agg(sum("n_copies")).collect().head.getLong(0) == docs.count())
    assert(deduped.select("keep_id").distinct().count() == deduped.count())
  }

  test("near-dup finds the planted +' dup' pairs symmetrically") {
    val pairs = queries("q_dedup_near")(spark, sf).collect()
    assert(pairs.length >= 20, s"expected ~25 planted pairs, got ${pairs.length}")
    pairs.foreach { r =>
      assert(r.getLong(1) > r.getLong(0), "pairs must be ordered a < b")
    }
  }

  test("window running sum ends at the group total") {
    val ev = graft.ops.Tables.events(spark, sf)
    val expected = ev.filter(col("user_id") === 3)
      .agg(sum("value")).collect().head.getDouble(0)
    val lastRunning = queries("q_win_running")(spark, sf)
      .filter(col("user_id") === 3)
      .orderBy(col("event_id").desc).limit(1)
      .collect().head.getDouble(2)
    assert(math.abs(lastRunning - expected) < 1e-3)
  }

  test("set algebra: |A union_all B| = |A| + |B|") {
    val ev = graft.ops.Tables.events(spark, sf)
    val a = ev.filter(col("event_type") === "purchase").count()
    val b = ev.filter(col("event_type") === "error").count()
    assert(queries("q_union_all")(spark, sf).count() == a + b)
  }

  test("top-k per group is bounded and correctly ranked") {
    val topk = queries("q_win_topk_group")(spark, sf)
    val maxPer = topk.groupBy("o_custkey").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxPer <= 3)
  }

  test("sim_topk self-consistency: best neighbor has highest sim") {
    val df = queries("q_sim_topk")(spark, sf).collect()
    df.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("queries are deterministic across runs") {
    val names = Seq("q_agg_basic", "q_dedup_minhash", "q_win_rank", "q_sim_topk")
    names.foreach { n =>
      val a = queries(n)(spark, sf).collect().toSeq
      val b = queries(n)(spark, sf).collect().toSeq
      assert(a == b, s"$n not deterministic")
    }
  }

  test("compaction plan: conserves rows, contiguous ranges, bins close full") {
    val rows = queries("q_layout_compaction")(spark, sf).collect()
      .sortBy(_.getAs[Long]("bin"))
    val total = graft.ops.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    rows.foreach(r => assert(r.getAs[Long]("n_files") >= 1))
    // bins tile the date axis in order, never overlapping
    rows.sliding(2).filter(_.length == 2).foreach { w =>
      assert(w(0).getAs[java.sql.Date]("day_last").getTime <
             w(1).getAs[java.sql.Date]("day_first").getTime)
    }
    // every bin except the last closed because the running total crossed
    // its boundary: cum rows through bin b must reach 400*(b+1)
    val cum = rows.map(_.getAs[Long]("n_rows")).scanLeft(0L)(_ + _).drop(1)
    rows.init.zip(cum.init).foreach { case (r, c) =>
      assert(c >= 400L * (r.getAs[Long]("bin") + 1),
        s"bin ${r.getAs[Long]("bin")} closed early at cum=$c")
    }
  }

  test("ltv curve: monotone, lands on total revenue, conserves orders") {
    val rows = queries("q_events_ltv")(spark, sf).collect()
      .sortBy(_.getAs[Long]("age_q"))
    val ltv = rows.map(_.getAs[Double]("ltv"))
    ltv.sliding(2).filter(_.length == 2).foreach(w => assert(w(1) >= w(0)))
    val o = graft.ops.Tables.orders(spark, sf)
    val totalCents = o.selectExpr(
      "sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))")
      .head.getLong(0)
    assert(rows.last.getAs[Double]("cum_rev") == totalCents / 100.0)
    assert(rows.map(_.getAs[Long]("n_orders")).sum == o.count())
  }

  test("blocklist gate: flag consistent, occurrences dominate terms") {
    val rows = queries("q_text_blocklist")(spark, sf).collect()
    rows.foreach { r =>
      val t = r.getAs[Long]("n_terms"); val occ = r.getAs[Long]("n_occ")
      assert(t >= 0 && t <= 3)
      assert(occ >= t)
      assert(r.getAs[Long]("blocked") == (if (t > 0) 1L else 0L))
    }
    // the fixture vocabulary makes both outcomes non-empty
    assert(rows.exists(_.getAs[Long]("blocked") == 1L))
    assert(rows.exists(_.getAs[Long]("blocked") == 0L))
  }

  test("sessions: event conservation, durations need >= 2 events, gaps split") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_events_sessions")(spark, sf).collect()
    val totalEvents = graft.ops.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == totalEvents,
      "every event must land in exactly one session")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1)
      assert(r.getAs[Double]("avg_events") >= 1.0)
      assert(r.getAs[Long]("max_secs") >= 0)
    }
    // the fixture spans a month of sparse per-user activity, so a 30-min
    // gap rule must split every user into many sessions
    assert(rows.forall(_.getAs[Long]("n_sessions") > 1))
  }

  test("trimmed/winsorized means: bounded by group extremes, robust ordering") {
    import org.apache.spark.sql.functions._
    val o = graft.ops.Tables.orders(spark, sf)
    val ext = o.groupBy(col("o_orderpriority").as("pri"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"),
           avg("o_totalprice").as("mean"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    SparkEntry.queries("q_agg_trimmed")(spark, sf).collect().foreach { r =>
      val (lo, hi, _) = ext(r.getAs[String]("pri"))
      val (tm, wm) = (r.getAs[Double]("trimmed_mean"),
                      r.getAs[Double]("winsor_mean"))
      assert(tm >= lo && tm <= hi, s"trimmed mean $tm outside [$lo,$hi]")
      assert(wm >= lo && wm <= hi, s"winsor mean $wm outside [$lo,$hi]")
      // both drop the same tail mass from each side of the same sample, so
      // they can only diverge by the clamped tails' pull
      assert(math.abs(tm - wm) <= (hi - lo),
        "trimmed and winsorized means diverged beyond the value range")
    }
  }

  test("hampel: total rows, median within window extremes, flag replays") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_win_hampel")(spark, sf)
    val rows = out.collect()
    assert(rows.length == graft.ops.Tables.events(spark, sf).count())
    // replay one user's flags from scratch in memory
    val ev = graft.ops.Tables.events(spark, sf)
      .filter(col("user_id") === 3)
      .select(col("event_id"), col("value"), unix_micros(col("ts")).as("us"))
      .collect().sortBy(r => (r.getLong(2), r.getLong(0)))
    val vals = ev.map(_.getDouble(1))
    def med(a: Array[Double]): Double = {
      val s = a.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val flags = vals.indices.map { i =>
      val w = vals.slice(math.max(0, i - 3), math.min(vals.length, i + 4))
      val m = med(w)
      val mad = med(w.map(x => math.abs(x - m)))
      math.abs(vals(i) - m) > 4.4478 * mad
    }
    val got = rows.filter(_.getAs[Long]("user_id") == 3)
      .sortBy(_.getAs[Long]("event_id"))
    val expByEvent = ev.map(_.getLong(0)).zip(flags).toMap
    got.foreach { r =>
      assert(r.getAs[Boolean]("is_outlier")
               == expByEvent(r.getAs[Long]("event_id")),
        s"hampel flag mismatch at event ${r.getAs[Long]("event_id")}")
    }
    assert(rows.exists(_.getAs[Boolean]("is_outlier")),
      "fixture values are heavy-tailed enough to trip the filter somewhere")
  }

  test("negative sampling: no self-draws, near-complete fill, uniform spread") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_sample_negatives")(spark, sf).collect()
    val n = graft.ops.Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("neg_id") != r.getAs[Long]("doc_id"))
    }
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length)
    // self-collision chance is 1/N per draw — a handful of 3s at most
    assert(perDoc.values.forall(c => c >= 3 && c <= 4))
    assert(perDoc.values.count(_ == 4) >= (n * 0.95).toInt,
      "almost every anchor keeps all 4 draws")
    // uniformity proxy: the md5 draw must touch a large share of the corpus
    val distinctNegs = rows.map(_.getAs[Long]("neg_id")).distinct.length
    assert(distinctNegs >= n * 0.9,
      s"only $distinctNegs of $n docs drawn — hash spread too narrow")
  }

  test("langid eval: counts balance and micro-average equals raw accuracy") {
    val rows = SparkEntry.queries("q_eval_langid")(spark, sf).collect()
    assert(rows.length == 5)
    // Σ support counts EVERY doc (a doc with no marker hit is a false
    // negative of its true class); Σ predicted_n counts only predicted
    // docs — equal exactly when prediction coverage is 100%, which the
    // coverage check below establishes independently instead of the old
    // by-construction identity over the inner-joined table
    val support = rows.map(_.getAs[Long]("support")).sum
    val predicted = rows.map(_.getAs[Long]("predicted_n")).sum
    val nDocs = graft.ops.Tables.documents(spark, sf).count()
    assert(support == nDocs, "every document appears in exactly one support")
    assert(predicted <= support, "predictions cannot exceed documents")
    val covered = SparkEntry.queries("q_text_langid")(spark, sf).count()
    assert(predicted == covered,
      "predicted_n must sum to the prediction table's row count")
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") <= r.getAs[Long]("support"))
      assert(r.getAs[Long]("tp") <= r.getAs[Long]("predicted_n"))
    }
    val correct = SparkEntry.queries("q_text_langid")(spark, sf)
      .collect().count(_.getAs[Boolean]("correct"))
    assert(rows.map(_.getAs[Long]("tp")).sum == correct,
      "per-class TPs must sum to the prediction table's correct count")
  }

  test("winnow pairs: all planted near-dups found, overlaps in (0.5, 1]") {
    import org.apache.spark.sql.functions._
    val docs = graft.ops.Tables.documents(spark, sf)
    val planted = docs.as("a")
      .join(docs.as("b"), expr("b.text = a.text || ' dup'"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.nonEmpty)
    val got = SparkEntry.queries("q_text_winnow_pairs")(spark, sf).collect()
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(gotPairs),
      s"missed planted pairs: ${planted -- gotPairs}")
    got.foreach { r =>
      val ov = r.getDouble(3)
      assert(ov >= 0.5 && ov <= 1.0, s"overlap $ov out of range")
    }
  }

  test("pack mask: spans tile each bin contiguously; only tail bins underfill") {
    val rows = SparkEntry.queries("q_pack_mask")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, bins) =>
      val sorted = bins.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val spans = r.getString(3).split(",").map { t =>
          val Array(a, b) = t.split("-"); (a.toLong, b.toLong)
        }
        assert(spans.length == r.getLong(2), s"$lang: segment count drift")
        assert(spans.head._1 == 0L, s"$lang bin $i must start at 0")
        spans.sliding(2).foreach {
          case Array((_, e1), (s2, _)) =>
            assert(e1 == s2, s"$lang bin $i: gap between segments")
          case _ => ()
        }
        assert(spans.last._2 == r.getLong(4), s"$lang bin $i fill mismatch")
        if (i < sorted.length - 1)
          assert(r.getLong(4) == 2048L, s"$lang non-tail bin $i underfull")
      }
    }
  }

  test("sweepline: peak bounded by interval count, replay matches one nation") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_win_sweepline")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("peak") >= 1L)
      assert(r.getAs[Long]("peak") <= r.getAs[Long]("n_orders"))
    }
    // replay nation 0's timeline in memory
    val iv = graft.ops.Tables.orders(spark, sf)
      .join(graft.ops.Tables.customer(spark, sf),
            col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === 0)
      .select(col("o_orderdate").cast("timestamp").cast("long").as("start"),
              col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(0) + 30L * 86400))
    val pts = iv.flatMap { case (a, b) => Seq((a, 1), (b, -1)) }
      .sortBy { case (t, d) => (t, d) }
    val peak = pts.scanLeft(0) { case (acc, (_, d)) => acc + d }.max
    val got = rows.find(_.getAs[Int]("nk") == 0).get.getAs[Long]("peak")
    assert(got == peak, s"sweepline peak $got != replay $peak for nation 0")
  }

  test("iqr audit: quartiles ordered, outliers counted outside exact fences") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_dq_outlier_iqr")(spark, sf).collect()
    assert(rows.length == 5)
    val vals = graft.ops.Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val (q1, q3) = (r.getAs[Double]("q1"), r.getAs[Double]("q3"))
      assert(q1 <= q3)
      val cents = vals(r.getAs[String]("flag"))
        .map(x => math.floor(x.getDouble(1) * 100.0 + 0.5).toLong)
      val n = cents.length
      val sorted = cents.sorted
      val q1c = sorted((n - 1) / 4)
      val q3c = sorted(3 * (n - 1) / 4)
      val exp = cents.count(c =>
        2 * c < 2 * q1c - 3 * (q3c - q1c) || 2 * c > 2 * q3c + 3 * (q3c - q1c))
      assert(r.getAs[Long]("n_outliers") == exp,
        s"${r.getAs[String]("flag")}: fence count drift")
    }
    assert(rows.map(_.getAs[Long]("n_outliers")).sum > 0,
      "heavy-tailed fixture values must trip some fence")
  }

  test("weighted mean: replays exactly from cents/qty moments for one brand") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_agg_weighted")(spark, sf).collect()
    assert(rows.nonEmpty)
    val brand = rows.head.getAs[String]("p_brand")
    val li = graft.ops.Tables.lineitem(spark, sf)
      .join(graft.ops.Tables.part(spark, sf),
            col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === brand)
      .select(col("l_extendedprice"), col("l_quantity"))
      .collect()
    val cents = li.map(r => math.floor(r.getDouble(0) * 100.0 + 0.5).toLong)
    val qty = li.map(r => math.floor(r.getDouble(1) + 0.5).toLong)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val exp = r4(cents.zip(qty).map { case (c, q) => c * q }.sum
                   / (100.0 * qty.sum))
    assert(rows.head.getAs[Long]("units") == qty.sum)
    assert(rows.head.getAs[Double]("weighted_unit_price") == exp)
  }

  test("graph cc: labels form a valid partition with self-labeled canons") {
    val rows = SparkEntry.queries("q_graph_cc")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "the co-purchase graph must have components")
    val byCanon = rows.groupBy(_._2)
    byCanon.foreach { case (canon, ms) =>
      // canon = component min, is itself a member labeled with itself
      assert(ms.map(_._1).min == canon, s"canon $canon is not its component min")
      assert(ms.exists(m => m._1 == canon && m._2 == canon))
      // every member carries the component's true size
      ms.foreach(m => assert(m._3 == ms.length.toLong,
        s"supp ${m._1}: size ${m._3} != |component| ${ms.length}"))
    }
  }

  test("graph bfs: seed at 0, hops within cap, every level has a parent level") {
    val rows = SparkEntry.queries("q_graph_bfs")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.count(_._2 == 0L) == 1, "exactly one seed at distance 0")
    assert(rows.forall(t => t._2 >= 0L && t._2 <= 6L), "depth cap 6")
    // BFS levels are contiguous: a node at distance d implies d-1 exists
    val levels = rows.map(_._2).toSet
    (0L to levels.max).foreach(d =>
      assert(levels.contains(d), s"hole in BFS levels at $d"))
  }

  test("KS drift: sides partition the stream, D in [0,1], flag matches the line") {
    val r = SparkEntry.queries("q_dq_ks_drift")(spark, sf).collect().head
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val total = graft.ops.Tables.events(spark, sf).count()
    assert(n1 + n2 == total, "every event lands in exactly one half")
    assert(n1 > 0 && n2 > 0, "midpoint split must populate both halves")
    val (ks, crit) = (r.getAs[Double]("ks_d"), r.getAs[Double]("crit"))
    assert(ks >= 0.0 && ks <= 1.0)
    assert(crit > 0.0)
    val flag = r.getAs[Long]("is_drift")
    if (ks > crit + 1e-6) assert(flag == 1L)
    if (ks < crit - 1e-6) assert(flag == 0L)
  }

  test("autocorr: 7 lags, pair counts shrink by exactly one per lag, |r| <= 1") {
    val rows = SparkEntry.queries("q_events_autocorr")(spark, sf).collect()
      .map(r => (r.getAs[Long]("lag_k"), r.getAs[Long]("n_pairs"),
                 r.getAs[Double]("autocorr")))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    val nDays = rows.head._2 + 1 // lag-1 pairs = days - 1
    rows.foreach { case (k, np, ac) =>
      assert(np == nDays - k, s"lag $k: $np pairs != ${nDays - k}")
      assert(ac >= -1.0001 && ac <= 1.0001, s"lag $k: autocorr $ac out of range")
    }
  }

  test("holt smoothing replays the exact scalar recurrence") {
    val rows = SparkEntry.queries("q_win_holt")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length >= 10, "a daily series must exist")
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    var l = rows.head._2; var b = 0.0
    assert(rows.head._3 == r4(l) && rows.head._4 == 0.0)
    rows.tail.foreach { case (day, v, level, trend) =>
      val l2 = 0.5 * v + 0.5 * (l + b)
      b = 0.3 * (l2 - l) + 0.7 * b
      l = l2
      assert(level == r4(l), s"$day: level $level != ${r4(l)}")
      assert(trend == r4(b), s"$day: trend $trend != ${r4(b)}")
    }
  }

  test("kalman filter replays the exact adaptive-gain recurrence") {
    val rows = SparkEntry.queries("q_win_kalman")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length >= 10, "a daily series must exist")
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    var x = rows.head._2; var p = 1.0
    assert(rows.head._3 == r4(x) && rows.head._4 == r6(p))
    rows.tail.foreach { case (day, v, est, perr) =>
      val k = (p + 0.5) / ((p + 0.5) + 2.0)
      x = x + k * (v - x)
      p = (1.0 - k) * (p + 0.5)
      assert(est == r4(x), s"$day: est $est != ${r4(x)}")
      assert(perr == r6(p), s"$day: perr $perr != ${r6(p)}")
    }
    // the error variance settles toward its fixed point p* where
    // p* = (1-K)(p*+Q): gain adapts, uncertainty stays bounded
    assert(p > 0.0 && p < 1.5, s"error variance diverged: $p")
  }

  test("holt-winters replays the exact seeded seasonal recurrence") {
    import graft.ops.Tables
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(sum("value").as("v")).collect()
      .map(r => (r.getDate(0).toString,
                 math.floor(r.getDouble(1) * 10000.0 + 0.5) / 10000.0))
      .sortBy(_._1)
    val rows = SparkEntry.queries("q_win_holtwinters")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2),
                 r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.length == daily.length - 7, "one output row per day after the seed week")
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    var l = daily.take(7).map(d => math.floor(d._2 * 10000.0 + 0.5).toLong)
      .sum.toDouble / 10000.0 / 7.0
    var b = 0.0
    var s = daily.take(7).map(_._2 - l).toVector
    daily.drop(7).zip(rows).foreach { case ((day, v), out) =>
      assert(out._1 == day && out._2 == v)
      val l2 = 0.3 * (v - s(0)) + 0.7 * (l + b)
      b = 0.2 * (l2 - l) + 0.8 * b
      s = s.drop(1) :+ (0.15 * (v - l2) + 0.85 * s(0))
      l = l2
      assert(out._3 == r4(l), s"$day: level ${out._3} != ${r4(l)}")
      assert(out._4 == r4(b), s"$day: trend ${out._4} != ${r4(b)}")
      assert(out._5 == r4(s.last), s"$day: seasonal ${out._5} != ${r4(s.last)}")
    }
  }

  test("changepoint maximizes the exact integer CUSUM-departure statistic") {
    import graft.ops.Tables
    val vm = Tables.events(spark, sf)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(sum("value").as("v")).collect()
      .map(r => (r.getDate(0).toString,
                 math.floor(r.getDouble(1) * 10000.0 + 0.5).toLong))
      .sortBy(_._1)
    val n = vm.length.toLong
    val tot = vm.map(_._2).sum
    var cum = 0L
    val stats = vm.dropRight(1).zipWithIndex.map { case ((day, v), i) =>
      cum += v
      (day, (i + 1).toLong, math.abs(n * cum - (i + 1) * tot))
    }
    val best = stats.maxBy(t => (t._3, -t._2)) // max stat, earliest day on tie
    val got = SparkEntry.queries("q_events_changepoint")(spark, sf).collect().head
    assert(got.getDate(0).toString == best._1)
    assert(got.getAs[Long]("n_before") == best._2)
    assert(got.getAs[Long]("n_after") == n - best._2)
    assert(got.getAs[Long]("stat") == best._3)
  }

  test("peaks are exactly the strict interior local maxima of the daily series") {
    import graft.ops.Tables
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(sum("value").as("v")).collect()
      .map(r => (r.getDate(0).toString,
                 math.floor(r.getDouble(1) * 10000.0 + 0.5) / 10000.0))
      .sortBy(_._1)
    val expected = daily.sliding(3).collect {
      case Array((_, pv), (d, v), (_, nv)) if v > pv && v > nv =>
        (d, math.floor((v - math.max(pv, nv)) * 10000.0 + 0.5) / 10000.0)
    }.toSeq
    val got = SparkEntry.queries("q_events_peaks")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("3-core: fixed 8 rounds are converged (round 8 == round 7) and degrees hold") {
    import graft.ops.Tables
    val cs = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") <= 2)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cn"),
              concat(lit("s"), col("l_suppkey")).as("sn"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    var e = cs.flatMap(t => Seq(t, t.swap)).toSet
    var prev = e
    (1 to 8).foreach { r =>
      prev = e
      val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size }
      e = e.filter(t => deg(t._1) >= 3 && deg(t._2) >= 3)
    }
    assert(e == prev, "peeling must be converged by round 8")
    val expected = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("q_graph_kcore")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.forall(_ >= 3L), "every core node keeps degree >= 3")
  }

  test("adamic-adar: ordered pairs, weight bounds follow from the degree cap") {
    val rows = SparkEntry.queries("q_graph_adamic_adar")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (s1, s2, shared, aa) =>
      assert(s1 < s2, "canonical pair order")
      assert(shared >= 2L)
      // each of `shared` common neighbors contributes 1/ln(deg) with
      // 2 <= deg <= 100, so the integer-exact sum is bracketed by the
      // extremes (1e-6 slack for the per-neighbor micro-quantization)
      assert(aa >= shared / math.log(100.0) - 1e-6 * shared)
      assert(aa <= shared / math.log(2.0) + 1e-6 * shared)
    }
    // descending score order with (s1, s2) tie-break
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 &&
          (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))))
      case _ =>
    }
  }

  test("hamming top-k matches a replayed sign-pack + popcount") {
    import graft.ops.Tables
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sig(v: Array[Float]): Long =
      v.zipWithIndex.foldLeft(0L) { case (a, (x, i)) =>
        if (x > 0f) a | (1L << i) else a
      }
    val rows = SparkEntry.queries("q_sim_hamming")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == 100, "10 queries x top-10")
    rows.foreach { case (q, _, c, dist) =>
      assert(dist == java.lang.Long.bitCount(sig(vecs(q)) ^ sig(vecs(c))))
    }
    // within each query, rank order is by (dist, vec_id)
    rows.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 < b._4 || (a._4 == b._4 && a._3 < b._3))
        case _ =>
      }
    }
  }

  test("bm25 replays the exact scoring formula for every emitted row") {
    import graft.ops.Tables
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n.toDouble
    val terms = Seq("table", "value", "data", "join", "query")
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val rows = SparkEntry.queries("q_text_bm25")(spark, sf).collect()
    assert(rows.length == terms.length * 20)
    terms.foreach { t =>
      val df = docs.count(_._2.contains(t)).toLong
      val idf = math.log(((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
      rows.filter(_.getString(0) == t).foreach { r =>
        val (doc, tf) = (r.getLong(2), r.getLong(3))
        val dl = docs.find(_._1 == doc).get._2.length.toDouble
        val exp = r6(idf * (tf.toDouble * 2.2)
                     / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        assert(r.getDouble(4) == exp, s"term $t doc $doc")
      }
    }
  }

  test("k-anonymity audit partitions every customer into exactly one QI group") {
    val rows = SparkEntry.queries("q_dq_kanon")(spark, sf).collect()
    val total = graft.ops.Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach(r =>
      assert(r.getAs[Boolean]("risky") == (r.getAs[Long]("n") < 5L)))
    assert(rows.exists(_.getAs[Boolean]("risky")),
      "the fixture QI grid must expose at least one small group")
  }

  test("shard packing conserves docs and follows the greedy boundary rule") {
    val rows = SparkEntry.queries("q_mm_shard_pack")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = graft.ops.Tables.documents(spark, sf).count()
    assert(rows.length == total, "every doc lands in exactly one shard")
    assert(rows.map(_._3).distinct.length == rows.length)
    rows.groupBy(_._1).values.foreach { g =>
      val bySeq = g.sortBy(_._5)
      // cumulative bytes add up within the source and shards start at 0
      var run = 0L
      bySeq.foreach { case (_, shard, _, b, cum) =>
        assert(shard == (cum - b) / 2000L, "greedy boundary rule")
        run += b
        assert(cum == run, "window cumulative sum is gapless")
      }
      val shards = bySeq.map(_._2).distinct
      assert(shards.toSeq == (0L until shards.length.toLong).toSeq,
        "contiguous shard ids")
    }
  }

  test("dupspans verify only winnow candidates and spans fit inside both docs") {
    val rows = queries("q_text_dupspans")(spark, sf).collect()
    assert(rows.nonEmpty, "planted near-dups must yield verified spans")
    val cands = graft.ops.LlmOps
      .winnowPairTable(graft.ops.Tables.documents(spark, sf))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lens = graft.ops.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(cands((a, b)), s"($a,$b) is not a winnow candidate")
      val mx = r.getAs[Long]("max_span_len")
      assert(mx >= 30L && mx <= math.min(lens(a), lens(b)),
        "a span cannot exceed either document")
      assert(r.getAs[Long]("span_chars") >= mx)
      assert(r.getAs[Long]("n_spans") >= 1L)
    }
  }

  test("readability recomputes exactly from the three regex counts") {
    val rows = queries("q_text_readability")(spark, sf).collect()
    val total = graft.ops.Tables.documents(spark, sf).count()
    assert(rows.length == total)
    rows.foreach { r =>
      val (w, sy, se) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_syll"),
                         r.getAs[Long]("n_sents"))
      assert(w >= 1L && se >= 1L)
      val f = 206.835 - 1.015 * (w.toDouble / se) - 84.6 * (sy.toDouble / w)
      assert(math.abs(r.getAs[Double]("flesch")
               - math.floor(f * 10000.0 + 0.5) / 10000.0) < 1e-12)
    }
  }

  test("label propagation covers exactly the cc node set with node-id labels") {
    val lpa = queries("q_graph_labelprop")(spark, sf).collect()
    val cc = queries("q_graph_cc")(spark, sf).collect()
    assert(lpa.map(_.getAs[Long]("supp")).toSet ==
           cc.map(_.getAs[Long]("supp")).toSet,
      "LPA runs on the same co-purchase graph as cc")
    val nodes = lpa.map(_.getAs[Long]("supp")).toSet
    val bySize = lpa.groupBy(_.getAs[Long]("community"))
    lpa.foreach { r =>
      assert(nodes(r.getAs[Long]("community")), "labels are node ids")
      assert(r.getAs[Long]("community_size") ==
             bySize(r.getAs[Long]("community")).length.toLong)
    }
    // plurality labels can only refine reachability: two nodes in the
    // same LPA community must share a cc component
    val comp = cc.map(r => r.getAs[Long]("supp") -> r.getAs[Long]("canon_id")).toMap
    bySize.values.foreach { g =>
      assert(g.map(r => comp(r.getAs[Long]("supp"))).distinct.length == 1,
        "an LPA community never crosses component boundaries")
    }
  }

  test("l-diversity classes partition customers; entropy bounded by ln(l)") {
    val rows = queries("q_dq_ldiv")(spark, sf).collect()
    val total = graft.ops.Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct")
      assert(l >= 1L && l <= 5L, "at most the 5 market segments")
      assert(r.getAs[Boolean]("risky") == (l < 3L))
      val h = r.getAs[Double]("sens_entropy")
      assert(h >= -1e-9 && h <= math.log(l.toDouble) + 1e-9,
        "Shannon entropy is bounded by ln(#values)")
    }
  }

  test("substring-dedup cuts are exactly the policy image of the span pairs") {
    val cuts = queries("q_dedup_substring")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val lens = graft.ops.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = queries("q_text_dupspans")(spark, sf).collect()
    val expect = pairs.filter { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      r.getAs[Long]("span_chars") * 10 >= 3 * math.min(lens(a), lens(b)) ||
        r.getAs[Long]("max_span_len") >= 100
    }
    assert(cuts.keySet == expect.map(_.getAs[Long]("doc_b")).toSet,
      "cut set = doc_b of every qualifying pair, nothing else")
    cuts.values.foreach(r => assert(r.getAs[Long]("n_partners") >= 1L))
  }

  test("clustering coefficient recomputes from triangles and degree") {
    val rows = queries("q_graph_clustercoeff")(spark, sf).collect()
    assert(rows.nonEmpty)
    val triCount = queries("q_graph_triangles")(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("n_triangles"))
      .toMap
    rows.foreach { r =>
      val (dg, tri) = (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"))
      assert(dg >= 2L)
      assert(tri == triCount(r.getAs[Long]("supp")),
        "corner counts agree with q_graph_triangles")
      val c = 2.0 * tri / (dg * (dg - 1))
      assert(math.abs(r.getAs[Double]("coeff")
               - math.floor(c * 1e6 + 0.5) / 1e6) < 1e-12)
      assert(r.getAs[Double]("coeff") >= 0.0 &&
             r.getAs[Double]("coeff") <= 1.0 + 1e-12)
    }
  }

  test("forecast backtest: exact integer error sums and ratio identities") {
    val rows = queries("q_eval_forecast")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (sn, ss) = (r.getAs[Long]("sae_naive"), r.getAs[Long]("sae_snaive"))
    assert(r.getAs[Long]("n_eval") >= 1L && sn >= 0L && ss >= 0L)
    if (sn > 0) {
      val mase = ss.toDouble / sn
      assert(math.abs(r.getAs[Double]("mase")
               - math.floor(mase * 1e6 + 0.5) / 1e6) < 1e-12)
    }
  }

  test("ann sweep: probe-4 row recomputes from the rankings; recall is " +
       "monotone in probes and exactly 1.0 with every cell probed") {
    val rows = queries("q_eval_ann")(spark, sf).collect()
    assert(rows.length == 4 * 8, "4 probe budgets x 8 queries")
    val ex = queries("q_sim_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val av = queries("q_sim_ann_ivf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    // the probes=4 slice must equal the old single-point harness: hits
    // recomputed from the exact top-5 vs the probe-4 IVF top-5
    rows.filter(_.getAs[Long]("probes") == 4L).foreach { r =>
      val qid = r.getAs[Long]("qid")
      val hits = ex.filter(_._1 == qid).count(av.contains)
      assert(r.getAs[Long]("n_hits") == hits.toLong)
      assert(math.abs(r.getAs[Double]("recall")
               - math.floor(hits / 5.0 * 1e4 + 0.5) / 1e4) < 1e-12)
    }
    // widening the probe budget can only ADD candidates under the same
    // ranking, so per-query recall is monotone non-decreasing in probes
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, qr) =>
      val byP = qr.sortBy(_.getAs[Long]("probes"))
        .map(_.getAs[Long]("n_hits"))
      assert(byP.zip(byP.tail).forall { case (a, b) => a <= b },
        s"recall not monotone in probes: ${byP.mkString(",")}")
    }
    // the fixture has 10 cells; probes=12 searches all of them, so the
    // 'approximate' path IS the exact scan — recall exactly 1.0
    rows.filter(_.getAs[Long]("probes") == 12L).foreach { r =>
      assert(r.getAs[Long]("n_hits") == 5L && r.getAs[Double]("recall") == 1.0,
        s"probes=12 must reach exact recall, got $r")
    }
  }

  test("dedup P/R harness recomputes from the exact and banded pair sets") {
    val rows = queries("q_eval_dedup")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val ex = queries("q_dedup_near")(spark, sf).collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
    val ap = queries("q_dedup_minhash")(spark, sf).collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
    assert(r.getAs[Long]("n_exact") == ex.size.toLong)
    assert(r.getAs[Long]("n_approx") == ap.size.toLong)
    assert(r.getAs[Long]("n_hit") == ex.intersect(ap).size.toLong)
    assert(r.getAs[Long]("n_hit") <=
           math.min(r.getAs[Long]("n_exact"), r.getAs[Long]("n_approx")))
  }

  test("bpe merges replay an exact in-memory BPE on the token frequencies") {
    val rows = queries("q_text_bpe")(spark, sf).collect()
    var words: Map[Vector[String], Long] = graft.ops.Tables
      .documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").count().collect()
      .map(r => r.getString(0).split("").toVector -> r.getLong(1)).toMap
    val expected = scala.collection.mutable.Buffer[(String, String, Long)]()
    for (_ <- 1 to 3) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((w, f) <- words; i <- 0 until w.length - 1)
        pc((w(i), w(i + 1))) += f
      if (pc.nonEmpty) {
        val ((la, lb), c) =
          pc.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
        expected += ((la, lb, c))
        // leftmost-non-overlapping greedy application, the op's islands rule
        words = words.toSeq.map { case (w, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i < w.length - 1 && w(i) == la && w(i + 1) == lb) {
              out += (la + lb); i += 2
            } else { out += w(i); i += 1 }
          }
          (out.result(), f)
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    assert(rows.map(r => (r.getString(1), r.getString(2),
                          r.getAs[Long]("pair_count"))).toSeq
             == expected.toSeq)
  }

  test("modularity recomputes exactly from the LPA partition and edge list") {
    val r = queries("q_eval_communities")(spark, sf).collect().head
    val comm = queries("q_graph_labelprop")(spark, sf).collect()
      .map(x => x.getAs[Long]("supp") -> x.getAs[Long]("community")).toMap
    val cs = graft.ops.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.ops.Tables.orders(spark, sf)
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val pairs = graft.ops.Graph.cooccur(cs, 100, 3)
      .select("s1", "s2").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val dirEdges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val m2 = dirEdges.length.toLong
    assert(r.getAs[Long]("m_edges") == m2 / 2)
    val li = dirEdges.count { case (a, b) => comm(a) == comm(b) }.toLong
    assert(r.getAs[Long]("intra_directed") == li)
    val deg = dirEdges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // toSeq: a Set of node ids mapped to degrees would DEDUPLICATE equal
    // degree values before summing (the K10 fixture graph is 9-regular)
    val sd = comm.keys.toSeq.groupBy(comm).values
      .map(g => { val ds = g.map(deg).sum; ds * ds }).sum
    val q = (m2 * li - sd).toDouble / (m2 * m2)
    assert(math.abs(r.getAs[Double]("modularity")
             - math.floor(q * 1e6 + 0.5) / 1e6) < 1e-12)
    assert(r.getAs[Long]("n_communities") == comm.values.toSet.size.toLong)
  }

  test("assortativity is the exact Pearson of endpoint degrees") {
    val r = queries("q_graph_assortativity")(spark, sf).collect().head
    val pe = graft.ops.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") <= 2)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.ops.Tables.orders(spark, sf)
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cn"),
              concat(lit("s"), col("l_suppkey")).as("sn"))
      .distinct().collect().map(x => (x.getString(0), x.getString(1)))
    val e = pe.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = e.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = e.map { case (a, b) => (deg(a), deg(b)) }
    val n = xs.length.toLong
    assert(r.getAs[Long]("m2_edges") == n)
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map { case (x, y) => x * y }.sum
    val (sxx, syy) = (xs.map(p => p._1 * p._1).sum, xs.map(p => p._2 * p._2).sum)
    val den = math.sqrt((n * sxx - sx * sx).toDouble) *
      math.sqrt((n * syy - sy * sy).toDouble)
    assert(den > 0, "thinned graph must have degree variance")
    val rho = (n * sxy - sx * sy).toDouble / den
    assert(math.abs(r.getAs[Double]("assortativity")
             - math.floor(rho * 1e6 + 0.5) / 1e6) < 1e-12)
    assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
  }

  test("cdc merge conserves rows and its deletes equal the audit's 'removed' class") {
    // conservation: |out| = |base| + inserted − matched-deletes (unmatched
    // tombstones are no-ops); and the per-key audit the warehouse would
    // run afterwards (q_dq_snapshot_diff's FULL JOIN classification, here
    // keyed on the merge key) must classify EXACTLY the matched-delete
    // keys as 'removed' — the apply and the audit agreeing is the point
    // of wiring tombstones into the merge family (r6 verdict ask #8)
    val o = graft.ops.Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long")).collect().map(_.getLong(0))
    val baseKeys = o.filter(_ % 3 != 0).toSet
    val cdcDel = o.filter(_ % 2 == 0).filter(_ % 10 == 0).toSet
    val cdcUp = o.filter(_ % 2 == 0).filter(_ % 10 != 0).toSet
    val matchedDeletes = cdcDel & baseKeys
    val inserted = cdcUp -- baseKeys
    val out = queries("q_merge_cdc")(spark, sf).collect()
    assert(out.length == baseKeys.size + inserted.size - matchedDeletes.size,
      "row conservation: |out| = |base| + inserted - deleted")
    val outKeys = out.map(_.getAs[Long]("o_orderkey")).toSet
    assert((baseKeys -- outKeys) == matchedDeletes,
      "keys missing from the applied table must be exactly the tombstoned ones")
    // audit side: snapshot-diff base vs applied, per merge key
    val removed = (baseKeys -- outKeys)
    assert(removed == matchedDeletes && (outKeys -- baseKeys) == inserted,
      "audit classes (removed/added) must agree with the apply's actions")
    val actions = out.groupBy(_.getAs[String]("action")).view
      .mapValues(_.length.toLong).toMap
    assert(actions.getOrElse("inserted", 0L) == inserted.size.toLong)
    assert(actions.getOrElse("updated", 0L) == (cdcUp & baseKeys).size.toLong)
    assert(actions.getOrElse("kept", 0L)
      == (baseKeys -- cdcUp -- matchedDeletes).size.toLong)
  }

  test("theil-sen slope is the lower median of the exact pairwise slopes") {
    val rows = queries("q_events_theilsen")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val nDays = graft.ops.Tables.events(spark, sf)
      .select(to_date(date_trunc("day", col("ts")))).distinct().count()
    assert(r.getAs[Long]("n_pairs") == nDays * (nDays - 1) / 2)
    assert(r.getAs[Long]("ri") < r.getAs[Long]("rj"))
  }
}
