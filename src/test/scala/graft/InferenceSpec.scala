package graft

import org.apache.spark.sql.functions._
import graft.functions.JaroWinklerUtil
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 inference/fuzzy family: unit pins for the statistic formulas
  * (known closed-form values on tiny hand inputs) plus the JaroWinkler
  * expression's reference vectors — the classic Winkler '90 pairs every
  * implementation is graded against, and the edge conventions the DuckDB
  * oracle was probed for (boost threshold, prefix cap, empties). */
class InferenceSpec extends SparkTestBase {

  private def u8(s: String) = UTF8String.fromString(s)
  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.score(u8(a), u8(b))

  test("jaro-winkler reference vectors (Winkler '90 / rapidfuzz set)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("same", "same") === 1.0)
    assert(jw("", "") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window 0: no aligned match
  }

  test("jaro-winkler operates on code points, surrogate pairs included") {
    // CJK, window 0: matches only at aligned positions — m=2, prefix=2
    // jaro = (2/3 + 2/3 + 1)/3 = 0.77778 → jw = jaro + 2·0.1·(1−jaro)
    val cjk = jw("日本語", "日本誤")
    assert(math.abs(cjk - (0.7777777777777778 +
      0.2 * (1 - 0.7777777777777778))) < 1e-12)
    // astral-plane char (U+1D51E, a surrogate PAIR in UTF-16) must count
    // as ONE unit: "𝔞b" vs "ab" → m=1, jaro = (1/2 + 1/2 + 1)/3 = 2/3,
    // below the boost gate
    assert(math.abs(jw("𝔞b", "ab") - 2.0 / 3.0) < 1e-12)
    // symmetry and identity hold on mixed-width strings
    assert(jw("héllo", "hello") === jw("hello", "héllo"))
    assert(jw("日本語", "日本語") === 1.0)
  }

  test("jaro-winkler boost threshold: no prefix bonus at jaro <= 0.7") {
    // jaro("abcdxxxxxx","abcyyyyyyzzz") = 0.51667 with prefix 3 — the
    // bonus would lift it to 0.6617; DuckDB (and Winkler's original)
    // suppress the boost below 0.7, so score == jaro exactly
    val a = "abcdxxxxxx"; val b = "abcyyyyyyzzz"
    assert(math.abs(jw(a, b) - 0.5166666666666667) < 1e-12)
  }

  test("jaro-winkler prefix cap at 4") {
    // 10-char strings sharing an 8-char prefix: l is capped at 4
    val s1 = "abcdefghij"; val s2 = "abcdefghXY"
    val m = 8.0; val jaro = (m / 10 + m / 10 + m / m) / 3.0
    assert(math.abs(jw(s1, s2) - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  test("jaro-winkler codegen and interpreted paths agree on fixture names") {
    GraftFunctions.register(spark)
    val p = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_name")).limit(50).collect().map(_.getString(0))
    for (a <- p.take(10); b <- p.take(10)) {
      val viaSql = spark.sql(
        s"SELECT graft_jaro_winkler('${a}', '${b}')").head.getDouble(0)
      assert(viaSql === jw(a, b), s"($a, $b)")
    }
  }

  test("mann-whitney matches the closed form on a tiny two-sample input") {
    // groups: purchase {1,2,4}, click {3,5}; pooled ranks 1..5 (no ties)
    // R1 = 1+2+4 = 7 → U1 = 7 − 3·4/2 = 1; mean = 3; var = 3·2·6/12 = 3
    import spark.implicits._
    val df = Seq(
      ("purchase", 0.01), ("purchase", 0.02), ("purchase", 0.04),
      ("click", 0.03), ("click", 0.05)
    ).toDF("event_type", "value")
      .withColumn("ts", lit(ts("2024-01-05 10:00:00")))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("mwu").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.Inference.ops.find(_.name == "q_agg_mwu").get
      .fn(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n1") === 3L)
    assert(r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Double]("u1") === 1.0)
    // z = (1 − 3)/√3 = −1.154701 (r6 of −1.1547005…)
    assert(math.abs(r.getAs[Double]("z") - (-1.154701)) < 1e-9)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("grouped OLS recovers an exact line with r2 = 1") {
    import spark.implicits._
    // y = 200 cents/day · x + 0: three days of one event each, values
    // chosen so the daily total is exactly 2·day dollars
    val rows = Seq(
      ("2024-01-01 00:00:00", 2.0), ("2024-01-02 00:00:00", 4.0),
      ("2024-01-03 00:00:00", 6.0))
    val df = rows.map { case (t, v) => ("purchase", v, ts(t)) }
      .toDF("event_type", "value", "ts")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("regr").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.Inference.ops.find(_.name == "q_agg_regr").get
      .fn(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("anova F is 0 when all group means are equal") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("event_type", "value")
      .withColumn("ts", lit(ts("2024-01-05 10:00:00")))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("anova").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Inference.ops.find(_.name == "q_agg_anova").get
      .fn(spark, dir).collect().head
    assert(r.getAs[Long]("k") === 2L)
    assert(math.abs(r.getAs[Double]("ssb")) < 1e-9)
    assert(math.abs(r.getAs[Double]("f_stat")) < 1e-9)
  }

  test("cohen's kappa: perfect agreement → 1, independence → ~0") {
    import spark.implicits._
    // lang 'p': gates always agree; lang 'q': gates statistically
    // independent (2×2 uniform) → kappa 0
    def doc(lang: String, nChars: Long, spaces: Int) =
      (lang, ("x " * spaces) + "y", nChars)
    val rows =
      Seq.fill(10)(doc("p", 400L, 50)) ++ Seq.fill(10)(doc("p", 100L, 5)) ++
      Seq(doc("q", 400L, 50), doc("q", 400L, 5),
          doc("q", 100L, 50), doc("q", 100L, 5))
    val df = rows.toDF("lang", "text", "n_chars")
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("source", lit("t"))
    val dir = java.nio.file.Files.createTempDirectory("kappa").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ops.Inference.ops.find(_.name == "q_eval_kappa").get
      .fn(spark, dir).collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("p").getAs[Double]("kappa") === 1.0)
    assert(math.abs(out("q").getAs[Double]("kappa")) < 1e-9)
  }

  test("bollinger needs a full 20-day history and flags a spike") {
    import spark.implicits._
    // 24 flat days at $1.00 then one 25th day at $100 → only days 21+
    // emit; the spike day breaks out 'up'
    val rows = (1 to 24).map(i =>
      (f"2024-01-$i%02d 00:00:00", 1.0)) :+ ("2024-01-25 00:00:00", 100.0)
    val df = rows.map { case (t, v) => ("purchase", v, ts(t)) }
      .toDF("event_type", "value", "ts")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("boll").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.Inference.ops.find(_.name == "q_win_bollinger").get
      .fn(spark, dir).collect()
    assert(out.length === 5) // days 21..25
    val byDay = out.map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    assert(byDay("2024-01-21").getAs[String]("breakout") === "in")
    assert(byDay("2024-01-25").getAs[String]("breakout") === "up")
    assert(byDay("2024-01-25").getAs[Double]("value") === 100.0)
    // flat history: σ = 0, band collapses to the mean
    assert(byDay("2024-01-21").getAs[Double]("upper") === 1.0)
    assert(byDay("2024-01-21").getAs[Double]("lower") === 1.0)
  }

  test("kruskal-wallis H matches the closed form (no ties)") {
    import spark.implicits._
    // two groups {1,2} vs {3,4}: pooled ranks 1..4, R₁=3, R₂=7 →
    // H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4, no tie correction
    val df = Seq(("a", 0.01), ("a", 0.02), ("b", 0.03), ("b", 0.04))
      .toDF("event_type", "value")
      .withColumn("ts", lit(ts("2024-01-05 10:00:00")))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("kw").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Inference.ops.find(_.name == "q_agg_kruskal").get
      .fn(spark, dir).collect().head
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-9)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("spearman rho is 1 on a perfectly monotone day series") {
    import spark.implicits._
    // 3 days: counts 1,2,3 and totals strictly increasing with count
    val rows =
      Seq(("2024-01-01 01:00:00", 1.0)) ++
      Seq(("2024-01-02 01:00:00", 2.0), ("2024-01-02 02:00:00", 2.0)) ++
      Seq(("2024-01-03 01:00:00", 3.0), ("2024-01-03 02:00:00", 3.0),
          ("2024-01-03 03:00:00", 3.0))
    val df = rows.map { case (t, v) => ("purchase", v, ts(t)) }
      .toDF("event_type", "value", "ts")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("spear").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Inference.ops.find(_.name == "q_agg_spearman").get
      .fn(spark, dir).collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("rho") === 1.0)
  }

  test("kendall tau-b is 1 on a perfectly concordant series, with ties " +
       "in neither margin") {
    import spark.implicits._
    val rows =
      Seq(("2024-01-01 01:00:00", 1.0)) ++
      Seq(("2024-01-02 01:00:00", 2.0), ("2024-01-02 02:00:00", 2.0)) ++
      Seq(("2024-01-03 01:00:00", 3.0), ("2024-01-03 02:00:00", 3.0),
          ("2024-01-03 03:00:00", 3.0))
    val df = rows.map { case (t, v) => ("purchase", v, ts(t)) }
      .toDF("event_type", "value", "ts")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("kend").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Inference.ops.find(_.name == "q_agg_kendall").get
      .fn(spark, dir).collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("c") === 3L) // all C(3,2) pairs concordant
    assert(r.getAs[Long]("d") === 0L)
    assert(r.getAs[Double]("tau") === 1.0)
  }

  test("ljung-box flags a trending series and not a flat one") {
    import spark.implicits._
    def mk(vals: Seq[Double], tag: String) = {
      val rows = vals.zipWithIndex.map { case (v, i) =>
        ("purchase", v, ts(f"2024-01-${i + 1}%02d 00:00:00"))
      }
      val df = rows.toDF("event_type", "value", "ts")
        .withColumn("event_id", monotonically_increasing_id())
        .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      ops.Inference.ops.find(_.name == "q_events_ljungbox").get
        .fn(spark, dir).collect().head
    }
    // strong linear trend → massive positive autocorrelation at all lags
    val trend = mk((1 to 30).map(_.toDouble), "lb_t")
    assert(trend.getAs[Long]("n") === 30L)
    assert(trend.getAs[Boolean]("significant"),
      s"trending series must reject white noise: $trend")
    // alternating ±: strong NEGATIVE lag-1 autocorrelation — the two-sided
    // Q statistic must reject this too (rho² is sign-blind)
    val alt = mk((1 to 30).map(i => if (i % 2 == 0) 10.0 else 1.0), "lb_a")
    assert(alt.getAs[Boolean]("significant"))
  }

  test("token KL is 0 for a lang whose distribution equals the corpus") {
    import spark.implicits._
    // two langs with IDENTICAL token distributions → the global mix
    // equals each lang's mix → KL = 0 for both
    val rows = Seq(
      ("a", "x x y"), ("a", "x y z"),
      ("b", "x x y"), ("b", "x y z"))
    val df = rows.toDF("lang", "text")
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("kl").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ops.Inference.ops.find(_.name == "q_text_kl").get
      .fn(spark, dir).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") === 6L)
      assert(math.abs(r.getAs[Double]("kl")) < 1e-9, r.toString)
    }
    // skew lang 'b' hard toward one token → its KL must rise above 0
    val rows2 = Seq(("a", "x x y"), ("a", "x y z"), ("b", "w w w w w w"))
    val df2 = rows2.toDF("lang", "text")
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir2 = java.nio.file.Files.createTempDirectory("kl2").toString
    df2.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out2 = ops.Inference.ops.find(_.name == "q_text_kl").get
      .fn(spark, dir2).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("kl")).toMap
    assert(out2("b") > 0.5, s"divergent lang must score high: $out2")
    assert(out2("a") > 0.0)
  }

  test("bootstrap CI collapses to the mean on a constant-valued corpus") {
    import spark.implicits._
    // every replica's weighted mean of a constant is that constant, so
    // the rank-selected band is degenerate: lo == mean == hi
    val df = (1 to 200).map(i => ("purchase", 5.0, i.toLong))
      .toDF("event_type", "value", "event_id")
      .withColumn("ts", lit(ts("2024-01-05 10:00:00")))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("boot").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Inference.ops.find(_.name == "q_agg_bootstrap").get
      .fn(spark, dir).collect().head
    assert(r.getAs[Long]("n") === 200L)
    assert(r.getAs[Double]("mean") === 5.0)
    assert(r.getAs[Double]("ci_lo") === 5.0)
    assert(r.getAs[Double]("ci_hi") === 5.0)
  }

  test("difference-in-differences recovers a planted uplift exactly") {
    import spark.implicits._
    // A: 10 pre, 11 post (+1 drift); B: 10 pre, 13 post (+3) → DiD = +2
    def rows(uid: Long, day: String, v: Double, n: Int) =
      Seq.fill(n)(("purchase", v, ts(s"$day 10:00:00"), uid))
    val all =
      rows(2L, "2024-01-05", 10.0, 50) ++ rows(2L, "2024-01-20", 11.0, 50) ++
      rows(1L, "2024-01-05", 10.0, 50) ++ rows(1L, "2024-01-20", 13.0, 50)
    val df = all.toDF("event_type", "value", "ts", "user_id")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("did").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Inference.ops.find(_.name == "q_events_did").get
      .fn(spark, dir).collect().head
    assert(r.getAs[Long]("n00") === 50L)
    assert(r.getAs[Double]("did") === 2.0)
    // constant per cell → zero within-cell variance → SE 0, t NULL/∞ guard
    assert(r.getAs[Double]("se") === 0.0)
  }

  test("degenerate corpora yield NULL statistics, never ANSI divide-by-zero") {
    import spark.implicits._
    // every value identical: all-tied ranks, zero variances everywhere —
    // the worst-case input for each test statistic's denominator
    val rows = for {
      day <- 1 to 10; et <- Seq("purchase", "click"); i <- 1 to 3
    } yield (et, 2.0, ts(f"2024-01-$day%02d 0$i:00:00"))
    val df = rows.toDF("event_type", "value", "ts")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", col("event_id") % 4)
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("degen").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    def run(name: String) =
      ops.Inference.ops.find(_.name == name).get.fn(spark, dir).collect()
    val mwu = run("q_agg_mwu")
    assert(mwu.length === 10)
    assert(mwu.forall(_.isNullAt(mwu.head.fieldIndex("z"))))
    val kw = run("q_agg_kruskal")
    assert(kw.forall(_.isNullAt(kw.head.fieldIndex("h"))))
    val sp = run("q_agg_spearman")
    assert(sp.forall(_.isNullAt(sp.head.fieldIndex("rho"))))
    val kd = run("q_agg_kendall")
    assert(kd.forall(_.isNullAt(kd.head.fieldIndex("tau"))))
    val rg = run("q_agg_regr")
    assert(rg.forall(r => r.getAs[Double]("slope") == 0.0
      && r.isNullAt(r.fieldIndex("r2"))), "flat y: slope 0, r2 undefined")
    val av = run("q_agg_anova").head
    assert(av.getAs[Double]("ssw") === 0.0)
    assert(av.isNullAt(av.fieldIndex("f_stat")))
    val lb = run("q_events_ljungbox").head
    assert(lb.isNullAt(lb.fieldIndex("q_stat")))
  }

  test("jarowinkler op: block pairing and threshold match a brute replay") {
    GraftFunctions.register(spark)
    // independent replay of the op's size-blocked near-match semantics at
    // sf0.001: the op must return exactly the thresholded subset, and the
    // distributed expression must agree with the driver-side scorer on
    // every candidate pair
    val p = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_name", "p_size").collect()
    val brute = for {
      a <- p; b <- p
      if a.getAs[Int]("p_size") == b.getAs[Int]("p_size")
      if a.getAs[Long]("p_partkey") < b.getAs[Long]("p_partkey")
      if a.getAs[String]("p_name") != b.getAs[String]("p_name")
    } yield ((a.getAs[Long]("p_partkey"), b.getAs[Long]("p_partkey")),
             jw(a.getAs[String]("p_name"), b.getAs[String]("p_name")))
    val expected = brute.collect {
      case (k, s) if math.floor(s * 1e6 + 0.5) / 1e6 >= 0.9 => k
    }.toSet
    assert(expected.nonEmpty)
    val got = ops.Inference.ops.find(_.name == "q_text_jarowinkler").get
      .fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"))).toSet
    assert(got === expected)
    assert(got.forall { case (p1, p2) => p1 < p2 })
  }
}
