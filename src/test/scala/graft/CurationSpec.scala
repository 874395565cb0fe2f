package graft

import graft.ops.{Curation, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the curation family (sf0.001) — properties the
  * DuckDB hash-compare can't express: conservation laws, greedy maximality,
  * and distributional sanity of the deterministic sampler. */
class CurationSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sf)

  test("dedupSegments conserves distinct segments and keeps doc 0's head") {
    val out = Curation.dedupSegments(docs, 8).cache()
    // every output doc exists, n_kept never exceeds n_segs
    assert(out.filter(col("n_kept") > col("n_segs")).count() == 0)
    assert(out.count() == docs.count())
    // conservation: exactly one surviving copy of each distinct segment
    val segs = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(explode(transform(
        sequence(lit(0), ceil(size(col("toks")) / lit(8.0)).cast("int") - 1),
        i => array_join(slice(col("toks"), i * 8 + 1, lit(8)), " "))).as("seg"))
    val distinctSegs = segs.select("seg").distinct().count()
    val totalKept = out.agg(sum("n_kept")).collect().head.getLong(0)
    assert(totalKept == distinctSegs,
      s"kept $totalKept != $distinctSegs distinct segments")
    // the globally-first doc always keeps its first segment
    val d0 = out.orderBy("doc_id").limit(1).collect().head
    assert(d0.getAs[Long]("n_kept") >= 1L)
    // reassembled text token count == 8·full kept segments (± short tail)
    val bad = out.filter(col("n_kept") > 0 &&
      size(split(col("new_text"), " ")) > col("n_kept") * 8).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("dedupSegments strips planted cross-doc boilerplate, first doc keeps it") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter for updates every single day"
    val rows = Seq(
      (10L, s"$boiler unique alpha content first document body words here"),
      (20L, s"$boiler unique beta content second document body words here"),
      (30L, "entirely original gamma content third document body words done"))
      .toDF("doc_id", "text")
    val out = Curation.dedupSegments(rows, 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("new_text"))).toMap
    // the 8-token boilerplate segment survives ONLY in doc 10
    assert(out(10L)._2.startsWith(boiler.split(" ").take(8).mkString(" ")))
    assert(!out(20L)._2.contains("subscribe"),
      s"doc 20 must lose the boilerplate: ${out(20L)._2}")
    // non-boilerplate content always survives
    assert(out(20L)._2.contains("beta"))
    assert(out(30L)._1 == 2L, "untouched doc keeps all its segments")
  }

  test("merge upsert: action counts follow the key arithmetic") {
    val out = SparkEntry.queries("q_merge_upsert")(spark, sf).cache()
    val orders = Tables.orders(spark, sf)
    val baseN = orders.filter(col("o_orderkey") % 3 =!= 0).count()
    val chgN = orders.filter(col("o_orderkey") % 2 === 0).count()
    val bothN = orders.filter(col("o_orderkey") % 3 =!= 0 &&
                              col("o_orderkey") % 2 === 0).count()
    val acts = out.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(acts.getOrElse("updated", 0L) == bothN)
    assert(acts.getOrElse("inserted", 0L) == chgN - bothN)
    assert(acts.getOrElse("kept", 0L) == baseN - bothN)
    // result keys = base ∪ change set, each exactly once
    assert(out.count() == baseN + chgN - bothN)
    assert(out.select("o_orderkey").distinct().count() == out.count())
    out.unpersist()
  }

  test("mixDomains: rates are min(1, w·N/n) and sampling tracks the rate") {
    val weights = Seq("en" -> 0.4, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.1, "de" -> 0.1)
    val out = Curation.mixDomains(docs, weights).cache()
    val n = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = n.values.sum
    val kept = out.groupBy("lang").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, w) <- weights) {
      val rate = math.min(1.0, w * total / n(lang))
      val k = kept.getOrElse(lang, 0L)
      assert(k <= n(lang))
      // md5-uniform keep: observed fraction within ±0.15 of the rate
      assert(math.abs(k.toDouble / n(lang) - rate) < 0.15,
        s"$lang kept ${k.toDouble / n(lang)} vs rate $rate")
    }
    // a doc's keep decision is a pure function of doc_id + rate: rerunning
    // yields the identical set (determinism)
    val again = Curation.mixDomains(docs, weights)
    assert(out.select("doc_id").except(again.select("doc_id")).count() == 0)
    assert(again.select("doc_id").except(out.select("doc_id")).count() == 0)
    out.unpersist()
  }

  test("budgetSelect: greedy quality-prefix within the token budget") {
    val sel = Curation.budgetSelect(docs, 5).cache()
    val qual = graft.ops.LlmOps.qualityScores(docs, 5)
      .select("doc_id", "quality", "n_toks").cache()
    val budget = qual.agg(sum("n_toks")).collect().head.getLong(0) / 4
    val used = sel.agg(sum("n_toks")).collect().head.getLong(0)
    assert(used <= budget, s"selected $used tokens > budget $budget")
    // prefix property: every selected quality >= every unselected quality
    val minSel = sel.agg(min("quality")).collect().head.getDouble(0)
    val unsel = qual.join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxUnsel = unsel.agg(max("quality")).collect().head.getDouble(0)
    assert(minSel >= maxUnsel)
    // maximality: adding the best unselected GROUP would break the budget
    val nextTokens = unsel.filter(col("quality") === maxUnsel)
      .agg(sum("n_toks")).collect().head.getLong(0)
    assert(used + nextTokens > budget)
    sel.unpersist(); qual.unpersist()
  }

  test("softDedupWeights: weights sum to 1 per duplicate group") {
    val out = Curation.softDedupWeights(docs)
    assert(out.count() == docs.count())
    assert(out.filter(col("weight") <= 0 || col("weight") > 1).count() == 0)
    // Σ weight == n_copies · (1/n_copies) ≈ 1 per group ⇒ corpus-wide sum
    // equals the number of distinct normalized texts (within rounding)
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val groups = docs.select(norm.as("k")).distinct().count()
    val wsum = out.agg(sum("weight")).collect().head.getDouble(0)
    assert(math.abs(wsum - groups) < 0.01 * groups + 1)
  }

  test("q_events_stationary: converged probability vector") {
    val pi = SparkEntry.queries("q_events_stationary")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a distribution: sums to 1 within per-step rounding slack, all > 0
    assert(math.abs(pi.values.sum - 1.0) < 1e-3, s"sum ${pi.values.sum}")
    assert(pi.values.forall(_ > 0))
    // fixpoint: one more power step moves nothing beyond rounding noise
    val ev = Tables.events(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("cur"))
    val t = ev.select(col("user_id"), col("event_type").as("cur"),
                      lead(col("event_type"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
      .select(col("cur"), col("nxt"),
              (col("n") * lit(1.0) / sum(col("n")).over(wc)).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val next = pi.keys.map { y =>
      y -> pi.keys.map(x => pi(x) * t.getOrElse((x, y), 0.0)).sum
    }.toMap
    val drift = pi.keys.map(k => math.abs(next(k) - pi(k))).max
    assert(drift < 1e-4, s"power step still moves the vector by $drift")
  }

  test("lmScoreBuckets: fixed-grid partition of scored docs") {
    val out = Curation.lmScoreBuckets(docs, 256).collect()
    // the fixture's score spread (~0.4 over width 0.023) must fill several
    // buckets — a 1-bar histogram would mean the grid stopped resolving
    assert(out.length >= 4 && out.length <= 256, s"${out.length} buckets")
    assert(out.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 255
    })
    val scored = docs.filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == scored)
    // per-bucket ordering: min <= avg <= max, buckets ascending by range
    assert(out.forall { r =>
      r.getAs[Double]("min_score") <= r.getAs[Double]("avg_score") + 1e-6 &&
      r.getAs[Double]("avg_score") <= r.getAs[Double]("max_score") + 1e-6
    })
    val byBucket = out.sortBy(_.getAs[Long]("bucket"))
    assert(byBucket.sliding(2).forall {
      case Array(a, b) =>
        a.getAs[Double]("max_score") <= b.getAs[Double]("min_score") + 1e-6
      case _ => true
    })
  }

  test("q_mix_temperature: a distribution that flattens toward uniform") {
    val out = SparkEntry.queries("q_mix_temperature")(spark, sf).collect()
    val byLang = out.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n"), r.getAs[Double]("p"), r.getAs[Double]("q"),
       r.getAs[Double]("boost"))).toMap
    // q is a distribution (within per-lang rounding slack)
    assert(math.abs(byLang.values.map(_._3).sum - 1.0) < 1e-3)
    // temperature < 1 flattens: every lang's q sits between p and uniform,
    // so low-resource langs get boost > 1 and the top lang boost < 1
    val top = byLang.maxBy(_._2._1)._1
    val bottom = byLang.minBy(_._2._1)._1
    assert(byLang(top)._4 < 1.0, s"top lang $top boost ${byLang(top)._4}")
    assert(byLang(bottom)._4 > 1.0)
    // order-preserving: flattened shares never invert the raw ranking
    val sorted = byLang.values.toSeq.sortBy(_._2)
    assert(sorted.map(_._3) == sorted.map(_._3).sorted,
      "q must be monotone in p")
  }

  test("q_sample_dsir: weights separate target-language docs from the rest") {
    val out = SparkEntry.queries("q_sample_dsir")(spark, sf).cache()
    assert(out.count() == docs.count())
    val j = out.join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val avg = j.groupBy((col("lang") === "en").as("is_en"))
      .agg(org.apache.spark.sql.functions.avg(col("logw") / col("n_toks")).as("a"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the importance weight is a log-likelihood ratio toward the en slice:
    // en docs must average strictly higher per-token than non-en docs
    assert(avg(true) > avg(false),
      s"en ${avg(true)} !> other ${avg(false)}")
    // keep flag is exactly the sign of the weight
    assert(out.filter((col("logw") > 0) =!= (col("keep") === 1)).count() == 0)
    out.unpersist()
  }

  test("seenBloom: planted dups never miss; FP rate stays near the filter's design") {
    import org.apache.spark.sql.functions._
    // corpus of 2000 unique texts; a new batch of 500 where every 5th doc
    // is an EXACT copy of a corpus text (100 planted dups, 400 novel)
    val cp = spark.range(2000)
      .select(col("id").as("doc_id"),
              concat(lit("corpus text block "), col("id"),
                     lit(" with filler words")).as("text"))
    val nd = spark.range(500)
      .select((col("id") + 10000).as("doc_id"),
        when(col("id") % 5 === 0,
             concat(lit("corpus text block "), col("id") * 4,
                    lit(" with filler words")))
          .otherwise(concat(lit("novel text block "), col("id"),
                            lit(" nothing like corpus"))).as("text"))
    val r = graft.ops.Curation.seenBloom(nd, cp).collect()
    val dups = r.filter(_.getLong(2) == 1)
    assert(dups.length == 100, s"expected 100 planted dups, got ${dups.length}")
    // Bloom guarantee: NO false negative, ever
    assert(dups.forall(_.getLong(1) == 1), "an actual dup was not flagged")
    // false positives bounded: 2000 docs × 4 bits in 65536 → fill ≈ 11.5%,
    // FP ≈ fill⁴ ≈ 0.02% — allow generous headroom for hash clumping
    val fps = r.count(x => x.getLong(1) == 1 && x.getLong(2) == 0)
    assert(fps <= 5, s"false-positive count $fps exceeds the design rate")
  }
}
