package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions injection: a session built with `.withExtensions(new
  * GraftExtensions)` (≡ spark.sql.extensions=graft.GraftExtensions) can
  * call graft_dot from SQL, and the native expression agrees with the
  * higher-order-function formulation it replaced. */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_dot is injected and matches the HOF formulation") {
    // getOrCreate only applies extensions when it actually creates a
    // session, so detach any active one first; the SparkContext is shared
    // and must NOT be stopped (sibling suites use it)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val viaNative = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .collect().head.getDouble(0)
    assert(viaNative == 32.0)
    // agreement with the HOF chain it replaced
    val rows = spark.sql(
      """SELECT graft_dot(a, b) AS nat,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS hof
        |FROM (SELECT array(0.5D, -1.25D, 3.0D, 2.0D) AS a,
        |             array(1.5D, 2.0D, -0.5D, 0.25D) AS b)""".stripMargin)
      .collect().head
    assert(rows.getDouble(0) == rows.getDouble(1), "native vs HOF drift")
    // null safety
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .collect().head
    assert(n.isNullAt(0))
  }

  test("graft_topk SpaceSaving sketch honors the heavy-hitter guarantees") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-topk-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    import spark.implicits._
    // zipf-ish stream: item i appears ~1000/i times, forced through
    // multiple partitions so partial buffers really merge
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item_$i"))
    val df = rows.toDF("tok").repartition(4)
    df.createOrReplaceTempView("toks")
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = rows.size.toLong
    val capacity = 16
    val sketch = spark.sql(
      s"SELECT inline(graft_topk(tok, $capacity, $capacity)) FROM toks")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every item with true frequency > N/capacity must be reported
    val mandatory = exact.filter(_._2 > n / capacity).keySet
    val reported = sketch.map(_._1).toSet
    assert(mandatory.subsetOf(reported),
           s"missing guaranteed heavy hitters: ${mandatory -- reported}")
    // est >= true >= est - err for every reported item
    sketch.foreach { case (item, est, err) =>
      val t = exact.getOrElse(item, 0L)
      assert(est >= t && t >= est - err, s"$item: est=$est err=$err true=$t")
    }
    // and the top-3 by estimate are the true top-3 (well separated here)
    val top3 = sketch.sortBy(-_._2).take(3).map(_._1).toSeq
    assert(top3 == Seq("item_1", "item_2", "item_3"), s"got $top3")

    // items beyond the 64 KiB modified-UTF-8 limit must round-trip the
    // shuffle serializer (writeUTF would throw UTFDataFormatException)
    val big = "x" * 100000
    val bigDf = (Seq.fill(8)(big) ++ Seq.fill(3)("small")).toDF("tok").repartition(4)
    bigDf.createOrReplaceTempView("bigtoks")
    val bigSketch = spark.sql("SELECT inline(graft_topk(tok, 4, 2)) FROM bigtoks")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(bigSketch.toMap.get(big).contains(8L),
           s"oversized token lost in serialization: ${bigSketch.map(t => (t._1.take(10), t._2)).toSeq}")
  }

  test("graft_topk state merges across streaming micro-batches (complete mode)") {
    // the heavy-hitters sketch as STREAMING state: a TypedImperativeAggregate
    // buffer must serialize into the state store at each micro-batch boundary
    // and merge with the next batch's partials — the shape a continuous
    // trending-items pipeline runs. Capacity (16) > distinct items (4) keeps
    // SpaceSaving exact here, so the streamed result must EQUAL the exact
    // totals across both batches, proving no state was lost or double-counted.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-topk-stream-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[String]
    val q = ms.toDF().toDF("tok")
      .groupBy()
      .agg(org.apache.spark.sql.functions.expr("graft_topk(tok, 16, 4)").as("tk"))
      .writeStream.format("memory").queryName("graft_topk_stream")
      .outputMode("complete").start()
    try {
      ms.addData(Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma"): _*)
      q.processAllAvailable()
      ms.addData(Seq.fill(4)("beta") ++ Seq.fill(2)("delta") ++ Seq("alpha"): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT inline(tk) FROM graft_topk_stream")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("beta" -> 7L, "alpha" -> 6L, "delta" -> 2L, "gamma" -> 1L),
             s"streamed sketch diverged from exact cross-batch totals: $got")
    } finally q.stop()
  }

  test("graft_exact_pct is bit-identical to Spark's percentile") {
    // r16: the primitive-buffer exact percentile replaced Spark's boxed
    // value→count map in q_agg_mad / q_agg_eqdepth / q_agg_percentile /
    // q_dq_psi — this pin holds the swap to BIT-equality (same sort,
    // same interpolation, same NULL-on-empty), across duplicates, ties,
    // negative values, nulls, group keys, and both scalar and array
    // percentage forms, on an adversarial value set (n and n-1 both
    // non-divisible by common percentage denominators so interpolation
    // actually fires).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-exact-pct-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val rnd = new scala.util.Random(41)
    val rows = (1 to 9973).map { i =>
      val g = i % 3
      val v: java.lang.Double =
        if (i % 97 == 0) null
        else if (i % 11 == 0) math.floor(rnd.nextDouble() * 10) // ties
        else rnd.nextDouble() * 2000.0 - 1000.0
      (g, v)
    } :+ ((3, null: java.lang.Double)) // an all-null group → NULL out
    val df = spark.createDataFrame(rows).toDF("g", "v")
    df.createOrReplaceTempView("pct_probe")
    val q =
      """SELECT g,
        |  percentile(v, 0.5) AS sp_med,
        |  graft_exact_pct(v, 0.5) AS gr_med,
        |  percentile(v, array(0.1, 0.25, 0.333, 0.5, 0.77, 0.9, 1.0)) AS sp_arr,
        |  graft_exact_pct(v, array(0.1D, 0.25D, 0.333D, 0.5D, 0.77D, 0.9D, 1.0D)) AS gr_arr,
        |  percentile(v, 0.0) AS sp_min, graft_exact_pct(v, 0.0D) AS gr_min
        |FROM pct_probe GROUP BY g""".stripMargin
    spark.sql(q).collect().foreach { r =>
      val g = r.getInt(0)
      assert(java.util.Objects.equals(r.get(1), r.get(2)),
        s"scalar median diverged for group $g: ${r.get(1)} vs ${r.get(2)}")
      assert(java.util.Objects.equals(r.get(3), r.get(4)),
        s"array percentiles diverged for group $g: ${r.get(3)} vs ${r.get(4)}")
      assert(java.util.Objects.equals(r.get(5), r.get(6)),
        s"p0 diverged for group $g: ${r.get(5)} vs ${r.get(6)}")
      if (g == 3) assert(r.get(2) == null,
        "all-null group must evaluate to NULL, like percentile")
    }
  }

  test("graft_l2 is bit-identical to the aggregate(sequence(...)) HOF") {
    // r16: the native range-L2 replaced the interpreted HOF fold in
    // q_vec_pq / q_sim_ivfpq — this pin holds the swap to BIT-equality
    // (same left-to-right FP op order) on random vectors, including
    // expression-valued subspace bounds and null propagation.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-l2-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val rnd = new scala.util.Random(43)
    val rows = (1 to 500).map { i =>
      (i % 8, Array.fill(64)(rnd.nextDouble() * 2 - 1),
              Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    spark.createDataFrame(rows).toDF("s", "a", "b")
      .createOrReplaceTempView("l2_probe")
    val q =
      """SELECT
        |  graft_l2(a, b, 1, 64) AS nat_full,
        |  aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE), (acc, i) ->
        |    acc + (element_at(a, i) - element_at(b, i))
        |        * (element_at(a, i) - element_at(b, i))) AS hof_full,
        |  graft_l2(a, b, s*8 + 1, s*8 + 8) AS nat_sub,
        |  aggregate(sequence(s*8 + 1, s*8 + 8), CAST(0.0 AS DOUBLE), (acc, i) ->
        |    acc + (element_at(a, i) - element_at(b, i))
        |        * (element_at(a, i) - element_at(b, i))) AS hof_sub
        |FROM l2_probe""".stripMargin
    spark.sql(q).collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"full-range L2 drift: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(r.getDouble(2) == r.getDouble(3),
        s"subspace L2 drift: ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
    // hi < lo ≡ empty sequence ≡ 0.0; null array → NULL
    val edge = spark.sql(
      """SELECT graft_l2(array(1.0D), array(2.0D), 2, 1),
        |  graft_l2(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D), 1, 1)"""
        .stripMargin).collect().head
    assert(edge.getDouble(0) == 0.0)
    assert(edge.isNullAt(1))
  }
}
