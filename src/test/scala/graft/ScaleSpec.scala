package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale patterns that the 100 TB design leans on, demonstrated and
  * asserted on the local plan: bucketed co-located joins (no shuffle) and
  * partition-pruned reads (no full scan). */
class ScaleSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    // warehouse + derby dirs are pinned to /tmp via build.sbt javaOptions;
    // the in-memory catalog forgets tables between JVMs while their files
    // persist, so clear both before writing
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val o = graft.ops.Tables.orders(spark, sf)
    val c = graft.ops.Tables.customer(spark, sf)
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
            col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == o.count())
  }

  test("partitioned parquet read prunes partitions") {
    val dir = Files.createTempDirectory("graft_part").toString
    graft.ops.Tables.events(spark, sf)
      .withColumn("etype", col("event_type"))
      .write.mode("overwrite").partitionBy("etype").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("etype") === "purchase")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    val expected = graft.ops.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
    // pruning means only the one directory is read
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(expected > 0)
  }

  test("filters and projections reach the parquet scan") {
    val plan = SparkEntry.queries("q_scan_pushdown")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(!plan.contains("l_extendedprice"), "unused columns must be pruned")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("q_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("dimension joins broadcast the small side") {
    val plan = SparkEntry.queries("q_join_broadcast")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("banded near-dup candidate joins never use BroadcastNestedLoopJoin") {
    // the quadratic all-pairs scans were replaced with equi-joins on band
    // buckets (simhash: pigeonhole prefix bands; cosine: LSH buckets) — a
    // BroadcastNestedLoopJoin anywhere in these plans would mean the O(n²)
    // plan crept back in
    for (q <- Seq("q_dedup_simhash", "q_sim_cosine_dup_lsh", "q_dedup_minhash",
                  "q_dedup_lsh", "q_dedup_incremental", "q_join_range",
                  "q_sim_knn_lsh",
                  // the PIT feature join carries a user_id equi key — a
                  // nested loop would be the quadratic plan creeping in
                  "q_join_pit")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q must shard candidates by bucket, not scan all pairs:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q must shard candidates by bucket, not cross-join:\n$plan")
    }
  }

  test("triangle wedge/closing joins are equi joins; only the 1-row threshold broadcasts") {
    // inspect the RAW builder, not the registry op: the op reads the
    // memoized checkpoint (a LogicalRDD scan that would pass these
    // asserts vacuously); the machinery under test lives in the builder
    val (_, corners, scaffold) = graft.ops.Graph.triangleCorners(spark, sf)
    val plan = corners.queryExecution.executedPlan.toString
    scaffold.unpersist()
    assert(!plan.contains("CartesianProduct"),
      s"triangle counting must never cross-join the corpus:\n$plan")
    // the only sanctioned nested-loop join is the 1-row mean+2σ threshold
    // frame broadcast against the pair table (its condition references
    // `support`). The wedge join (on the oriented source) and the closing
    // join (on the target pair) must both be hash/sort-merge equi joins.
    // (Count lines, not occurrences — the plan STRING duplicates shared
    // subtrees per reference, so the one BNLJ prints many times.)
    val rogue = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin"))
      .filterNot(_.contains("support"))
      .toSeq
    assert(rogue.isEmpty,
      s"non-threshold nested-loop join in triangle plan:\n${rogue.mkString("\n")}")
  }

  test("lateral join decorrelates to a rank-limit window, not per-row re-execution") {
    val plan = SparkEntry.queries("q_join_lateral")(spark, sf)
      .queryExecution.executedPlan.toString
    // WindowGroupLimit = Catalyst pushed the per-customer LIMIT into a
    // partial top-k below the shuffle — the plan shape that scales
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("deterministic split is map-only — no exchange anywhere in the plan") {
    // q_sample_split must stay embarrassingly parallel: an Exchange here
    // would mean the md5 bucketing got hidden behind a shuffle
    val plan = SparkEntry.queries("q_sample_split")(spark, sf)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the final ORDER BY's rangepartitioning —
    // a hashpartitioning would mean a groupBy/join crept into the bucketing
    assert(!plan.contains("hashpartitioning"), s"split must be map-only:\n$plan")
  }

  test("SCD2 build shuffles once on the partition key") {
    val plan = SparkEntry.queries("q_scd2_build")(spark, sf)
      .queryExecution.executedPlan.toString
    // one hashpartitioning exchange for the per-customer window; the only
    // other allowed exchange is the final ORDER BY's rangepartitioning
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected exactly one hash exchange, got $hashEx:\n$plan")
  }

  test("minhash signature stage is shuffle-free (map-only array_min)") {
    val plan = graft.ops.LlmOps.minhashSigs(
      graft.ops.Tables.documents(spark, sf)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signatures must not shuffle:\n$plan")
  }

  test("segment dedup picks first occurrences with an aggregate, not a window") {
    // the chosen shape: groupBy(seg).min(struct) + join back — partial
    // aggregation combines a hot boilerplate segment map-side before the
    // shuffle. A Window over partitionBy(seg) would funnel the hot segment
    // through one task; assert it never creeps in.
    val plan = SparkEntry.queries("q_dedup_segments")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"first-occurrence must be an agg:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"expected a partial-aggregating min:\n$plan")
  }

  test("mixture sampling broadcasts the rate table and keeps the scan map-only") {
    val plan = SparkEntry.queries("q_mix_domains")(spark, sf)
      .queryExecution.executedPlan.toString
    // the docs-side join against the domain-count-bounded rate table must
    // be a broadcast — a hash exchange on the corpus side would mean the
    // rate table lost its broadcast and the sampler now shuffles 100 TB
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"rate join must broadcast:\n$plan")
  }

  test("budget selection windows over score groups, never the corpus") {
    // the running-sum window must consume the post-aggregation
    // distinct-quality table (≤10⁴+1 rows by rounding), i.e. sit ABOVE a
    // HashAggregate on quality — windowing raw docs would be a global sort
    // of the corpus through one partition
    val df = SparkEntry.queries("q_budget_select")(spark, sf)
    val planStr = df.queryExecution.executedPlan.toString
    val winIdx = planStr.indexOf("Window")
    assert(winIdx >= 0, planStr)
    assert(planStr.substring(winIdx).contains("HashAggregate"),
      s"running-sum window must read the aggregated score groups:\n$planStr")
  }

  test("correlated EXISTS decorrelates to a semi join, not per-row re-execution") {
    val plan = SparkEntry.queries("q_tpch_q4")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("merge upsert plans a keyed join, never a nested loop") {
    val plan = SparkEntry.queries("q_merge_upsert")(spark, sf)
      .queryExecution.executedPlan.toString
    // FULL OUTER on the merge key must be a hash/sort-merge equi-join; a
    // BroadcastNestedLoopJoin would mean the ON condition stopped being
    // an equi-key and the merge scans base×changes at 100 TB
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("FullOuter"), s"merge must stay a full join:\n$plan")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the 100 TB lever behind semi-join reduction: a selective filter on
    // the dim side gets turned into a bloom-filter predicate pushed into
    // the FACT-side scan, so rows that cannot join die before the shuffle.
    // Spark injects it (InjectRuntimeFilter) only for non-broadcast joins
    // above the application-side size threshold — thresholds here are set
    // to what a 100 TB fact table would trivially clear, and broadcast is
    // disabled because a broadcastable dim needs no reduction.
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val li = graft.ops.Tables.lineitem(spark, sf)
      val dim = graft.ops.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      val opt = j.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("might_contain"),
        s"expected an injected bloom-filter predicate on the fact side:\n$opt")
      assert(j.count() == 1)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("z-order layout narrows per-partition extents on BOTH dimensions") {
    // the footer-metadata effect z-ordering buys: after laying lineitem
    // out along the (part, supplier) curve, each partition (stand-in for
    // a file) covers a small rectangle of the key plane — so a filter on
    // EITHER dimension can skip most partitions. A plain sort on partkey
    // alone leaves the suppkey extent at ~full width in every file.
    val li = graft.ops.Tables.lineitem(spark, sf)
    def extents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val e = df
        .groupBy(spark_partition_id().as("p"))
        .agg((max("l_partkey") - min("l_partkey")).as("pw"),
             (max("l_suppkey") - min("l_suppkey")).as("sw"))
        .agg(avg("pw"), avg("sw")).collect().head
      (e.getDouble(0), e.getDouble(1))
    }
    val bySingle = li.repartitionByRange(16, col("l_partkey"))
    val byZ = graft.ops.Layout.zorder(li, "l_partkey", "l_suppkey", 16)
    val (zP, zS) = extents(byZ)
    val (sP, sS) = extents(bySingle)
    val (fullP, fullS) = (
      li.agg(max("l_partkey") - min("l_partkey")).collect().head.getLong(0).toDouble,
      li.agg(max("l_suppkey") - min("l_suppkey")).collect().head.getLong(0).toDouble)
    // single-column sort: near-perfect on its own key, useless on the other
    assert(sP < fullP / 4, s"range layout should narrow partkey: $sP vs $fullP")
    assert(sS > fullS * 0.8, s"single-key layout leaves suppkey wide: $sS vs $fullS")
    // z-order: BOTH dimensions substantially narrower than full width
    assert(zP < fullP * 0.6, s"z-order should narrow partkey: $zP vs $fullP")
    assert(zS < fullS * 0.6, s"z-order should narrow suppkey: $zS vs $fullS")
  }

  test("salted skew join broadcasts the replicated dimension") {
    val plan = SparkEntry.queries("q_join_salted")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("AQE splits skewed join partitions when thresholds are hit") {
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one hot key (90% of rows) + a long tail
      val skewed = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
                col("id").as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = skewed.join(dim, Seq("k"))
      // execute THIS queryExecution (count() would plan its own); AQE only
      // materializes the final skew-split plan after execution
      joined.queryExecution.toRdd.foreach(_ => ())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE coalesces small shuffle partitions") {
    val df = graft.ops.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") || plan.contains("coalesced") ||
           spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("dynamic partition pruning injects a runtime filter into the fact scan") {
    // the 100 TB lever beyond static pruning: a filter on the DIM side
    // prunes FACT partitions at runtime via a DPP subquery (reusing the
    // join's broadcast). Static PartitionFilters can't see through the
    // join; the dynamicpruning expression is what keeps a
    // dim-filtered join from scanning every fact partition.
    val dir = Files.createTempDirectory("graft_dpp").toString
    graft.ops.Tables.orders(spark, sf)
      .withColumn("bucket", pmod(col("o_custkey"), lit(10)))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = graft.ops.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"),
              pmod(col("c_custkey"), lit(10)).as("bucket"))
      .filter(col("bucket") === 3)
    val joined = fact.join(dim, Seq("bucket"))
    val plan = joined.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a DPP subquery filter:\n$plan")
    assert(joined.count() > 0)
  }

  test("blocklist gate is map-only — the term list rides the expression") {
    // the bounded blocklist is a literal array inside the codegen'd
    // filter, so the gate must run at scan speed: no groupBy/join
    // exchange; only the final ORDER BY's rangepartitioning is allowed
    val plan = SparkEntry.queries("q_text_blocklist")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"blocklist gate must be map-only:\n$plan")
  }

  test("gopher quality gate is map-only — every signal an in-row HOF") {
    // a hashpartitioning exchange would mean a groupBy/join crept into
    // what must run at scan speed; only the final ORDER BY's
    // rangepartitioning is allowed
    val plan = SparkEntry.queries("q_text_gopher")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"gopher gate must be map-only:\n$plan")
  }

  test("int8 quantization shuffles only the 64-row stats side; encode is map-only") {
    // pass 1 (per-dimension min/max) is the single allowed hash exchange;
    // the folded 1-row stats frame must broadcast back, and pass 2
    // (encode/decode/error) adds no exchange of its own
    val plan = SparkEntry.queries("q_vec_quantize")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1,
      s"only the per-dimension stats agg may hash-shuffle, got $hashEx:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"stats row must broadcast onto the corpus scan:\n$plan")
    // reconstruction sanity: per-dim quantization error ≤ (step/2)² with
    // step = range/255 ≈ 2.4e-3 on the unit-norm fixture → mse ≪ 1e-5
    val mse = SparkEntry.queries("q_vec_quantize")(spark, sf)
      .agg(max("mse"), min("mse")).head()
    assert(mse.getDouble(1) >= 0.0 && mse.getDouble(0) <= 1e-5, mse.toString)
  }

  test("co-occurrence mining caps hot customers and takes a bounded top-k") {
    val df = SparkEntry.queries("q_graph_cooccur")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the quadratic step must stay an equi-join on the customer bucket —
    // never a nested-loop over supplier pairs
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"pair generation must shard by customer:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 must not globally sort:\n$plan")
    // the degree≤100 cap bounds within-customer pair fan-out
    val pairs = df.collect()
    assert(pairs.nonEmpty && pairs.forall(_.getLong(2) >= 2))
  }

  test("interp spine grows with users × span, not events × span") {
    val df = SparkEntry.queries("q_events_interp")(spark, sf)
    val rows = df.collect()
    // every fill sits strictly between two observations of its user and
    // within the per-user [first, last] window — no extrapolation
    assert(rows.nonEmpty)
    val perUser = rows.groupBy(_.getLong(0))
    perUser.foreach { case (_, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate.toEpochDay).sorted
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
        "spine must be dense per user")
      // endpoints are observed, never filled
      val byDay = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      assert(byDay.head.getLong(2) == 0L && byDay.last.getLong(2) == 0L)
    }
  }

  test("dsir weights broadcast the bucket-bounded feature tables") {
    // both the log-ratio table (≤1024 rows by hash geometry) and the
    // 1-row totals must broadcast; a SortMergeJoin would mean the
    // corpus-sized token stream shuffles against a table that can never
    // exceed the bucket count
    val plan = SparkEntry.queries("q_sample_dsir")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"feature lookup must broadcast:\n$plan")
  }

  test("pca covariance collapses map-side; iteration adds no shuffles") {
    // the n·d² outer-product stream must partial-aggregate inside the
    // scan stage (partial_sum under the idx-keyed HashAggregate), so the
    // exchange carries ≤4096 rows per partition — a window or non-partial
    // shape would shuffle the full expanded stream
    val e = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.select(
      expr("transform(v, x -> CAST(floor(x * 1000000.0D + 0.5D) AS BIGINT))")
        .as("qv"))
    val flat = q.select(posexplode(col("qv")).as(Seq("i", "qi")), col("qv"))
      .select(col("i"), col("qi"), posexplode(col("qv")).as(Seq("j", "qj")))
      .groupBy((col("i") * 64 + col("j")).as("idx"))
      .agg(sum(col("qi") * col("qj")).as("c"))
    val plan = flat.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"),
      s"outer-product must partial-aggregate map-side:\n$plan")
    // exactly 4096 cells leave the aggregation regardless of corpus size
    assert(flat.count() == 4096)
  }

  test("novelty first-occurrence is an aggregate join, not a window") {
    // same discipline as segment dedup: a hot boilerplate gram must
    // collapse map-side in groupBy(g).min, never funnel through one
    // window task
    val plan = SparkEntry.queries("q_text_novelty")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"first-occurrence must be an agg:\n$plan")
    assert(plan.contains("partial_min"), plan)
  }

  test("trend/seasonal/ttest reduce to bounded broadcast frames") {
    // each stats op's only corpus-sized work is the first aggregate; the
    // coefficient/mean/moment frames join back by broadcast (trend,
    // seasonal) or collapse to one row (ttest) — a SortMergeJoin anywhere
    // means a bounded frame shuffled the corpus
    Seq("q_events_trend", "q_win_seasonal", "q_agg_ttest").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$q: bounded frames must broadcast:\n$plan")
    }
  }

  test("diversity sample: map-side argmax assignment, per-cell pick via WindowGroupLimit") {
    val plan = SparkEntry.queries("q_sample_diverse")(spark, sf)
      .queryExecution.executedPlan.toString
    // nearest-centroid argmax must be an aggregation (partial map-side
    // collapse of the n×k candidate stream), never a window over it
    assert(plan.contains("WindowGroupLimit"),
      s"per-cell top-2 must push a partial group limit:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("KMV sketch state is a pushed per-group limit, k rows per group") {
    val plan = SparkEntry.queries("q_agg_kmv")(spark, sf)
      .queryExecution.executedPlan.toString
    // rn <= 64 must become a partial WindowGroupLimit before the shuffle —
    // the sketch never materializes the full distinct stream post-sort
    assert(plan.contains("WindowGroupLimit"),
      s"k-smallest must push a group limit:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("negative sampling: 1-row count broadcast, equi-join resolution only") {
    val plan = SparkEntry.queries("q_sample_negatives")(spark, sf)
      .queryExecution.executedPlan.toString
    // the corpus count rides a broadcast; resolving draws is an equi join
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastHashJoin"),
      s"count/draw resolution must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop is the sanctioned 1-row count attach
    val bnlj = plan.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"unexpected nested loops ($bnlj):\n$plan")
  }

  test("OHLC candles are ONE aggregation pass with map-side partials, no window") {
    val plan = SparkEntry.queries("q_events_ohlc")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"first/last must not become windows:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_max_by")
             || plan.contains("partial_count"),
      s"candle state must combine map-side before the shuffle:\n$plan")
  }

  test("hampel filter shuffles once on user_id; the frame stays bounded") {
    val plan = SparkEntry.queries("q_win_hampel")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("\n")
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"one user_id shuffle expected, found $exchanges:\n$plan")
    assert(plan.contains("specifiedwindowframe(RowFrame, -3, 3)"),
      s"frame must stay the bounded +/-3 rows:\n$plan")
  }

  // Registry-wide plan ratchet (graft.PlanAudit is the eyeball twin): every
  // query whose physical plan contains a BroadcastNestedLoopJoin line is
  // enumerated here, and each is one of (a) a 1-row/bounded broadcast
  // stats-or-threshold attach (the sanctioned crossJoin(broadcast(agg))
  // pattern — constant-size build side at any corpus size), (b) a
  // documented exact all-pairs baseline whose banded/LSH twin is the scale
  // path, or (c) the tiny region×nation fixture cross. A query OUTSIDE
  // this list planning a nested loop — or ANY query planning a
  // CartesianProduct — fails the suite, so a join-key typo in a future op
  // can't silently ship an O(n²) plan.
  private val bnljAllowed: Set[String] = Set(
    // (a) 1-row / bounded broadcast attaches
    "q_agg_bloom", "q_agg_chisq", "q_agg_cmsketch", "q_agg_cuped",
    "q_agg_eqdepth", "q_agg_eqdepth_approx", // same 1-row boundary attach
    "q_budget_select", "q_dq_benford", "q_dq_freshness",
    "q_dq_psi", "q_events_anomaly", "q_events_heatmap", "q_events_ltv",
    "q_events_survival", "q_events_trend", "q_events_window_funnel",
    "q_graph_pagerank", "q_graph_triangles", "q_mix_domains", "q_mix_epochs",
    "q_mix_temperature", "q_sample_diverse", "q_sample_dsir",
    "q_sample_negatives", "q_sample_stratified", "q_sim_ann_ivf",
    "q_sim_ann_ivf_kmeans", "q_sim_ivfpq", "q_text_cluster_topics",
    "q_text_containment_pairs", "q_text_keywords", "q_text_tfidf",
    "q_tpch_q11", "q_tpch_q22", "q_vec_pca_power", "q_vec_pq",
    "q_vec_quantize", "q_win_cusum", "q_win_seasonal", "q_dedup_near",
    "q_dq_ks_drift", // 1-row midpoint + count attaches
    "q_events_changepoint", // 1-row (n, tot) attach
    "q_sim_hamming", // 10-row query-signature broadcast vs linear scan
    "q_eval_retrieval", // 8-row query-signature broadcast vs linear scan
                        // + the exact-truth side shares cosineTopK's
                        // documented broadcast-query baseline shape
    "q_text_bm25", // 1-row corpus stats + 5-row term-df broadcast
    "q_events_theilsen", // calendar-bounded daily-table pairwise build
    "q_win_mannkendall", // the same calendar-bounded pairwise build
                         // (S statistic) + three 1-row scalar attaches
    "q_graph_clustercoeff", // triangle core's 1-row threshold attach
    "q_eval_ann", // ivfTopK's bounded centroid-table broadcast
    "q_eval_dedup", // two 1-row count attaches
    "q_text_bpe", // per-round 1-row argmax-pair broadcast
    "q_eval_communities", // two 1-row scalar attaches (m2, intra)
    "q_events_ljungbox", // 1-row moment/denominator/term-sum attaches
    "q_agg_bootstrap", // one 1-row rank-selected CI-bound attach
    "q_text_kl", // 1-row global-total attach (top-K table is equi-keyed)
    // (b) documented exact baselines (ANN/banded twins are the scale path)
    "q_sim_knn", "q_sim_topk", "q_sim_cosine_dup", "q_vec_knn_classify",
    "q_vec_matryoshka",
    // (c) tiny-fixture cross
    "q_join_cross")

  test("registry-wide ratchet: no undeclared nested-loop joins, no cartesians") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (n, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart) Some(s"$n: CartesianProduct")
        else if (bnlj && !bnljAllowed(n)) Some(s"$n: undeclared BNLJ")
        else None
    }
    assert(offenders.isEmpty,
      s"scale anti-patterns outside the allowlist:\n${offenders.mkString("\n")}")
  }

  test("purchase-graph derivation is memoized: N consumers, one build") {
    // force the base memo in, then run three distinct consumers of the
    // same (session, sfDir) artifacts — the corpus-sized lineitem⋈orders
    // derivation must NOT rebuild (r6 verdict ask #1: the graph family
    // used to re-derive it per query)
    graft.ops.PurchaseGraph.pairs(spark, sf).count()
    val c0 = graft.ops.PurchaseGraph.buildCount
    SparkEntry.queries("q_graph_degree")(spark, sf).count()
    SparkEntry.queries("q_graph_cooccur")(spark, sf).count()
    SparkEntry.queries("q_graph_adamic_adar")(spark, sf).count()
    assert(graft.ops.PurchaseGraph.buildCount == c0,
      "membership consumers must reuse the memoized purchase-graph base")
    // the memoized artifact must survive the clearCache() Bench/Verify
    // issue between queries — RDD-level checkpoint, not CacheManager
    spark.catalog.clearCache()
    val c1 = graft.ops.PurchaseGraph.buildCount
    val plan = SparkEntry.queries("q_graph_degree")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(graft.ops.PurchaseGraph.buildCount == c1,
      "clearCache must not evict the checkpointed purchase-graph base")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"consumer must scan the checkpointed base, not re-derive:\n$plan")
    // the LPA core is shared too: labelprop + eval_communities = 1 build
    graft.ops.PurchaseGraph.lpaLabels(spark, sf).count()
    val c2 = graft.ops.PurchaseGraph.buildCount
    SparkEntry.queries("q_graph_labelprop")(spark, sf).count()
    SparkEntry.queries("q_eval_communities")(spark, sf).count()
    assert(graft.ops.PurchaseGraph.buildCount == c2,
      "labelprop and eval_communities must share one LPA labeling")
  }

  test("doc-dedup cores are memoized: grams/sigs built once per sfDir") {
    // same discipline for the text-dedup family (r7): the capped gram
    // table and the 16-permutation minhash signature table are each
    // derived from the full documents corpus; six-plus registry ops
    // consume them, so N consumers must pay ONE build per artifact
    graft.ops.DocCore.grams(spark, sf).count()
    graft.ops.DocCore.sigs(spark, sf).count()
    graft.ops.DocCore.winnowFps(spark, sf).count()
    graft.ops.DocCore.winnowPairs(spark, sf).count()
    graft.ops.DocCore.dupSpans(spark, sf).count()
    graft.ops.DocCore.lmScores(spark, sf).count()
    graft.ops.DocCore.clusters(spark, sf).count()
    val c0 = graft.ops.DocCore.buildCount
    SparkEntry.queries("q_dedup_near")(spark, sf).count()
    SparkEntry.queries("q_text_containment_pairs")(spark, sf).count()
    SparkEntry.queries("q_dedup_minhash")(spark, sf).count()
    SparkEntry.queries("q_dedup_lsh")(spark, sf).count()
    SparkEntry.queries("q_dedup_incremental")(spark, sf).count()
    SparkEntry.queries("q_text_winnow")(spark, sf).count()
    SparkEntry.queries("q_text_winnow_pairs")(spark, sf).count()
    SparkEntry.queries("q_text_dupspans")(spark, sf).count()
    SparkEntry.queries("q_dedup_substring")(spark, sf).count()
    SparkEntry.queries("q_text_lmscore")(spark, sf).count()
    SparkEntry.queries("q_text_lmbuckets")(spark, sf).count()
    SparkEntry.queries("q_dedup_cluster")(spark, sf).count()
    SparkEntry.queries("q_pipeline_curate")(spark, sf).count()
    assert(graft.ops.DocCore.buildCount == c0,
      "dedup consumers must reuse the memoized gram/signature artifacts")
    // survives the clearCache() Bench/Verify issue between queries
    spark.catalog.clearCache()
    val c1 = graft.ops.DocCore.buildCount
    val plan = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(graft.ops.DocCore.buildCount == c1,
      "clearCache must not evict the checkpointed dedup cores")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"consumer must scan the checkpointed signature table:\n$plan")
  }

  test("partitioned events layout prunes the scan to the filtered days") {
    // the date predicate must reach the scan as a PARTITION filter
    // (directory-level pruning), not only a row filter: 7 of the 30
    // event_date=... directories touched
    val df = SparkEntry.queries("q_layout_partition_prune")(spark, sf)
    df.collect() // execute THIS plan instance so the scan metrics populate
    // AQE wraps the executed plan in an adaptive root whose materialized
    // stages are QueryStageExec LEAVES — recurse through both to reach
    // the actual file scan
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
      }.flatten
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a FileSourceScanExec over the layout")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"date predicate must prune partitions, not just rows:\n$scan")
    scan.metrics.get("numPartitions").foreach { m =>
      assert(m.value == 7,
        s"scan must touch exactly the 7 filtered day-partitions, got ${m.value}")
    }
  }

  test("bucketed layout joins and aggregates with no hash exchange") {
    // both fact scans are bucketed on the join key: the sort-merge join
    // and the per-key aggregate must run on the bucket layout directly —
    // the only shuffle in the plan is the final presentation sort
    // (range partitioning)
    val df = SparkEntry.queries("q_layout_bucket_join")(spark, sf)
    df.collect()
    def hashExchanges(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
          Seq(e.toString)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          hashExchanges(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          hashExchanges(q.plan)
      }.flatten
    val offenders = hashExchanges(df.queryExecution.executedPlan)
    assert(offenders.isEmpty,
      s"bucketed join/agg must not re-shuffle the fact tables:\n${offenders.mkString("\n")}")
  }

  test("cluster label loop closes a planted long chain in O(log d) rounds") {
    // a 64-vertex path graph is the worst case the r5 verdict named:
    // plain min-label propagation moves the root label ONE hop per round
    // (~63 sequential shuffles); with the path-halving pointer jump the
    // label-chain length halves per round, so the loop must close in
    // O(log₂ 64) ≈ 6 rounds (+seed +detection). The bound at 10 fails
    // loudly if the jump is ever dropped, while output correctness
    // (every vertex labeled with the chain min) is asserted exactly.
    import spark.implicits._
    val n = 64
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (out, iters) = graft.ops.LlmOps.clusterPairsIter(chain)
    val rows = out.collect()
    info(s"64-chain closed in $iters rounds")
    assert(rows.length == n, "every chain vertex labeled")
    assert(rows.forall(_.getLong(1) == 0L), "canon = chain min")
    assert(rows.forall(_.getLong(2) == n.toLong), "one component of size 64")
    assert(iters <= 10,
      s"$iters rounds for a 64-chain — the path-halving jump is not halving")
  }

  test("registry-wide cache hygiene: only documented loop-scoped caches survive an op") {
    // the generalized ADVICE-r7 #1 guard: every registry op runs at
    // sf0.001 and any op that leaves plan-cache entries behind must be
    // on the documented whitelist — the ops whose docstrings state the
    // loop-scoped cache is dropped by the callers' clearCache-between-
    // queries contract. A new op that silently joins the leaver set
    // fails here; memo-owned derivations (DocCore/PurchaseGraph) live as
    // RDD-level localCheckpoints, not cacheManager entries, so they
    // never appear.
    // the empirically-measured r8 leaver set: every member caches a
    // bounded intermediate (signature/band/candidate-pair tables, the
    // pagerank edge layout, lmbuckets' 1-row range) that its docstring
    // hands to the clearCache contract; this list is a RATCHET — shrink
    // it when an op gains its own unpersist, never grow it silently
    val allowed: Set[String] = Set(
      "q_dedup_lsh", "q_dedup_lsh_fast", "q_dedup_minhash_fast",
      "q_dedup_semantic_lsh", "q_dedup_simhash", "q_dedup_substring",
      "q_graph_pagerank", "q_pipeline_curate", "q_sim_ann_ivf_kmeans",
      "q_sim_cosine_dup_lsh", "q_sim_cosine_dup_srp", "q_sim_knn_lsh",
      "q_text_lmbuckets")
    spark.catalog.clearCache()
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val leavers = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      try SparkEntry.queries(name)(spark, sf).collect()
      catch { case e: Throwable =>
        failures += s"$name: ${e.getClass.getSimpleName} " +
          String.valueOf(e.getMessage).take(160)
      }
      val left = !spark.sharedState.cacheManager.isEmpty
      spark.catalog.clearCache()
      if (left) Some(name) else None
    }
    assert(failures.isEmpty,
      s"ops threw at sf0.001:\n${failures.mkString("\n")}")
    val undocumented = leavers.filterNot(allowed)
    assert(undocumented.isEmpty,
      s"ops left undocumented cache entries: ${undocumented.mkString(", ")}")
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
