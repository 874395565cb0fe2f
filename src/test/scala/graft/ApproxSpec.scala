package graft

import graft.SparkEntry.queries

/** Recall/tolerance properties for the randomized (no-oracle) operators,
  * measured against their exact counterparts on sf0.001 (SURVEY §5.2.3). */
class ApproxSpec extends SparkTestBase {

  test("MinHash-LSH near-dup recall >= 0.8 vs exact 3-gram Jaccard") {
    val exact = queries("q_dedup_near")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = queries("q_dedup_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must contain planted near-dups")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} true pairs")
  }

  // fixture labels are not geometric clusters (mean cosine ≈ 0 both within
  // and across labels), so IVF recall ≈ searched fraction = nprobe/k = 0.4;
  // the assertion pins that recall/cost dial rather than cluster luck
  test("IVF ANN top-5 recall tracks the searched fraction (nprobe=4, k=10)") {
    val exact = queries("q_sim_topk")(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = queries("q_sim_ann_ivf")(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.25, s"IVF recall $recall should be ≈ 0.4 (searched fraction)")
  }

  test("k-means IVF is deterministic and recall tracks the searched fraction") {
    val run1 = queries("q_sim_ann_ivf_kmeans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val run2 = queries("q_sim_ann_ivf_kmeans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(run1.sameElements(run2), "seeded k-means must be deterministic")
    assert(run1.map(_._1).distinct.length == 8, "every query answered")
    val exact = queries("q_sim_topk")(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run1.map(t => (t._1, t._2)).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    // the fixture's vectors are near-uniform (no geometric clusters), so
    // probing 4/16 cells recovers ≈ the searched fraction of true
    // neighbors; on clustered data the same operator approaches 1.0
    assert(recall >= 0.1, s"k-means IVF recall $recall collapsed below the searched-fraction floor")
  }

  test("LSH cosine near-dup recall >= 0.8 vs exact all-pairs, exact sims") {
    // sf0.01: the sf0.001 embedding slice may contain no pairs >= 0.45
    val sf01 = "/root/testdata/sf0.01"
    val exactRows = queries("q_sim_cosine_dup")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lshRows = queries("q_sim_cosine_dup_lsh")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exactRows.nonEmpty, "fixture must contain cosine near-dup pairs")
    val recall = exactRows.keys.count(lshRows.contains).toDouble / exactRows.size
    assert(recall >= 0.8, s"LSH recall $recall over ${exactRows.size} true pairs")
    // every surfaced pair must carry the EXACT re-ranked similarity and be a
    // true positive (the threshold filter runs on exact dots, not estimates)
    lshRows.foreach { case (k, sim) =>
      assert(exactRows.get(k).contains(sim),
             s"pair $k: lsh sim $sim != exact ${exactRows.get(k)}")
    }
  }

  test("LSH semantic clustering recovers the exact components (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = queries("q_dedup_semantic")(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = queries("q_dedup_semantic_lsh")(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "fixture must contain cosine components")
    // recall over clustered vertices; canon ids may differ only if LSH
    // missed the component's min member
    val recovered = exact.keys.count(lsh.contains).toDouble / exact.size
    assert(recovered >= 0.8, s"semantic-LSH vertex recall $recovered")
  }

  test("LSH full k-NN graph recovers exact edges above the radius floor") {
    // 6 OR'd BRP tables (per-table collision ≈ 0.31 at the sim-0.3 radius
    // on the near-uniform cloud ⇒ expected recall ≈ 1−0.69⁶ ≈ 0.89);
    // asserted at both fixture SFs per the r5 done-criteria
    for (sfDir <- Seq(sf, "/root/testdata/sf0.01")) {
      val exactRows = queries("q_sim_knn")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val lshRows = queries("q_sim_knn_lsh")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(exactRows.nonEmpty, "exact kNN graph must be non-empty")
      // edges with sim < 0.3 are OUTSIDE the LSH radius by construction —
      // recall is defined over the reachable edges (the operator's
      // contract); overall recall is reported for context
      val reachable = exactRows.filter(_._2 >= 0.3)
      val recallReach = reachable.keys.count(lshRows.contains).toDouble /
        math.max(reachable.size, 1)
      val recallAll = exactRows.keys.count(lshRows.contains).toDouble / exactRows.size
      info(s"knn-LSH recall @$sfDir: reachable $recallReach, overall $recallAll " +
        s"(${exactRows.size} exact edges, ${reachable.size} reachable)")
      assert(recallReach >= 0.8,
        s"knn-LSH reachable-edge recall $recallReach over ${reachable.size} edges @$sfDir")
      // surfaced edges carry the EXACT re-ranked similarity
      lshRows.foreach { case (k, sim) =>
        exactRows.get(k).foreach(e =>
          assert(e == sim, s"edge $k: lsh sim $sim != exact $e"))
      }
      spark.catalog.clearCache() // the op caches its hashed projection
    }
  }

  test("IVF-PQ top-8 recall >= 0.5 vs exact L2; shortlist distances are exact") {
    import org.apache.spark.sql.functions._
    val out = queries("q_sim_ivfpq")(spark, sf).collect()
    assert(out.length == 64, s"${out.length} rows — expected 8 queries × 8")
    // exact top-8 by the same L2² metric (small: 8 queries × corpus)
    graft.GraftFunctions.register(spark)
    val e = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("d").asc, col("vec_id").asc)
    val exact = q.crossJoin(e).filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        expr("aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE), (acc, i) -> " +
             "acc + (element_at(qv, i) - element_at(v, i)) " +
             "* (element_at(qv, i) - element_at(v, i)))").as("d"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"IVF-PQ top-8 recall $recall on the near-uniform fixture cloud")
    // 6-probe / 64-shortlist operating point: the fixture's near-uniform
    // embeddings quantize poorly (PQ resolution binds — see the op's
    // scaladoc), so 0.5 is the honest floor; clustered real embeddings
    // sit far higher
    assert(recall >= 0.5, s"recall $recall < 0.5")
    // returned distances are EXACT (re-ranked), ascending per query
    out.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      val ds = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("dist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("BRP-LSH ANN returns ranked neighbors for every query") {
    val ann = queries("q_sim_ann_lsh")(spark, sf)
    val perQuery = ann.groupBy("qid").count().collect()
      .map(r => r.getLong(1)).toList
    assert(perQuery.nonEmpty && perQuery.forall(_ <= 5))
  }

  test("approx_percentile within 5% of the exact interpolated percentile") {
    import org.apache.spark.sql.functions._
    val exact = graft.ops.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    queries("q_agg_approx_pct")(spark, sf).collect().foreach { r =>
      val e = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - e) / e <= 0.05,
             s"${r.getString(0)}: approx ${r.getDouble(1)} vs exact $e")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    val exact = graft.ops.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = queries("q_agg_hll")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("HLL sketch error stays within the published 3-sigma bound at all SFs") {
    import org.apache.spark.sql.functions._
    // lgConfigK = 12 ⇒ k = 4096 registers ⇒ RSE ≈ 1.04/√k ≈ 1.63% (the
    // standard HyperLogLog bound, and what the DataSketches HLL docs
    // quote for the coupon-exhausted regime); 3σ ≈ 4.9%. Checking all
    // three fixtures exercises the sketch from exact-ish coupon counts
    // (sf0.001) through genuine estimation territory (sf0.1).
    val bound = 3 * 1.04 / math.sqrt(1 << 12)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")) {
      val exact = graft.ops.Tables.lineitem(spark, dir)
        .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val rows = queries("q_agg_hll_sketch")(spark, dir).collect()
      assert(rows.nonEmpty, s"$dir: empty sketch output")
      rows.foreach { r =>
        val (flag, est) = (r.getString(0), r.getLong(1))
        val e = exact(flag)
        val err = math.abs(est - e).toDouble / e
        info(f"$dir $flag: est $est exact $e err ${err * 100}%.2f%%")
        assert(err <= bound,
          f"$dir $flag: err ${err * 100}%.2f%% exceeds 3σ ${bound * 100}%.2f%%")
      }
    }
  }

  test("HLL sketch union-merge equals the direct sketch and tracks exact") {
    import org.apache.spark.sql.functions._
    val exact = graft.ops.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = queries("q_agg_hll_sketch")(spark, sf).collect()
    rows.foreach { r =>
      val (flag, direct, merged) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(direct == merged,
        s"$flag: sketch algebra must make union-of-partials == direct " +
        s"($direct vs $merged)")
      val e = exact(flag)
      assert(math.abs(direct - e).toDouble / e <= 0.05,
        s"$flag: sketch est $direct vs exact $e")
    }
  }

  test("xxhash64 minhash twin: high agreement with md5 banding, planted dups found") {
    val md5Pairs = queries("q_dedup_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fastPairs = queries("q_dedup_minhash_fast")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(md5Pairs.nonEmpty)
    // different (equally valid) hash families disagree only on borderline
    // pairs: cross-family agreement must stay high both ways
    val recall = md5Pairs.count(fastPairs.contains).toDouble / md5Pairs.size
    assert(recall >= 0.8, s"fast twin recalls $recall of md5 candidates")
    // and the actual planted near-dups (the exact operator's output) must
    // be found by the fast family on its own merits
    val exact = queries("q_dedup_near")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedRecall = exact.count(fastPairs.contains).toDouble / exact.size
    assert(plantedRecall >= 0.8,
      s"fast twin finds $plantedRecall of true near-dups")
    // the thresholded designated scale path: its fast twin must agree with
    // the md5 form at the same 0.5 estimate threshold
    val lshMd5 = queries("q_dedup_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshFast = queries("q_dedup_lsh_fast")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (lshMd5.nonEmpty) {
      val lshRecall = lshMd5.count(lshFast.contains).toDouble / lshMd5.size
      assert(lshRecall >= 0.7,
        s"lsh fast twin recalls $lshRecall of md5 thresholded pairs")
    }
  }

  test("xxhash64 CDC twin: per-doc agreement with the md5 form") {
    import org.apache.spark.sql.functions._
    // a different (equally valid) boundary-hash family cuts at different
    // positions, so chunk COUNTS differ — but both families must chunk
    // the same docs, keep per-doc chunk volume in the same regime, and
    // agree on which docs share content with another doc
    def byDoc(name: String): Map[Long, (Long, Boolean)] =
      queries(name)(spark, sf).collect()
        .map(r => r.getLong(0) ->
          (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks") > 0L))
        .toMap
    val md5 = byDoc("q_dedup_cdc")
    val fast = byDoc("q_dedup_cdc_fast")
    assert(md5.nonEmpty && md5.keySet == fast.keySet,
      "both families must chunk exactly the docs with length >= window")
    // normalized bounds put both families' chunk counts within a small
    // constant factor on every doc (both are walks of the same [16,256]
    // corridor over the same text)
    md5.keys.foreach { id =>
      val (a, b) = (md5(id)._1, fast(id)._1)
      assert(a <= 3 * b + 2 && b <= 3 * a + 2,
        s"doc $id: chunk counts diverge beyond the corridor ($a vs $b)")
    }
    // dup-doc classification agreement, both directions — borderline
    // docs whose only sharing is a single short chunk legitimately flip
    // between hash families (each family cuts different boundaries), so
    // the cross-family bounds are loose; the sharp contract is below
    val md5Dup = md5.collect { case (id, (_, true)) => id }.toSet
    val fastDup = fast.collect { case (id, (_, true)) => id }.toSet
    assert(md5Dup.nonEmpty, "the fixture plants near-dups; md5 must see them")
    val recall = md5Dup.count(fastDup.contains).toDouble / md5Dup.size
    assert(recall >= 0.8, s"fast twin recalls $recall of md5 dup docs")
    if (fastDup.nonEmpty) {
      val precision = fastDup.count(md5Dup.contains).toDouble / fastDup.size
      assert(precision >= 0.7,
        s"only $precision of fast dup docs are md5 dup docs")
    }
    // the sharp deterministic contract: a doc with an identical twin
    // shares EVERY chunk whatever the boundary hash — both families must
    // flag all exact-dup docs
    val exactDup = graft.ops.Tables.documents(spark, sf)
      .groupBy("text").agg(collect_list(col("doc_id")).as("ids"),
                           count(lit(1)).as("c"))
      .filter(col("c") > 1 && length(col("text")) >= 8)
      .select(explode(col("ids")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    if (exactDup.nonEmpty) {
      assert(exactDup.forall(id => md5.get(id).exists(_._2)),
        "md5 CDC must flag every exact-dup doc")
      assert(exactDup.forall(id => fast.get(id).exists(_._2)),
        "fast CDC must flag every exact-dup doc")
    }
  }

  test("approx-percentile twins: mad and eqdepth track their exact forms") {
    // q_agg_mad_approx: per-flag med/mad within 1% of the exact form
    // (GK sketch at accuracy 10000 → rank error n/10000; the price
    // domain is dense enough that the value error is far tighter), and
    // the dependent outlier count moves only at the threshold margin
    val exactMad = queries("q_agg_mad")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("med"), r.getAs[Double]("mad"),
         r.getAs[Long]("n_outliers"))).toMap
    val approxMad = queries("q_agg_mad_approx")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("med"), r.getAs[Double]("mad"),
         r.getAs[Long]("n_outliers"))).toMap
    assert(exactMad.keySet == approxMad.keySet)
    exactMad.foreach { case (flag, (n, med, mad, nOut)) =>
      val (na, meda, mada, nOuta) = approxMad(flag)
      assert(na == n, s"$flag: row counts must be exact ($na vs $n)")
      assert(math.abs(meda - med) / med <= 0.01,
        s"$flag: approx med $meda vs exact $med")
      assert(math.abs(mada - mad) / mad <= 0.01,
        s"$flag: approx mad $mada vs exact $mad")
      val tol = math.max(20L, n / 50L)
      assert(math.abs(nOuta - nOut) <= tol,
        s"$flag: outlier count $nOuta vs exact $nOut (tol $tol)")
      info(f"$flag: med err ${math.abs(meda - med) / med * 100}%.3f%% " +
           f"mad err ${math.abs(mada - mad) / mad * 100}%.3f%% " +
           f"outliers $nOuta vs $nOut")
    }
    // q_agg_eqdepth_approx: all 10 bins present, each decile population
    // within rank-error reach of the exact bin's
    val exactBins = queries("q_agg_eqdepth")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n")).toMap
    val approxBins = queries("q_agg_eqdepth_approx")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n")).toMap
    assert(approxBins.keySet == exactBins.keySet && exactBins.size == 10)
    val total = exactBins.values.sum
    assert(approxBins.values.sum == total, "binning must conserve rows")
    exactBins.foreach { case (bin, n) =>
      val na = approxBins(bin)
      val tol = math.max(20L, total / 50L) // 2% of corpus ≫ n/10000 rank err
      assert(math.abs(na - n) <= tol,
        s"bin $bin: approx population $na vs exact $n (tol $tol)")
    }
  }

  test("count-min sketch: overestimate-only bounds and shard mergeability") {
    import org.apache.spark.sql.functions._
    val li = graft.ops.Tables.lineitem(spark, sf)
    val est = queries("q_agg_cmsketch")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = li.groupBy(col("l_partkey").cast("string").as("item"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = li.count()
    graft.ops.Approx.CmsProbes.map(_.toString).foreach { p =>
      val t = truth.getOrElse(p, 0L)
      val e = est(p)
      assert(e >= t, s"CMS must never underestimate: item $p est=$e true=$t")
      // deterministic-hash analogue of the εN bound: min over 4 depths of
      // width-256 rows; 8×N/256 is far above any plausible collision mass
      assert(e - t <= 8 * n / 256,
        s"item $p overestimate ${e - t} exceeds the collision-mass bound")
    }
    // mergeability: counters for a union of shards == cell-wise sum of the
    // shards' counters — the persist-partials pattern that lets 100 TB
    // build per-partition sketches and merge them without re-scanning
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val items = li.select(col("l_partkey").cast("string").as("item_"),
                          col("l_orderkey"))
    val direct = cells(graft.ops.Approx.cmSketch(items.select("item_")))
    val shardA = graft.ops.Approx.cmSketch(
      items.filter(col("l_orderkey") % 2 === 0).select("item_"))
    val shardB = graft.ops.Approx.cmSketch(
      items.filter(col("l_orderkey") % 2 =!= 0).select("item_"))
    val merged = cells(
      shardA.unionAll(shardB)
        .groupBy("dep_", "bucket").agg(sum(col("c")).as("c")))
    assert(direct == merged,
      "cell-wise sum of shard sketches must equal the direct sketch")
  }

  test("bloom filter: no false negatives, absent keys rejected, union-merge") {
    import org.apache.spark.sql.functions._
    val members = graft.ops.Tables.part(spark, sf)
      .filter(col("p_size") <= 25)
      .select(col("p_partkey").cast("string").as("item_"))
    val memberSet = members.collect().map(_.getString(0)).toSet
    val got = queries("q_agg_bloom")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    graft.ops.Approx.BloomProbes.map(_.toString).foreach { p =>
      if (memberSet(p))
        assert(got(p), s"FALSE NEGATIVE on member $p — bloom guarantee broken")
    }
    // the five 1000001+ probes are outside every fixture's key range; with
    // ~33% fill the per-key FP chance is ~1%, so at least 4 of 5 must miss
    val absent = Seq("1000001", "1000002", "1000003", "1000004", "1000005")
    assert(absent.count(p => !got(p)) >= 4,
      s"absent keys mostly admitted: ${absent.map(p => p -> got(p))}")
    // merge = plain set union of shard bit tables
    def bits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val direct = bits(graft.ops.Approx.bloomBits(members))
    val a = graft.ops.Approx.bloomBits(
      members.filter(col("item_").cast("long") % 2 === 0))
    val b = graft.ops.Approx.bloomBits(
      members.filter(col("item_").cast("long") % 2 =!= 0))
    assert(bits(a.unionAll(b).distinct()) == direct,
      "union of shard bloom filters must equal the direct filter")
  }

  test("KMV sketch: estimate within the k=64 error envelope, shard-mergeable") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val li = graft.ops.Tables.lineitem(spark, sf)
    val dv = li.select(col("l_returnflag").as("grp_"),
                       col("l_partkey").as("item_")).distinct()
    val truth = dv.groupBy("grp_").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    queries("q_agg_kmv")(spark, sf).collect().foreach { r =>
      val (grp, est) = (r.getString(0), r.getDouble(2))
      val t = truth(grp).toDouble
      // KMV relative std error ≈ 1/sqrt(k−2) ≈ 12.7% at k=64; 3σ bound
      assert(math.abs(est - t) / t <= 0.38,
        s"KMV estimate $est for group $grp vs exact $t outside 3σ")
    }
    // mergeability: k-smallest of the union of per-shard k-smallest lists
    // == the direct sketch (every globally-kept hash survives its shard)
    def kept(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val direct = kept(graft.ops.Approx.kmvKept(dv, 64))
    val a = graft.ops.Approx.kmvKept(dv.filter(col("item_") % 2 === 0), 64)
    val b = graft.ops.Approx.kmvKept(dv.filter(col("item_") % 2 =!= 0), 64)
    val w = Window.partitionBy(col("grp_"))
      .orderBy(col("h").asc, col("item_").asc)
    val merged = kept(
      a.unionAll(b).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 64).select("grp_", "item_", "h"))
    assert(merged == direct,
      "re-ranked union of shard KMV sketches must equal the direct sketch")
  }

  test("deterministic HLL: estimate in the m=64 envelope, registers max-merge") {
    import org.apache.spark.sql.functions._
    val li = graft.ops.Tables.lineitem(spark, sf)
    val dv = li.select(col("l_returnflag").as("grp_"),
                       col("l_partkey").as("item_")).distinct()
    val truth = dv.groupBy("grp_").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    queries("q_agg_hll_det")(spark, sf).collect().foreach { r =>
      val (grp, est) = (r.getString(0), r.getDouble(2))
      val t = truth(grp).toDouble
      // HLL relative std error ≈ 1.04/sqrt(64) ≈ 13%; 3σ bound
      assert(math.abs(est - t) / t <= 0.39,
        s"HLL estimate $est for group $grp vs exact $t outside 3σ")
    }
    // max-merge: registers of the union == cell-wise max of shard registers
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val direct = regs(graft.ops.Approx.hllRegisters(dv))
    val a = graft.ops.Approx.hllRegisters(dv.filter(col("item_") % 2 === 0))
    val b = graft.ops.Approx.hllRegisters(dv.filter(col("item_") % 2 =!= 0))
    val merged = regs(
      a.unionAll(b).groupBy("grp_", "b").agg(max(col("m")).as("m")))
    assert(merged == direct,
      "cell-wise max of shard HLL registers must equal the direct registers")
  }
}
