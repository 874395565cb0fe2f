package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

/** §2.9 P2 — sub-quadratic scale paths for near-dedup and similarity
  * search. The randomized-hash ops are no-oracle (MLlib's hash families
  * aren't expressible in DuckDB); ApproxSpec property-tests their recall
  * against the exact operators (`q_dedup_near`, `q_sim_topk`) on the same
  * fixtures. The label-centroid IVF is fully deterministic and therefore
  * oracle-checked like any exact op.
  *
  * These are the 100 TB designs: the exact operators stay as correctness
  * baselines, and these replace them when the candidate-pair space must be
  * sharded by hash bucket instead of enumerated.
  *
  * Caching contract (same as [[LlmOps]]): the self-join operators cache
  * the embeddings projection because the returned plan references it on
  * both join sides — that cache cannot be unpersisted inside the
  * operator without breaking the plan. Callers that invoke these
  * repeatedly must call `spark.catalog.clearCache()` (or unpersist the
  * input) between calls, as Bench does between queries; otherwise cached
  * relations accumulate until executor storage evicts them.
  */
object Approx {
  import Tables._

  /** Power-iteration depth for q_vec_pca_power — enough to separate the
    * leading direction on the fixture cloud while keeping the unrolled
    * oracle CTE readable (same trade-off as Graph.Steps). */
  private val PcaSteps = 8

  /** Fixed probe keys for q_agg_cmsketch (l_partkey values present at
    * every fixture SF). */
  private[graft] val CmsProbes: Seq[Int] =
    Seq(1, 2, 3, 5, 8, 13, 21, 34, 55, 89)

  /** Salted CMS bucket over the in-scope (dep_, item_) columns. */
  private[graft] val CmsBucket: org.apache.spark.sql.Column =
    expr("CAST(conv(substring(md5(concat(CAST(dep_ AS STRING), ':', item_)), 1, 6), 16, 10) AS BIGINT) % 256")

  /** Probe keys for q_agg_bloom: the CMS probe mix (members at every SF)
    * plus five keys beyond any fixture's p_partkey range (definite
    * non-members, exercising the negative path). */
  private[graft] val BloomProbes: Seq[Int] =
    CmsProbes ++ Seq(1000001, 1000002, 1000003, 1000004, 1000005)

  /** Salted k=4 Bloom bit over the in-scope (dep_, item_) columns —
    * 'b'-prefixed salt decorrelates it from the CMS rows. */
  private[graft] val BloomBit: org.apache.spark.sql.Column =
    expr("CAST(conv(substring(md5(concat('b', CAST(dep_ AS STRING), ':', item_)), 1, 6), 16, 10) AS BIGINT) % 1024")

  /** The Bloom filter itself: DISTINCT set-bit table for an `item_`
    * column — ≤ 1024 rows at any member count; union-mergeable. */
  private[graft] def bloomBits(
      items: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    items
      .select(explode(sequence(lit(0), lit(3))).as("dep_"), col("item_"))
      .select(BloomBit.as("bit")).distinct()

  /** BRP-LSH cosine near-dup pairs (vec_a < vec_b, sim = r6 exact dot ≥
    * minSim) — the shared candidate+re-rank pipeline of
    * q_sim_cosine_dup_lsh and q_dedup_semantic_lsh.
    *
    * Spelled as a MANUAL banded self-join over the fitted model's
    * hashes (the q_sim_knn_lsh shape) instead of MLlib's
    * `approxSimilarityJoin` (r16): the MLlib join carries both FULL row
    * structs (features vector + v array) through its collision join and
    * then runs `distinct()` over millions of ~1 KB candidate structs
    * plus a per-row Vector-UDT distance UDF — measured 3.15 s at sf0.1
    * against 1.36 s for this spelling, which shuffles only the exploded
    * (table, bucket) projection, scores candidates INSIDE the join with
    * the codegen'd dot, and distincts the few threshold survivors.
    * The output is IDENTICAL by construction and was verified
    * row-for-row against the MLlib spelling at sf0.01/sf0.1: same fitted
    * hyperplanes (same seed), same collision set (hash values are exact
    * floor() integers — the long cast loses nothing), and the same
    * radius gate (`√Σ(aᵢ−bᵢ)² < √(2−2·minSim)` via graft_l2, the exact
    * FP op order of MLlib's sqdist loop) kept so boundary pairs cannot
    * differ through float-norm noise. Radius computed, not hand-rounded:
    * 1.0488 < √1.1 would systematically reject true pairs with sim in
    * [0.45, 0.4500093). */
  private def brpScoredPairs(s: org.apache.spark.sql.SparkSession,
                             emb: org.apache.spark.sql.DataFrame,
                             minSim: Double)
      : org.apache.spark.sql.DataFrame = {
    val radius = math.sqrt(2 - 2 * minSim)
    val e = emb
      .select(col("vec_id"), array_to_vector(Tables.embSafe).as("features"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(0.125).setNumHashTables(6).setSeed(42L)
    val model = lsh.fit(e)
    // cached: both sides of the banded self-join read the hashed
    // projection (the q_sim_knn_lsh discipline)
    val hashed = model.transform(e)
      .select(col("vec_id"), col("v"),
              posexplode(col("hashes")).as(Seq("tbl", "h")))
      .select(col("vec_id"), col("v"), col("tbl"),
              element_at(vector_to_array(col("h")), 1).cast("long")
                .as("bucket"))
      .cache()
    hashed.select(col("tbl"), col("bucket"),
                  col("vec_id").as("vec_a"), col("v").as("va"))
      .join(hashed.select(col("tbl"), col("bucket"),
                          col("vec_id").as("vec_b"), col("v").as("vb")),
            Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(sqrt(expr("graft_l2(va, vb, 1, 64)")) < lit(radius))
      .select(col("vec_a"), col("vec_b"),
              Det.r6(expr("graft_dot(va, vb)")).as("sim"))
      .filter(col("sim") >= minSim)
      .distinct() // same pair from multiple tables: sims identical
  }

  val ops: Seq[OpDef] = Seq(

    // q_dedup_lsh — the LSH near-dup scale path — lives in LlmOps: its
    // native banded-minhash formulation (md5 permutations) is deterministic
    // and therefore oracle-checked there. An MLlib MinHashLSH formulation
    // was measured and rejected for the role: approxSimilarityJoin pays a
    // 4096-dim sparse-vector Jaccard (keyDistance) per candidate — 7.5 s at
    // sf0.1 vs ~3 s for the signature-agreement estimate, and the gap
    // widens with document length since signatures are constant-size.

    /** Random-projection-LSH ANN (MLlib): bucketed Euclidean join from the
      * 8-query set to all vectors (unit-norm ⇒ dist² = 2−2·cos), ranked to
      * top-5 per query. */
    OpDef.noOracle("q_sim_ann_lsh") { (s, d) =>
      val e = embeddings(s, d)
        .select(col("vec_id"), array_to_vector(Tables.embSafe).as("features"))
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("features"))
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setBucketLength(0.125).setNumHashTables(4).setSeed(42L)
      val model = lsh.fit(e)
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("dist_r").asc, col("vec_id").asc)
      model.approxSimilarityJoin(q, e, 1.2, "dist")
        .select(col("datasetA.qid").as("qid"),
                col("datasetB.vec_id").as("vec_id"),
                Det.r6(col("dist")).as("dist_r"))
        .filter(col("qid") =!= col("vec_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    /** Sub-quadratic cosine near-dup pairs — the 100 TB path for
      * `q_sim_cosine_dup` (whose all-pairs scan is the exact baseline).
      * Candidates come from a BucketedRandomProjectionLSH self-join: for
      * unit-norm vectors cos ≥ t ⇔ ‖a−b‖ ≤ √(2−2t), so the Euclidean
      * radius √(2−2·0.45) captures every true pair a bucket collision
      * surfaces; each candidate is then re-ranked with the exact
      * codegen'd dot product and thresholded — output rows are exact sims,
      * only recall is approximate (ApproxSpec pins it vs the exact op). */
    OpDef.noOracle("q_sim_cosine_dup_lsh") { (s, d) =>
      graft.GraftFunctions.register(s)
      brpScoredPairs(s, embeddings(s, d), 0.45)
        .orderBy("vec_a", "vec_b")
    },

    /** Sub-quadratic semantic dedup — q_dedup_semantic's scale twin:
      * connected components over the LSH-surfaced cosine pairs instead of
      * the all-pairs scan. Same generic `clusterPairs` loop; only the
      * candidate generation changes, which is the whole point of keeping
      * clustering and pair-finding as separate operators. */
    OpDef.noOracle("q_dedup_semantic_lsh") { (s, d) =>
      graft.GraftFunctions.register(s)
      val pairs = brpScoredPairs(s, embeddings(s, d), 0.45)
      graft.ops.LlmOps.clusterPairs(
        pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    },

    /** Sub-quadratic FULL k-NN graph — q_sim_knn's scale twin, and the
      * missing piece between the per-query ANN ops (which restrict to the
      * 8-vector query set) and graph consumers (dedup clustering,
      * diversity sampling) that need every vector's neighbors: BRP-LSH
      * self-join surfaces bucket-collision candidates within the Euclidean
      * radius √(2−2·minSim) (unit-norm ⇒ cos ≥ s ⇔ dist ≤ √(2−2s)), each
      * candidate is re-ranked with the exact codegen'd dot product, and a
      * per-vector window keeps top-k. No crossJoin anywhere in the plan
      * (ScaleSpec asserts); cost ∝ Σ bucket² instead of n². Neighbors
      * below minSim are unreachable by construction — on the near-random
      * fixture that bounds recall (ApproxSpec pins the floor); on
      * genuinely clustered embeddings true neighbors sit far inside the
      * radius and recall approaches exact. */
    OpDef.noOracle("q_sim_knn_lsh") { (s, d) =>
      graft.GraftFunctions.register(s)
      val e = embeddings(s, d)
        .select(col("vec_id"), array_to_vector(Tables.embSafe).as("features"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      // bucketLength must match the PROJECTION scale, not the vector norm:
      // a unit 64-dim vector projects onto a unit random direction with
      // σ ≈ 1/√64 = 0.125, so 0.125 buckets actually partition the data
      // (0.5 buckets put every vector in one cell → the self-join
      // degenerates to all-pairs × tables: measured 149 s vs ~4 s).
      // minSim 0.3 is the LSH operating point: below it cosine is
      // indistinguishable from random on near-uniform embeddings and NO
      // hash family can prune (on clustered real embeddings the same
      // operator reaches far higher recall at the same cost).
      // 6 OR'd tables: per-table collision ≈ 0.31 at the radius on this
      // cloud, so recall ≈ 1−0.69⁶ ≈ 0.89 (measured 0.91 reachable-edge
      // recall vs 0.52 at the old 2 tables). The candidate join is MANUAL
      // (posexplode hashes → equi-join on (table, bucket)) rather than
      // MLlib approxSimilarityJoin: same candidate set, but the exact
      // re-rank is the codegen'd dot product, the sim threshold prunes
      // BEFORE the pair dedup (so distinct() runs on the few true pairs,
      // not every bucket collision), and no per-row Vector UDF distance
      // is ever paid — 3× cheaper at the same recall.
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setBucketLength(0.125).setNumHashTables(6).setSeed(42L)
      val model = lsh.fit(e)
      // cached: the banded self-join reads the hashed projection on both
      // sides — uncached the parquet scan + hash UDF would run twice
      val hashed = model.transform(e)
        .select(col("vec_id"), col("v"),
                posexplode(col("hashes")).as(Seq("tbl", "h")))
        .select(col("vec_id"), col("v"), col("tbl"),
                element_at(vector_to_array(col("h")), 1).cast("long")
                  .as("bucket"))
        .cache()
      val cand = hashed.select(col("tbl"), col("bucket"),
                               col("vec_id").as("i"), col("v").as("va"))
        .join(hashed.select(col("tbl"), col("bucket"),
                            col("vec_id").as("j"), col("v").as("vb")),
              Seq("tbl", "bucket"))
        .filter(col("i") < col("j"))
        .select(col("i"), col("j"),
                Det.r6(expr("graft_dot(va, vb)")).as("sim"))
        .filter(col("sim") >= 0.3)
        .distinct() // same (i,j) from multiple tables: sims identical
      val edges = cand.union(
        cand.select(col("j").as("i"), col("i").as("j"), col("sim")))
      val w = Window.partitionBy(col("i"))
        .orderBy(col("sim").desc, col("j").asc)
      edges.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .orderBy("i", "rn")
    },

    /** IVF with TRAINED centroids: k-means coarse quantizer (seeded MLlib
      * fit — the real IVF construction, vs q_sim_ann_ivf's fixture-label
      * cells), then the same probe: rank the 16 cells per query by
      * centroid similarity, search the top 4 exactly. `clusterCenters` is
      * k×dim — bounded by the CHOSEN k, not the corpus — so materializing
      * it driver-side and broadcasting is the correct plan at any scale
      * (the per-vector cell assignment stays distributed in
      * `model.transform`). */
    OpDef.noOracle("q_sim_ann_ivf_kmeans") { (s, d) =>
      graft.GraftFunctions.register(s)
      import s.implicits._
      val e = embeddings(s, d)
        .select(col("vec_id"), array_to_vector(Tables.embSafe).as("features"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val model = new org.apache.spark.ml.clustering.KMeans()
        .setK(16).setSeed(42L).setFeaturesCol("features")
        .setPredictionCol("cell")
        .fit(e)
      // cached: the probe plan reads the assignment on BOTH sides of the
      // join (query rows and searched cells) — uncached it would re-scan
      // and re-run model.transform twice (same contract as the LSH ops)
      val assigned = model.transform(e).select(col("vec_id"), col("cell"), col("v"))
        .cache()
      val cents = model.clusterCenters.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }.toDF("cell", "cv")
      val q = assigned.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val wCell = Window.partitionBy(col("qid"))
        .orderBy(col("csim").desc, col("cell").asc)
      val probe = q.join(broadcast(cents))
        .select(col("qid"), col("qv"), col("cell"),
                Det.r6(expr("graft_dot(qv, cv)")).as("csim"))
        .withColumn("crn", row_number().over(wCell))
        .filter(col("crn") <= 4)
        .select("qid", "qv", "cell")
      val wTop = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      probe.join(assigned, Seq("cell"))
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
                Det.r6(expr("graft_dot(qv, v)")).as("sim"))
        .withColumn("rn", row_number().over(wTop).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    /** IVF-style ANN: coarse quantization by per-label centroid, probe the
      * 4 nearest cells, exact re-rank inside them. Deterministic; the scale
      * story is that the inner search touches nprobe/k of the corpus and the
      * cell assignment is a broadcast join against k centroids. Note the
      * fixture's labels are NOT geometric clusters (within- and cross-label
      * mean cosine are both ≈0), so recall here ≈ the searched fraction —
      * ApproxSpec pins that recall/cost relationship; on genuinely clustered
      * data the same operator approaches exact recall.
      *
      * Unlike the randomized-LSH ops this one IS oracle-checked: label
      * centroids are per-dimension averages, cell choice ranks on the
      * ROUNDED centroid similarity with a label tie-break, and the final
      * rank is on rounded sims with a vec_id tie-break — every step is
      * deterministic and spelled identically in the DuckDB SQL. */
    OpDef(
      "q_sim_ann_ivf",
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cpos AS (
        |  SELECT label, i AS pos, avg(v[i]) AS cx
        |  FROM e, (SELECT unnest(range(1, 65)) AS i)
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label, list(cx ORDER BY pos) AS cv
        |  FROM cpos GROUP BY label),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
        |csims AS (
        |  SELECT qid,  c.label,
        |    floor((list_sum(list_transform(range(1, 65), i -> qv[i] * c.cv[i])))
        |          * 1000000.0 + 0.5) / 1000000.0 AS csim
        |  FROM q, cent c),
        |probe AS (
        |  SELECT qid, label FROM (
        |    SELECT qid, label,
        |      row_number() OVER (PARTITION BY qid
        |                         ORDER BY csim DESC, label ASC) AS crn
        |    FROM csims)
        |  WHERE crn <= 4),
        |sims AS (
        |  SELECT p.qid, e.vec_id,
        |    floor((list_sum(list_transform(range(1, 65), i -> q.qv[i] * e.v[i])))
        |          * 1000000.0 + 0.5) / 1000000.0 AS sim
        |  FROM probe p
        |  JOIN e ON e.label = p.label
        |  JOIN q ON q.qid = p.qid
        |  WHERE p.qid <> e.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, sim,
        |    row_number() OVER (PARTITION BY qid
        |                       ORDER BY sim DESC, vec_id ASC) AS rn
        |  FROM sims)
        |SELECT qid, vec_id, sim, rn FROM ranked WHERE rn <= 5
        |ORDER BY qid, rn""".stripMargin
    ) { (s, d) => ivfTopK(s, d).orderBy("qid", "rn") },

    /** Element-wise vector aggregation as a first-class op: per-label
      * centroid of the embedding column (the building block under IVF,
      * k-means assignment, and class prototypes), summarized to scalars
      * (count, L2 norm, first component) because the driver's comparator
      * rejects array outputs. The explode→(label, pos) aggregation is the
      * canonical distributed centroid: map-side partial sums shrink the
      * corpus×dim row stream to k×dim per partition before the shuffle,
      * and the result is bounded by k×dim at any corpus size. */
    OpDef(
      "q_vec_centroids",
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |c AS (
        |  SELECT label, i AS pos, avg(v[i]) AS cx
        |  FROM e, (SELECT unnest(range(1, 65)) AS i)
        |  GROUP BY label, i),
        |n AS (SELECT label, count(*) AS n_vecs FROM e GROUP BY label)
        |SELECT n.label, n.n_vecs,
        |  floor((sqrt(sum(c.cx * c.cx))) * 1000000.0 + 0.5) / 1000000.0
        |    AS cnorm,
        |  floor((max(CASE WHEN c.pos = 1 THEN c.cx END)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS c1
        |FROM c JOIN n ON c.label = n.label
        |GROUP BY n.label, n.n_vecs
        |ORDER BY n.label""".stripMargin
    ) { (s, d) =>
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val c = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(avg(col("x")).as("cx"))
      val n = e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
      c.join(n, Seq("label"))
        .groupBy("label", "n_vecs")
        .agg(Det.r6(sqrt(sum(col("cx") * col("cx")))).as("cnorm"),
             Det.r6(max(when(col("pos") === 0, col("cx")))).as("c1"))
        .select("label", "n_vecs", "cnorm", "c1")
        .orderBy("label")
    },

    /** Int8 scalar quantization of the embedding column — the standard
      * 4× compression applied before storing/serving vectors at corpus
      * scale. Two passes: (1) per-dimension global min/max — a 64-row
      * aggregate folded into ONE (lo[], hi[]) stats row and broadcast
      * (the same bounded-stats-frame pattern as q_events_anomaly); (2) a
      * map-only encode/decode pass emitting, per vector, the exact
      * integer code sum (a content checksum of the codes) and the r12
      * reconstruction MSE. Nothing in pass 2 shuffles, so at 100 TB the
      * cost is two scans and a 1-row broadcast — the shape a production
      * embedding-compression job has.
      *
      * Determinism: codes are floor((x−lo)/(hi−lo)·255 + .5) clamped to
      * [0,255] — identical IEEE double expressions on both engines, so
      * the integer codes (and hence code_sum) are exact; the MSE sums
      * squared per-position errors left-to-right in both engines and is
      * r12-rounded (errors are ~1e-8, far above double noise at 1e-22,
      * far below r6's grid — hence the finer scale). */
    OpDef(
      "q_vec_quantize",
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |st AS (
        |  SELECT i AS pos, min(v[i]) AS lo, max(v[i]) AS hi
        |  FROM e, (SELECT unnest(range(1, 65)) AS i)
        |  GROUP BY i),
        |sa AS (
        |  SELECT list(lo ORDER BY pos) AS lo, list(hi ORDER BY pos) AS hi
        |  FROM st),
        |enc AS (
        |  SELECT vec_id, v, lo, hi,
        |    list_transform(range(1, 65), i ->
        |      least(255, greatest(0, CAST(floor(
        |        (v[i] - lo[i]) / (hi[i] - lo[i]) * 255.0 + 0.5) AS BIGINT))))
        |      AS q
        |  FROM e, sa),
        |err AS (
        |  SELECT vec_id, q,
        |    list_transform(range(1, 65), i ->
        |      v[i] - (lo[i] + q[i] * (hi[i] - lo[i]) / 255.0)) AS dv
        |  FROM enc)
        |SELECT vec_id,
        |  CAST(list_sum(q) AS BIGINT) AS code_sum,
        |  floor((list_sum(list_transform(dv, d -> d * d)) / 64.0)
        |        * 1000000000000.0 + 0.5) / 1000000000000.0 AS mse
        |FROM err
        |ORDER BY vec_id""".stripMargin
    ) { (s, d) =>
      val e = embeddings(s, d)
        .select(col("vec_id"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val st = e.select(posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("pos").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      val sa = st.agg(
        transform(array_sort(collect_list(struct(col("pos"), col("lo")))),
                  p => p.getField("lo")).as("lo"),
        transform(array_sort(collect_list(struct(col("pos"), col("hi")))),
                  p => p.getField("hi")).as("hi"))
      def loAt(i: org.apache.spark.sql.Column) = element_at(col("lo"), i + 1)
      def hiAt(i: org.apache.spark.sql.Column) = element_at(col("hi"), i + 1)
      e.crossJoin(broadcast(sa))
        .withColumn("q", transform(col("v"), (x, i) =>
          least(lit(255L), greatest(lit(0L),
            floor((x - loAt(i)) / (hiAt(i) - loAt(i)) * lit(255.0) + lit(0.5))
              .cast("long")))))
        .withColumn("dv", transform(col("v"), (x, i) =>
          x - (loAt(i) + element_at(col("q"), i + 1)
                         * (hiAt(i) - loAt(i)) / lit(255.0))))
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("code_sum"),
          Det.r(aggregate(col("dv"), lit(0.0), (a, x) => a + x * x)
                  / lit(64.0), 12).as("mse"))
        .orderBy("vec_id")
    },

    /** Vector hygiene audit — the counted-rejection face of the loader
      * gate `Tables.embeddings` applies before any similarity math (r7):
      * classify every RAW embedding row into the first matching class of
      * null-vector → wrong-dim → non-finite-component → over-magnitude →
      * zero-vector → ok, one row of exact counts out. The first four
      * classes are exactly what the gate rejects; `n_zero` is the
      * documented PROPAGATION class (well-formed, every dot = 0, can
      * never cross a similarity threshold); `n_ok` is what the
      * similarity family actually computes on. On the fixture corpus all
      * rows are ok — the oracle pins that and the audit's shape;
      * HostileVectorSpec pins the non-trivial counts on a corpus built
      * to break the gate. One map-only classification pass + a 1-row
      * aggregate at any corpus size. */
    OpDef(
      "q_vec_quality",
      s"""WITH c AS (
         |  SELECT CASE
         |    WHEN embedding IS NULL THEN 'null'
         |    WHEN len(embedding) <> ${Tables.EmbDim} THEN 'wrong_dim'
         |    WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x)
         |           OR isinf(x))) > 0 THEN 'nonfinite'
         |    WHEN len(list_filter(embedding,
         |           x -> abs(x) > ${Tables.EmbMaxAbs})) > 0 THEN 'oversized'
         |    WHEN len(list_filter(embedding, x -> x <> 0)) = 0 THEN 'zero'
         |    ELSE 'ok' END AS cls
         |  FROM embeddings)
         |SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) FILTER (WHERE cls = 'null') AS BIGINT) AS n_null,
         |  CAST(count(*) FILTER (WHERE cls = 'wrong_dim') AS BIGINT)
         |    AS n_wrong_dim,
         |  CAST(count(*) FILTER (WHERE cls = 'nonfinite') AS BIGINT)
         |    AS n_nonfinite,
         |  CAST(count(*) FILTER (WHERE cls = 'oversized') AS BIGINT)
         |    AS n_oversized,
         |  CAST(count(*) FILTER (WHERE cls = 'zero') AS BIGINT) AS n_zero,
         |  CAST(count(*) FILTER (WHERE cls = 'ok') AS BIGINT) AS n_ok
         |FROM c""".stripMargin
    ) { (s, d) =>
      val nonfinite = expr(
        """exists(embedding, x -> x IS NULL OR isnan(x)
          |  OR x <= CAST('-Infinity' AS DOUBLE)
          |  OR x >= CAST('Infinity' AS DOUBLE))""".stripMargin)
      val oversized = expr(
        s"exists(embedding, x -> abs(x) > CAST(${Tables.EmbMaxAbs} AS FLOAT))")
      val zero = expr("forall(embedding, x -> x = CAST(0 AS FLOAT))")
      val cls = when(col("embedding").isNull, "null")
        .when(size(col("embedding")) =!= Tables.EmbDim, "wrong_dim")
        .when(nonfinite, "nonfinite")
        .when(oversized, "oversized")
        .when(zero, "zero")
        .otherwise("ok")
      def n(c: String, as: String) =
        count(when(col("cls") === c, 1)).cast("long").as(as)
      Tables.t(s, d, "embeddings").select(cls.as("cls"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
             n("null", "n_null"), n("wrong_dim", "n_wrong_dim"),
             n("nonfinite", "n_nonfinite"), n("oversized", "n_oversized"),
             n("zero", "n_zero"), n("ok", "n_ok"))
    },

    /** Count–Min sketch, fully deterministic and therefore oracle-checked
      * (unlike the HLL/percentile sketches whose hash families DuckDB
      * can't replay): depth 4 salted-md5 hash rows × width 256 counters.
      * Construction is `explode(4) → groupBy(depth, bucket)` — the
      * corpus-sized stream collapses to ≤ 1024 cells via map-side partial
      * aggregation, and the counter table is MERGEABLE by cell-wise sum
      * (the persist-partials incremental-stats pattern, proven for two
      * shards in SourceFormatSpec's HLL twin and here in ApproxSpec).
      * Probing joins the 40-row probe×depth table against the bounded
      * counter table and takes min over depths; CMS guarantees
      * est ≥ true ≥ est − εN, asserted in ApproxSpec. */
    OpDef(
      "q_agg_cmsketch", {
        val probes = CmsProbes.map(p => s"($p)").mkString(", ")
        s"""WITH it AS (
           |  SELECT CAST(l_partkey AS VARCHAR) AS item FROM lineitem),
           |cms AS (
           |  SELECT dep,
           |    CAST('0x' || substring(md5(CAST(dep AS VARCHAR) || ':' || item),
           |                           1, 6) AS BIGINT) % 256 AS bucket,
           |    count(*) AS c
           |  FROM it CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(dep)
           |  GROUP BY 1, 2),
           |p AS (SELECT CAST(pk AS VARCHAR) AS item
           |      FROM (VALUES $probes) AS pv(pk)),
           |pb AS (
           |  SELECT p.item, d.dep,
           |    CAST('0x' || substring(md5(CAST(d.dep AS VARCHAR) || ':' || p.item),
           |                           1, 6) AS BIGINT) % 256 AS bucket
           |  FROM p CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(dep))
           |SELECT pb.item, min(coalesce(cms.c, 0)) AS est
           |FROM pb LEFT JOIN cms
           |  ON pb.dep = cms.dep AND pb.bucket = cms.bucket
           |GROUP BY pb.item
           |ORDER BY item""".stripMargin
      }
    ) { (s, d) =>
      import s.implicits._
      val it = lineitem(s, d).select(col("l_partkey").cast("string").as("item_"))
      val cms = cmSketch(it)
      val pb = CmsProbes.map(_.toString).toDF("item_")
        .crossJoin(Seq(0, 1, 2, 3).toDF("dep_"))
        .select(col("item_"), col("dep_"), CmsBucket.as("bucket"))
      pb.join(broadcast(cms), Seq("dep_", "bucket"), "left")
        .groupBy(col("item_").as("item"))
        .agg(min(coalesce(col("c"), lit(0L))).as("est"))
        .select(col("item"), col("est"))
        .orderBy("item")
    },

    /** Bloom filter as data, deterministic and oracle-checked — the "seen"
      * set behind crawl-frontier dedup, benchmark decontamination and
      * semi-join reduction when the key set is too big to broadcast raw:
      * k=4 salted-md5 hashes into a 1024-bit space, the filter is just the
      * DISTINCT set-bit table (≤ 1024 rows at ANY member count — the
      * aggregation collapses the corpus; mergeable by plain set union,
      * asserted in ApproxSpec along with the no-false-negative guarantee).
      * Probing: a key is 'maybe present' iff all 4 of its bit positions
      * are set; reported here as (hits, maybe) per probe over a fixed
      * member-and-absent probe mix. The plan-level twin — Spark's OWN
      * runtime bloom pruning — is asserted separately in ScaleSpec. */
    OpDef(
      "q_agg_bloom", {
        val probes = BloomProbes.map(p => s"($p)").mkString(", ")
        s"""WITH m AS (
           |  SELECT CAST(p_partkey AS VARCHAR) AS item FROM part
           |  WHERE p_size <= 25),
           |bits AS (
           |  SELECT DISTINCT
           |    CAST('0x' || substring(md5('b' || CAST(dep AS VARCHAR) || ':'
           |                               || item), 1, 6) AS BIGINT) % 1024
           |      AS bit
           |  FROM m CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(dep)),
           |p AS (SELECT CAST(pk AS VARCHAR) AS item
           |      FROM (VALUES $probes) AS pv(pk)),
           |pb AS (
           |  SELECT p.item,
           |    CAST('0x' || substring(md5('b' || CAST(d.dep AS VARCHAR) || ':'
           |                               || p.item), 1, 6) AS BIGINT) % 1024
           |      AS bit
           |  FROM p CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(dep))
           |SELECT pb.item,
           |       CAST(sum(CASE WHEN bits.bit IS NULL THEN 0 ELSE 1 END)
           |            AS BIGINT) AS hits,
           |       CAST(sum(CASE WHEN bits.bit IS NULL THEN 0 ELSE 1 END)
           |            AS BIGINT) = 4 AS maybe
           |FROM pb LEFT JOIN bits ON pb.bit = bits.bit
           |GROUP BY pb.item
           |ORDER BY item""".stripMargin
      }
    ) { (s, d) =>
      import s.implicits._
      val members = part(s, d).filter(col("p_size") <= 25)
        .select(col("p_partkey").cast("string").as("item_"))
      val bits = bloomBits(members)
      val pb = BloomProbes.map(_.toString).toDF("item_")
        .crossJoin(Seq(0, 1, 2, 3).toDF("dep_"))
        .select(col("item_"), BloomBit.as("bit"))
      pb.join(broadcast(bits.withColumn("hit", lit(1L))), Seq("bit"), "left")
        .groupBy(col("item_").as("item"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(col("item"), col("hits"), (col("hits") === 4).as("maybe"))
        .orderBy("item")
    },

    /** Product quantization (PQ) — the memory layout behind every serious
      * ANN index (IVF-PQ): the 64-dim space splits into 8 subspaces of 8
      * dims; each subvector is coded as its nearest subspace centroid
      * (label centroids, the same deterministic coarse codebook as
      * q_sim_ann_ivf), compressing a vector to 8 small codes plus a
      * reconstruction error. 64 floats → 8 codes is the 32× compression
      * that lets a 100 TB corpus's index fit in executor memory.
      *
      * Scale shape: the codebook is k×dim → broadcast; the n×k×8
      * candidate-distance stream is generated and argmin-collapsed
      * (groupBy(vec, subspace).min(struct)) inside the scan task before
      * the shuffle, exactly like q_sample_diverse's assignment; the final
      * code assembly is a bounded 8-way conditional aggregation.
      * Determinism: subspace distances are r6-rounded before the argmin
      * (ties broken by smallest centroid id) and the per-vector error sum
      * runs in exact BIGINT micro-units. */
    OpDef(
      "q_vec_pq", {
        val codeCat = (0 to 7)
          .map(k => s"max(CASE WHEN s = $k THEN CAST(code AS VARCHAR) END)")
          .mkString(" || '-' || ")
        s"""WITH e AS (
           |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings),
           |cpos AS (
           |  SELECT label AS cl, i AS pos, avg(v[i]) AS cx
           |  FROM e, (SELECT unnest(range(1, 65)) AS i)
           |  GROUP BY 1, 2),
           |cent AS (SELECT cl, list(cx ORDER BY pos) AS cv FROM cpos GROUP BY cl),
           |sub AS (
           |  SELECT e.vec_id, c.cl, ss.s,
           |    floor((list_sum(list_transform(range(ss.s * 8 + 1, ss.s * 8 + 9),
           |            i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))))
           |          * 1000000.0 + 0.5) / 1000000.0 AS dist
           |  FROM e, cent c, (SELECT unnest(range(0, 8)) AS s) ss),
           |best AS (
           |  SELECT vec_id, s, cl AS code,
           |    CAST(floor(dist * 1000000.0 + 0.5) AS BIGINT) AS di
           |  FROM (SELECT vec_id, s, cl, dist,
           |          row_number() OVER (PARTITION BY vec_id, s
           |                             ORDER BY dist ASC, cl ASC) AS rn
           |        FROM sub) r WHERE rn = 1)
           |SELECT vec_id, $codeCat AS code,
           |  CAST(sum(di) AS BIGINT) / 1000000.0 AS err
           |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin
      }
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val el = embeddings(s, d)
        .select(col("vec_id"), col("label"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val cent = el
        .select(col("label").as("cl"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cl", "pos").agg(avg(col("x")).as("cx"))
        .groupBy("cl")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
               p => p.getField("cx")).as("cv"))
      val sub = el.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cl"), col("v"), col("cv"),
                explode(sequence(lit(0), lit(7))).as("s"))
        .select(col("vec_id"), col("s"), col("cl"),
          // native graft_l2 ≡ the aggregate(sequence(...)) HOF fold
          // bit-for-bit (r16): the HOF is CodegenFallback — interpreted
          // lambda dispatch n×k×8 times per query, plus a sequence array
          // materialized per row
          Det.r6(expr("graft_l2(v, cv, s*8 + 1, s*8 + 8)")).as("dist"))
      val best = sub.groupBy("vec_id", "s")
        .agg(min(struct(col("dist"), col("cl"))).as("b"))
        .select(col("vec_id"), col("s"), col("b.cl").as("code"),
                floor(col("b.dist") * lit(1000000.0) + lit(0.5)).cast("long")
                  .as("di"))
      best.groupBy("vec_id")
        .agg(concat_ws("-", (0 to 7).map(k =>
               max(when(col("s") === k, col("code"))).cast("string")): _*)
               .as("code"),
             sum(col("di")).as("disum"))
        .select(col("vec_id"), col("code"),
                (col("disum") / lit(1000000.0)).as("err"))
        .orderBy("vec_id")
    },

    /** IVF-PQ search — the full composition of the coarse quantizer
      * (q_sim_ann_ivf) and the PQ codebook (q_vec_pq), i.e. how a real
      * 100 TB ANN index answers a query: (1) probe the 6 nearest coarse
      * cells, (2) score ONLY vectors in probed cells by asymmetric
      * distance computation — the query's 8×k subspace-distance table
      * (640 rows, broadcast) looked up per stored CODE, never touching
      * stored vectors, (3) exact re-rank of the 64-deep shortlist. The
      * 6/64 operating point holds top-8 recall ≈ 0.6 on the fixture's
      * NEAR-UNIFORM embedding cloud (a recall sweep showed shortlist
      * depth, i.e. PQ resolution, is the binding constraint there —
      * label-clustered real embeddings quantize far better); ApproxSpec
      * pins the recall floor. The
      * only corpus-sized joins key on cell/code ids; the ADC lookup table
      * is bounded by queries × subspaces × codebook, and per-candidate PQ
      * distances sum in exact BIGINT micro-units.
      *
      * Fully deterministic (label centroids, r6-before-rank, id
      * tie-breaks) ⇒ oracle-checked, like q_sim_ann_ivf and unlike the
      * MLlib BRP family. */
    OpDef(
      "q_sim_ivfpq", {
        def l2(a: String, b: String, lo: String, hi: String) =
          s"floor((list_sum(list_transform(range($lo, $hi), " +
          s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))) * 1000000.0 + 0.5) / 1000000.0"
        s"""WITH e AS (
           |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings),
           |cpos AS (
           |  SELECT label AS cl, i AS pos, avg(v[i]) AS cx
           |  FROM e, (SELECT unnest(range(1, 65)) AS i)
           |  GROUP BY 1, 2),
           |cent AS (SELECT cl, list(cx ORDER BY pos) AS cv FROM cpos GROUP BY cl),
           |qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
           |probes AS (
           |  SELECT qid, cl FROM (
           |    SELECT q.qid, c.cl,
           |      row_number() OVER (PARTITION BY q.qid
           |        ORDER BY ${l2("q.qv", "c.cv", "1", "65")} ASC, c.cl ASC) AS rn
           |    FROM qs q, cent c) r WHERE rn <= 6),
           |asg AS (
           |  SELECT vec_id, cl AS cell FROM (
           |    SELECT e.vec_id, c.cl,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${l2("e.v", "c.cv", "1", "65")} ASC, c.cl ASC) AS rn
           |    FROM e, cent c) r WHERE rn = 1),
           |sub AS (
           |  SELECT e.vec_id, c.cl, ss.s,
           |    ${l2("e.v", "c.cv", "ss.s * 8 + 1", "ss.s * 8 + 9")} AS dist
           |  FROM e, cent c, (SELECT unnest(range(0, 8)) AS s) ss),
           |codes AS (
           |  SELECT vec_id, s, cl AS code FROM (
           |    SELECT vec_id, s, cl,
           |      row_number() OVER (PARTITION BY vec_id, s
           |                         ORDER BY dist ASC, cl ASC) AS rn
           |    FROM sub) r WHERE rn = 1),
           |adc AS (
           |  SELECT q.qid, ss.s, c.cl AS code,
           |    CAST(floor((${l2("q.qv", "c.cv", "ss.s * 8 + 1", "ss.s * 8 + 9")})
           |         * 1000000.0 + 0.5) AS BIGINT) AS dqi
           |  FROM qs q, cent c, (SELECT unnest(range(0, 8)) AS s) ss),
           |cand AS (
           |  SELECT p.qid, a.vec_id, CAST(sum(ad.dqi) AS BIGINT) AS dpq
           |  FROM asg a JOIN probes p ON a.cell = p.cl
           |  JOIN codes cd ON cd.vec_id = a.vec_id
           |  JOIN adc ad ON ad.qid = p.qid AND ad.s = cd.s AND ad.code = cd.code
           |  WHERE p.qid <> a.vec_id
           |  GROUP BY p.qid, a.vec_id),
           |short AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id,
           |      row_number() OVER (PARTITION BY qid
           |                         ORDER BY dpq ASC, vec_id ASC) AS rn
           |    FROM cand) r WHERE rn <= 64),
           |rr AS (
           |  SELECT sh.qid, sh.vec_id, ${l2("q.qv", "e.v", "1", "65")} AS dist
           |  FROM short sh JOIN qs q ON sh.qid = q.qid
           |  JOIN e ON sh.vec_id = e.vec_id)
           |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id, dist FROM (
           |  SELECT qid, vec_id, dist,
           |    row_number() OVER (PARTITION BY qid
           |                       ORDER BY dist ASC, vec_id ASC) AS rnk
           |  FROM rr) f
           |WHERE rnk <= 8 ORDER BY qid, rnk""".stripMargin
      }
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val el = embeddings(s, d)
        .select(col("vec_id"), col("label"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val cent = el
        .select(col("label").as("cl"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cl", "pos").agg(avg(col("x")).as("cx"))
        .groupBy("cl")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
               p => p.getField("cx")).as("cv"))
      // native graft_l2 ≡ the aggregate(sequence(...)) HOF fold
      // bit-for-bit (r16) — the HOF interpreted its lambda per element
      // across every crossJoin(cent) row below
      def l2(a: String, b: String) = Det.r6(expr(s"graft_l2($a, $b, 1, 64)"))
      def l2sub(a: String, b: String) =
        Det.r6(expr(s"graft_l2($a, $b, s*8 + 1, s*8 + 8)"))
      val qs = el.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("dc").asc, col("cl").asc)
      val probes = qs.crossJoin(broadcast(cent))
        .select(col("qid"), col("cl"), l2("qv", "cv").as("dc"))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 6)
        .select(col("qid"), col("cl").as("cell"))
      val asg = el.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cl"), l2("v", "cv").as("dv"))
        .groupBy("vec_id")
        .agg(min(struct(col("dv"), col("cl"))).as("m"))
        .select(col("vec_id"), col("m.cl").as("cell"))
      val codes = el.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cl"), col("v"), col("cv"),
                explode(sequence(lit(0), lit(7))).as("s"))
        .select(col("vec_id"), col("s"), col("cl"), l2sub("v", "cv").as("dist"))
        .groupBy("vec_id", "s")
        .agg(min(struct(col("dist"), col("cl"))).as("b"))
        .select(col("vec_id"), col("s"), col("b.cl").as("code"))
      val adc = qs.crossJoin(broadcast(cent))
        .select(col("qid"), col("cl").as("code"), col("qv"), col("cv"),
                explode(sequence(lit(0), lit(7))).as("s"))
        .select(col("qid"), col("s"), col("code"),
          floor(l2sub("qv", "cv") * lit(1000000.0) + lit(0.5)).cast("long")
            .as("dqi"))
      val cand = asg.join(broadcast(probes), Seq("cell"))
        .filter(col("qid") =!= col("vec_id"))
        .join(codes, Seq("vec_id"))
        .join(broadcast(adc), Seq("qid", "s", "code"))
        .groupBy("qid", "vec_id")
        .agg(sum(col("dqi")).as("dpq"))
      val w16 = Window.partitionBy(col("qid"))
        .orderBy(col("dpq").asc, col("vec_id").asc)
      val short = cand.withColumn("rn", row_number().over(w16))
        .filter(col("rn") <= 64).select("qid", "vec_id")
      val wf = Window.partitionBy(col("qid"))
        .orderBy(col("dist").asc, col("vec_id").asc)
      short.join(qs, Seq("qid"))
        .join(el.select(col("vec_id"), col("v")), Seq("vec_id"))
        .select(col("qid"), col("vec_id"), l2("qv", "v").as("dist"))
        .withColumn("rnk", row_number().over(wf).cast("long"))
        .filter(col("rnk") <= 8)
        .select(col("qid"), col("rnk"), col("vec_id"), col("dist"))
        .orderBy("qid", "rnk")
    },

    /** Distributed PCA, top component by power iteration — the
      * dimensionality-reduction / whitening primitive of an embedding
      * pipeline, run entirely as DataFrame aggregations: (1) the 64×64
      * second-moment matrix as a flattened outer-product aggregation —
      * the n·d² element stream is generated AND collapsed inside each
      * scan task (hash partial-agg over d² = 4096 keys), so the shuffle
      * carries ≤ 4096 rows per partition, never the corpus; (2) 8 power
      * steps over the d²-cell matrix folded into ONE row, as array HOFs
      * with the same per-step lazy localCheckpoint lineage barrier as
      * q_events_stationary (zero shuffles in the loop); (3) a map-only
      * projection of every vector onto the resulting component.
      *
      * Determinism: inputs are pre-quantized to BIGINT micro-units, so
      * every corpus-sized sum is exact integer arithmetic (immune to
      * partial-agg order); matrix cells convert to doubles once, and all
      * 64-term iteration dots are sequential folds (graft_dot ==
      * DuckDB's list_sum — the bit-identity the cosine family already
      * hash-matches with), with per-step r6 re-gridding of the iterate.
      * Overflow bound: |x| ≤ 1 ⇒ cell sums ≤ n·10¹² — exact to n ≈ 9·10⁶
      * per aggregation; past that, shard the corpus and MERGE per-shard
      * moment matrices by cell-wise addition (same mergeability as the
      * CMS/Bloom sketches, and the reason the quantized formulation is
      * the right 100 TB shape). */
    OpDef(
      "q_vec_pca_power", {
        val steps = (1 to PcaSteps).map { i =>
          s"""it$i AS (
             |  SELECT md, list_transform(y, x ->
             |      floor(x / sqrt(list_sum(list_transform(y, z -> z * z)))
             |            * 1000000.0 + 0.5) / 1000000.0) AS w
             |  FROM (SELECT md, list_transform(range(0, 64), i ->
             |          list_sum(list_transform(range(1, 65), j ->
             |            md[i*64 + j] * w[j]))) AS y
             |        FROM it${i - 1}) s$i)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |q AS (
           |  SELECT list_transform(v, x ->
           |    CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS qv FROM e),
           |op AS (
           |  SELECT (ti.i - 1) * 64 + (tj.j - 1) AS idx,
           |         CAST(sum(qv[ti.i] * qv[tj.j]) AS BIGINT) AS c
           |  FROM q, (SELECT unnest(range(1, 65)) AS i) ti,
           |       (SELECT unnest(range(1, 65)) AS j) tj
           |  GROUP BY 1),
           |m AS (
           |  SELECT list_transform(list(c ORDER BY idx), x ->
           |    CAST(x AS DOUBLE) / 1000000000000.0) AS md FROM op),
           |it0 AS (
           |  SELECT md, list_transform(range(0, 64), i ->
           |    CAST(0.125 AS DOUBLE)) AS w FROM m),
           |$steps
           |SELECT e.vec_id,
           |  floor(list_sum(list_transform(range(1, 65), k -> e.v[k] * f.w[k]))
           |        * 1000000.0 + 0.5) / 1000000.0 AS pc1
           |FROM e, it$PcaSteps f ORDER BY e.vec_id""".stripMargin
      }
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val e = embeddings(s, d)
        .select(col("vec_id"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val q = e.select(
        expr("transform(v, x -> CAST(floor(x * 1000000.0D + 0.5D) AS BIGINT))")
          .as("qv"))
      val flat = q
        .select(posexplode(col("qv")).as(Seq("i", "qi")), col("qv"))
        .select(col("i"), col("qi"), posexplode(col("qv")).as(Seq("j", "qj")))
        .groupBy((col("i") * 64 + col("j")).as("idx"))
        .agg(sum(col("qi") * col("qj")).as("c"))
      val m = flat
        .agg(transform(array_sort(collect_list(struct(col("idx"), col("c")))),
               x => x.getField("c").cast("double") / lit(1000000000000.0))
               .as("md"))
      var it = m.select(col("md"),
        expr("transform(sequence(0, 63), i -> CAST(0.125 AS DOUBLE))").as("w"))
      for (_ <- 1 to PcaSteps) {
        it = it
          .select(col("md"),
            expr("transform(sequence(0, 63), i -> " +
                 "graft_dot(slice(md, i*64 + 1, 64), w))").as("y"))
          // same lineage barrier as q_events_stationary: without it the
          // nested lambda reference to the previous w re-evaluates the
          // whole prior step per element
          // D-suffixed literals: a bare 1000000.0 parses as DECIMAL in
          // SQL-string form, and long/decimal division would leave the
          // iterate DECIMAL(30,9) instead of DOUBLE
          .select(col("md"),
            expr("transform(y, x -> floor(x / sqrt(graft_dot(y, y)) " +
                 "* 1000000.0D + 0.5D) / 1000000.0D)").as("w"))
          .localCheckpoint(false)
      }
      e.crossJoin(broadcast(it.select(col("w"))))
        .select(col("vec_id"), Det.r6(expr("graft_dot(v, w)")).as("pc1"))
        .orderBy("vec_id")
    },

    /** k-NN majority-vote label classification — the eval-time primitive
      * behind embedding-space labeling (quality-tier propagation, topic
      * assignment, weak supervision): each query vector takes the
      * majority label of its 5 exact nearest neighbors, ties broken to
      * the smallest label. Reuses cosineTopK's broadcast-query linear
      * scan (8 queries × corpus through the codegen'd graft_dot — the
      * per-query cost is one pass, never a self-join); the vote table is
      * bounded by queries × labels, so everything after the scan is
      * constant-sized. The ANN ops are the drop-in scale path for the
      * neighbor stage. Deterministic (r6 sims, full tie-breaks) ⇒
      * oracle-checked. */
    OpDef(
      "q_vec_knn_classify",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, label AS true_label, v AS qv
        |      FROM e WHERE vec_id < 8),
        |sims AS (
        |  SELECT qid, e.vec_id, e.label AS nlabel,
        |    floor((list_sum(list_transform(range(1, 65), i -> qv[i] * v[i])))
        |          * 1000000.0 + 0.5) / 1000000.0 AS sim
        |  FROM q JOIN e ON qid <> e.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, nlabel, sim,
        |    row_number() OVER (PARTITION BY qid
        |                       ORDER BY sim DESC, vec_id ASC) AS rn
        |  FROM sims),
        |votes AS (
        |  SELECT qid, nlabel, count(*) AS votes, max(sim) AS best_sim
        |  FROM ranked WHERE rn <= 5 GROUP BY qid, nlabel),
        |pick AS (
        |  SELECT qid, nlabel, votes, best_sim,
        |    row_number() OVER (PARTITION BY qid
        |                       ORDER BY votes DESC, nlabel ASC) AS vrn
        |  FROM votes)
        |SELECT p.qid, q.true_label, p.nlabel AS pred_label,
        |  CAST(p.votes AS BIGINT) AS votes, p.best_sim,
        |  CAST(CASE WHEN p.nlabel = q.true_label THEN 1 ELSE 0 END AS BIGINT)
        |    AS correct
        |FROM pick p JOIN q ON p.qid = q.qid
        |WHERE p.vrn = 1 ORDER BY p.qid""".stripMargin
    ) { (s, d) =>
      val lab = embeddings(s, d).select(col("vec_id"), col("label"))
      val nb = LlmOps.cosineTopK(embeddings(s, d), col("vec_id") < 8, 5)
        .join(lab, Seq("vec_id"))
        .select(col("qid"), col("label").as("nlabel"), col("sim"))
      val votes = nb.groupBy("qid", "nlabel")
        .agg(count(lit(1)).as("votes"), max(col("sim")).as("best_sim"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("votes").desc, col("nlabel").asc)
      val truth = embeddings(s, d).filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("label").as("true_label"))
      votes.withColumn("vrn", row_number().over(w))
        .filter(col("vrn") === 1)
        .join(broadcast(truth), Seq("qid"))
        .select(col("qid"), col("true_label"), col("nlabel").as("pred_label"),
                col("votes"), col("best_sim"),
                when(col("nlabel") === col("true_label"), 1L).otherwise(0L)
                  .as("correct"))
        .orderBy("qid")
    },

    /** Embedding outlier screen — the vector-data-quality gate before any
      * index build or semantic dedup: a corrupt/degenerate vector (bad
      * decode, wrong modality, truncation) sits far from its label's
      * centroid and poisons ANN cells and dedup clusters. Per-label
      * centroids (k×dim, broadcast; components r6-rounded BEFORE the
      * distance so the centroid is a cross-engine constant), squared
      * distance per vector via one codegen'd pass, then the mean+2σ flag
      * with distances floor-quantized to micro BIGINT — per-label moment
      * sums are exact integers (the q_graph_triangles threshold
      * discipline). Everything after the scan is label-bounded; the scan
      * itself is map-only against broadcast centroids. */
    OpDef(
      "q_vec_outliers",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cpos AS (
        |  SELECT label, i AS pos,
        |    floor(avg(v[i]) * 1000000.0 + 0.5) / 1000000.0 AS cx
        |  FROM e, (SELECT unnest(range(1, 65)) AS i)
        |  GROUP BY label, i),
        |cent AS (SELECT label, list(cx ORDER BY pos) AS cv
        |         FROM cpos GROUP BY label),
        |d AS (
        |  SELECT vec_id, e.label,
        |    CAST(floor(list_sum(list_transform(range(1, 65),
        |           i -> (v[i] - cv[i]) * (v[i] - cv[i])))
        |           * 1000000.0 + 0.5) AS BIGINT) AS di
        |  FROM e JOIN cent ON e.label = cent.label),
        |st AS (SELECT label, count(*) AS n, sum(di) AS s,
        |              sum(di * di) AS sq
        |       FROM d GROUP BY label),
        |thr AS (SELECT label,
        |  CAST(floor(s * 1.0 / n
        |             + 2 * sqrt((sq - s * 1.0 * s / n) / n) + 0.5) AS BIGINT)
        |    AS t
        |  FROM st)
        |SELECT d.vec_id, d.label, d.di / 1000000.0 AS dist2,
        |  CAST(CASE WHEN d.di > thr.t THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_outlier
        |FROM d JOIN thr ON d.label = thr.label
        |ORDER BY d.vec_id""".stripMargin
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val cent = e
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(Det.r6(avg(col("x"))).as("cx"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
                       p => p.getField("cx")).as("cv"))
      val di = e.join(broadcast(cent), Seq("label"))
        .withColumn("w", expr("zip_with(v, cv, (a, b) -> a - b)"))
        .select(col("vec_id"), col("label"),
                floor(expr("graft_dot(w, w)") * lit(1000000.0) + lit(0.5))
                  .cast("long").as("di"))
      val thr = di.groupBy("label")
        .agg(count(lit(1)).as("n"), sum(col("di")).as("s_"),
             sum(col("di") * col("di")).as("sq"))
        .select(col("label"),
          floor(col("s_") * lit(1.0) / col("n")
                + lit(2) * sqrt((col("sq") - col("s_") * lit(1.0) * col("s_")
                                 / col("n")) / col("n")) + lit(0.5))
            .cast("long").as("t"))
      di.join(broadcast(thr), Seq("label"))
        .select(col("vec_id"), col("label"),
                (col("di") / lit(1000000.0)).as("dist2"),
                when(col("di") > col("t"), 1L).otherwise(0L).as("is_outlier"))
        .orderBy("vec_id")
    },

    /** Matryoshka / dimension-truncation recall audit — before shipping
      * truncated embeddings (the 4× index-shrink lever MRL training
      * promises), measure what retrieval actually loses: exact top-5 by
      * full 64-dim similarity vs top-5 using only the FIRST 16
      * dimensions, per query — recall@5 plus whether the top-1 neighbor
      * survives. Both rankings are the broadcast-query linear scan
      * (codegen'd dot over a sliced array); the overlap join is bounded
      * by queries × k. Fully deterministic ⇒ oracle-checked. On this
      * near-uniform fixture the audit shows heavy loss — exactly the
      * decision signal the op exists to produce (MRL-trained embeddings
      * would score high; these aren't). */
    OpDef(
      "q_vec_matryoshka",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
        |full_r AS (
        |  SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      floor((list_sum(list_transform(range(1, 65),
        |            i -> qv[i] * v[i]))) * 1000000.0 + 0.5) / 1000000.0 DESC,
        |      vec_id ASC) AS rn
        |  FROM q JOIN e ON qid <> vec_id),
        |trunc_r AS (
        |  SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      floor((list_sum(list_transform(range(1, 17),
        |            i -> qv[i] * v[i]))) * 1000000.0 + 0.5) / 1000000.0 DESC,
        |      vec_id ASC) AS rn
        |  FROM q JOIN e ON qid <> vec_id)
        |SELECT f.qid,
        |  CAST(count(t.vec_id) AS BIGINT) AS n_kept,
        |  floor((count(t.vec_id) * 1.0 / 5) * 10000.0 + 0.5) / 10000.0
        |    AS recall5,
        |  CAST(max(CASE WHEN f.rn = 1 AND t.rn IS NOT NULL
        |                THEN 1 ELSE 0 END) AS BIGINT) AS top1_kept
        |FROM (SELECT * FROM full_r WHERE rn <= 5) f
        |LEFT JOIN (SELECT * FROM trunc_r WHERE rn <= 5) t
        |  ON f.qid = t.qid AND f.vec_id = t.vec_id
        |GROUP BY f.qid ORDER BY f.qid""".stripMargin
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val e = embeddings(s, d)
        .select(col("vec_id"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      def ranked(dims: Int) = {
        val dot =
          if (dims == 64) expr("graft_dot(qv, v)")
          else expr(s"graft_dot(slice(qv, 1, $dims), slice(v, 1, $dims))")
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        broadcast(q).join(e, col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id"), Det.r6(dot).as("sim"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("qid", "vec_id", "rn")
      }
      val f = ranked(64)
      val t = ranked(16)
        .select(col("qid").as("tq"), col("vec_id").as("tv"),
                col("rn").as("trn"))
      f.join(t, col("qid") === col("tq") && col("vec_id") === col("tv"),
             "left")
        .groupBy("qid")
        .agg(count(col("tv")).as("n_kept"),
             Det.r4(count(col("tv")) * lit(1.0) / lit(5)).as("recall5"),
             max(when(col("rn") === 1 && col("trn").isNotNull, 1L)
                 .otherwise(0L)).as("top1_kept"))
        .orderBy("qid")
    },

    /** KMV (k-minimum-values) distinct-count sketch — the third classic
      * stream summary alongside q_agg_cmsketch / q_agg_bloom, and like
      * them DETERMINISTIC (md5 hash) and therefore oracle-checked, unlike
      * the engine-native HLL ops whose hash family DuckDB can't replay.
      * Keep the k=64 smallest hash values of the distinct stream per
      * group; if fewer than k survive the count is exact, otherwise
      * estimate (k−1)/h_(k) with the hash scaled into [0,1) by 16^12
      * (= 2^48, so the constant and every surviving hash are exact
      * doubles and both engines divide bit-identically).
      *
      * Scale shape: distinct() collapses map-side before its shuffle;
      * the per-group k-smallest is a rank window that WindowGroupLimit
      * turns into a per-partition top-k push-down (same plan shape
      * asserted for q_topk / q_win_topk_group in ScaleSpec), so the
      * sketch state is k rows per group no matter the corpus size.
      * Mergeable: k-smallest of a union == k-smallest of the
      * concatenated shard sketches (asserted in ApproxSpec). */
    OpDef(
      "q_agg_kmv",
      """WITH dv AS (
        |  SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
        |h AS (
        |  SELECT l_returnflag, l_partkey,
        |    CAST('0x' || substring(md5('kmv' || CAST(l_partkey AS VARCHAR)),
        |                           1, 12) AS BIGINT) AS h
        |  FROM dv),
        |r AS (
        |  SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY h ASC, l_partkey ASC) AS rn
        |  FROM h)
        |SELECT l_returnflag, count(*) AS n_kept,
        |  CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |       ELSE floor((CAST(17732923532771328 AS DOUBLE) / max(h))
        |                   * 10000.0 + 0.5) / 10000.0 END AS est_distinct
        |FROM r WHERE rn <= 64
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val k = 64
      kmvKept(
          lineitem(s, d).select(col("l_returnflag").as("grp_"),
                                col("l_partkey").as("item_")).distinct(), k)
        .groupBy("grp_")
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
        .select(col("grp_").as("l_returnflag"), col("n_kept"),
          when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(Det.r4(lit(1.7732923532771328e16) / col("hk")))
            .as("est_distinct"))
        .orderBy("l_returnflag")
    },

    /** See [[hllRegisters]] — the deterministic, hash-verified HLL. */
    OpDef(
      "q_agg_hll_det",
      """WITH dv AS (
        |  SELECT DISTINCT l_returnflag AS g, l_partkey AS item
        |  FROM lineitem),
        |h AS (
        |  SELECT g, CAST('0x' || substring(md5('hll' || CAST(item AS VARCHAR)),
        |                                   1, 12) AS BIGINT) AS h
        |  FROM dv),
        |parts AS (SELECT g, h % 64 AS b, h // 64 AS rest FROM h),
        |rk AS (
        |  SELECT g, b, CASE WHEN rest > 0
        |                    THEN 43 - length(ltrim(bin(rest), '0'))
        |                    ELSE 43 END AS rank
        |  FROM parts),
        |reg AS (SELECT g, b, max(rank) AS m FROM rk GROUP BY g, b),
        |agg AS (
        |  SELECT g, count(*) AS nb,
        |    CAST(sum(CAST(1 AS BIGINT) << (43 - m)) AS BIGINT) AS s_int
        |  FROM reg GROUP BY g),
        |est AS (
        |  SELECT g, CAST(64 - nb AS BIGINT) AS v,
        |    (CAST(s_int AS DOUBLE) + CAST(64 - nb AS DOUBLE) * 8796093022208.0)
        |      / 8796093022208.0 AS denom
        |  FROM agg)
        |SELECT g AS l_returnflag, v AS empty_buckets,
        |  CASE WHEN 2904.064 / denom <= 160.0 AND v > 0
        |       THEN floor((64.0 * ln(64.0 / v)) * 10000.0 + 0.5) / 10000.0
        |       ELSE floor((2904.064 / denom) * 10000.0 + 0.5) / 10000.0
        |       END AS est_distinct
        |FROM est ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val reg = hllRegisters(
        lineitem(s, d).select(col("l_returnflag").as("grp_"),
                              col("l_partkey").as("item_")).distinct())
      reg.groupBy("grp_")
        .agg(count(lit(1)).as("nb"),
             sum(expr("shiftleft(CAST(1 AS BIGINT), 43 - m)"))
               .cast("long").as("s_int"))
        .select(col("grp_"), (lit(64) - col("nb")).cast("long").as("v"),
                ((col("s_int").cast("double")
                    + (lit(64) - col("nb")).cast("double")
                      * lit(8796093022208.0))
                   / lit(8796093022208.0)).as("denom"))
        .select(col("grp_").as("l_returnflag"),
                col("v").as("empty_buckets"),
                when(lit(2904.064) / col("denom") <= 160.0
                     && col("v") > 0,
                     Det.r4(lit(64.0) * log(lit(64.0) / col("v"))))
                  .otherwise(Det.r4(lit(2904.064) / col("denom")))
                  .as("est_distinct"))
        .orderBy("l_returnflag")
    },

    /** Binary sign quantization + Hamming-distance top-k — the 64×
      * compression point of the vector-search family: each 64-dim float
      * embedding collapses to ONE BIGINT of sign bits (bit i set ⟺
      * dim i > 0), and candidate distance is a single `bit_count(xor)` —
      * two machine instructions per comparison vs 64 multiply-adds for
      * cosine. The standard first-pass filter in front of exact re-rank
      * when embeddings don't fit memory (sign bits preserve angular
      * locality: Hamming distance on sign vectors estimates angle the
      * same way q_sim_cosine_dup_srp's random hyperplanes do, here with
      * the coordinate axes as the planes).
      *
      * Scan shape: packing is map-only (an in-row fold over the 64 dims);
      * the 10 query signatures broadcast (bounded: k×8 bytes) against a
      * linear candidate scan — no shuffle on the corpus side until the
      * per-query top-10 WindowGroupLimit. Entirely integer arithmetic ⇒
      * bit-exact cross-engine, oracle-checked (unlike the randomized SRP
      * twin). Bit 64 is the BIGINT sign bit: Spark's `shiftleft(1L, 63)`
      * wraps to Long.MinValue silently, DuckDB range-checks `<<` — the
      * oracle spells that one bit as the literal minimum instead. */
    OpDef(
      "q_sim_hamming",
      """WITH p AS (
        |  SELECT vec_id,
        |    bit_or(CASE WHEN e <= 0 THEN CAST(0 AS BIGINT)
        |           WHEN i = 64 THEN (-9223372036854775807 - 1)
        |           ELSE (CAST(1 AS BIGINT) << (i - 1)) END) AS sig
        |  FROM (SELECT vec_id, unnest(embedding) AS e,
        |               generate_subscripts(embedding, 1) AS i
        |        FROM embeddings) u
        |  GROUP BY vec_id),
        |q AS (SELECT vec_id AS q_id, sig AS qsig FROM p WHERE vec_id < 10),
        |c AS (SELECT vec_id, sig FROM p WHERE vec_id >= 10),
        |d AS (SELECT q.q_id, c.vec_id,
        |        CAST(bit_count(xor(q.qsig, c.sig)) AS INTEGER) AS dist
        |      FROM q CROSS JOIN c),
        |r AS (SELECT q_id, vec_id, dist,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY dist, vec_id) AS BIGINT) AS rk
        |      FROM d)
        |SELECT q_id, rk, vec_id, dist FROM r
        |WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin
    ) { (s, d) =>
      val packed = embeddings(s, d).select(col("vec_id"), expr(
        """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
          |  (a, i) -> a | CASE WHEN element_at(embedding, i + 1) > 0
          |    THEN shiftleft(CAST(1 AS BIGINT), i)
          |    ELSE CAST(0 AS BIGINT) END)""".stripMargin).as("sig"))
      val q = packed.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("sig").as("qsig"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("dist"), col("vec_id"))
      packed.filter(col("vec_id") >= 10)
        .crossJoin(broadcast(q))
        .select(col("q_id"), col("vec_id"),
                bit_count(col("qsig").bitwiseXOR(col("sig")))
                  .cast("int").as("dist"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("q_id"), col("rk"), col("vec_id"), col("dist"))
        .orderBy("q_id", "rk")
    },

    /** ANN operating-point sweep: recall@5 of the IVF path against the
      * exact top-5 at EVERY deployable probe budget (4/6/8/12 probed
      * cells) — the curve an ANN deployment is tuned from, not one point
      * on it. Fully deterministic (both sides rank r6-rounded dots under
      * id tie-breaks) ⇒ oracle-checked, unlike the randomized LSH twins
      * whose recall lives in ApproxSpec. The fixture has 10 label cells;
      * probing p of them scans ~p/10 of the corpus, and on this
      * near-uniform cloud recall ≈ the searched fraction — the honest
      * floor that must be MONOTONE in p, and EXACTLY 1.0 at p=12 (every
      * cell probed ⇒ the approximate path degenerates to the exact
      * scan); ApproxSpec pins both. On clustered data the same harness
      * finds the small p where the curve saturates.
      *
      * Shared-work shape: centroid ranks (crn) are computed ONCE for the
      * widest budget; each budget re-ranks the already-scored candidate
      * pool under `crn <= p` — four window-filter branches over one
      * probe-12 scored table, unioned. The corpus-sized work (candidate
      * scoring) is done once; per-budget work is candidate-pool-sized.
      * The exact side is 8 queries × corpus, bounded by the query set. */
    OpDef(
      "q_eval_ann", {
        val budgets = Seq(4, 6, 8, 12)
        val perP = budgets.map { p =>
          s"""  SELECT $p AS probes, ex.qid,
             |    CAST(count(av.vec_id) AS BIGINT) AS n_hits,
             |    floor((count(av.vec_id) * 1.0 / 5) * 10000.0 + 0.5) / 10000.0
             |      AS recall
             |  FROM ex LEFT JOIN (
             |    SELECT qid, vec_id FROM (
             |      SELECT qid, vec_id,
             |        row_number() OVER (PARTITION BY qid
             |                           ORDER BY sim DESC, vec_id ASC) AS rn
             |      FROM asims WHERE crn <= $p)
             |    WHERE rn <= 5) av
             |    ON av.qid = ex.qid AND av.vec_id = ex.vec_id
             |  GROUP BY ex.qid""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH e AS (
           |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings),
           |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
           |xsims AS (
           |  SELECT qid, vec_id,
           |    floor((list_sum(list_transform(range(1, 65), i -> qv[i] * v[i])))
           |          * 1000000.0 + 0.5) / 1000000.0 AS sim
           |  FROM q JOIN e ON qid <> vec_id),
           |ex AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id,
           |      row_number() OVER (PARTITION BY qid
           |                         ORDER BY sim DESC, vec_id ASC) AS rn
           |    FROM xsims)
           |  WHERE rn <= 5),
           |cpos AS (
           |  SELECT label, i AS pos, avg(v[i]) AS cx
           |  FROM e, (SELECT unnest(range(1, 65)) AS i)
           |  GROUP BY label, i),
           |cent AS (
           |  SELECT label, list(cx ORDER BY pos) AS cv
           |  FROM cpos GROUP BY label),
           |csims AS (
           |  SELECT qid, c.label,
           |    floor((list_sum(list_transform(range(1, 65), i -> qv[i] * c.cv[i])))
           |          * 1000000.0 + 0.5) / 1000000.0 AS csim
           |  FROM q, cent c),
           |probe AS (
           |  SELECT qid, label, crn FROM (
           |    SELECT qid, label,
           |      row_number() OVER (PARTITION BY qid
           |                         ORDER BY csim DESC, label ASC) AS crn
           |    FROM csims)
           |  WHERE crn <= 12),
           |asims AS (
           |  SELECT p.qid, e.vec_id, p.crn,
           |    floor((list_sum(list_transform(range(1, 65), i -> q.qv[i] * e.v[i])))
           |          * 1000000.0 + 0.5) / 1000000.0 AS sim
           |  FROM probe p
           |  JOIN e ON e.label = p.label
           |  JOIN q ON q.qid = p.qid
           |  WHERE p.qid <> e.vec_id),
           |u AS (
           |$perP)
           |SELECT CAST(probes AS BIGINT) AS probes, qid, n_hits, recall
           |FROM u ORDER BY probes, qid""".stripMargin
      }
    ) { (s, d) =>
      val budgets = Seq(4, 6, 8, 12)
      val exact = graft.ops.LlmOps
        .cosineTopK(embeddings(s, d), col("vec_id") < 8, 5)
        .select("qid", "vec_id")
      // candidate pool scored ONCE at the widest budget, with each
      // cell's centroid rank riding along for the per-budget filters
      val pool = ivfScored(s, d, maxProbes = 12)
      val wTop = Window.partitionBy(col("aqid"))
        .orderBy(col("sim").desc, col("avid").asc)
      val perP = budgets.map { p =>
        val av = pool.filter(col("crn") <= p)
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select(col("aqid"), col("avid"))
        exact
          .join(av, col("qid") === col("aqid")
                      && col("vec_id") === col("avid"), "left")
          .groupBy("qid")
          .agg(count(col("aqid")).cast("long").as("n_hits"))
          .select(lit(p.toLong).as("probes"), col("qid"), col("n_hits"),
                  Det.r4(col("n_hits") * lit(1.0) / lit(5)).as("recall"))
      }
      perP.reduce(_.unionAll(_)).orderBy("probes", "qid")
    },

    /** Retrieval-quality metric sheet (r9): Precision@10, MRR, and
      * NDCG@10 of the 64× COMPRESSED retriever (sign-bit Hamming ranking,
      * q_sim_hamming's signatures) against the exact-cosine top-10 truth
      * — the standard eval triplet a RAG / semantic-dedup deployment
      * tunes against, complementing q_eval_ann's recall-vs-probes curve
      * (recall says WHETHER the truth set was found; NDCG says whether it
      * surfaced in the right ORDER). Graded relevance = 11 − exact rank.
      * Both rankings are fully deterministic (r6-rounded dots / integer
      * Hamming, id tie-breaks) ⇒ oracle-checked; each per-rank DCG term
      * is nano-quantized to BIGINT before the sum so accumulation order
      * can never perturb the score (the rolling-corr discipline), and
      * IDCG is the same integer formula over ranks 1..10. Scale: truth
      * and retrieval are both broadcast-query × corpus scans (bounded by
      * the query set), the metric join is queries×k rows. */
    OpDef(
      "q_eval_retrieval",
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
        |xs AS (
        |  SELECT qid, vec_id,
        |    floor((list_sum(list_transform(range(1, 65), i -> qv[i] * v[i])))
        |          * 1000000.0 + 0.5) / 1000000.0 AS sim
        |  FROM q JOIN e ON qid <> vec_id),
        |truth AS (
        |  SELECT qid, vec_id, rn AS trank FROM (
        |    SELECT qid, vec_id,
        |      CAST(row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rn
        |    FROM xs)
        |  WHERE rn <= 10),
        |p AS (
        |  SELECT vec_id,
        |    bit_or(CASE WHEN e <= 0 THEN CAST(0 AS BIGINT)
        |           WHEN i = 64 THEN (-9223372036854775807 - 1)
        |           ELSE (CAST(1 AS BIGINT) << (i - 1)) END) AS sig
        |  FROM (SELECT vec_id, unnest(embedding) AS e,
        |               generate_subscripts(embedding, 1) AS i
        |        FROM embeddings) u
        |  GROUP BY vec_id),
        |qs AS (SELECT vec_id AS qid, sig AS qsig FROM p WHERE vec_id < 8),
        |ret AS (
        |  SELECT qid, vec_id, rrank FROM (
        |    SELECT qs.qid, p.vec_id,
        |      CAST(row_number() OVER (PARTITION BY qs.qid
        |        ORDER BY bit_count(xor(qs.qsig, p.sig)), p.vec_id)
        |        AS BIGINT) AS rrank
        |    FROM qs JOIN p ON qs.qid <> p.vec_id)
        |  WHERE rrank <= 10),
        |g AS (
        |  SELECT r.qid, r.rrank, COALESCE(11 - t.trank, 0) AS rel,
        |    CAST(floor(COALESCE(11 - t.trank, 0) / log2(r.rrank + 1)
        |               * 1000000000.0 + 0.5) AS BIGINT) AS term
        |  FROM ret r LEFT JOIN truth t
        |    ON t.qid = r.qid AND t.vec_id = r.vec_id),
        |idcg AS (
        |  SELECT sum(CAST(floor((11 - i) / log2(i + 1)
        |                        * 1000000000.0 + 0.5) AS BIGINT)) AS v
        |  FROM (SELECT unnest(range(1, 11)) AS i)),
        |a AS (
        |  SELECT qid,
        |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |    sum(term) AS dcg_q,
        |    min(CASE WHEN rel > 0 THEN rrank END) AS br
        |  FROM g GROUP BY qid)
        |SELECT qid, n_hits,
        |  floor(n_hits / 10.0 * 10000.0 + 0.5) / 10000.0 AS p_at_10,
        |  CAST(COALESCE(br, 0) AS BIGINT) AS best_rank,
        |  floor((CASE WHEN br IS NULL THEN 0.0 ELSE 1.0 / br END)
        |        * 1000000.0 + 0.5) / 1000000.0 AS mrr,
        |  floor(dcg_q / (SELECT v FROM idcg) * 10000.0 + 0.5) / 10000.0
        |    AS ndcg_10
        |FROM a ORDER BY qid""".stripMargin
    ) { (s, d) =>
      val k = 10
      val truth = graft.ops.LlmOps
        .cosineTopK(embeddings(s, d), col("vec_id") < 8, k)
        .select(col("qid"), col("vec_id"), col("rn").as("trank"))
      val packed = embeddings(s, d).select(col("vec_id"), expr(
        """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
          |  (a, i) -> a | CASE WHEN element_at(embedding, i + 1) > 0
          |    THEN shiftleft(CAST(1 AS BIGINT), i)
          |    ELSE CAST(0 AS BIGINT) END)""".stripMargin).as("sig"))
      val q = packed.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("sig").as("qsig"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("dist").asc, col("vec_id").asc)
      val retrieved = packed.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
                bit_count(col("qsig").bitwiseXOR(col("sig")))
                  .cast("int").as("dist"))
        .withColumn("rrank", row_number().over(w).cast("long"))
        .filter(col("rrank") <= k)
      val idcg = expr(
        """aggregate(sequence(1, 10), CAST(0 AS BIGINT),
          |  (a, i) -> a + CAST(floor((11 - i) / log2(i + 1)
          |                           * 1000000000.0 + 0.5) AS BIGINT))"""
          .stripMargin)
      retrieved.join(truth, Seq("qid", "vec_id"), "left")
        .withColumn("rel", coalesce(lit(11L) - col("trank"), lit(0L)))
        .withColumn("term",
          floor(col("rel") / log2(col("rrank") + lit(1))
                  * lit(1000000000.0) + lit(0.5)).cast("long"))
        .groupBy("qid")
        .agg(sum(when(col("rel") > 0, 1L).otherwise(0L)).cast("long")
               .as("n_hits"),
             sum(col("term")).as("dcg_q"),
             min(when(col("rel") > 0, col("rrank"))).as("br"))
        .select(col("qid"), col("n_hits"),
                Det.r4(col("n_hits") / lit(10.0)).as("p_at_10"),
                coalesce(col("br"), lit(0L)).as("best_rank"),
                Det.r6(when(col("br").isNotNull, lit(1.0) / col("br"))
                         .otherwise(lit(0.0))).as("mrr"),
                Det.r4(col("dcg_q") / idcg.cast("double")).as("ndcg_10"))
        .orderBy("qid")
    }
  )

  /** IVF candidate pool scored at a probe budget: coarse-quantize the 8
    * fixture queries against the per-label centroids, keep the
    * `maxProbes` best cells per query (centroid rank `crn` rides along),
    * and exact-score every candidate in those cells. Columns: aqid,
    * avid, crn, sim — NOT yet top-k'd, so one scored pool serves every
    * budget ≤ maxProbes (the q_eval_ann sweep filters `crn <= p` and
    * re-ranks per budget; corpus-sized scoring runs once). */
  private[graft] def ivfScored(s: org.apache.spark.sql.SparkSession,
                               d: String, maxProbes: Int)
      : org.apache.spark.sql.DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), col("label"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
    // centroids: mean per dimension per label
    val cent = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x")).as("cx"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
                     p => p.getField("cx")).as("cv"))
    graft.GraftFunctions.register(s)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val dotc = expr("graft_dot(qv, cv)")
    val wCell = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("label").asc)
    val probe = q.join(broadcast(cent))
      .select(col("qid"), col("qv"), col("label"), Det.r6(dotc).as("csim"))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= maxProbes)
      .select(col("qid"), col("qv"), col("label"), col("crn"))
    val dotv = expr("graft_dot(qv, v)")
    probe.join(e, Seq("label"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid").as("aqid"), col("vec_id").as("avid"), col("crn"),
              Det.r6(dotv).as("sim"))
  }

  /** IVF coarse-quantize → probe-4 → exact re-rank, the deterministic
    * ANN pipeline behind q_sim_ann_ivf. Columns: qid, vec_id, sim, rn
    * (top-5 per query). The [[ivfScored]] pool at probe budget 4,
    * top-k'd. */
  private[graft] def ivfTopK(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame = {
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    ivfScored(s, d, maxProbes = 4)
      .select(col("aqid").as("qid"), col("avid").as("vec_id"), col("sim"))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= 5)
  }

  /** Deterministic HyperLogLog, oracle-checked — completes the sketch
    * quartet's merge-semantics matrix: CMS sum-merges, Bloom unions, KMV
    * re-ranks, and HLL MAX-merges its registers (the register table from
    * a union of shards is the cell-wise max of the shards' tables,
    * asserted in ApproxSpec). m=64 buckets from the low 6 md5 bits; rank
    * = leading-zero count of the remaining 42 bits + 1, computed as
    * 43 − bitlength via base-2 string conversion (exact integer, no
    * libm). The 2^−M register sum runs as an EXACT BIGINT sum of
    * 2^(43−M) terms scaled by 2^43 — float summation order can never
    * perturb the estimate (the rolling_corr lesson applied to HLL), and
    * the fixture path never evaluates ln (raw > 2.5m), so both engines'
    * arithmetic is bit-identical end to end. Estimate error ~1.04/√64 ≈
    * 13% 1σ; the engine-native HLL++ (q_agg_hll) remains the production
    * twin, this one is the hash-verified teaching spelling.
    *
    * Scale: distinct → ≤ 64 register rows per group via map-side
    * partial max — constant state at any corpus size. */
  private[graft] def hllRegisters(
      dv: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val h = expr("CAST(conv(substring(md5(concat('hll', " +
      "CAST(item_ AS STRING))), 1, 12), 16, 10) AS BIGINT)")
    dv.select(col("grp_"), h.as("h"))
      .select(col("grp_"), (col("h") % 64).as("b"),
              expr("h div 64").as("rest"))
      .select(col("grp_"), col("b"),
              when(col("rest") > 0,
                   lit(43) - length(expr("conv(rest, 10, 2)")))
                .otherwise(lit(43)).as("rank"))
      .groupBy("grp_", "b").agg(max(col("rank")).as("m"))
  }

  /** KMV sketch state for a (grp_, item_) stream: the k smallest 48-bit
    * md5 hash values of the DISTINCT items per group — k rows per group at
    * any corpus size. Mergeable: re-ranking the union of shard sketches
    * and keeping the k smallest equals the direct sketch, because each
    * shard's kept set contains every hash that can be globally among the
    * k smallest (asserted in ApproxSpec). */
  private[graft] def kmvKept(
      dv: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val h = expr("CAST(conv(substring(md5(concat('kmv', " +
      "CAST(item_ AS STRING))), 1, 12), 16, 10) AS BIGINT)")
    val w = Window.partitionBy(col("grp_"))
      .orderBy(col("h").asc, col("item_").asc)
    dv.select(col("grp_"), col("item_"), h.as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("grp_", "item_", "h")
  }

  /** CMS counter table (dep_, bucket, c) for an `item_` column: ≤ 4×256
    * cells at any corpus size (map-side combine does the collapse).
    * Mergeable: counters for a union of shards = cell-wise sum of the
    * shards' counter tables (asserted in ApproxSpec). */
  private[graft] def cmSketch(
      items: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    items
      .select(explode(sequence(lit(0), lit(3))).as("dep_"), col("item_"))
      .select(col("dep_"), CmsBucket.as("bucket"))
      .groupBy("dep_", "bucket").agg(count(lit(1)).as("c"))
}
