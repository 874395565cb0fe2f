package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adversarial-input hardening for the vector/similarity family (r6
  * verdict ask #4) — the embedding twin of HostileCorpusSpec.
  *
  * Every fixture vector is a well-formed unit-norm 64-dim float list;
  * this spec replaces `embeddings` with a corpus built to break dot-
  * product arithmetic and MLlib's LSH — null vectors, empty and ragged
  * (3-dim / 100-dim) vectors, NaN / ±Inf / null components, all-zero
  * vectors, denormal and 1e30-magnitude components, exact duplicates, a
  * null label — half of them INSIDE the vec_id < 8 query window every
  * q_sim_* op draws its query set from. The contract under test:
  *
  *  - the loader gate (`Tables.embeddings`) rejects exactly the
  *    null / wrong-dim / non-finite rows, counted by q_vec_quality;
  *  - every vector-family operator evaluates TOTALLY over the gated
  *    corpus (no op ever sees a malformed vector, so none can throw
  *    mid-shuffle — the 100 TB dead-job scenario the gate exists for);
  *  - rejected ids never appear in any output; per-query top-k bounds
  *    still bind; zero vectors PROPAGATE (documented: every dot = 0,
  *    below every similarity threshold).
  */
class HostileVectorSpec extends SparkTestBase {

  private val dir = "/tmp/graft_hostile_vec"
  private val D = graft.ops.Tables.EmbDim

  // deterministic well-formed unit vector, seeded by id
  private def unitVec(seed: Long): Array[java.lang.Float] = {
    val xs = Array.tabulate(D) { j =>
      val h = (seed * 2654435761L + j * 40503L) & 0xffffL
      (h.toDouble / 0xffff - 0.5)
    }
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => java.lang.Float.valueOf((x / n).toFloat))
  }

  private def vec(xs: Array[java.lang.Float]): Seq[java.lang.Float] = xs.toSeq

  // hostile ids (rejected by the gate): 0..2, 8..13, and the 1e30-
  // magnitude 17; zero vector at 3 (well-formed, propagates);
  // well-formed queries at 4..7
  private val rejectedIds =
    Set(0L, 1L, 2L, 8L, 9L, 10L, 11L, 12L, 13L, 17L)

  private lazy val corpus: Unit = {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents"))
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    def withAt(base: Array[java.lang.Float], i: Int, v: java.lang.Float) = {
      val c = base.clone(); c(i) = v; c
    }
    val nan = java.lang.Float.valueOf(Float.NaN)
    val pinf = java.lang.Float.valueOf(Float.PositiveInfinity)
    val ninf = java.lang.Float.valueOf(Float.NegativeInfinity)
    val rows: Seq[Row] = Seq(
      Row(0L, null, 0),                                     // null vector
      Row(1L, vec(withAt(unitVec(1), 17, nan)), 1),         // NaN component
      Row(2L, vec(withAt(unitVec(2), 0, pinf)), 2),         // +Inf component
      Row(3L, Seq.fill(D)(java.lang.Float.valueOf(0f)), 3), // zero vector (passes)
      Row(4L, vec(unitVec(4)), 4),                          // well-formed queries
      Row(5L, vec(unitVec(5)), 5),
      Row(6L, vec(unitVec(6)), 6),
      Row(7L, vec(unitVec(7)), 7),
      Row(8L, vec(withAt(unitVec(8), 63, ninf)), 8),        // -Inf component
      Row(9L, vec(unitVec(9).take(3)), 9),                  // ragged: 3 dims
      Row(10L, vec(unitVec(10) ++ unitVec(11)).take(100), 0), // ragged: 100 dims
      Row(11L, Seq.empty[java.lang.Float], 1),              // empty array
      Row(12L, vec(withAt(unitVec(12), 31, null)), 2),      // null component
      Row(13L, vec(Array.fill(D)(nan)), 3),                 // all-NaN
      Row(14L, vec(unitVec(99)), 4),                        // exact dup of 15
      Row(15L, vec(unitVec(99)), 5),
      Row(16L, vec(unitVec(16).map(x =>
        java.lang.Float.valueOf(x * 1e-38f))), 6),          // denormal-tiny
      Row(17L, vec(unitVec(17).map(x =>
        java.lang.Float.valueOf(x * 1e30f))), 7),           // huge magnitude
      Row(18L, vec(unitVec(18)), null)                      // null label
    ) ++ (19L until 80L).map(i => Row(i, vec(unitVec(i)), (i % 10).toInt))
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
                  nullable = true),
      StructField("label", IntegerType, nullable = true)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  // the full embedding-consuming surface
  private val ops = Seq(
    "q_sim_topk", "q_sim_knn", "q_sim_cosine_dup", "q_sim_cosine_dup_srp",
    "q_sim_ann_lsh", "q_sim_cosine_dup_lsh", "q_sim_knn_lsh",
    "q_sim_ann_ivf", "q_sim_ann_ivf_kmeans", "q_sim_ivfpq", "q_sim_hamming",
    "q_vec_centroids", "q_vec_quantize", "q_vec_pq", "q_vec_pca_power",
    "q_vec_knn_classify", "q_vec_outliers", "q_vec_matryoshka",
    "q_vec_quality", "q_dedup_semantic", "q_dedup_semantic_lsh",
    "q_eval_ann", "q_text_cluster_topics", "q_sample_diverse")

  test("q_vec_quality counts every hostile class exactly") {
    corpus
    val r = SparkEntry.queries("q_vec_quality")(spark, dir).collect().head
    assert(r.getAs[Long]("n_rows") == 80L)
    assert(r.getAs[Long]("n_null") == 1L)        // id 0
    assert(r.getAs[Long]("n_wrong_dim") == 3L)   // ids 9, 10, 11
    assert(r.getAs[Long]("n_nonfinite") == 5L)   // ids 1, 2, 8, 12, 13
    assert(r.getAs[Long]("n_oversized") == 1L)   // id 17 (1e30 components)
    assert(r.getAs[Long]("n_zero") == 1L)        // id 3
    assert(r.getAs[Long]("n_ok") == 69L)
  }

  test("the loader gate rejects exactly the malformed rows") {
    corpus
    val kept = graft.ops.Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 80L).toSet -- rejectedIds,
      "gate must drop null/ragged/non-finite vectors and nothing else")
  }

  test("every vector-family op is total over the hostile corpus") {
    corpus
    val failures = ops.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty,
      s"vector ops must not throw on hostile vectors:\n${failures.mkString("\n")}")
  }

  test("rejected ids never surface; top-k bounds bind; zero vector " +
       "propagates below every threshold") {
    corpus
    // per-query exact top-k: ≤ 5 rows per query, no rejected candidate
    val topk = SparkEntry.queries("q_sim_topk")(spark, dir).collect()
    val perQ = topk.groupBy(_.getAs[Long]("qid")).view.mapValues(_.length)
    assert(perQ.values.forall(_ <= 5), "top-k bound must bind")
    assert(!topk.exists(r => rejectedIds.contains(r.getAs[Long]("vec_id"))
                          || rejectedIds.contains(r.getAs[Long]("qid"))),
      "no rejected id may appear as query or candidate")
    // the zero vector (id 3) is a VALID query whose dots are all 0 — it
    // still emits a (deterministically tie-broken) top-5, but can never
    // cross the 0.45 cosine-dup threshold
    val dups = SparkEntry.queries("q_sim_cosine_dup")(spark, dir).collect()
    assert(!dups.exists(r => r.getAs[Long]("vec_a") == 3L
                          || r.getAs[Long]("vec_b") == 3L),
      "a zero vector can never clear a positive similarity threshold")
    // the planted exact duplicate pair (14, 15) IS found through the gate
    assert(dups.exists(r => r.getAs[Long]("vec_a") == 14L
                         && r.getAs[Long]("vec_b") == 15L),
      "well-formed duplicates must still be detected on the hostile corpus")
  }
}
