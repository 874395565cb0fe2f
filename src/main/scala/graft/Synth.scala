package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for scale-growth measurement.
  *
  * The driver fixtures stop at sf0.1, so every "survives 100×" claim was
  * plan-asserted but never measured. These generators produce arbitrarily
  * large documents/embeddings tables with KNOWN planted structure so the
  * growth curve of the banded dedup/similarity family can be measured and
  * asserted (GrowthSpec) and benchmarked (GrowthBench):
  *
  *  - near-dup density is constant (1 planted pair per 10 docs), so a
  *    sub-quadratic operator's candidate-pair count must grow ~linearly
  *    with the corpus while an all-pairs operator's work grows n²;
  *  - generation is pure Spark expressions over `spark.range` — a pure
  *    function of the row id (murmur3 `hash`), so the same n yields the
  *    same corpus on any partitioning, there is no driver-side loop, and
  *    the generator itself scales to any n a cluster can hold.
  */
object Synth {

  private val nToks = 40

  /** n synthetic docs; every 10th (doc_id % 10 == 9) is a near-duplicate
    * of the previous doc with one mid-document token mutated — 3 of its 38
    * word-3-grams change, so trigram Jaccard ≈ 35/41 ≈ 0.85, comfortably
    * above the 0.5 dedup thresholds while staying a NEAR (not exact) dup.
    * Base tokens are drawn from a 5 000-word vocabulary by hashing
    * (base_id, position): with ~38 grams over a 1.25·10¹¹ trigram space,
    * unrelated docs essentially never share a gram, so every candidate
    * pair a banded operator emits is a planted one — candidate counts are
    * a clean linearity observable.
    *
    * `megaCluster` appends that many byte-identical boilerplate docs: the
    * pathological exact-dup cluster that the hot-gram and band-bucket caps
    * exist for. With the caps in place it contributes ZERO near-dup
    * candidates (its grams and band buckets all exceed the caps) and the
    * operators stay fast; without them it would contribute C(mega, 2)
    * pairs from a single unspillable aggregation row. */
  def synthDocs(s: SparkSession, n: Long, megaCluster: Long = 0L): DataFrame = {
    val isDup = pmod(col("id"), lit(10)) === lit(9)
    val base = when(isDup, col("id") - 1).otherwise(col("id"))
    val mutPos = pmod(base, lit(nToks - 2)) + lit(1)
    def tok(j: Column) =
      concat(lit("w"), pmod(hash(base * 131 + j * 7919), lit(5000)))
    val toks = transform(sequence(lit(0), lit(nToks - 1)),
      j => when(isDup && j === mutPos,
                concat(lit("mut"), pmod(hash(col("id")), lit(997))))
             .otherwise(tok(j)))
    val main = s.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", toks).as("text"),
      element_at(array(lit("en"), lit("de"), lit("fr")),
                 (pmod(base, lit(3)) + 1).cast("int")).as("lang"),
      lit("synth").as("source"))
    val boiler = (0 until nToks).map(j => s"boiler$j").mkString(" ")
    val mega = s.range(n, n + megaCluster).select(
      col("id").as("doc_id"), lit(boiler).as("text"),
      lit("en").as("lang"), lit("boiler").as("source"))
    (if (megaCluster > 0) main.unionAll(mega) else main)
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** n unit-norm embeddings; every 10th (vec_id % 10 == 9) is a small
    * perturbation of the previous vector (cos ≈ 0.999 — a planted
    * semantic dup), all others are hash-random. At dims ≥ 64 a random
    * pair's cosine concentrates as N(0, 1/dims), so with dims = 256 the
    * 0.45 dedup threshold sits ~7σ out and planted pairs are the ONLY
    * pairs above it — output counts are a clean linearity observable. */
  def synthEmb(s: SparkSession, n: Long, dims: Int = 64): DataFrame = {
    val isDup = pmod(col("id"), lit(10)) === lit(9)
    val base = when(isDup, col("id") - 1).otherwise(col("id"))
    val pre = transform(sequence(lit(0), lit(dims - 1)),
      j => (pmod(hash(base * 8191 + j), lit(2001)) - lit(1000)).cast("double")
             / lit(1000.0)
           + when(isDup,
                  (pmod(hash(col("id") * 127 + j), lit(21)) - lit(10))
                    .cast("double") / lit(500.0))
               .otherwise(lit(0.0)))
    s.range(n)
      .withColumn("pre", pre)
      .withColumn("nrm", sqrt(aggregate(col("pre"), lit(0.0),
                                        (a, x) => a + x * x)))
      .select(col("id").as("vec_id"),
              transform(col("pre"), x => (x / col("nrm")).cast("float"))
                .as("embedding"),
              pmod(col("id"), lit(8)).cast("int").as("label"))
  }

  /** n synthetic bipartite purchase edges for the graph family: customer
    * `c<i>` buys from `degree` hash-chosen suppliers (duplicate draws fold
    * into the weight), so |E| grows EXACTLY linearly with nCust at constant
    * degree — the observable GrowthSpec pins for the distributed PageRank
    * loop. Pure `spark.range` expressions, same determinism contract as
    * [[synthDocs]]. Output (src, dst, n) is the directed half;
    * symmetrization is the caller's choice (Graph.pagerank's fixture
    * wrapper symmetrizes, and so does the GrowthSpec harness). */
  def synthEdges(s: SparkSession, nCust: Long, nSupp: Long,
                 degree: Int = 3): DataFrame =
    s.range(nCust)
      .select(col("id"), explode(sequence(lit(0), lit(degree - 1))).as("j"))
      .select(concat(lit("c"), col("id")).as("src"),
              concat(lit("s"),
                     pmod(hash(col("id") * 31 + col("j") * 17), lit(nSupp)))
                .as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))

  /** Materialize a fixture-layout directory (documents.parquet +
    * embeddings.parquet) so dir-parameterized ops run on it unchanged. */
  def write(s: SparkSession, dir: String, nDocs: Long, nVecs: Long,
            megaCluster: Long = 0L, dims: Int = 64): Unit = {
    synthDocs(s, nDocs, megaCluster).repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    synthEmb(s, nVecs, dims).repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** k×-scaled TPC-H fixture: the fact tables (lineitem, orders) are k
    * key-shifted copies of the source fixture's — every copy preserves
    * the orderkey join structure, value distributions, and per-query
    * selectivities, so result weights grow exactly k× — and the five
    * dimension tables are copied unchanged (dims scale sub-linearly in
    * real warehouses; holding them fixed also keeps the broadcast-side
    * sizes constant, which is what makes a broadcast→SMJ plan flip an
    * OBSERVABLE of fact growth rather than an artifact). Output is a
    * fixture-layout dir, so `SparkEntry.queries` run on it unchanged.
    * The key shift (10⁹) is far above any fixture orderkey, so copies
    * never collide. */
  def writeTpch(s: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val OFF = 1000000000L
    def scaled(name: String, keyCol: String): DataFrame = {
      val base = s.read.parquet(s"$srcDir/$name.parquet")
      (0 until k).map(i =>
        base.withColumn(keyCol, col(keyCol) + lit(i * OFF)))
        .reduce(_ unionAll _)
    }
    scaled("orders", "o_orderkey").repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    scaled("lineitem", "l_orderkey").repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      s.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
  }
}
