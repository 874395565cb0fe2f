package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r9 ask #5: can q_graph_bfs (4.8 s at sf0.1, the suite's heaviest) go
  * under 3 s with a different spelling? Candidates measured here against
  * the current accumulate-and-reaggregate loop:
  *   A) current: dist ∪ (frontier ⋈ edges) → groupBy-min per round
  *   B) explicit frontier: newly-reached = (frontier ⋈ edges) distinct
  *      anti-join settled — no per-round aggregation over |settled|
  *   C) B with checkpoints every other round
  * Run: sbt "Test/runMain graft.ProfileBfs /root/testdata/sf0.1" */
object ProfileBfs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bfs-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edgesOf(): DataFrame = {
      val pe = graft.ops.PurchaseGraph.namedPairs(spark, sfDir)
      pe.select(col("cn").as("src"), col("sn").as("dst"))
        .unionAll(pe.select(col("sn").as("src"), col("cn").as("dst")))
        .repartition(col("src")).cache()
    }

    def variantA(): DataFrame = {
      val edges = edgesOf()
      var dist = edges.agg(min(col("src")).as("node"))
        .select(col("node"), lit(0L).as("dist"))
        .localCheckpoint(false)
      for (k <- 1 to 6) {
        val next = dist.filter(col("dist") === (k - 1).toLong)
          .join(edges, col("node") === col("src"))
          .select(col("dst").as("node"), lit(k.toLong).as("dist"))
        dist = dist.union(next)
          .groupBy("node").agg(min(col("dist")).as("dist"))
        dist = dist.localCheckpoint(k == 6)
      }
      edges.unpersist()
      dist.select(col("node"), col("dist").cast("long").as("dist"))
        .orderBy("node")
    }

    def variantB(every: Int): DataFrame = {
      val edges = edgesOf()
      var frontier = edges.agg(min(col("src")).as("node"))
        .select(col("node"), lit(0L).as("dist"))
        .localCheckpoint(false)
      var settled = frontier
      for (k <- 1 to 6) {
        val reached = frontier.join(edges, col("node") === col("src"))
          .select(col("dst").as("node")).distinct()
        frontier = reached.join(settled, Seq("node"), "left_anti")
          .select(col("node"), lit(k.toLong).as("dist"))
        if (k % every == 0 || k == 6) frontier = frontier.localCheckpoint(false)
        settled = settled.union(frontier)
        if (k % every == 0 || k == 6) settled = settled.localCheckpoint(k == 6)
      }
      edges.unpersist()
      settled.select(col("node"), col("dist").cast("long").as("dist"))
        .orderBy("node")
    }

    def run(name: String, f: () => DataFrame): Array[(String, Long)] = {
      val t0 = System.nanoTime()
      val rows = f().collect().map(r => (r.getString(0), r.getLong(1)))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bfs-prof] $name%-14s ${dt}%.3f s  rows=${rows.length}")
      rows
    }
    // warm-up the memoized graph base + codegen
    run("warmup(A)", () => variantA())
    val a = run("A(current)", () => variantA())
    val b1 = run("B(ckpt=1)", () => variantB(1))
    val b2 = run("B(ckpt=2)", () => variantB(2))
    val a2 = run("A(again)", () => variantA())
    require(a.sameElements(b1) && a.sameElements(b2),
      "variants must agree row-for-row")
    println(s"[bfs-prof] agreement ok; A again=${a2.length}")
    spark.stop()
  }
}
