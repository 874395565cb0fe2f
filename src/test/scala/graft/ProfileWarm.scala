package graft

import org.apache.spark.sql.SparkSession

/** Per-component timing of the two shared-derivation warm builds the
  * bench reports (graph_warm ≈ 30 s, doc_warm ≈ 22 s at sf0.1) — which
  * artifact inside each actually costs, so optimization effort lands
  * where the seconds are. Run:
  * sbt "Test/runMain graft.ProfileWarm /root/testdata/sf0.1" */
object ProfileWarm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-warm-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[warm-prof] $name%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("g:pairs") { graft.ops.PurchaseGraph.pairs(spark, sfDir).count() }
    t("g:thinnedNamed") { graft.ops.PurchaseGraph.thinnedNamed(spark, sfDir).count() }
    t("g:lpaLabels") { graft.ops.PurchaseGraph.lpaLabels(spark, sfDir).count() }
    t("g:triangle") { graft.ops.PurchaseGraph.triangle(spark, sfDir)._2.count() }
    t("d:grams") { graft.ops.DocCore.grams(spark, sfDir).count() }
    t("d:sigs") { graft.ops.DocCore.sigs(spark, sfDir).count() }
    t("d:winnowFps") { graft.ops.DocCore.winnowFps(spark, sfDir).count() }
    t("d:winnowPairs") { graft.ops.DocCore.winnowPairs(spark, sfDir).count() }
    t("d:dupSpans") { graft.ops.DocCore.dupSpans(spark, sfDir).count() }
    t("d:lmScores") { graft.ops.DocCore.lmScores(spark, sfDir).count() }
    t("d:clusters") { graft.ops.DocCore.clusters(spark, sfDir).count() }
    spark.stop()
  }
}
