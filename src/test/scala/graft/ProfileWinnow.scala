package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc cost breakdown for q_text_winnow_pairs (Test/runMain).
  *
  * NOTE from the round-6 investigation: never spell the fps chain as
  * nested array HOFs with the hash array referenced twice in one
  * projection — CollapseProject inlines the O(n_grams) md5 build into
  * every slice lambda (O(n²·w) md5s, minutes of single-core work). The
  * production winnowFps is the explode → codegen md5 → window-min form
  * precisely because interpreted HOF lambdas measured ~6× slower. */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.ops.Tables.documents(spark, sfDir)
    val e = graft.ops.LlmOps.winnowFps(docs, 8, 4)
    t("fps rows")(println("  fps=" + e.count()))
    t("fps rows again")(println("  fps=" + e.count()))
    val buckets = e.groupBy("fp")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 50))
    t("buckets")(println("  buckets=" + buckets.count()))
    t("pair volume")(println("  pairs=" + buckets
      .agg(sum(expr("size(ids) * (size(ids) - 1) / 2"))).head.get(0)))
    t("full pairs run 1")(SparkEntry.queries("q_text_winnow_pairs")(spark, sfDir).count())
    spark.catalog.clearCache()
    t("full pairs run 2")(SparkEntry.queries("q_text_winnow_pairs")(spark, sfDir).count())
    spark.catalog.clearCache()
    t("full winnow run")(SparkEntry.queries("q_text_winnow")(spark, sfDir)
      .write.mode("overwrite").parquet("/tmp/profile_winnow_out"))
    spark.stop()
  }
}
