package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness for the knn_lsh operating point (same pattern
  * as ProfileQ5): runs the op N times in one session and prints per-run
  * wall clock, so fixed JVM/codegen overhead separates from per-run cost.
  * Not a test — invoke with `Test/runMain graft.ProfileKnn [sfDir]`. */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 4) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q_sim_knn_lsh")(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
