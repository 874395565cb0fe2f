package graft

/** Plan probe for the exact k-NN baseline (run manually:
  * `sbt "Test/runMain graft.KnnPlanProbe"`). */
object KnnPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    val plan = SparkEntry.queries("q_sim_knn")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    println(plan.linesIterator.map(_.take(120)).mkString("\n"))
    spark.stop()
  }
}
