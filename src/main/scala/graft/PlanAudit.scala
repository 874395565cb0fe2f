package graft

import org.apache.spark.sql.SparkSession

/** Registry-wide physical-plan audit: plans every declared query (no
  * execution) and prints one line per query with its CartesianProduct /
  * BroadcastNestedLoopJoin line counts, so scale anti-patterns can't hide
  * in the long tail of the inventory. The ScalaTest twin (ScaleSpec)
  * asserts the allowlist; this main is for eyeballing the full table.
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = plan.split("\n").count(_.contains("CartesianProduct"))
        val bnlj = plan.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
        if (cart > 0 || bnlj > 0)
          println(s"AUDIT $n cartesian=$cart bnlj=$bnlj")
      } catch {
        case e: Throwable => println(s"AUDIT $n PLAN_ERROR ${e.getMessage}")
      }
    }
    println("AUDIT done")
    spark.stop()
  }
}
