package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.LakeTable

/** Measures the V1 source-boundary tax (r9 ask #6): the same predicate +
  * aggregate over the same committed lake table through three paths —
  * direct manifest read, the graft-lake source (pruned, `.rdd` exit), and
  * the graft-lake source with stats stripped (no pruning). Median of N
  * runs after warm-up; results go into the LakeRelation.buildScan
  * docstring. Run: sbt "Test/runMain graft.ProfileLakeTax /root/testdata/sf0.1" */
object ProfileLakeTax {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-lake-tax")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_tax_").toString
    val o = graft.ops.Tables.orders(spark, sfDir)
    val width = math.max(32L,
      o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
    val table = o
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
           sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
               .cast("long")).cast("long").as("cents"))
      .withColumn("band", expr(s"custkey div $width"))
    require(LakeTable.commit(spark, dir, table, Some("band"),
                             Seq("custkey"))(_ => None) == Right(1L))
    val hi = width * 2 // predicate touches ~2 of ~8 bands

    def agg(df: DataFrame): Long = df
      .filter(col("custkey").between(1L, hi))
      .agg(sum(col("cents")), count(lit(1))).head.getLong(1)

    def direct(): Long = agg(LakeTable.read(spark, dir))
    def source(): Long = agg(
      spark.read.format("graft-lake").option("path", dir).load())
    // pruning disabled: read the same files through the V1 source shape
    // (schema-pinned scan + .rdd) but over ALL files — isolates the
    // boundary cost from the pruning benefit
    val allFiles = LakeTable.currentFiles(dir)
      .map(f => java.nio.file.Paths.get(dir, f).toString)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      LakeTable.currentSchema(dir).mkString(", "))
    def sourceNoPrune(): Long = agg(
      spark.createDataFrame(
        spark.read.schema(schema).parquet(allFiles: _*)
          .select(schema.fieldNames.map(col): _*).rdd,
        schema))

    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); val n = f(); val dt = (System.nanoTime() - t0) / 1e9
      require(n > 0); dt
    }
    def median(f: () => Long, runs: Int): Double = {
      val ts = (1 to runs).map(_ => time(f)).sorted
      ts(runs / 2)
    }
    // warm-up each path once
    direct(); source(); sourceNoPrune()
    val d = median(direct _, 5)
    val s = median(source _, 5)
    val np = median(sourceNoPrune _, 5)
    println(f"[lake-tax] direct_read=$d%.3f s  source_pruned=$s%.3f s  " +
            f"source_noprune_rdd=$np%.3f s  boundary_tax=${s - d}%.3f s " +
            f"(${100 * (s - d) / d}%.0f%%)  pruning_saves=${np - s}%.3f s")
    spark.stop()
  }
}
