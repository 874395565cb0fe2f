package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.LakeTable

/** Measures the DSv2 catalog read tax (r12): the same pruned + filtered
  * aggregate over one committed lake table through three paths — the
  * direct manifest read (plain parquet plan), the V1 `graft-lake`
  * format, and the V2 catalog (`spark.table`, V1Scan row bridge with
  * pushdown/pruning compiled into the inner frame). Median of N runs
  * after warm-up; results go into the LakeV2ScanShim docstring.
  * Run: sbt "Test/runMain graft.ProfileV2Read /root/testdata/sf0.1" */
object ProfileV2Read {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-v2-read-tax")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cat = "v2tax"
    val wh = java.nio.file.Files.createTempDirectory("graft_v2tax_").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val dir = java.nio.file.Paths.get(wh, "default", "t").toString
    val o = graft.ops.Tables.orders(spark, sfDir)
    require(LakeTable.commit(spark, dir, o)(_ => None) == Right(1L))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n > 0); (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("o_custkey") % 10 === 3)
        .agg(sum(col("o_totalprice")).cast("long"), count(lit(1)))
        .head.getLong(1)

    val direct = () => agg(LakeTable.read(spark, dir))
    val v1 = () => agg(spark.read.format("graft-lake").load(dir))
    val v2 = () => agg(spark.table(s"$cat.default.t"))

    // warm-up, then interleaved medians (ambient drift hits all three)
    Seq(direct, v1, v2).foreach(f => f())
    val runs = 7
    val (ds, v1s, v2s) = (1 to runs).map { _ =>
      (time(direct()), time(v1()), time(v2()))
    }.unzip3
    println(f"direct-manifest median: ${median(ds)}%.3f s")
    println(f"v1-format       median: ${median(v1s)}%.3f s")
    println(f"v2-catalog      median: ${median(v2s)}%.3f s")
    println(f"v2/direct ratio: ${median(v2s) / median(ds)}%.2f")
    spark.stop()
  }
}
