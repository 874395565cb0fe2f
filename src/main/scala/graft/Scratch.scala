package graft

// Throwaway measurement main for the r16 optimization round — deleted
// before the round closes. Not part of the driver contract.
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    import org.apache.spark.sql.functions._
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def tm(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tm] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    graft.GraftFunctions.register(spark)
    val radius = math.sqrt(2 - 2 * 0.45)
    for (round <- 1 to 2) {
      println(s"== round $round")
      spark.catalog.clearCache()
      val emb = graft.ops.Tables.byName(spark, d, "embeddings")
      val e = emb.select(col("vec_id"),
        array_to_vector(graft.ops.Tables.embSafe).as("features"),
        transform(col("embedding"), x => x.cast("double")).as("v")).cache()
      e.count()
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setBucketLength(0.125).setNumHashTables(6).setSeed(42L)
      val model = lsh.fit(e)
      // MLlib reference
      val joined = model.approxSimilarityJoin(e, e, radius, "dist")
      val refPairs = joined
        .select(col("datasetA.vec_id").as("vec_a"), col("datasetA.v").as("va"),
                col("datasetB.vec_id").as("vec_b"), col("datasetB.v").as("vb"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
                expr("round(graft_dot(va, vb), 6)").as("sim"))
        .filter(col("sim") >= 0.45)
      tm("mllib asj + rerank")(noop(refPairs))
      // knn_lsh-shaped manual: score inside the collision join, distinct
      // only the survivors
      val hashed = model.transform(e)
        .select(col("vec_id"), col("v"),
                posexplode(col("hashes")).as(Seq("tbl", "h")))
        .select(col("vec_id"), col("v"), col("tbl"),
                element_at(vector_to_array(col("h")), 1).cast("long")
                  .as("bucket"))
        .cache()
      val manPairs = hashed.select(col("tbl"), col("bucket"),
                                   col("vec_id").as("vec_a"), col("v").as("va"))
        .join(hashed.select(col("tbl"), col("bucket"),
                            col("vec_id").as("vec_b"), col("v").as("vb")),
              Seq("tbl", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .filter(sqrt(expr("graft_l2(va, vb, 1, 64)")) < lit(radius))
        .select(col("vec_a"), col("vec_b"),
                expr("round(graft_dot(va, vb), 6)").as("sim"))
        .filter(col("sim") >= 0.45)
        .distinct()
      tm("manual scored join")(noop(manPairs))
      tm("manual 2nd")(noop(manPairs))
      if (round == 2) {
        val diff = refPairs.unionAll(manPairs).groupBy("vec_a", "vec_b", "sim")
          .agg(count(lit(1)).as("n")).filter(col("n") =!= 2)
        println("[tm] DIFF rows=" + diff.count() +
          " ref=" + refPairs.count() + " man=" + manPairs.count())
      }
      hashed.unpersist()
      e.unpersist()
    }
    spark.stop()
  }
}
