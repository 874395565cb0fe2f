package graft

import org.apache.spark.sql.SparkSession

/** Child-process committer for [[CrossJvmSpec]] (r11, verdict ask #7):
  * a SECOND JVM with its own SparkSession racing partial merges against
  * the parent's committer on one lake table. The commit protocol's only
  * cross-process channels are atomic filesystem primitives (create-new
  * hard links for manifest claims, create-file for markers/fences), so
  * nothing here shares memory with the parent — which is the point: the
  * serialized-commit loop must hold across REAL process boundaries, not
  * just across threads under one JVM lock.
  *
  * Protocol: write the `ready` file once the session is up, wait for the
  * parent's `go` file (so both sides' commit loops overlap in time), run
  * `rounds` sequential merges of this side's key range, exit 0 on all
  * commits accepted / 2 on any Left.
  */
object CrossJvmChild {
  def main(args: Array[String]): Unit = {
    val (dir, roundsS, readyS) = (args(0), args(1), args(2))
    // mode "merge" (default): partial merges on the banded table;
    // mode "append": plain zero-rewrite appends of disjoint keys on a
    // flat table — the batch committer racing the parent's V2 STREAMING
    // write (r12, behavior 48's cross-process story)
    val mode = args.lift(3).getOrElse("merge")
    val rounds = roundsS.toInt
    val ready = java.nio.file.Paths.get(readyS)
    val go = ready.resolveSibling("go")
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    java.nio.file.Files.createFile(ready)
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (!java.nio.file.Files.exists(go)) {
      if (System.nanoTime() > deadline) sys.exit(3)
      Thread.sleep(10)
    }
    // mode "create" (r13): one CREATE TABLE race per round against the
    // parent on table rt_<i> — the pending.json hard-link CAS is the
    // only arbiter across the process boundary. Prints WIN/LOSE per
    // round for the parent to reconcile; any other failure exits 2.
    if (mode == "create") {
      spark.conf.set("spark.sql.catalog.xj", "graft.sources.LakeCatalog")
      spark.conf.set("spark.sql.catalog.xj.warehouse", dir)
      for (i <- 1 to rounds) {
        try {
          spark.sql(s"CREATE TABLE xj.default.rt_$i (child_col BIGINT)")
          println(s"CREATE-WIN $i")
        } catch {
          case e: Throwable
              if Option(e.getMessage).exists(_.toLowerCase
                .contains("already exists")) =>
            println(s"CREATE-LOSE $i")
          case e: Throwable =>
            System.err.println(s"child create $i unexpected: $e")
            spark.stop()
            sys.exit(2)
        }
      }
      spark.stop()
      sys.exit(0)
    }
    for (i <- 1 to rounds) {
      val r: Either[String, Long] = mode match {
        case "append" =>
          val rows = Seq.tabulate(20) { k =>
            (1000L * i + 100L + k, s"child_$i")
          }.toDF("k", "v")
          graft.sources.LakeTable.append(spark, dir, rows)(_ => None)
        case _ =>
          val ups = Seq.tabulate(20) { k =>
            (100L + k, s"child_$i", (100L + k) % 4)
          }.toDF("k", "v", "band")
          graft.sources.LakeTable.mergePartial(
            spark, dir, ups, Seq("k"), "band")(_ => None)
      }
      r match {
        case Right(_) => ()
        case Left(reason) =>
          System.err.println(s"child commit $i rejected: $reason")
          spark.stop()
          sys.exit(2)
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
