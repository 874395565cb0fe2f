package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.sources.LakeTable

/** `readStream.format("graft-lake")` — the streaming change-feed source
  * (r10): version-as-offset delivery, OPTIMIZE silence, exactly-once
  * across a stop/restart, and startingVersion tailing. The consumer folds
  * signed multiplicities keyed by micro-batch id (the idempotent-sink
  * discipline any foreachBatch consumer of a CDC feed runs), and every
  * assertion compares the fold against a fresh BATCH read of the live
  * table — the same truth the batch q_lake_changes op pins. */
class LakeStreamSpec extends SparkTestBase {

  private def roll(df: DataFrame, width: Long): DataFrame = df
    .groupBy(col("o_custkey").as("custkey"))
    .agg(count(lit(1)).cast("long").as("n_orders"),
         sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
             .cast("long")).cast("long").as("cents"))
    .withColumn("band", expr(s"custkey div $width"))

  private type Key = (Long, Long, Long, Long)
  private def key(r: Row): Key =
    (r.getAs[Long]("custkey"), r.getAs[Long]("n_orders"),
     r.getAs[Long]("cents"), r.getAs[Long]("band"))

  /** Fold the per-batch buffers into the end-state multiset. */
  private def fold(batches: mutable.Map[Long, Seq[Row]]): Set[Key] =
    batches.values.flatten
      .foldLeft(Map.empty[Key, Long]) { (m, r) =>
        val w = if (r.getAs[String]("_change_type") == "delete") -1L else 1L
        m.updated(key(r), m.getOrElse(key(r), 0L) + w)
      }
      .collect { case (k, m) if m > 0 => k }.toSet

  private def liveKeys(dir: String): Set[Key] =
    LakeTable.read(spark, dir).collect().map(key).toSet

  test("change-feed stream: versions as offsets, optimize silent, " +
       "exactly-once across restart") {
    val dir = Files.createTempDirectory("graft_lakestream_").toString
    val cp = Files.createTempDirectory("graft_lakestream_cp_").toString
    val o = graft.ops.Tables.orders(spark, sf)
    val width = math.max(32L,
      o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
    val full = roll(o, width)

    // v1: partial snapshot (band 0 rolled up from a date-limited slice)
    val v1 = full.filter(col("band") =!= 0)
      .unionByName(roll(o.filter(
        col("o_orderdate") < lit("1997-01-01").cast("timestamp")), width)
        .filter(col("band") === 0))
    assert(LakeTable.commit(spark, dir, v1, Some("band"))(_ => None)
      == Right(1L))

    val batches = mutable.Map.empty[Long, Seq[Row]] // batchId-keyed: replay-idempotent
    val q = spark.readStream.format("graft-lake")
      .option("path", dir).load()
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.synchronized { batches(id) = df.collect().toSeq }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(fold(batches) == liveKeys(dir), "initial snapshot (v1 inserts)")

      // v2: partial merge corrects band 0; v3: OPTIMIZE (must be silent);
      // v4: CDC tombstones — all while the stream is live
      assert(LakeTable.mergePartial(spark, dir,
        full.filter(col("band") === 0), Seq("custkey"), "band")(_ => None)
        == Right(2L))
      assert(LakeTable.optimize(spark, dir, Long.MaxValue, Seq.empty,
        Some("band")) == Right(3L))
      val tomb = full.filter(col("custkey") % 10 === 3)
        .withColumn("op", lit("D"))
      assert(LakeTable.applyCdcPartial(spark, dir, tomb,
        Seq("custkey"), "band")(_ => None) == Right(4L))
      q.processAllAvailable()
      assert(fold(batches) == liveKeys(dir), "fold across merge/opt/cdc")
      val versionsSeen = batches.values.flatten
        .map(_.getAs[Long]("_commit_version")).toSet
      assert(versionsSeen == Set(1L, 2L, 4L),
        s"optimize (v3) must emit no logical changes; saw $versionsSeen")
    } finally q.stop()

    // v5 lands while the stream is DOWN; the restarted query must deliver
    // exactly (4, 5] — no replay of v1–v4 (committed offsets) and no gap
    val preRestart = batches.keySet.toSet
    assert(LakeTable.mergePartial(spark, dir,
      full.filter(col("band") === 1)
        .withColumn("cents", col("cents") + lit(1L)),
      Seq("custkey"), "band")(_ => None) == Right(5L))
    val q2 = spark.readStream.format("graft-lake")
      .option("path", dir).load()
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.synchronized { batches(id) = df.collect().toSeq }
        ()
      }
      .start()
    try {
      q2.processAllAvailable()
      val newRows = batches.filterKeys(!preRestart.contains(_)).values.flatten
      assert(newRows.nonEmpty)
      assert(newRows.map(_.getAs[Long]("_commit_version")).toSet == Set(5L),
        "restart must resume at the committed offset: only v5's diff")
      assert(fold(batches) == liveKeys(dir), "fold after restart + v5")
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger drains a backlog one version per batch") {
    val dir = Files.createTempDirectory("graft_lakestream_rate_").toString
    val cp = Files.createTempDirectory("graft_lakestream_ratecp_").toString
    val o = graft.ops.Tables.orders(spark, sf)
    val width = math.max(32L,
      o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
    val full = roll(o, width)
    assert(LakeTable.commit(spark, dir, full, Some("band"))(_ => None)
      == Right(1L))

    val batchVersions = mutable.ArrayBuffer.empty[Set[Long]]
    def run(): Unit = {
      val q = spark.readStream.format("graft-lake")
        .option("path", dir).option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (df: DataFrame, _: Long) =>
          val vs = df.select("_commit_version").distinct()
            .collect().map(_.getLong(0)).toSet
          batchVersions.synchronized { batchVersions += vs }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // v1 alone
    assert(batchVersions.filter(_.nonEmpty).forall(_.size == 1))
    assert(batchVersions.flatten.toSet == Set(1L))

    // backlog of three more versions lands while the stream is DOWN;
    // the restarted query must drain it one version per micro-batch
    // (the rate cursor floors at the committed offset, not at 0)
    for (i <- 2 to 4) {
      assert(LakeTable.mergePartial(spark, dir,
        full.filter(col("band") === (i % 3).toLong)
          .withColumn("cents", col("cents") + lit(i.toLong)),
        Seq("custkey"), "band")(_ => None) == Right(i.toLong))
    }
    run()
    val nonEmpty = batchVersions.filter(_.nonEmpty)
    assert(nonEmpty.forall(_.size == 1),
      s"each micro-batch must carry exactly one version: $batchVersions")
    assert(nonEmpty.flatten.toSet == Set(1L, 2L, 3L, 4L))
  }

  test("startingVersion tails new commits without replaying history") {
    val dir = Files.createTempDirectory("graft_lakestream_tail_").toString
    val cp = Files.createTempDirectory("graft_lakestream_tailcp_").toString
    val o = graft.ops.Tables.orders(spark, sf)
    val width = math.max(32L,
      o.agg(max(col("o_custkey"))).head.getLong(0) / 8L + 1L)
    val full = roll(o, width)
    assert(LakeTable.commit(spark, dir, full, Some("band"))(_ => None)
      == Right(1L))

    val rows = mutable.ArrayBuffer.empty[Row]
    val q = spark.readStream.format("graft-lake")
      .option("path", dir).option("startingVersion", "1")
      .load()
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(rows.isEmpty, "history at or below startingVersion is skipped")
      assert(LakeTable.mergePartial(spark, dir,
        full.filter(col("band") === 2)
          .withColumn("n_orders", col("n_orders") + lit(1L)),
        Seq("custkey"), "band")(_ => None) == Right(2L))
      q.processAllAvailable()
      assert(rows.nonEmpty)
      assert(rows.map(_.getAs[Long]("_commit_version")).toSet == Set(2L))
      // the tailing consumer sees band 2's rewrite as retract+add pairs
      val bands = rows.map(_.getAs[Long]("band")).toSet
      assert(bands == Set(2L), "partial merge streams only touched bands")
    } finally q.stop()
  }
}
