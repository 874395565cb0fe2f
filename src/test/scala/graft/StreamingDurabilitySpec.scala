package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event
import java.nio.file.Files

/** §3 E3 durability semantics: the checkpoint WAL is the cross-restart
  * boundary, and the RocksDB state store is the production state backend.
  */
class StreamingDurabilitySpec extends SparkTestBase {

  private def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
    Event(id, ts(t), uid, typ, v, """{"k": 1}""")

  test("checkpointed file-sink query resumes exactly-once across restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val chk = Files.createTempDirectory("graft_chk").toString
    val out = Files.createTempDirectory("graft_out").toString
    val ms = MemoryStream[Event]
    val agg = StreamOps.tumblingCounts(ms.toDF())
    def start() = agg.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    val q1 = start()
    ms.addData(
      ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:10:00", 1, "click", 2.0))
    q1.processAllAvailable()
    ms.addData(ev(3, "2024-01-01 13:00:00", 1, "view", 1.0)) // close 10:00 win
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint (offsets in the WAL mark committed
    // batches) with new data closing the 13:00 window
    ms.addData(ev(4, "2024-01-01 16:00:00", 2, "view", 1.0))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out)
      .select("win_start", "event_type", "n")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toList
    // exactly-once: the 10:00 window appears once despite the restart, and
    // the 13:00 window (closed after restart) appears once
    assert(rows.count(_ == ("2024-01-01 10:00:00.0", "click", 2L)) == 1,
      s"10:00 window must appear exactly once: $rows")
    assert(rows.count(_ == ("2024-01-01 13:00:00.0", "view", 1L)) == 1,
      s"13:00 window must appear exactly once after restart: $rows")
  }

  test("foreachBatch idempotent write: epoch replay after a crash adds no duplicates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val chk = Files.createTempDirectory("graft_chk_eo").toString
    val out = Files.createTempDirectory("graft_out_eo").toString
    val ms = MemoryStream[Event]
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = ms.toDF().writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamOps.writeBatchIdempotent(b, out, id)
        // crash AFTER the data landed but BEFORE the epoch commits: the
        // replayed epoch re-runs with the SAME batchId and must overwrite
        // its own partition, not append a second copy
        if (id == 1 && injected.compareAndSet(false, true))
          throw new RuntimeException("injected post-write pre-commit failure")
      }
      .start()
    val q1 = start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:01:00", 1, "click", 2.0))
    q1.processAllAvailable() // batch 0 commits
    ms.addData(ev(3, "2024-01-01 10:02:00", 2, "view", 3.0))
    intercept[Exception] { q1.processAllAvailable() } // batch 1 crashes
    q1.stop()
    assert(injected.get, "fault injection never fired")
    val q2 = start() // WAL holds batch 1's offsets; it replays with id 1
    q2.processAllAvailable()
    q2.stop()
    val ids = spark.read.parquet(out).select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"replayed epoch must overwrite, not duplicate: $ids")
  }

  test("RocksDB state store backend produces the same results") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.tumblingCounts(ms.toDF())
        .writeStream.format("memory").queryName("rocks_1")
        .outputMode("append").start()
      ms.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:20:00", 2, "click", 2.0))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 13:00:00", 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("rocks_1").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      q.stop()
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L)),
        s"RocksDB-backed window agg drifted: $rows")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming near-dup state survives a checkpointed restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val chk = Files.createTempDirectory("graft_chk_nd").toString
    val out = Files.createTempDirectory("graft_out_nd").toString
    val ms = MemoryStream[StreamOps.DocEvent]
    val nd = StreamOps.streamingNearDup(spark, ms.toDF(), 0.5)
    def start() = nd.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog tonight again"
    val q1 = start()
    ms.addData(StreamOps.DocEvent(1L, ts("2024-01-01 10:00:00"), base))
    q1.processAllAvailable()
    q1.stop()
    // the duplicate arrives AFTER the restart: doc 1's signatures must
    // come back from the band-bucket state in the checkpoint, not memory
    ms.addData(StreamOps.DocEvent(2L, ts("2024-01-01 10:05:00"), base + " dup"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val dups = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toList
    assert(dups.contains((2L, 1L)),
      s"doc 2 must match doc 1's checkpointed signatures, got $dups")
  }

  test("streaming packer cumulative position survives a checkpointed restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val chk = Files.createTempDirectory("graft_chk_pack").toString
      val out = Files.createTempDirectory("graft_out_pack").toString
      val ms = MemoryStream[StreamOps.PackDoc]
      val packed = StreamOps.streamingPack(spark, ms.toDF(), 8)
      def start() = packed.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
      val q1 = start()
      ms.addData(StreamOps.PackDoc(0L, ts("2024-01-01 10:00:00"), "en",
                                   "a b c d e")) // 5 toks -> bin 0, off 0
      q1.processAllAvailable(); q1.stop()
      // the next doc arrives AFTER the restart: its start position (5)
      // must come back from the ValueState in the checkpoint, not memory
      ms.addData(StreamOps.PackDoc(1L, ts("2024-01-01 10:01:00"), "en",
                                   "f g h i")) // 4 toks -> bin 0, off 5
      val q2 = start()
      q2.processAllAvailable(); q2.stop()
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
      assert(rows == Set((0L, 0L, 0L), (1L, 0L, 5L)),
        s"packer state must resume at token 5: ${rows.mkString(", ")}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
