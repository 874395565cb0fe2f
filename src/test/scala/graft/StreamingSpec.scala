package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** §2.10 behaviors driven through MicroBatchExecution via MemoryStream —
  * the same engine path a Kafka source exercises (§1.4). */
class StreamingSpec extends SparkTestBase {

  private var qn = 0
  private def nextName(): String = { qn += 1; s"stream_sink_$qn" }

  private def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
    Event(id, ts(t), uid, typ, v, """{"k": 1}""")

  test("tumbling window counts; watermark finalizes closed windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:20:00", 1, "click", 2.0),
      ev(3, "2024-01-01 10:40:00", 2, "view", 3.0))
    q.processAllAvailable()
    // advance watermark well past 11:00 so the 10:00 window closes
    ms.addData(ev(4, "2024-01-01 13:00:00", 1, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table(name)
      .select("win_start", "event_type", "n", "total")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
                           r.getLong(2), r.getDouble(3))).toSet
    q.stop()
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "view", 1L, 3.0)))
  }

  test("windowed approx-distinct users tracks exact within HLL error") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.tumblingApproxUsers(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // window 10:00–11:00: 40 distinct users over 80 events, two batches
    val batch1 = (1 to 40).map(i =>
      ev(i, f"2024-01-01 10:${i % 60}%02d:00", i % 20 + 1, "click", 1.0))
    val batch2 = (41 to 80).map(i =>
      ev(i, f"2024-01-01 10:${i % 60}%02d:00", i % 40 + 1, "view", 1.0))
    ms.addData(batch1: _*)
    q.processAllAvailable()
    ms.addData(batch2: _*) // sketch state must merge across micro-batches
    q.processAllAvailable()
    ms.addData(ev(99, "2024-01-01 13:00:00", 1, "click", 1.0)) // close window
    q.processAllAvailable()
    val row = spark.table(name)
      .filter(col("win_start") === ts("2024-01-01 10:00:00")).collect().head
    q.stop()
    val approx = row.getAs[Long]("approx_users")
    assert(row.getAs[Long]("n_events") == 80L)
    // HLL++ default rsd 5%: 40 distinct must estimate within ±15%
    assert(math.abs(approx - 40.0) / 40.0 <= 0.15,
      s"approx $approx vs exact 40")
  }

  test("late data beyond the watermark is dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(ev(1, "2024-01-01 10:05:00", 1, "click", 1.0))
    q.processAllAvailable()
    ms.addData(ev(2, "2024-01-01 14:00:00", 1, "click", 1.0)) // wm → 13:50
    q.processAllAvailable()
    ms.addData(ev(3, "2024-01-01 10:10:00", 1, "click", 5.0)) // late: dropped
    ms.addData(ev(4, "2024-01-01 16:00:00", 1, "click", 1.0)) // close 14:00 win
    q.processAllAvailable()
    val clicks10 = spark.table(name)
      .filter("win_start = timestamp'2024-01-01 10:00:00' AND event_type='click'")
      .select("n").collect().map(_.getLong(0)).toList
    q.stop()
    assert(clicks10 == List(1L), s"late row must not count, got $clicks10")
  }

  test("streaming dedup by event_id") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.dedupByEventId(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0), // dup in same batch
      ev(2, "2024-01-01 10:01:00", 1, "view", 2.0))
    q.processAllAvailable()
    ms.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0)) // dup later batch
    q.processAllAvailable()
    val n = spark.table(name).count()
    q.stop()
    assert(n == 2, s"expected 2 distinct events, got $n")
  }

  test("dropDuplicatesWithinWatermark dedups redeliveries with perturbed ts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.dedupWithinWatermark(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:01:00", 1, "view", 2.0))
    q.processAllAvailable()
    // redelivery of event 1 with a DIFFERENT timestamp — the shape
    // dropDuplicates("event_id","ts") would NOT catch
    ms.addData(ev(1, "2024-01-01 10:00:07", 1, "click", 1.0))
    q.processAllAvailable()
    val n = spark.table(name).count()
    q.stop()
    assert(n == 2, s"expected the perturbed redelivery suppressed, got $n rows")
  }

  test("transformWithState running totals agree with mapGroupsWithState") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // state v2 requires a multi-column-family store: RocksDB, the
    // production backend (HDFSBackedStateStoreProvider cannot run it)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.runningUserTotalsV2(spark, ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.5),
      ev(2, "2024-01-01 10:01:00", 1, "click", 2.5))
    q.processAllAvailable()
    ms.addData(ev(3, "2024-01-01 10:02:00", 1, "view", 6.0))
    q.processAllAvailable()
    val last = spark.table(name).filter("user_id = 1")
      .orderBy("n_events").collect().last
    q.stop()
    // same cumulative totals the mapGroupsWithState test pins
    assert(last.getLong(1) == 3L)
    assert(math.abs(last.getDouble(2) - 10.0) < 1e-9)
    } finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("session windows split on gap > 10 minutes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.sessionCounts(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 7, "click", 1.0),
      ev(2, "2024-01-01 10:05:00", 7, "click", 1.0), // same session
      ev(3, "2024-01-01 10:30:00", 7, "click", 1.0)) // new session
    ms.addData(ev(4, "2024-01-01 12:00:00", 8, "view", 1.0)) // advance wm
    q.processAllAvailable()
    val sessions = spark.table(name).filter("user_id = 7")
      .select("n").collect().map(_.getLong(0)).sorted.toList
    q.stop()
    assert(sessions == List(1L, 2L), s"expected sessions of 2 and 1, got $sessions")
  }

  test("mapGroupsWithState keeps running per-user totals") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.runningUserTotals(spark, ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.5),
      ev(2, "2024-01-01 10:01:00", 1, "click", 2.5))
    q.processAllAvailable()
    ms.addData(ev(3, "2024-01-01 10:02:00", 1, "view", 6.0))
    q.processAllAvailable()
    val last = spark.table(name).filter("user_id = 1")
      .orderBy("n_events").collect().last
    q.stop()
    assert(last.getLong(1) == 3L)
    assert(math.abs(last.getDouble(2) - 10.0) < 1e-9)
  }

  test("mapGroupsWithState drops idle-user state on event-time timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.runningUserTotals(spark, ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.5),
      ev(2, "2024-01-01 10:01:00", 1, "click", 2.5))
    q.processAllAvailable()
    // push the watermark far past user 1's 30-min idle deadline (and run a
    // second batch so the armed timeout actually fires and evicts state)
    ms.addData(ev(3, "2024-01-01 12:00:00", 9, "view", 1.0))
    q.processAllAvailable()
    ms.addData(ev(4, "2024-01-01 12:01:00", 9, "view", 1.0))
    q.processAllAvailable()
    // user 1 returns AFTER eviction: totals must restart from zero — if
    // the old state had survived, this would read n_events=3, total=11.0
    ms.addData(ev(5, "2024-01-01 14:00:00", 1, "view", 7.0))
    q.processAllAvailable()
    val rows = spark.table(name).filter("user_id = 1")
      .select("n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    q.stop()
    assert(rows.contains((1L, 7.0)),
      s"state must restart after timeout eviction, got $rows")
    assert(!rows.exists(_._1 == 3L),
      s"pre-timeout state must not leak into the new session, got $rows")
  }

  test("flatMapGroupsWithState sessionizer emits sessions on event-time timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.sessionizer(spark, ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 5, "click", 1.0),
      ev(2, "2024-01-01 10:04:00", 5, "view", 2.0))
    q.processAllAvailable()
    // nothing closed yet: watermark hasn't passed end + 10min
    assert(spark.table(name).count() == 0)
    // push watermark far past the session timeout
    ms.addData(ev(3, "2024-01-01 12:00:00", 6, "click", 1.0))
    q.processAllAvailable()
    ms.addData(ev(4, "2024-01-01 14:00:00", 6, "click", 1.0))
    q.processAllAvailable()
    val sessions = spark.table(name).filter("user_id = 5").collect()
    q.stop()
    assert(sessions.length == 1, s"one closed session for user 5: ${sessions.toList}")
    assert(sessions.head.getLong(1) == 2L)
    assert(math.abs(sessions.head.getDouble(2) - 3.0) < 1e-9)
  }

  test("streaming near-dup flags a later doc against earlier signatures") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[StreamOps.DocEvent]
    val name = nextName()
    val q = StreamOps.streamingNearDup(spark, ms.toDF(), 0.5)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog tonight again"
    ms.addData(
      StreamOps.DocEvent(1L, ts("2024-01-01 10:00:00"), base),
      StreamOps.DocEvent(2L, ts("2024-01-01 10:01:00"),
        "completely different content about spark query engines at scale"))
    q.processAllAvailable()
    // near-dup of doc 1 arrives in a LATER micro-batch: must match the
    // signature stored in the band-bucket state
    ms.addData(StreamOps.DocEvent(3L, ts("2024-01-01 10:05:00"), base + " dup"))
    q.processAllAvailable()
    val dups = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(dups.exists { case (d, of, est) => d == 3L && of == 1L && est >= 0.5 },
           s"doc 3 must be flagged against doc 1, got $dups")
    assert(!dups.exists { case (d, of, _) => d == 2L || of == 2L },
           s"unrelated doc 2 must not pair, got $dups")
  }

  test("streaming contamination flags docs overlapping the static benchmark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[StreamOps.DocEvent]
    val name = nextName()
    val q = StreamOps.streamingContamination(ms.toDF(), bench, 3)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      StreamOps.DocEvent(1L, ts("2024-01-01 10:00:00"),
        "alpha beta gamma delta epsilon mu"),          // 3 shared grams
      StreamOps.DocEvent(2L, ts("2024-01-01 10:01:00"),
        "one two three four five six"))                // 0 shared
    q.processAllAvailable()
    val flagged = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    q.stop()
    assert(flagged.keySet == Set(1L), s"got $flagged")
    assert(flagged(1L) == 3L)
  }

  test("streaming curation gate agrees with the batch mixture sampler") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // rates as the batch op would derive them; 'fr' fully suppressed
    val rates = Seq(("en", 0.6), ("fr", 0.0)).toDF("lang", "rate")
    val ms = MemoryStream[StreamOps.PackDoc]
    val name = nextName()
    val q = StreamOps.streamingCurationGate(ms.toDF(), rates, 3)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val docs = (1L to 40L).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val text = if (i % 10 == 0) "too short" // 2 toks: quality-floored
                 else s"some tokens of document number $i"
      StreamOps.PackDoc(i, ts("2024-01-01 10:00:00"), lang, text)
    }
    ms.addData(docs.take(20): _*)
    q.processAllAvailable()
    ms.addData(docs.drop(20): _*) // second micro-batch: same gate, no state
    q.processAllAvailable()
    val streamed = spark.table(name).collect().map(_.getLong(0)).toSet
    q.stop()
    // batch twin over the identical rows: same join + same md5 uniform
    val batch = StreamOps.streamingCurationGate(
      docs.toDF(), rates, 3).collect().map(_.getLong(0)).toSet
    assert(streamed == batch,
      s"ingest gate must equal batch backfill: $streamed vs $batch")
    assert(streamed.nonEmpty && streamed.forall(_ % 2 == 0), "fr suppressed")
    assert(!streamed.exists(_ % 10 == 0), "short docs quality-floored")
  }

  test("streaming anomaly gate flags exactly what the batch twin flags") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val baseline = Seq(("purchase", 100.0, 10.0), ("click", 1.0, 0.0))
      .toDF("event_type", "mu", "sd")
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.streamingAnomalyGate(ms.toDF(), baseline, 2.0)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val evs = Seq(
      ev(1, "2024-01-01 10:00:00", 3, "purchase", 100.0), // z = 0
      ev(2, "2024-01-01 10:00:01", 3, "purchase", 135.0), // z = 3.5 → flag
      ev(3, "2024-01-01 10:00:02", 4, "purchase", 75.0),  // z = −2.5 → flag
      ev(4, "2024-01-01 10:00:03", 4, "purchase", 119.0), // z = 1.9
      ev(5, "2024-01-01 10:00:04", 5, "click", 9999.0),   // sd = 0: passes
      ev(6, "2024-01-01 10:00:05", 5, "view", 1.0))       // no baseline row
    ms.addData(evs.take(3): _*)
    q.processAllAvailable()
    ms.addData(evs.drop(3): _*) // second micro-batch: stateless gate
    q.processAllAvailable()
    val streamed = spark.table(name).collect()
      .map(r => r.getAs[Long]("event_id")).toSet
    q.stop()
    assert(streamed == Set(2L, 3L), s"got $streamed")
    // batch backfill over the identical rows flags the identical events
    val batch = StreamOps.streamingAnomalyGate(evs.toDF(), baseline, 2.0)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(batch == streamed)
  }

  test("streaming CUSUM gate: cross-batch state equals an exact batch replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val target = Map("purchase" -> 10000L, "click" -> 100L) // centi-units
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.streamingCusum(spark, ms.toDF(), target, 5000L)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    val evs = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "purchase", 120.0), // +2000
      ev(2, "2024-01-01 10:00:01", 1, "purchase", 90.0),  // -1000 → 1000
      ev(3, "2024-01-01 10:00:02", 2, "click", 1.0),      // 0
      ev(4, "2024-01-01 10:01:00", 2, "purchase", 130.0), // +3000 → 4000
      ev(5, "2024-01-01 10:01:30", 3, "purchase", 125.0), // +2500 → 6500 flag
      ev(6, "2024-01-01 10:02:00", 3, "click", 0.2))      // clamp at 0
    ms.addData(evs.take(3): _*)
    q.processAllAvailable()
    ms.addData(evs.drop(3): _*)
    q.processAllAvailable()
    // update mode emits one row per key per batch — keep the final state
    val streamed = spark.table(name).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_seen"),
                 r.getAs[Long]("cusum_centi"), r.getAs[Long]("is_change")))
      .groupBy(_._1).map { case (t, rs) => rs.maxBy(_._2) }.toSet
    q.stop()
    // exact integer replay over the full ordered history
    val replay = evs.groupBy(_.event_type).map { case (t, es) =>
      var s = 0L
      es.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        s = math.max(0L, s + math.floor(e.value * 100.0 + 0.5).toLong
                          - target.getOrElse(t, 0L))
      }
      (t, es.size.toLong, s, if (s > 5000L) 1L else 0L)
    }.toSet
    assert(streamed == replay, s"streamed=$streamed replay=$replay")
    // the sustained upward drift in purchases must be flagged
    assert(streamed.exists(r => r._1 == "purchase" && r._4 == 1L))
  }

  test("quota gate admits exactly rank<=n per (user, window) across random splits") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // 2 users × 2 windows; user 1 bursts past the n=3 quota in hour 10
    val evs = (1L to 14L).map { i =>
      val (uid, t) =
        if (i <= 6) (1L, s"2024-01-01 10:0${i - 1}:00")
        else if (i <= 9) (2L, s"2024-01-01 10:0${i - 7}:30")
        else (1L, s"2024-01-01 11:0${i - 10}:00")
      ev(i, t, uid, "click", 1.0)
    }
    val expected = evs.groupBy(e => (e.user_id, e.ts.getTime / 3600000L))
      .flatMap { case (_, es) =>
        es.sortBy(e => (e.ts.getTime, e.event_id)).zipWithIndex
          .map { case (e, i) => e.event_id -> (i < 3) }
      }
    // three different batch splits must all reproduce the batch ranking
    for (cuts <- Seq(Seq(14), Seq(4, 9, 14), Seq(1, 2, 7, 11, 14))) {
      val ms = MemoryStream[Event]
      val name = nextName()
      val q = StreamOps.quotaGate(spark, ms.toDF(), 3L)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      var prev = 0
      cuts.foreach { c =>
        ms.addData(evs.slice(prev, c): _*); prev = c
        q.processAllAvailable()
      }
      val got = spark.table(name).collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("admitted"))
        .toMap
      q.stop()
      assert(got == expected, s"splits=$cuts")
    }
    // and the batch twin agrees on the same data
    val twin = StreamOps.quotaGateBatch(evs.toDF(), 3L).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("admitted"))
      .toMap
    assert(twin == expected.toMap)
    // quota binds: user 1 hour-10 has exactly 3 admitted of 6
    assert(evs.filter(e => e.user_id == 1L && e.ts.getTime / 3600000L
             == ts("2024-01-01 10:00:00").getTime / 3600000L)
             .count(e => expected(e.event_id)) == 3)
  }

  test("streaming as-of join equals the batch point-in-time replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // dim updates (key → rate) and facts, deliberately out of order
    // across micro-batches: the 10:04 dim for key 1 arrives AFTER the
    // 10:05 fact was seen, and must still win for it (the fact is only
    // final once the watermark passes it)
    val dimFeed = Seq(
      (1L, "2024-01-01 10:00:00", 1.0), (2L, "2024-01-01 10:00:00", 5.0),
      (1L, "2024-01-01 10:04:00", 2.0), (1L, "2024-01-01 10:30:00", 3.0),
      (2L, "2024-01-01 10:20:00", 6.0))
    val factFeed = Seq(
      (1L, "2024-01-01 10:02:00"), (1L, "2024-01-01 10:05:00"),
      (2L, "2024-01-01 10:01:00"), (1L, "2024-01-01 10:31:00"),
      (2L, "2024-01-01 10:25:00"), (3L, "2024-01-01 10:03:00")) // no dim
    // batch replay: latest dim with ts <= fact ts per key
    val expected = factFeed.map { case (k, t) =>
      val before = dimFeed.filter(d => d._1 == k && d._2 <= t)
      (k, ts(t).toString,
       if (before.isEmpty) None else Some(before.maxBy(d => (d._2, d._3))._3))
    }.toSet
    val dimMs = MemoryStream[StreamOps.DimUpd]
    val factMs = MemoryStream[StreamOps.FactRow]
    val name = nextName()
    val q = StreamOps.streamingAsofJoin(spark, factMs.toDF(), dimMs.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // batch 1: first two dims + two facts (one pre-dating the 10:04 dim)
    dimMs.addData(StreamOps.DimUpd(1L, ts(dimFeed(0)._2), 1.0),
                  StreamOps.DimUpd(2L, ts(dimFeed(1)._2), 5.0))
    factMs.addData(StreamOps.FactRow(1L, ts(factFeed(0)._2)),
                   StreamOps.FactRow(1L, ts(factFeed(1)._2)),
                   StreamOps.FactRow(3L, ts(factFeed(5)._2)))
    q.processAllAvailable()
    // batch 2: the out-of-order 10:04 dim that must serve the 10:05 fact,
    // plus the rest of both feeds
    dimMs.addData(StreamOps.DimUpd(1L, ts(dimFeed(2)._2), 2.0),
                  StreamOps.DimUpd(1L, ts(dimFeed(3)._2), 3.0),
                  StreamOps.DimUpd(2L, ts(dimFeed(4)._2), 6.0))
    factMs.addData(StreamOps.FactRow(2L, ts(factFeed(2)._2)),
                   StreamOps.FactRow(1L, ts(factFeed(3)._2)),
                   StreamOps.FactRow(2L, ts(factFeed(4)._2)))
    q.processAllAvailable()
    // sentinels far in the future on BOTH streams: the union's global
    // watermark is the MIN of the two sides', so each must advance past
    // every real fact before the last ones finalize
    dimMs.addData(StreamOps.DimUpd(99L, ts("2024-01-01 13:00:00"), 0.0))
    factMs.addData(StreamOps.FactRow(99L, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    dimMs.addData(StreamOps.DimUpd(99L, ts("2024-01-01 16:00:00"), 0.0))
    factMs.addData(StreamOps.FactRow(99L, ts("2024-01-01 16:00:00")))
    q.processAllAvailable()
    val rows = spark.table(name)
      .select("k", "ts", "rate").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
                 if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .filter(_._1 != 99L) // drop the sentinel key's own emissions
    q.stop()
    assert(rows.length == factFeed.length,
      s"every fact must emit exactly once: ${rows.toSeq}")
    assert(rows.toSet == expected.map { case (k, t, v) => (k, t, v) },
      s"streaming as-of must equal the batch replay:\n got ${rows.toSeq.sorted}\n exp ${expected.toSeq.sorted}")
  }

  test("as-of join keeps dim history across a timeout-driven emission") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // sparse fact traffic: the first fact is finalized by a TIMEOUT
    // invocation (its key gets no rows in the watermark-advancing
    // batches), and a LATER fact on the same key must still find the
    // 10:00 dim — the r7 bug removed the whole key state (dim buffer
    // included) whenever a finalization timeout drained the last
    // pending fact, so the 13:00 fact emitted rate=None
    val dimMs = MemoryStream[StreamOps.DimUpd]
    val factMs = MemoryStream[StreamOps.FactRow]
    val name = nextName()
    val q = StreamOps.streamingAsofJoin(spark, factMs.toDF(), dimMs.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def sentinel(t: String): Unit = {
      dimMs.addData(StreamOps.DimUpd(99L, ts(t), 0.0))
      factMs.addData(StreamOps.FactRow(99L, ts(t)))
      q.processAllAvailable()
    }
    dimMs.addData(StreamOps.DimUpd(1L, ts("2024-01-01 10:00:00"), 1.0))
    factMs.addData(StreamOps.FactRow(1L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // watermark-only batches: key 1 sees no data, so its 10:05 fact can
    // only finalize via the timeout armed at pending.min+1
    sentinel("2024-01-01 13:00:00")
    sentinel("2024-01-01 13:05:00")
    // the sparse follow-up fact on the same key
    factMs.addData(StreamOps.FactRow(1L, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    sentinel("2024-01-01 13:30:00")
    sentinel("2024-01-01 13:40:00")
    val rows = spark.table(name).select("k", "ts", "rate").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getTimestamp(1).toString,
                 if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    q.stop()
    assert(rows == Set(("2024-01-01 10:05:00.0", Some(1.0)),
                       ("2024-01-01 13:00:00.0", Some(1.0))),
      s"the post-timeout fact must still see the 10:00 dim: $rows")
  }

  test("stream-static join enriches events with customer dims") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val customers = graft.ops.Tables.customer(spark, sf)
    val name = nextName()
    val q = StreamOps.enrichWithCustomer(ms.toDF(), customers)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(ev(1, "2024-01-01 10:00:00", 3, "click", 1.0))
    q.processAllAvailable()
    val row = spark.table(name).collect().head
    q.stop()
    assert(row.getAs[String]("c_name") != null, "customer 3 should enrich")
  }

  test("stream-stream interval join matches purchase to preceding click") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.purchaseAfterClick(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
      ev(2, "2024-01-01 10:10:00", 1, "purchase", 9.99),
      ev(3, "2024-01-01 09:00:00", 2, "click", 0.0),
      ev(4, "2024-01-01 10:10:00", 2, "purchase", 5.0)) // click 70min before
    ms.addData(ev(9, "2024-01-01 13:00:00", 3, "view", 0.0)) // advance wm
    q.processAllAvailable()
    val pairs = spark.table(name).select("p_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs.contains((2L, 1L)), s"user1 purchase must match its click: $pairs")
    assert(!pairs.exists(_._1 == 4L), "user2 click is outside the 30min interval")
  }

  test("stream-stream LEFT OUTER join emits unmatched purchases after watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.purchaseWithOptionalClick(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
      ev(2, "2024-01-01 10:10:00", 1, "purchase", 9.99),
      ev(4, "2024-01-01 10:10:00", 2, "purchase", 5.0)) // user 2 never clicked
    q.processAllAvailable()
    // push BOTH sides' watermarks far enough that user 2's purchase is
    // provably unmatched -> the null-click row may now be emitted (a
    // 'view' would be filtered out of both join inputs and advance
    // neither watermark)
    ms.addData(ev(9, "2024-01-01 15:00:00", 3, "click", 0.0),
               ev(10, "2024-01-01 15:00:01", 3, "purchase", 1.0))
    q.processAllAvailable()
    ms.addData(ev(11, "2024-01-01 18:00:00", 3, "click", 0.0),
               ev(12, "2024-01-01 18:00:01", 3, "purchase", 1.0))
    q.processAllAvailable()
    val rows = spark.table(name).select("p_id", "c_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    q.stop()
    assert(rows.contains((2L, 1L)), s"matched purchase must carry its click: $rows")
    assert(rows.contains((4L, -1L)), s"unmatched purchase must emit with NULL click: $rows")
  }

  test("stream-stream LEFT SEMI join emits each clicked purchase exactly once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.purchaseHavingClick(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
      ev(2, "2024-01-01 10:05:00", 1, "click", 0.0), // second matching click
      ev(3, "2024-01-01 10:10:00", 1, "purchase", 9.99),
      ev(4, "2024-01-01 10:10:00", 2, "purchase", 5.0)) // user 2 never clicked
    q.processAllAvailable()
    ms.addData(ev(9, "2024-01-01 15:00:00", 3, "click", 0.0),
               ev(10, "2024-01-01 15:00:01", 3, "purchase", 1.0))
    q.processAllAvailable()
    val rows = spark.table(name).select("p_id")
      .collect().map(_.getLong(0)).toList
    q.stop()
    // semi join: existence only — one row despite TWO matching clicks,
    // and only purchase-side columns in the schema
    assert(rows.count(_ == 3L) == 1,
      s"clicked purchase must emit exactly once: $rows")
    assert(!rows.contains(4L), s"clickless purchase must not emit: $rows")
    assert(!spark.table(name).columns.contains("c_id"))
  }

  test("stream-stream FULL OUTER join emits unmatched rows from both sides") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = StreamOps.purchaseClickFullOuter(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
      ev(2, "2024-01-01 10:10:00", 1, "purchase", 9.99),
      ev(3, "2024-01-01 10:05:00", 5, "click", 0.0),    // user 5 never buys
      ev(4, "2024-01-01 10:10:00", 2, "purchase", 5.0)) // user 2 never clicked
    q.processAllAvailable()
    // two far-future rounds so both watermarks pass every unmatched row's
    // completeness horizon (click side additionally needs the purchase
    // watermark past c_ts + 30min — the join window's width)
    ms.addData(ev(9, "2024-01-01 15:00:00", 3, "click", 0.0),
               ev(10, "2024-01-01 15:00:01", 3, "purchase", 1.0))
    q.processAllAvailable()
    ms.addData(ev(11, "2024-01-01 18:00:00", 3, "click", 0.0),
               ev(12, "2024-01-01 18:00:01", 3, "purchase", 1.0))
    q.processAllAvailable()
    val rows = spark.table(name).select("p_id", "c_id")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                           if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    q.stop()
    assert(rows.contains((2L, 1L)), s"matched pair must join: $rows")
    assert(rows.contains((4L, -1L)), s"unmatched purchase must emit: $rows")
    assert(rows.contains((-1L, 3L)), s"unmatched click must emit: $rows")
  }

  test("streaming sequence packer agrees with the batch operator on a monotone stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val d = Seq(
        StreamOps.PackDoc(0L, ts, "en", "a b c d e"), // 5 toks
        StreamOps.PackDoc(1L, ts, "en", "f g h"),     // 3
        StreamOps.PackDoc(2L, ts, "en", "i j k l"),   // 4: starts tok 8
        StreamOps.PackDoc(3L, ts, "de", "x y z"))
      val ms = MemoryStream[StreamOps.PackDoc]
      val name = nextName()
      val q = StreamOps.streamingPack(spark, ms.toDF(), 8)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      ms.addData(d(0), d(1), d(3)) // batch 1
      q.processAllAvailable()
      ms.addData(d(2))             // batch 2: state carries tok position 8
      q.processAllAvailable()
      val got = spark.table(name)
        .select("doc_id", "lang", "bin_id", "bin_off").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      q.stop()
      // identical to LlmOps.packSequences over the same 4 docs (ApiSpec)
      assert(got == Set(
        (0L, "en", 0L, 0L), (1L, "en", 0L, 5L), (2L, "en", 1L, 0L),
        (3L, "de", 0L, 0L)), got.mkString(", "))
    } finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("two source streams union into one aggregating query") {
    // multi-source topology: two independent streams (e.g. two regions'
    // feeds) union into a single stateful aggregation — offsets tracked
    // per source in the same checkpoint
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms1 = MemoryStream[Event]
    val ms2 = MemoryStream[Event]
    val name = nextName()
    val q = ms1.toDF().union(ms2.toDF())
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    ms1.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0))
    ms2.addData(ev(2, "2024-01-01 10:00:05", 2, "click", 2.0),
                ev(3, "2024-01-01 10:00:10", 2, "view", 3.0))
    q.processAllAvailable()
    val rows = spark.table(name).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(rows == Map("click" -> 2L, "view" -> 1L),
      s"counts must span both sources: $rows")
  }

  test("Trigger.AvailableNow backfills queued data then stops itself") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    // data queued BEFORE start: the one-shot catch-up shape — process
    // everything available, checkpoint, terminate (no perpetual query)
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:00:30", 2, "view", 2.0),
      ev(3, "2024-01-01 10:01:10", 1, "click", 3.0))
    val name = nextName()
    val q = StreamOps.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    assert(!q.isActive)
    val total = spark.table(name).agg(sum("n")).collect().head.getLong(0)
    assert(total == 3L, s"backfill must process every queued event, got $total")
  }

  test("per-batch throughput holds steady across a sustained run") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamOps.tumblingCounts(ms.toDF())
      .writeStream.format("noop").start()
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val chunk = 4000
    // 10 identical-size micro-batches; a state-size or planning regression
    // shows up as later batches losing throughput (StreamBench records the
    // absolute rows/sec for BASELINE.md — this asserts the SHAPE)
    (0 until 10).foreach { b =>
      ms.addData((0 until chunk).map { i =>
        val n = b * chunk + i
        Event(n.toLong, new java.sql.Timestamp(base + n.toLong * 500),
              (n % 997).toLong, if (n % 3 == 0) "click" else "view",
              1.0, "{}")
      })
      q.processAllAvailable()
    }
    val rps = q.recentProgress.toSeq
      .filter(_.numInputRows > 0).map(_.processedRowsPerSecond)
    q.stop()
    assert(rps.size >= 8, s"expected ~10 data batches, saw ${rps.size}")
    val sorted = rps.drop(2).sorted // first batches pay codegen/JIT warmup
    val median = sorted(sorted.size / 2)
    val tail = rps.takeRight(3).sorted.apply(1)
    info(f"per-batch rows/sec median $median%.0f, last-3 median $tail%.0f")
    assert(tail >= median / 2.0,
      f"throughput collapsed across the run: last-3 median $tail%.0f " +
        f"vs run median $median%.0f")
  }

  test("observe() exposes per-batch input metrics through query progress") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = ms.toDF()
      .observe("input_stats", count(lit(1)).as("n_rows"),
               sum(col("value")).as("total_value"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.5),
      ev(2, "2024-01-01 10:00:10", 2, "view", 2.5))
    q.processAllAvailable()
    val m = q.lastProgress.observedMetrics.get("input_stats")
    q.stop()
    assert(m != null, "observed metrics must surface in progress")
    assert(m.getAs[Long]("n_rows") == 2L, m.toString)
    assert(math.abs(m.getAs[Double]("total_value") - 4.0) < 1e-9, m.toString)
  }

  test("foreachBatch sink receives every micro-batch exactly once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = ms.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        seen.put(batchId, batch.count()); ()
      }
      .outputMode("append").start()
    ms.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
               ev(2, "2024-01-01 10:01:00", 1, "view", 2.0))
    q.processAllAvailable()
    ms.addData(ev(3, "2024-01-01 10:02:00", 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.values.asScala.sum == 3, s"expected 3 rows across batches: $seen")
    assert(seen.size >= 2, "expected at least two micro-batches")
  }

  test("maxFilesPerTrigger paces file ingestion into bounded micro-batches") {
    // backpressure: a backlog of files must drain as bounded batches
    // (1 file per trigger), not one giant catch-up batch — the knob that
    // keeps a recovering stream from OOMing on its own backlog
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_paced").toString
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        seen.put(batchId, batch.count()); ()
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.values.asScala.sum == 3, s"all rows must arrive: $seen")
    assert(seen.size >= 3, s"1 file per trigger -> >= 3 micro-batches: $seen")
    assert(seen.values.asScala.forall(_ <= 1), s"each batch bounded to 1 row: $seen")
  }

  test("file source stream over the fixture equals the batch twin") {
    // unified API: the same window expression drives q_win_tumble_batch and
    // the streaming path; replaying the static events file through the
    // parquet file source must reproduce the batch result exactly
    import org.apache.spark.sql.functions._
    val eventsBatch = graft.ops.Tables.events(spark, sf)
    import org.apache.spark.sql.types._
    // Spark 4.1.2 reads the parquet TIMESTAMP(NANOS) column as
    // TIMESTAMP_NTZ (truncated to µs); normalize to the UTC session TZ
    // exactly like Tables.events so stream == batch bit-for-bit
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
    val name = nextName()
    // no watermark: complete replay, complete mode — we want exact equality
    val q = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.table(name).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    val batch = eventsBatch
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch, s"stream/batch divergence: ${streamed.size} vs ${batch.size}")
  }

  test("streaming OHLC candles equal the batch formulation over the fixture") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
    val name = nextName()
    val q = StreamOps.tumblingOhlc(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
       r.getDouble(4), r.getDouble(5))
    val streamed = spark.table(name).collect().map(key).toSet
    q.stop()
    val ev = graft.ops.Tables.events(spark, sf)
    val batch = ev
      .select(col("ts"),
              concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
                     lpad(col("event_id").cast("string"), 10, "0")).as("k"),
              col("value"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), min_by(col("value"), col("k")).as("open"),
           max(col("value")).as("high"), min(col("value")).as("low"),
           max_by(col("value"), col("k")).as("close"))
      .select(col("window.start").as("win_start"), col("n"), col("open"),
              col("high"), col("low"), col("close"))
      .collect().map(key).toSet
    assert(streamed == batch,
      s"stream/batch OHLC divergence: ${streamed.size} vs ${batch.size}")
  }

  test("dead-letter split: malformed rows quarantined, clean rows typed, total conserved") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val cleanRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val badRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = ms.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (clean, quarantine) = StreamOps.deadLetterSplit(batch)
        clean.collect().foreach(r =>
          cleanRows.add((r.getAs[Long]("event_id"), r.getAs[Int]("k"))))
        quarantine.collect().foreach(r =>
          badRows.add((r.getAs[Long]("event_id"), r.getAs[String]("reason"))))
        ()
      }
      .start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 1, "click", 1.0, """{"k": "oops"}"""),
      Event(3, ts("2024-01-01 10:02:00"), 2, "view", 2.0, """not json at all"""),
      ev(4, "2024-01-01 10:03:00", 2, "view", 2.0))
    q.processAllAvailable()
    ms.addData(Event(5, ts("2024-01-01 10:04:00"), 3, "click", 1.0, """{"j": 9}"""),
               ev(6, "2024-01-01 10:05:00", 3, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val clean = cleanRows.asScala.toSet
    val bad = badRows.asScala.toSet
    assert(clean.map(_._1) == Set(1L, 4L, 6L), s"clean routing: $clean")
    assert(clean.forall(_._2 == 1), "typed k must parse to 1")
    assert(bad.map(_._1) == Set(2L, 3L, 5L), s"quarantine routing: $bad")
    assert(bad.forall(_._2 == "unparseable props.k"))
    assert(clean.size + bad.size == 6, "conservation: every row lands once")
  }

  test("complete output mode re-emits full aggregate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    import org.apache.spark.sql.functions._
    val agg = ms.toDF().groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    ms.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0))
    q.processAllAvailable()
    ms.addData(ev(2, "2024-01-01 10:01:00", 1, "click", 1.0))
    q.processAllAvailable()
    val n = spark.table(name).filter("event_type = 'click'")
      .collect().head.getLong(1)
    q.stop()
    assert(n == 2L)
  }

  test("behavior 35: lake change-feed subscription folds to the live table across crash-replay") {
    // the streaming READ of the lake (r9 ask #3): a consumer subscribes
    // to the manifest history via pollLakeChanges, applies each version's
    // retract/add rows keyed on _commit_version (the idempotence handle),
    // and commits its cursor only after its own effect lands. A crash
    // between effect and cursor commit replays the window; the keyed fold
    // makes the replay a no-op. Across a partial merge, an OPTIMIZE
    // (which must contribute NOTHING), and a CDC tombstone, the streamed
    // fold must equal the batch read of the live version.
    import spark.implicits._
    import graft.sources.LakeTable
    val dir = java.nio.file.Files.createTempDirectory("graft_feed_sub_").toString
    val cursor = java.nio.file.Files
      .createTempDirectory("graft_feed_cur_").toString + "/cursor"
    def toDf(m: Map[Long, Long]) =
      m.toSeq.map { case (k, n) => (k, n, k / 32) }
        .toDF("custkey", "n_orders", "band")
    val gate = (df: org.apache.spark.sql.DataFrame) =>
      if (df.isEmpty) Some("empty") else None

    // the consumer: a keyed fold with per-version idempotence
    var state = Set.empty[(Long, Long, Long)]
    val applied = scala.collection.mutable.Set.empty[Long]
    var optRows = 0L
    def consume(commitCursor: Boolean): Unit =
      StreamOps.pollLakeChanges(spark, dir, cursor).foreach {
        case (_, to, changes) =>
          val rows = changes
            .select("custkey", "n_orders", "band", "_change_type",
                    "_commit_version").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                       r.getString(3), r.getLong(4)))
          rows.map(_._5).distinct.sorted.foreach { v =>
            if (!applied.contains(v)) {
              applied += v
              val dels = rows.filter(e => e._5 == v && e._4 == "delete")
                .map(e => (e._1, e._2, e._3)).toSet
              val ins = rows.filter(e => e._5 == v && e._4 == "insert")
                .map(e => (e._1, e._2, e._3)).toSet
              state = state -- dels ++ ins
            }
          }
          if (commitCursor) StreamOps.commitLakeCursor(cursor, to)
      }

    val base = (1L to 96L).map(k => k -> k).toMap
    assert(LakeTable.commit(spark, dir, toDf(base), Some("band"))(gate)
             == Right(1L))
    consume(commitCursor = true) // v1 snapshot arrives as inserts
    assert(state.size == 96)
    assert(LakeTable.mergePartial(spark, dir, toDf(Map(5L -> 500L)),
             Seq("custkey"), "band")(gate) == Right(2L))
    consume(commitCursor = false) // CRASH: effect applied, cursor stale
    assert(state.contains((5L, 500L, 0L)), "the merge must fold in")
    val vOpt = LakeTable.optimize(spark, dir, Long.MaxValue, Seq.empty,
                                  Some("band"))
    assert(vOpt == Right(3L))
    val changes = Seq((7L, 0L, 7L / 32, "D")).toDF("custkey", "n_orders", "band", "op")
    assert(LakeTable.applyCdcPartial(spark, dir, changes,
             Seq("custkey"), "band")(gate) == Right(4L))
    // replayed window covers v2 (already applied — idempotent skip),
    // v3 (optimize — zero rows by construction), v4 (the tombstone)
    optRows = {
      val feed = LakeTable.changesBetween(spark, dir, 1L, 4L)
      feed.filter(col("_commit_version") === 3L).count()
    }
    assert(optRows == 0L, "OPTIMIZE must contribute nothing to the feed")
    consume(commitCursor = true)
    val live = LakeTable.read(spark, dir)
      .select("custkey", "n_orders", "band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(state == live,
      "the streamed fold must equal the batch read after crash-replay")
    assert(StreamOps.pollLakeChanges(spark, dir, cursor).isEmpty,
      "a committed cursor at the live version polls nothing")
  }

  test("behavior 37: incremental MV maintenance over the feed survives crash-replay") {
    // q_lake_mv's streaming twin: the consumer maintains a per-band
    // (count, sum) AGGREGATE from the change feed — inserts add,
    // retractions subtract — applying each _commit_version exactly once,
    // with the cursor committed only after the effect. A crash between
    // effect and cursor commit replays the window; the applied-version
    // guard makes the replay a no-op, and the maintained aggregate must
    // equal a direct re-aggregation of the live table.
    import spark.implicits._
    import graft.sources.LakeTable
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_sub_").toString
    val cursor = java.nio.file.Files
      .createTempDirectory("graft_mv_cur_").toString + "/cursor"
    def toDf(m: Map[Long, Long]) =
      m.toSeq.map { case (k, n) => (k, n, k / 32) }
        .toDF("custkey", "n_orders", "band")
    val gate = (df: org.apache.spark.sql.DataFrame) =>
      if (df.isEmpty) Some("empty") else None

    var mv = Map.empty[Long, (Long, Long)] // band -> (count, sum)
    val applied = scala.collection.mutable.Set.empty[Long]
    def consume(commitCursor: Boolean): Unit =
      StreamOps.pollLakeChanges(spark, dir, cursor).foreach {
        case (_, to, changes) =>
          val rows = changes
            .select("band", "n_orders", "_change_type", "_commit_version")
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
          rows.map(_._4).distinct.sorted.foreach { v =>
            if (!applied.contains(v)) {
              applied += v
              rows.filter(_._4 == v).foreach { case (band, n, kind, _) =>
                val (c0, s0) = mv.getOrElse(band, (0L, 0L))
                val d = if (kind == "insert") 1L else -1L
                val nxt = (c0 + d, s0 + d * n)
                mv = if (nxt._1 == 0L) mv - band else mv + (band -> nxt)
              }
            }
          }
          if (commitCursor) StreamOps.commitLakeCursor(cursor, to)
      }

    val base = (1L to 96L).map(k => k -> k).toMap
    assert(LakeTable.commit(spark, dir, toDf(base), Some("band"))(gate)
             == Right(1L))
    consume(commitCursor = true)
    assert(LakeTable.mergePartial(spark, dir, toDf(Map(5L -> 500L)),
             Seq("custkey"), "band")(gate) == Right(2L))
    consume(commitCursor = false) // CRASH: effect applied, cursor stale
    // delete ALL of band 2 (keys 64..95): the group must vanish
    val wipeBand2 = (64L to 95L)
      .map(k => (k, 0L, k / 32, "D"))
      .toDF("custkey", "n_orders", "band", "op")
    assert(LakeTable.applyCdcPartial(spark, dir, wipeBand2,
             Seq("custkey"), "band")(gate) == Right(3L))
    consume(commitCursor = true) // replays v2 (idempotent skip) + v3
    val direct = LakeTable.read(spark, dir)
      .groupBy("band").agg(count(lit(1)).cast("long").as("c"),
                           sum("n_orders").cast("long").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mv == direct,
      s"maintained aggregate must equal the direct one: $mv vs $direct")
    assert(!mv.contains(2L), "a fully-deleted group must vanish from the MV")
  }

  test("genre composition end-to-end (r11 ask #8): events -> session " +
       "windows + watermark -> lake merge sink -> feed -> MV == batch twin") {
    import spark.implicits._
    import graft.sources.LakeTable
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft_genre_").toString
    val cpW = java.nio.file.Files
      .createTempDirectory("graft_genre_w_").toString
    val cpR = java.nio.file.Files
      .createTempDirectory("graft_genre_r_").toString
    // THE reference pipeline shape at production discipline: an event
    // stream sessionized with a watermark, persisted exactly-once into a
    // transactional table, whose change feed maintains a downstream MV.
    // Kafka swap is a one-liner: replace the MemoryStream source with
    // StreamOps.kafkaEvents(spark, servers, topic) (format("kafka")) and
    // every transform below is unchanged (§1.4 — the connector jar is
    // absent in this offline image; MemoryStream drives the identical
    // MicroBatchExecution path).
    val ms = MemoryStream[Event]
    val sessions = StreamOps.sessionCounts(ms.toDF())
      .withColumn("band", col("user_id") % 2)
    val w = sessions.writeStream.format("graft-lake")
      .option("path", dir).option("checkpointLocation", cpW)
      .option("commitMode", "merge")
      .option("keys", "user_id,sess_start").option("layoutBy", "band")
      .start()
    val mainEvents = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:05:00", 1, "click", 2.0), // same session
      ev(3, "2024-01-01 11:00:00", 1, "view", 4.0), // new session (>10m)
      ev(4, "2024-01-01 10:00:00", 2, "click", 8.0),
      ev(5, "2024-01-01 10:20:00", 2, "view", 16.0)) // new session
    try {
      ms.addData(mainEvents: _*)
      w.processAllAvailable()
      // the flusher pushes the watermark past every session above; its
      // own session stays open in state and must NOT reach the table
      ms.addData(ev(99, "2024-01-01 15:00:00", 9, "click", 0.5))
      w.processAllAvailable()
    } finally w.stop()

    // batch twin of the CLOSED sessions: the identical session_window
    // aggregation over the same events, run as a plain batch query
    val twin = mainEvents.toDF()
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("session_window.start").as("sess_start"),
              col("user_id"), col("n"), col("total"))
      .withColumn("band", col("user_id") % 2)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("sess_start").getTime,
       r.getAs[Long]("user_id"), r.getAs[Long]("n"),
       r.getAs[Double]("total"), r.getAs[Long]("band"))
    val persisted = LakeTable.read(spark, dir)
      .select("sess_start", "user_id", "n", "total", "band")
      .collect().map(key).toSet
    assert(persisted == twin.collect().map(key).toSet,
      s"the persisted sessions must equal the batch twin: $persisted")

    // the MV leg: stream the table's change feed into the declarative
    // signed aggregation (behavior 40) and land it complete-mode
    val feed = spark.readStream.format("graft-lake")
      .option("path", dir).load()
    val name = nextName()
    val q2 = StreamOps.lakeMv(feed, Seq("band"), Seq("n", "total"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").option("checkpointLocation", cpR)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val mv = spark.table(name).collect()
      .map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_sum"),
          r.getAs[Double]("total_sum"))))
      .toMap
    val twinMv = twin.groupBy("band")
      .agg(count(lit(1)).as("nr"), sum("n").as("ns"), sum("total").as("ts"))
      .collect()
      .map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("nr"), r.getAs[Long]("ns"),
          r.getAs[Double]("ts"))))
      .toMap
    assert(mv == twinMv,
      s"the feed-maintained MV must equal the batch twin's: $mv vs $twinMv")
  }
}
