package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LakeTable

/** Crash-replay proof for the write-audit-publish commit protocol
  * (StreamingDurabilitySpec's discipline applied to the batch sink, r6
  * verdict ask #3): kill the protocol between EVERY pair of stages and
  * assert a reader following the manifest never observes anything but
  * the last published version — no partial file lists, no staged data,
  * no half-written pointers. */
class LakeSpec extends SparkTestBase {

  private def snap(keyMax: Int): DataFrame =
    graft.ops.Tables.orders(spark, sf)
      .filter(col("o_custkey") <= keyMax)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).cast("long").as("n_orders"))

  private def gate(df: DataFrame): Option[String] =
    if (df.count() == 0L) Some("empty snapshot") else None

  private def readKeys(dir: String): Set[Long] =
    LakeTable.read(spark, dir).collect().map(_.getAs[Long]("custkey")).toSet

  test("a crash at every protocol stage leaves the old version live") {
    val dir = Files.createTempDirectory("graft_lake_spec_").toString
    val v1Keys = snap(50).collect().map(_.getAs[Long]("custkey")).toSet
    assert(LakeTable.commit(spark, dir, snap(50))(gate) == Right(1L))
    assert(LakeTable.currentVersion(dir).contains(1L))
    assert(readKeys(dir) == v1Keys)

    // CRASH 1: after staging, before audit/publish — staged parquet is
    // on disk but the reader (manifest-routed) must not see a byte of it
    val st2 = LakeTable.stage(spark, dir, snap(100))
    assert(st2.files.nonEmpty)
    assert(LakeTable.currentVersion(dir).contains(1L))
    assert(readKeys(dir) == v1Keys, "staged-only data must be invisible")

    // CRASH 2: after the manifest file is durably written, before the
    // pointer flip — the manifest exists under its final name, but
    // visibility is the POINTER's job alone
    val st3 = LakeTable.stage(spark, dir, snap(150))
    LakeTable.writeManifest(st3)
    assert(Files.exists(Paths.get(dir, s"manifest-v${st3.version}.json")))
    assert(LakeTable.currentVersion(dir).contains(1L))
    assert(readKeys(dir) == v1Keys, "unflipped manifest must be invisible")

    // CRASH 3: torn pointer tmp write (killed mid-write) — the tmp name
    // is never read by anyone; only a completed ATOMIC_MOVE publishes
    Files.write(Paths.get(dir, "._latest.tmp"),
                "manifest-v9".getBytes("UTF-8"))
    assert(LakeTable.currentVersion(dir).contains(1L))
    assert(readKeys(dir) == v1Keys, "a torn tmp write must be invisible")

    // REPLAY: finishing the interrupted publish flips atomically from
    // entirely-v1 to entirely-v3 — the resume path after crash 2
    LakeTable.flipPointer(st3)
    assert(LakeTable.currentVersion(dir).contains(st3.version))
    assert(readKeys(dir) == snap(150).collect()
      .map(_.getAs[Long]("custkey")).toSet)
  }

  test("a rejected audit publishes nothing") {
    val dir = Files.createTempDirectory("graft_lake_spec_").toString
    assert(LakeTable.commit(spark, dir, snap(50))(gate) == Right(1L))
    val before = readKeys(dir)
    val r = LakeTable.commit(spark, dir, snap(50).filter(lit(false)))(gate)
    assert(r.isLeft, "empty snapshot must fail the gate")
    assert(LakeTable.currentVersion(dir).contains(1L))
    assert(readKeys(dir) == before)
  }

  test("time travel reads any retained version; vacuum reclaims the rest") {
    val dir = Files.createTempDirectory("graft_lake_spec_").toString
    assert(LakeTable.commit(spark, dir, snap(20))(gate) == Right(1L))
    assert(LakeTable.commit(spark, dir, snap(50))(gate) == Right(2L))
    assert(LakeTable.commit(spark, dir, snap(80))(gate) == Right(3L))
    // a crash leftover: staged, never published — invisible but on disk
    LakeTable.stage(spark, dir, snap(10))
    val v1 = LakeTable.readVersion(spark, dir, 1L).collect()
      .map(_.getAs[Long]("custkey")).toSet
    assert(v1 == snap(20).collect().map(_.getAs[Long]("custkey")).toSet,
      "version 1 must read back exactly as committed")
    assert(LakeTable.versions(dir) == Seq(1L, 2L, 3L))
    val dataDirs = Files.list(Paths.get(dir, "data")).count()
    assert(dataDirs == 4, s"3 published + 1 orphaned staging, got $dataDirs")
    val (mDropped, fReclaimed) = LakeTable.vacuum(dir, keepVersions = 2)
    assert(mDropped == 1, "only v1's manifest falls outside keep=2")
    assert(fReclaimed > 0, "v1's files and the orphaned staging must go")
    // retained history still time-travels; the live version is untouched
    assert(LakeTable.versions(dir) == Seq(2L, 3L))
    assert(LakeTable.readVersion(spark, dir, 2L).count() == snap(50).count())
    assert(readKeys(dir) == snap(80).collect()
      .map(_.getAs[Long]("custkey")).toSet)
    assert(Files.list(Paths.get(dir, "data")).count() == 2,
      "only the two retained versions' data dirs survive")
    intercept[IllegalArgumentException] {
      LakeTable.readVersion(spark, dir, 1L)
    }
  }

  test("the audit reads the staged bytes as written, not the logical plan") {
    val dir = Files.createTempDirectory("graft_lake_spec_").toString
    val st = LakeTable.stage(spark, dir, snap(80))
    var auditedRows = -1L
    val r = LakeTable.audit(spark, st) { df =>
      auditedRows = df.count()
      // the audited frame must be a parquet scan of the staged files,
      // not the upstream orders plan
      val scanned = df.queryExecution.executedPlan.toString
      assert(scanned.contains("Scan parquet") || scanned.contains("FileScan"),
        s"audit must read staged files:\n$scanned")
      None
    }
    assert(r.isRight)
    assert(auditedRows == snap(80).count())
  }
}
