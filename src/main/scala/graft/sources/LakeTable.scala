package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths,
                      StandardCopyOption}

import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Minimal write-audit-publish table commit — the transactional-sink
  * capability a lakehouse user hits first (Delta/Iceberg's OPTIMIZE /
  * MERGE / snapshot machinery all sit on top of exactly this primitive),
  * reduced to what is testable offline:
  *
  *  - WRITE: stage the new version's parquet under an isolated
  *    `data/<uuid>/` directory nobody reads (readers only ever follow the
  *    manifest, so staged garbage is invisible by construction);
  *  - AUDIT: run an arbitrary validation against the staged files AS
  *    WRITTEN (read back from disk, not the in-memory plan — the audit
  *    must see what a reader would see, including any write-path
  *    truncation). The audit also enforces the SCHEMA EVOLUTION contract
  *    against the live version: additive columns are allowed (and the
  *    staged schema is recorded in the new manifest); dropping a column
  *    or changing a column's type is rejected before anything publishes;
  *  - PUBLISH: mint the version number AT PUBLISH TIME and claim it by
  *    creating `manifest-v{N}.json` as an ATOMIC CREATE-NEW (a hard link
  *    from a private tmp — `Files.createLink` fails with
  *    FileAlreadyExistsException if the name is taken). Two racing
  *    committers therefore can never mint the same version: the loser's
  *    create fails, it re-manifests the SAME staged files under the next
  *    number (no re-stage — the data directory is version-independent),
  *    and both commits survive as distinct, time-travel-readable
  *    versions. The `_latest` pointer then flips via
  *    write-tmp-then-ATOMIC_MOVE with a monotonic guard (never points
  *    backwards), so whichever flip lands last, readers see the highest
  *    committed version and every committed version stays readable.
  *
  * On a local filesystem the atomic create-new is link(2) and the pointer
  * flip is rename(2); at 100 TB on object storage both become
  * conditional-puts (`If-None-Match: *` for the manifest claim, ETag
  * compare-and-swap for the pointer) — same protocol, different atomic
  * primitive. The in-process flip is additionally serialized on a JVM
  * lock; ACROSS JVMs the monotonic guard window is exactly what the
  * conditional-put closes on a real object store (documented, not
  * simulated). */
object LakeTable {

  /** The staged-but-unpublished state a crash can leave behind: enough to
    * resume (publish) or abandon (readers never saw it). `version` is the
    * version HINT computed at stage time — publish mints the real number
    * under the manifest-create CAS, so it may come out higher when a
    * concurrent commit won the race. `batch` is an optional stream-epoch
    * watermark recorded IN the manifest, so the pointer flip atomically
    * publishes both the data and the fact that epoch N has been applied —
    * the idempotence handle for
    * [[graft.streaming.StreamOps.mergeBatchIntoLake]]. `schema` is the
    * staged files' schema AS WRITTEN (`name TYPE` per column, read back
    * from the parquet footers), recorded in the manifest for the
    * evolution audit and the by-name read reconcile. */
  final case class Staged(dir: String, version: Long, files: Seq[String],
                          batch: Option[Long] = None,
                          schema: Seq[String] = Seq.empty,
                          stats: Seq[String] = Seq.empty)

  private def latestPath(dir: String): Path = Paths.get(dir, "_latest")

  /** List a directory's entries with the stream CLOSED on exit —
    * `Files.list` leaks a directory file descriptor until GC otherwise,
    * which adds up over bench loops that commit/vacuum repeatedly. */
  private def listDir(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Seq.empty
    else Using.resource(Files.list(p))(_.iterator().asScala.toSeq)

  private def walkDir(p: Path): Seq[Path] =
    Using.resource(Files.walk(p))(_.iterator().asScala.toSeq)

  /** Currently-published version, if any — reads only the pointer. */
  def currentVersion(dir: String): Option[Long] = {
    val p = latestPath(dir)
    if (!Files.exists(p)) None
    else {
      val name = new String(Files.readAllBytes(p), UTF_8).trim
      "manifest-v(\\d+)\\.json".r.findFirstMatchIn(name).map(_.group(1).toLong)
    }
  }

  /** Stream-epoch watermark of the currently-published manifest, if the
    * last commit recorded one — reading it costs one manifest read, and
    * because the watermark rides the same atomic pointer flip as the
    * data, "applied batch ≥ N" is exactly "epoch N's merge is visible". */
  def appliedBatch(dir: String): Option[Long] = {
    val p = latestPath(dir)
    if (!Files.exists(p)) None
    else {
      val name = new String(Files.readAllBytes(p), UTF_8).trim
      val json = new String(Files.readAllBytes(Paths.get(dir, name)), UTF_8)
      "\"batch\":(-?\\d+)".r.findFirstMatchIn(json).map(_.group(1).toLong)
    }
  }

  private def manifestFiles(json: String): Seq[String] =
    "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(json).map(_.group(1)).toSeq

  /** Recorded `name TYPE` column list of a manifest, empty if the
    * manifest predates schema recording. */
  private def manifestSchema(json: String): Seq[String] =
    "\"schema\":\\[([^\\]]*)\\]".r.findFirstMatchIn(json).map(_.group(1))
      .map(s => "\"([^\"]+)\"".r.findAllMatchIn(s).map(_.group(1)).toSeq)
      .getOrElse(Seq.empty)

  /** Recorded per-file stats entries (`file|col|min|max`), empty when the
    * version was staged without a stats column. */
  private def manifestStats(json: String): Seq[String] =
    "\"stats\":\\[([^\\]]*)\\]".r.findFirstMatchIn(json).map(_.group(1))
      .map(s => "\"([^\"]+)\"".r.findAllMatchIn(s).map(_.group(1)).toSeq)
      .getOrElse(Seq.empty)

  private def readManifest(dir: String, version: Long): Option[String] = {
    val m = Paths.get(dir, s"manifest-v$version.json")
    if (Files.exists(m)) Some(new String(Files.readAllBytes(m), UTF_8))
    else None
  }

  /** File list of the currently-published manifest. */
  def currentFiles(dir: String): Seq[String] =
    currentVersion(dir).flatMap(readManifest(dir, _))
      .map(manifestFiles).getOrElse(Seq.empty)

  /** Schema (`name TYPE` per column) of the currently-published version. */
  def currentSchema(dir: String): Seq[String] =
    currentVersion(dir).flatMap(readManifest(dir, _))
      .map(manifestSchema).getOrElse(Seq.empty)

  // ---- per-version manifest accessors (the [[LakeSource]] read seam) ----

  private[sources] def schemaOf(dir: String, version: Long): Seq[String] =
    readManifest(dir, version).map(manifestSchema).getOrElse(Seq.empty)

  private[sources] def filesOf(dir: String, version: Long): Seq[String] =
    readManifest(dir, version).map(manifestFiles).getOrElse(Seq.empty)

  /** Per-(file, column) recorded (min, max), parsed once per call. */
  private[sources] def statsOf(dir: String, version: Long)
      : Map[(String, String), (Long, Long)] =
    readManifest(dir, version).map(manifestStats).getOrElse(Seq.empty)
      .flatMap { e =>
        e.split('|') match {
          case Array(f, c, mn, mx) => Some((f, c) -> (mn.toLong, mx.toLong))
          case _ => None
        }
      }.toMap

  private def readFiles(spark: SparkSession, dir: String, json: String,
                        what: String): DataFrame = {
    val files = manifestFiles(json).map(f => Paths.get(dir, f).toString)
    require(files.nonEmpty, s"$what lists no files in $dir")
    val df = spark.read.parquet(files: _*)
    // reconcile BY NAME in the manifest-recorded order: an evolved
    // table's reads are deterministic in column order regardless of the
    // physical file layout the writer happened to produce
    val names = manifestSchema(json).map(_.split(" ", 2)(0))
      .filter(df.columns.contains)
    if (names.isEmpty) df else df.select(names.map(col): _*)
  }

  /** Read the table THROUGH the manifest — the only sanctioned read path.
    * Staged-but-unpublished data is invisible; a concurrent commit flips
    * the pointer atomically, so this sees entirely-old or entirely-new. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(dir)
    require(v.nonEmpty, s"no published version in $dir")
    readFiles(spark, dir, readManifest(dir, v.get).get, s"version ${v.get}")
  }

  /** TIME TRAVEL: read a specific published version. Every commit's
    * manifest is immutable once its atomic create lands, so any
    * version's file list remains exact until [[vacuum]] reclaims it —
    * the Delta `VERSION AS OF` / Iceberg snapshot-read capability,
    * which on this layout is nothing more than following an older
    * manifest instead of `_latest`. An evolved table time-travels with
    * each version's OWN recorded schema. */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val json = readManifest(dir, version)
    require(json.nonEmpty,
      s"version $version not published (or vacuumed) in $dir")
    readFiles(spark, dir, json.get, s"version $version")
  }

  /** Every manifest on disk, ascending — PUBLISHED versions are those
    * ≤ the live pointer; anything above it is a crash orphan (a commit
    * that claimed its manifest but died before the pointer flip) and is
    * excluded from [[versions]] / retained-history accounting. */
  private def manifestVersions(dir: String): Seq[Long] =
    listDir(Paths.get(dir))
      .flatMap(p => "manifest-v(\\d+)\\.json".r
        .findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
      .sorted

  /** Published versions still on disk, ascending. A manifest whose
    * version exceeds the live pointer was never published (crash between
    * manifest claim and pointer flip) and does not appear here. */
  def versions(dir: String): Seq[Long] = {
    val live = currentVersion(dir).getOrElse(Long.MinValue)
    manifestVersions(dir).filter(_ <= live)
  }

  /** VACUUM: reclaim history. Keeps the newest `keepVersions` PUBLISHED
    * manifests (always including the live one) and deletes (a) older
    * manifests, (b) crash-ORPHANED manifests (version above the live
    * pointer: claimed but never published — counting them toward the
    * keep set would retain a never-readable orphan while reclaiming a
    * genuinely published version), (c) every data FILE referenced by no
    * kept manifest — reclaim is per-file, not per-directory, because
    * carry-over commits ([[stage]]'s `carry`) let a new version
    * reference a subset of an old version's directory; a directory with
    * no referenced files left is swept whole (dropped versions' dirs and
    * orphaned stagings alike). Retained versions stay
    * time-travel-readable, and a reader
    * HOLDING a retained version's DataFrame across the vacuum never
    * breaks — reclaim only ever touches versions outside the keep set
    * (LakeSpec pins both). Deletion order is safe under a crash
    * mid-vacuum: manifests are removed BEFORE their files, so no
    * surviving manifest ever references a missing file; a crash between
    * the two passes leaves unreferenced files that the next vacuum
    * sweeps.
    *
    * Concurrency contract (the object-store analogue of Delta's
    * `RETAIN n HOURS`): vacuum is an administrative op — running it
    * while a commit is IN FLIGHT can reclaim the in-flight manifest
    * claim, exactly as a zero-retention Delta vacuum breaks an
    * uncommitted writer. Production deployments gate reclaim on
    * manifest age; this offline reduction gates on version count and
    * documents the age gate rather than simulating a clock. Returns
    * (#manifests, #data files) deleted. */
  def vacuum(dir: String, keepVersions: Int): (Int, Int) = {
    val published = versions(dir)
    val live = currentVersion(dir)
    val keep =
      (published.takeRight(math.max(keepVersions, 1)) ++ live).toSet
    val orphans = manifestVersions(dir).filterNot(v =>
      keep.contains(v) || published.contains(v))
    val drop = published.filterNot(keep.contains) ++ orphans
    val keptFiles = keep.toSeq
      .flatMap(v => readManifest(dir, v).map(manifestFiles).getOrElse(Nil))
      .toSet
    drop.foreach(v =>
      Files.deleteIfExists(Paths.get(dir, s"manifest-v$v.json")))
    var reclaimed = 0
    val root = Paths.get(dir)
    listDir(Paths.get(dir, "data")).foreach { sub =>
      if (Files.isDirectory(sub)) {
        val entries = walkDir(sub)
        val keptHere = entries.exists(p =>
          Files.isRegularFile(p) && keptFiles.contains(
            root.relativize(p).toString))
        if (!keptHere) {
          // nothing referenced: sweep the whole staging subtree
          entries.reverse.foreach { p =>
            if (p.toString.endsWith(".parquet")) reclaimed += 1
            Files.deleteIfExists(p)
          }
        } else {
          // carry-over survivor: reclaim only the UNREFERENCED parquet
          // files (and their sidecars), keep the rest of the subtree
          entries.foreach { p =>
            val name = p.getFileName.toString
            if (Files.isRegularFile(p) && name.endsWith(".parquet")
                && !name.startsWith(".")
                && !keptFiles.contains(root.relativize(p).toString)) {
              reclaimed += 1
              Files.deleteIfExists(p)
              Files.deleteIfExists(p.resolveSibling(s".$name.crc"))
            }
            ()
          }
        }
      }
      ()
    }
    (drop.size, reclaimed)
  }

  /** Layout value a staged file path carries, if the file was written
    * under a `_layout=<value>` directory — the manifest-level partition
    * metadata that lets a MERGE prune its rewrite set to the touched
    * values and carry every other file forward verbatim. */
  private[graft] def layoutValueOf(file: String): Option[String] =
    "/_layout=([^/]+)/".r.findFirstMatchIn(file).map(_.group(1))

  /** Stage a new version's data files. Returns the staged state —
    * including the schema read back AS WRITTEN — and nothing is visible
    * to readers until [[publish]]. The carried version hint is only a
    * hint; publish mints the real one.
    *
    * `layoutBy` writes the staging Hive-partitioned by the named
    * column's VALUE (encoded in each file's path as `_layout=<value>`)
    * while keeping the column itself in the data (a shadow column does
    * the partitioning) — file-level layout metadata in the manifest,
    * the prune key for partial rewrites. `carry` lists already-published
    * files to carry over verbatim into this version's manifest: the
    * 100 TB MERGE primitive — only touched layout values restage, the
    * rest of the table travels as manifest entries, zero data movement. */
  def stage(spark: SparkSession, dir: String, df: DataFrame,
            layoutBy: Option[String] = None,
            carry: Seq[String] = Seq.empty,
            statsBy: Option[String] = None): Staged = {
    val version = currentVersion(dir).getOrElse(0L) + 1L
    val uuid = java.util.UUID.randomUUID().toString
    val staging = Paths.get(dir, "data", uuid)
    layoutBy match {
      case Some(c) =>
        df.withColumn("_layout", col(c))
          .write.partitionBy("_layout").parquet(staging.toString)
      case None => df.write.parquet(staging.toString)
    }
    val fresh = walkDir(staging)
      .filter(p => Files.isRegularFile(p))
      .map(p => staging.relativize(p).toString)
      .filter(f => f.endsWith(".parquet")
        && !Paths.get(f).getFileName.toString.startsWith("."))
      .sorted
      .map(f => s"data/$uuid/$f")
    val files = carry ++ fresh
    val schema =
      if (files.isEmpty) Seq.empty
      else spark.read.parquet(files.map(f => Paths.get(dir, f).toString): _*)
        .schema.fields.toSeq.map(f => s"${f.name} ${f.dataType.sql}")
    // per-file min/max of the stats column (one grouped pass over the
    // fresh files, keyed on input_file_name); carried files keep the
    // stats their origin version recorded
    val stats = statsBy match {
      case None => carriedStats(dir, carry)
      case Some(c) =>
        val byFile = spark.read
          .parquet(fresh.map(f => Paths.get(dir, f).toString): _*)
          .groupBy(org.apache.spark.sql.functions.input_file_name().as("_f"))
          .agg(org.apache.spark.sql.functions.min(col(c).cast("long")).as("_mn"),
               org.apache.spark.sql.functions.max(col(c).cast("long")).as("_mx"))
          .collect()
          .map { r =>
            val name = Paths.get(new java.net.URI(r.getString(0)).getPath)
            val rel = Paths.get(dir).toAbsolutePath.normalize
              .relativize(name.toAbsolutePath.normalize).toString
            s"$rel|$c|${r.getLong(1)}|${r.getLong(2)}"
          }.toSeq.sorted
        carriedStats(dir, carry) ++ byFile
    }
    Staged(dir, version, files, None, schema, stats)
  }

  /** The live manifest's stats entries for files being carried over. */
  private def carriedStats(dir: String, carry: Seq[String]): Seq[String] =
    if (carry.isEmpty) Seq.empty
    else {
      val carrySet = carry.toSet
      currentVersion(dir).flatMap(readManifest(dir, _))
        .map(manifestStats).getOrElse(Seq.empty)
        .filter(e => carrySet.contains(e.split('|').head))
    }

  /** Files of the live version whose recorded [lo, hi] stats range for
    * `colName` intersects the query range — plus every file with no
    * recorded stats (pruning must be a superset of the answer). This is
    * the manifest-level data skipping a 100 TB scan lives by: the
    * decision runs on manifest metadata only, no file is opened. */
  def filesWhere(dir: String, colName: String, lo: Long, hi: Long): Seq[String] = {
    val stats = currentVersion(dir).flatMap(readManifest(dir, _))
      .map(manifestStats).getOrElse(Seq.empty)
      .flatMap { e =>
        e.split('|') match {
          case Array(f, c, mn, mx) if c == colName =>
            Some(f -> (mn.toLong, mx.toLong))
          case _ => None
        }
      }.toMap
    currentFiles(dir).filter(f => stats.get(f) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true
    })
  }

  /** Read only the files [[filesWhere]] keeps. The caller still applies
    * its own row-level predicate — stats pruning is file-granular, a
    * kept file may hold rows outside the range. */
  def readWhere(spark: SparkSession, dir: String, colName: String,
                lo: Long, hi: Long): DataFrame = {
    val files = filesWhere(dir, colName, lo, hi)
    require(files.nonEmpty,
      s"no live file can hold $colName in [$lo, $hi] in $dir")
    val df = spark.read.parquet(files.map(f => Paths.get(dir, f).toString): _*)
    val names = currentSchema(dir).map(_.split(" ", 2)(0))
      .filter(df.columns.contains)
    if (names.isEmpty) df else df.select(names.map(col): _*)
  }

  /** The evolution contract, checked against the LIVE version: every
    * live column must survive with an identical type (no drops, no type
    * changes); NEW columns are additive evolution, allowed and recorded.
    * Returns the violation, if any. */
  private[graft] def evolutionError(staged: Staged): Option[String] = {
    val live = currentSchema(staged.dir)
    if (live.isEmpty) None
    else {
      val stagedByName = staged.schema
        .map(_.split(" ", 2)).map(a => a(0) -> a(1)).toMap
      live.iterator.map(_.split(" ", 2)).flatMap { a =>
        stagedByName.get(a(0)) match {
          case None => Some(s"drops column '${a(0)}'")
          case Some(t) if t != a(1) =>
            Some(s"changes column '${a(0)}' from ${a(1)} to $t")
          case _ => None
        }
      }.take(1).toSeq.headOption
        .map(v => s"schema evolution rejected: staged version $v " +
                  "(only additive columns may evolve)")
    }
  }

  /** Audit the staged files AS WRITTEN: the schema-evolution contract
    * first, then the caller's check. Left(reason) blocks publish. */
  def audit(spark: SparkSession, staged: Staged)(
      check: DataFrame => Option[String]): Either[String, Staged] = {
    evolutionError(staged) match {
      case Some(reason) => Left(s"audit failed for v${staged.version}: $reason")
      case None =>
        val df = spark.read.parquet(
          staged.files.map(f => Paths.get(staged.dir, f).toString): _*)
        check(df) match {
          case Some(reason) =>
            Left(s"audit failed for v${staged.version}: $reason")
          case None => Right(staged)
        }
    }
  }

  /** Publish a staged version: claim a version number via the manifest
    * CAS, then flip the `_latest` pointer (monotonic). Returns the
    * ACTUAL version minted — under a race it may exceed the stage-time
    * hint; the staged data directory is version-independent, so the
    * loser re-manifests, never re-stages. */
  def publish(staged: Staged): Long = {
    val v = writeManifest(staged)
    flipPointer(staged.dir, v)
    v
  }

  /** Step 1 of publish — the compare-and-swap. Exposed separately so
    * LakeSpec can crash the protocol between manifest claim and pointer
    * flip. Mints the first free version ≥ max(hint, every manifest on
    * disk + 1) and claims it by ATOMIC CREATE-NEW (hard link from a
    * private tmp; link(2) fails if the target exists). Returns the
    * version actually claimed. */
  private[graft] def writeManifest(staged: Staged): Long = {
    val batchField = staged.batch.map(b => s""""batch":$b,""").getOrElse("")
    val schemaField = staged.schema.map("\"" + _ + "\"")
      .mkString("\"schema\":[", ",", "],")
    // per-file stats entries (`file|col|min|max`); the files regex below
    // requires a closing quote right after `.parquet`, so these entries
    // can never be mistaken for file-list members
    val statsField =
      if (staged.stats.isEmpty) ""
      else staged.stats.map("\"" + _ + "\"")
        .mkString("\"stats\":[", ",", "],")
    val json = staged.files.map("\"" + _ + "\"")
      .mkString(s"""$batchField$schemaField$statsField"files":[""", ",", "]}")
    val tmp = Paths.get(staged.dir,
      s".manifest-${java.util.UUID.randomUUID()}.tmp")
    var v = math.max(staged.version,
      manifestVersions(staged.dir).lastOption.getOrElse(0L) + 1L)
    var claimed = -1L
    while (claimed < 0) {
      Files.write(tmp, s"""{"version":$v,$json""".getBytes(UTF_8))
      try {
        Files.createLink(Paths.get(staged.dir, s"manifest-v$v.json"), tmp)
        claimed = v
      } catch {
        case _: FileAlreadyExistsException => v += 1 // lost the race; retry
      }
    }
    Files.deleteIfExists(tmp)
    claimed
  }

  private val flipLock = new Object

  /** Step 2 of publish — the visibility flip, MONOTONIC: the pointer
    * never moves backwards, so when two racing commits both claim
    * versions, whichever flip runs last still leaves readers on the
    * HIGHER version and the other remains published history (its
    * manifest is ≤ the pointer, so [[versions]]/time-travel see it).
    * In-process flips are serialized on a JVM lock; across JVMs the
    * read-then-move window is what an object store's conditional-put
    * closes (see the class doc). */
  private[graft] def flipPointer(dir: String, version: Long): Unit =
    flipLock.synchronized {
      if (!currentVersion(dir).exists(_ >= version)) {
        val tmp = Paths.get(dir, "._latest.tmp")
        Files.write(tmp, s"manifest-v$version.json".getBytes(UTF_8))
        Files.move(tmp, latestPath(dir), StandardCopyOption.ATOMIC_MOVE,
                   StandardCopyOption.REPLACE_EXISTING)
      }
      ()
    }

  /** The full write-audit-publish commit. Returns Left without touching
    * any reader-visible state if the audit (evolution contract included)
    * rejects. `layoutBy` lays the version out Hive-partitioned by the
    * named column (see [[stage]]) so later [[mergePartial]] calls can
    * prune their rewrite set. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
             layoutBy: Option[String] = None,
             statsBy: Option[String] = None)(
      check: DataFrame => Option[String]): Either[String, Long] = {
    Files.createDirectories(Paths.get(dir))
    audit(spark, stage(spark, dir, df, layoutBy, Seq.empty, statsBy))(check)
      .map(publish)
  }

  /** Partial-rewrite MERGE — the 100 TB upsert: `upserts` (one row per
    * key, each carrying the table's layout column) replace same-key rows,
    * and only the files whose `_layout=<value>` path metadata intersects
    * the batch's touched values are read and rewritten — every other
    * live file CARRIES OVER into the new manifest verbatim, zero data
    * movement (exactly how Delta/Iceberg MERGE prunes its rewrite set by
    * file stats). Files without layout metadata (e.g. a flat initial
    * version) rewrite conservatively. The touched-value set is collected
    * to the driver — bounded by the layout cardinality, the same
    * metadata-scale work any table format's planner does. The commit
    * rides the full stage → audit → publish protocol; the audit sees
    * carried + staged files together, so cross-file invariants (key
    * uniqueness) still gate the publish. */
  def mergePartial(spark: SparkSession, dir: String, upserts: DataFrame,
                   keys: Seq[String], layoutCol: String,
                   batch: Option[Long] = None,
                   statsBy: Option[String] = None)(
      check: DataFrame => Option[String]): Either[String, Long] = {
    Files.createDirectories(Paths.get(dir))
    val touched = upserts.select(layoutCol).distinct().collect()
      .map(r => String.valueOf(r.get(0))).toSet
    val live = currentFiles(dir)
    val (rewrite, carried) = live.partition(f =>
      layoutValueOf(f).forall(touched.contains))
    val base =
      if (rewrite.isEmpty) upserts.limit(0)
      else spark.read.parquet(rewrite.map(f => Paths.get(dir, f).toString): _*)
        .join(upserts.select(keys.map(col): _*), keys, "left_anti")
    val merged = base.unionByName(upserts)
    audit(spark,
          stage(spark, dir, merged, Some(layoutCol), carried, statsBy)
            .copy(batch = batch))(check)
      .map(publish)
  }

  /** Partial-rewrite CDC APPLY — [[mergePartial]]'s third action:
    * `changes` carries one row per key (the per-batch winner) with an
    * `op` column, 'D' rows TOMBSTONE their key (dropped from the
    * rewritten files, never reinserted), everything else upserts. The
    * rewrite set is still pruned to the layout values the batch
    * touches; a delete whose key lives in an untouched file cannot
    * happen, because the key's layout value IS in the touched set by
    * construction (the change row carries it). Refuses to publish a
    * version with zero files (a full-table delete needs
    * schema-in-table-metadata, which this layout keeps in the manifest
    * only for non-empty versions). */
  def applyCdcPartial(spark: SparkSession, dir: String, changes: DataFrame,
                      keys: Seq[String], layoutCol: String,
                      batch: Option[Long] = None)(
      check: DataFrame => Option[String]): Either[String, Long] = {
    Files.createDirectories(Paths.get(dir))
    val touched = changes.select(layoutCol).distinct().collect()
      .map(r => String.valueOf(r.get(0))).toSet
    val live = currentFiles(dir)
    val (rewrite, carried) = live.partition(f =>
      layoutValueOf(f).forall(touched.contains))
    val upserts = changes.filter(col("op") =!= "D").drop("op")
    val base =
      if (rewrite.isEmpty) upserts.limit(0)
      else spark.read.parquet(rewrite.map(f => Paths.get(dir, f).toString): _*)
        .join(changes.select(keys.map(col): _*), keys, "left_anti")
    val merged = base.unionByName(upserts)
    val staged = stage(spark, dir, merged, Some(layoutCol), carried)
      .copy(batch = batch)
    if (staged.files.isEmpty)
      Left("empty table after CDC apply (full-table delete needs " +
           "schema-in-manifest support)")
    else audit(spark, staged)(check).map(publish)
  }

  /** OPTIMIZE — the compaction ACTION the q_layout_compaction planner
    * feeds: rewrite the live version's rows into `ceil(rows/targetRows)`
    * range-clustered files (one per planned bin — `repartitionByRange`
    * on the cluster columns keeps each rewritten file's min/max footer
    * range narrow, exactly the property the planner bins for) and commit
    * the rewrite through the SAME write-audit-publish protocol as any
    * other version. The audit proves conservation (row count unchanged)
    * before anything publishes; the pre-compaction version remains
    * time-travel-readable until [[vacuum]] reclaims it, and a crash
    * mid-optimize leaves the old version live (LakeSpec). At 100 TB this
    * runs per partition and only rewrites bins whose file count exceeds
    * the target — the manifest carries unchanged files forward verbatim;
    * the offline reduction rewrites the whole (small) table. */
  def optimize(spark: SparkSession, dir: String, targetRows: Long,
               clusterBy: Seq[String],
               layoutBy: Option[String] = None,
               statsBy: Option[String] = None): Either[String, Long] = {
    val base = read(spark, dir)
    val n = base.count()
    val bins = math.max(1L, (n + targetRows - 1L) / targetRows).toInt
    val laid = layoutBy match {
      // layout-preserving compaction: one shuffle keyed on the layout
      // column makes partitionBy write ONE file per layout value, so
      // later partial merges keep their prune metadata
      case Some(c) => base.repartition(col(c))
      case None if clusterBy.isEmpty => base.coalesce(bins)
      case None => base.repartitionByRange(bins, clusterBy.map(col): _*)
    }
    // the compacted version must CARRY the applied stream-epoch
    // watermark: compaction between an epoch's publish and its WAL
    // commit would otherwise erase the idempotence handle and the
    // replayed epoch would double-apply (StreamingDurabilitySpec)
    val wm = appliedBatch(dir)
    audit(spark, stage(spark, dir, laid, layoutBy, Seq.empty, statsBy)
                   .copy(batch = wm)) { df =>
      val m = df.count()
      if (m == n) None
      else Some(s"compaction must conserve rows: $n before, $m after")
    }.map(publish)
  }
}
