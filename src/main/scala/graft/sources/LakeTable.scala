package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *    truncation);
  *  - PUBLISH: write `manifest-v{N}.json` (the staged file list) via
  *    write-tmp-then-ATOMIC_MOVE, then flip the single `_latest` pointer
  *    the same way. The pointer flip is the ONE atomic step; a crash
  *    anywhere before it leaves the previous manifest live and readers
  *    never observe a partial commit (LakeSpec kills the commit between
  *    every pair of stages and proves it).
  *
  * On a local filesystem ATOMIC_MOVE is a rename(2); at 100 TB on object
  * storage the pointer flip becomes a conditional-put / metastore swap —
  * same protocol, different atomic primitive (documented, not simulated:
  * the staging/audit/manifest layout is identical). Version numbers are
  * monotonically increasing; concurrent committers would race on the
  * pointer flip, which is where a real table format adds the
  * compare-and-swap this offline reduction leaves to the filesystem. */
object LakeTable {

  /** The staged-but-unpublished state a crash can leave behind: enough to
    * resume (publish) or abandon (readers never saw it). `batch` is an
    * optional stream-epoch watermark recorded IN the manifest, so the
    * pointer flip atomically publishes both the data and the fact that
    * epoch N has been applied — the idempotence handle for
    * [[graft.streaming.StreamOps.mergeBatchIntoLake]]. */
  final case class Staged(dir: String, version: Long, files: Seq[String],
                          batch: Option[Long] = None)

  private def latestPath(dir: String): Path = Paths.get(dir, "_latest")

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

  /** File list of the currently-published manifest. */
  def currentFiles(dir: String): Seq[String] = {
    val p = latestPath(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      val name = new String(Files.readAllBytes(p), UTF_8).trim
      val manifest = Paths.get(dir, name)
      val json = new String(Files.readAllBytes(manifest), UTF_8)
      // manifest format: {"version":N,"files":["rel/path", ...]}
      "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(json).map(_.group(1)).toSeq
    }
  }

  /** Read the table THROUGH the manifest — the only sanctioned read path.
    * Staged-but-unpublished data is invisible; a concurrent commit flips
    * the pointer atomically, so this sees entirely-old or entirely-new. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = currentFiles(dir).map(f => Paths.get(dir, f).toString)
    require(files.nonEmpty, s"no published version in $dir")
    spark.read.parquet(files: _*)
  }

  /** TIME TRAVEL: read a specific published version. Every commit's
    * manifest is immutable once its atomic rename lands, so any
    * version's file list remains exact until [[vacuum]] reclaims it —
    * the Delta `VERSION AS OF` / Iceberg snapshot-read capability,
    * which on this layout is nothing more than following an older
    * manifest instead of `_latest`. */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val manifest = Paths.get(dir, s"manifest-v$version.json")
    require(Files.exists(manifest),
      s"version $version not published (or vacuumed) in $dir")
    val json = new String(Files.readAllBytes(manifest), UTF_8)
    val files = "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(json)
      .map(m => Paths.get(dir, m.group(1)).toString).toSeq
    require(files.nonEmpty, s"version $version lists no files in $dir")
    spark.read.parquet(files: _*)
  }

  /** Published versions still on disk, ascending. */
  def versions(dir: String): Seq[Long] =
    if (!Files.isDirectory(Paths.get(dir))) Seq.empty
    else Files.list(Paths.get(dir)).iterator().asScala
      .flatMap(p => "manifest-v(\\d+)\\.json".r
        .findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
      .toSeq.sorted

  /** VACUUM: reclaim history. Keeps the newest `keepVersions` manifests
    * (always including the live one) and deletes (a) older manifests,
    * (b) every data file referenced ONLY by deleted manifests, and
    * (c) staged-but-never-published directories (crash leftovers —
    * invisible to readers by construction, pure disk waste). Retained
    * versions stay time-travel-readable. Deletion order is safe under
    * a crash mid-vacuum: manifests are removed BEFORE their files, so
    * no surviving manifest ever references a missing file; a crash
    * between the two passes leaves unreferenced files that the next
    * vacuum sweeps. Returns (#manifests, #data files) deleted. */
  def vacuum(dir: String, keepVersions: Int): (Int, Int) = {
    val all = versions(dir)
    val live = currentVersion(dir)
    val keep = (all.takeRight(math.max(keepVersions, 1)) ++ live).toSet
    val (drop, kept) = all.partition(v => !keep.contains(v))
    def filesOf(v: Long): Set[String] = {
      val json = new String(
        Files.readAllBytes(Paths.get(dir, s"manifest-v$v.json")), UTF_8)
      "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(json).map(_.group(1)).toSet
    }
    // each stage() writes an isolated data/<uuid>/ dir, so reclaim is a
    // directory sweep: any dir not referenced by a KEPT manifest is dead
    // — dropped versions' dirs and crash-orphaned stagings alike. (A
    // layout that carries files across versions would reclaim per-file
    // against the kept set instead; same pass, finer key.)
    val keptDirs = kept.flatMap(filesOf)
      .map(f => Paths.get(f).getName(1).toString).toSet
    drop.foreach(v => Files.deleteIfExists(Paths.get(dir, s"manifest-v$v.json")))
    var reclaimed = 0
    val dataRoot = Paths.get(dir, "data")
    if (Files.isDirectory(dataRoot))
      Files.list(dataRoot).iterator().asScala.toSeq.foreach { sub =>
        if (Files.isDirectory(sub)
            && !keptDirs.contains(sub.getFileName.toString)) {
          Files.walk(sub).iterator().asScala.toSeq.reverse.foreach { p =>
            if (p.toString.endsWith(".parquet")) reclaimed += 1
            Files.deleteIfExists(p)
          }
        }
        ()
      }
    (drop.size, reclaimed)
  }

  /** Stage a new version's data files. Returns the staged state; nothing
    * is visible to readers until [[publish]]. */
  def stage(spark: SparkSession, dir: String, df: DataFrame): Staged = {
    val version = currentVersion(dir).getOrElse(0L) + 1L
    val uuid = java.util.UUID.randomUUID().toString
    val staging = Paths.get(dir, "data", uuid)
    df.write.parquet(staging.toString)
    val files = Files.list(staging).iterator().asScala
      .map(_.getFileName.toString)
      .filter(f => f.endsWith(".parquet") && !f.startsWith("."))
      .toSeq.sorted
      .map(f => s"data/$uuid/$f")
    Staged(dir, version, files)
  }

  /** Audit the staged files AS WRITTEN. Left(reason) blocks publish. */
  def audit(spark: SparkSession, staged: Staged)(
      check: DataFrame => Option[String]): Either[String, Staged] = {
    val df = spark.read.parquet(
      staged.files.map(f => Paths.get(staged.dir, f).toString): _*)
    check(df) match {
      case Some(reason) => Left(s"audit failed for v${staged.version}: $reason")
      case None => Right(staged)
    }
  }

  /** Publish a staged version: manifest via tmp+atomic-rename, then the
    * `_latest` pointer via tmp+atomic-rename. Only the final move makes
    * the version visible. */
  def publish(staged: Staged): Long = {
    writeManifest(staged)
    flipPointer(staged)
    staged.version
  }

  /** Step 1 of publish — exposed separately so LakeSpec can crash the
    * protocol between manifest write and pointer flip. */
  private[graft] def writeManifest(staged: Staged): Unit = {
    val batchField = staged.batch.map(b => s""""batch":$b,""").getOrElse("")
    val json = staged.files.map("\"" + _ + "\"")
      .mkString(s"""{"version":${staged.version},$batchField"files":[""",
                ",", "]}")
    val manifest = Paths.get(staged.dir, s"manifest-v${staged.version}.json")
    val tmp = Paths.get(staged.dir, s".manifest-v${staged.version}.json.tmp")
    Files.write(tmp, json.getBytes(UTF_8))
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
               StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Step 2 of publish — the single atomic visibility flip. */
  private[graft] def flipPointer(staged: Staged): Unit = {
    val tmp = Paths.get(staged.dir, "._latest.tmp")
    Files.write(tmp, s"manifest-v${staged.version}.json".getBytes(UTF_8))
    Files.move(tmp, latestPath(staged.dir), StandardCopyOption.ATOMIC_MOVE,
               StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** The full write-audit-publish commit. Returns Left without touching
    * any reader-visible state if the audit rejects. */
  def commit(spark: SparkSession, dir: String, df: DataFrame)(
      check: DataFrame => Option[String]): Either[String, Long] = {
    Files.createDirectories(Paths.get(dir))
    audit(spark, stage(spark, dir, df))(check).map(publish)
  }
}
