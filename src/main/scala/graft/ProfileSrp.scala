package graft

import org.apache.spark.sql.SparkSession

/** Bisect harness for the r12 q_sim_cosine_dup_srp calm regression
  * (1.21 → ~1.9 s): the op's code did not change between rounds — the
  * suspects are the r12 session-level injections (the LakeUpdateRule
  * post-hoc resolution rule + the GraftSqlParser), which ride EVERY
  * query's analysis. This main times the same op under two sessions —
  * with and without GraftExtensions — 4 runs each (first = warm-up),
  * printing per-run seconds.
  *
  * MEASURED (r13, calm gauges 0.205–0.28 s throughout):
  *   - with-extensions    min 1.84 s; without-extensions min 1.76 s —
  *     the r12 session injections cost ~nothing; acquitted.
  *   - the r11 TREE (655ed37), rebuilt and run on today's host, reads
  *     2.52 / 2.67 / 2.58 s for this query — the CURRENT tree reads
  *     1.86–2.05 s on the same runs, i.e. current code is ~25% FASTER
  *     than r11 code measured back-to-back. The r11-recorded 1.21 s
  *     belongs to the pre-shift host era (same conclusion as the r12
  *     whole-suite bisect in BASELINE.md) — there is no code
  *     regression to fix. */
object ProfileSrp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def session(ext: Boolean): SparkSession = {
      val b = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      (if (ext) b.withExtensions(new GraftExtensions) else b).getOrCreate()
    }
    def measure(spark: SparkSession, label: String): Unit = {
      graft.GraftFunctions.register(spark)
      val times = (1 to 4).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.ops.LlmOps.srpCosinePairs(
          graft.ops.Tables.embeddings(spark, sfDir), 0.45).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile-srp] $label: " +
        times.map(t => f"$t%.3f").mkString(" "))
    }
    val s1 = session(ext = true)
    s1.sparkContext.setLogLevel("WARN")
    measure(s1, "with-extensions")
    s1.stop()
    val s2 = session(ext = false)
    s2.sparkContext.setLogLevel("WARN")
    measure(s2, "without-extensions")
    s2.stop()
  }
}
