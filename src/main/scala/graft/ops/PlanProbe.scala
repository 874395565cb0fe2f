package graft.ops

import org.apache.spark.sql.DataFrame

/** Pre-checkpoint plan probe for iterative operators.
  *
  * The per-round `localCheckpoint(false)` discipline truncates lineage:
  * each round's operator plan is compiled at CONSTRUCTION time and never
  * passes through a QueryExecutionListener (no action wraps a lazy
  * checkpoint), so a nested-loop join inside a label/frontier loop is
  * invisible to any after-the-fact plan inspection (r6 ADVICE). The
  * iterative loops therefore call [[note]] on each round's DataFrame
  * right before checkpointing it — the only moment the round's plan
  * exists as SQL. A no-op (one volatile read) unless a harness installed
  * a collector via [[PlanAudit.withPlanOffenses]]; only scale-offense
  * lines are retained, so memory stays bounded.
  *
  * Harness-scoped global state: collectors are installed around a single
  * measured region by the growth harnesses/specs, which run regions
  * sequentially — not a concurrency-safe general tracing facility. */
object PlanProbe {
  @volatile private var sink: String => Unit = null

  /** Record the scale-offense lines (BroadcastNestedLoopJoin /
    * CartesianProduct) of `df`'s physical plan under `tag` — no-op
    * unless a collector is installed. */
  def note(tag: String, df: DataFrame): Unit = {
    val s = sink
    if (s != null)
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("BroadcastNestedLoopJoin")
                  || l.contains("CartesianProduct"))
        .foreach(l => s(s"[round:$tag] ${l.trim}"))
  }

  private[graft] def install(f: String => Unit): Unit = { sink = f }
  private[graft] def uninstall(): Unit = { sink = null }
}
