package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Dev-only phase timer for driver-side cost attribution (guide §1:
  * decide where the time goes before changing anything). Zero overhead
  * unless `-Dgraft.prof=true`: one volatile read per call site when
  * disabled. Accumulates (label → total ns, calls) across threads;
  * ProfileQ dumps and resets per query. Never enabled by Bench/Verify —
  * measurement harnesses stay untouched. */
object Prof {
  val enabled: Boolean = sys.props.get("graft.prof").contains("true") ||
    sys.env.get("SPARK_GRAFT_PROF").contains("true")
  private val totals = new ConcurrentHashMap[String, (LongAdder, LongAdder)]()

  @inline def apply[A](label: String)(f: => A): A =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally {
        val cell = totals.computeIfAbsent(label,
          _ => (new LongAdder, new LongAdder))
        cell._1.add(System.nanoTime() - t0)
        cell._2.increment()
      }
    }

  def dumpAndReset(): Seq[(String, Double, Long)] = {
    import scala.jdk.CollectionConverters._
    val out = totals.asScala.map { case (k, (ns, n)) =>
      (k, ns.sum() / 1e9, n.sum())
    }.toSeq.sortBy(-_._2)
    totals.clear()
    out
  }
}
