package graft

/** Scratch profiling harness (not part of the suite — run explicitly via
  * testOnly). Times consecutive executions of one query in a warm JVM to
  * split plan/JIT cost from steady-state execution. */
class ProfileQ5 extends SparkTestBase {
  // switch `ignore` to `test` to profile; excluded from the suite so CI
  // runs don't pay 6 timed sf0.1 executions
  ignore("profile q_tpch_q5 warm vs cold") {
    val d = "/root/testdata/sf0.1"
    for (q <- Seq("q_tpch_q5", "q_sim_topk")) {
      for (i <- 1 to 3) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, d).count()
        println(f"PROFILE $q run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
  }
}
