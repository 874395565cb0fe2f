package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions injection: a session built with `.withExtensions(new
  * GraftExtensions)` (≡ spark.sql.extensions=graft.GraftExtensions) can
  * call graft_dot from SQL, and the native expression agrees with the
  * higher-order-function formulation it replaced. */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_dot is injected and matches the HOF formulation") {
    // getOrCreate only applies extensions when it actually creates a
    // session, so detach any active one first; the SparkContext is shared
    // and must NOT be stopped (sibling suites use it)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val viaNative = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .collect().head.getDouble(0)
    assert(viaNative == 32.0)
    // agreement with the HOF chain it replaced
    val rows = spark.sql(
      """SELECT graft_dot(a, b) AS nat,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS hof
        |FROM (SELECT array(0.5D, -1.25D, 3.0D, 2.0D) AS a,
        |             array(1.5D, 2.0D, -0.5D, 0.25D) AS b)""".stripMargin)
      .collect().head
    assert(rows.getDouble(0) == rows.getDouble(1), "native vs HOF drift")
    // null safety
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .collect().head
    assert(n.isNullAt(0))
  }
}
