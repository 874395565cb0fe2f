package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders

/** §2.4 — aggregations. Spark plans partial (map-side) + final
  * (post-shuffle) HashAggregateExec automatically, so at 100 TB the shuffle
  * carries only per-group partial states, never raw rows.
  */
object Aggregates {
  import Tables._

  val ops: Seq[OpDef] = Seq(
    // ----- q_agg_basic: TPC-H Q1-style pricing summary (the flagship) -----
    OpDef(
      "q_agg_basic",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc_nulls_last,
                 col("l_linestatus").asc_nulls_last)
    }
  )
}
