package graft.ops

import org.apache.spark.sql.functions._

/** Multi-join analytic queries in the shapes a reference user actually
  * runs (TPC-H Q3/Q5/Q10 adapted to the fixture schema) plus the salted
  * two-stage aggregation skew pattern.
  *
  * Join trees are written dims-last with `broadcast()` hints on dimension
  * tables; the fact-side shuffles are on join keys only. Rankings that
  * involve floating revenue order by the *rounded* value (then a unique
  * key) so cross-engine float noise cannot flip the order.
  */
object Analytics {
  import Tables._

  private val revSql = "floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0"
  private def revCol = Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))

  val ops: Seq[OpDef] = Seq(

    // TPC-H Q3 shape: shipping-priority revenue top-10
    OpDef(
      "q_tpch_q3",
      s"""SELECT l_orderkey, $revSql AS revenue, o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin
    ) { (s, d) =>
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
              col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revCol.as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // TPC-H Q5 shape: revenue by nation where supplier and customer share
    // the nation, one region, one year
    OpDef(
      "q_tpch_q5",
      s"""SELECT n_name, $revSql AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN supplier ON s_nationkey = n_nationkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
    ) { (s, d) =>
      val nat = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
      lineitem(s, d)
        .join(orders(s, d)
                .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                        col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
              col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d)),
              col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(revCol.as("revenue"))
        .orderBy("n_name")
    },

    // TPC-H Q10 shape: returned-item revenue per customer, top 20
    OpDef(
      "q_tpch_q10",
      s"""SELECT c_custkey, c_name, $revSql AS revenue, n_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(orders(s, d)
                .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
                        col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
              col("o_custkey") === col("c_custkey"))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revCol.as("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // salted two-stage aggregation: the skew pattern (partial per
    // (key, salt) → final per key). Result ≡ direct GROUP BY; at 100 TB a
    // hot key's rows spread over 8 reducers in stage 1 instead of one.
    OpDef(
      "q_agg_salted",
      """SELECT user_id,
        |  floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total,
        |  count(*) AS n
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(8)))
        .groupBy("user_id", "salt")
        .agg(sum(col("value")).as("psum"), count(lit(1)).as("pn"))
        .groupBy("user_id")
        .agg(Det.r4(sum(col("psum"))).as("total"), sum(col("pn")).as("n"))
        .orderBy("user_id")
    },

    // salted skew JOIN: when one join key carries a disproportionate row
    // share, salt the fact side (key, hash%8) and replicate the dim side
    // ×8 so the hot key's rows spread over 8 reducers — the manual
    // companion to AQE's skew-join split (ScaleSpec covers that one), and
    // the pattern that still matters when the skew is known up front.
    // Result is identical to the plain join, which is what the oracle runs.
    OpDef(
      "q_join_salted",
      s"""SELECT c_mktsegment, count(*) AS n,
        |  ${Det.sql("sum(value)", 4)} AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    ) { (s, d) =>
      val nSalt = 8
      val fact = events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(nSalt)).cast("int"))
      val dim = customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
                explode(sequence(lit(0), lit(nSalt - 1))).as("salt"))
      fact.join(dim, col("user_id") === col("c_custkey") &&
                     fact("salt") === dim("salt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), Det.r4(sum(col("value"))).as("total"))
        .orderBy("c_mktsegment")
    },

    // TPC-H Q1 shape: the pricing-summary full-scan aggregate — partial
    // aggregation collapses 600 k rows to 6 groups map-side; the shuffle
    // moves 6 rows per partition
    OpDef(
      "q_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        |  floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS sum_base,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 AS sum_disc,
        |  floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 10000.0 + 0.5) / 10000.0 AS sum_charge,
        |  floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        |  floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        |  floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Det.r4(sum(col("l_quantity"))).as("sum_qty"),
          Det.r4(sum(col("l_extendedprice"))).as("sum_base"),
          Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc"),
          Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
                       * (lit(1) + col("l_tax")))).as("sum_charge"),
          Det.r4(avg(col("l_quantity"))).as("avg_qty"),
          Det.r4(avg(col("l_extendedprice"))).as("avg_price"),
          Det.r6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q18 shape: large-volume orders — the HAVING-on-aggregate +
    // fact-fact join pattern. l_quantity values are integral doubles, so
    // the HAVING threshold compares exactly on both engines; the ranking
    // orders by the rounded price then the unique order key.
    OpDef(
      "q_tpch_q18",
      """WITH big AS (
        |  SELECT l_orderkey,
        |         floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 200)
        |SELECT c_custkey, o_orderkey, o_orderdate,
        |       floor(o_totalprice * 10000.0 + 0.5) / 10000.0 AS total_r,
        |       sum_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY total_r DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin
    ) { (s, d) =>
      val big = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty_raw"))
        .filter(col("qty_raw") > 200)
        .select(col("l_orderkey"), Det.r4(col("qty_raw")).as("sum_qty"))
      big
        .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
                Det.r4(col("o_totalprice")).as("total_r"), col("sum_qty"))
        .orderBy(col("total_r").desc, col("o_orderkey").asc)
        .limit(20)
    },

    // TPC-H Q4 shape: order-priority checking — the correlated-EXISTS
    // pattern (Catalyst decorrelates to a left-semi join on the fact
    // table). The fixture lacks l_commitdate/l_receiptdate, so "late
    // delivery" is adapted to l_shipdate > o_orderdate + 60 days.
    OpDef(
      "q_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .join(li, col("l_orderkey") === col("o_orderkey") &&
                  col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAY"),
              "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q12 shape: shipping-priority split — conditional CASE
    // aggregation over a fact-fact join. The fixture lacks l_shipmode,
    // so the split keys on l_returnflag with a ship-date year window.
    OpDef(
      "q_tpch_q12",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
             sum(when(!high, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_returnflag")
    }
  )
}
