package graft.ops

import org.apache.spark.sql.functions._

/** The rest of the TPC-H shape suite (Q2/Q6–Q9/Q11/Q13–Q17/Q19–Q22),
  * adapted to the fixture schema — there is no `partsupp` table and no
  * l_commitdate/l_receiptdate/p_container columns, so the queries keep
  * each original's PLAN SHAPE (the thing worth testing: correlated
  * scalar subqueries, EXISTS/NOT-EXISTS decorrelation, disjunctive
  * pushdown, min-per-group join-back, scalar-subquery thresholds) while
  * substituting fixture columns for the missing ones. Analytics.scala
  * holds Q1/Q3/Q4/Q5/Q10/Q12/Q18; together the full 22-query suite is
  * covered.
  *
  * Determinism (SURVEY §5.3): every float aggregate is floor-rounded
  * identically on both engines; comparisons against aggregate-derived
  * thresholds round the threshold first; `l_quantity` is integral so its
  * sums/averages are IEEE-exact in any order; every result ends in a
  * total ORDER BY with a unique key.
  */
object Tpch {
  import Tables._

  private val revSql = Det.sql("sum(l_extendedprice * (1 - l_discount))", 4)
  private def revCol = Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))

  val ops: Seq[OpDef] = Seq(

    // TPC-H Q2 shape: min-cost supplier per part — the min-per-group +
    // join-back pattern (the original's correlated MIN(ps_supplycost)
    // subquery). Without partsupp, the observed per-lineitem unit price
    // stands in for the supply cost; rounding it per-row BEFORE the MIN
    // makes the min and the equality join bit-identical on both engines.
    OpDef(
      "q_tpch_q2",
      s"""WITH offers AS (
        |  SELECT DISTINCT l_partkey AS partkey, s_suppkey, s_name, n_name,
        |    ${Det.sql("l_extendedprice / l_quantity", 4)} AS unit_price
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |best AS (
        |  SELECT partkey, min(unit_price) AS min_price
        |  FROM offers GROUP BY partkey)
        |SELECT p_partkey, p_brand, s_suppkey, s_name, n_name, unit_price
        |FROM part
        |JOIN offers ON partkey = p_partkey
        |JOIN best ON best.partkey = p_partkey AND unit_price = min_price
        |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        |ORDER BY p_partkey, s_suppkey""".stripMargin
    ) { (s, d) =>
      val offers = lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("l_partkey").as("partkey"), col("s_suppkey"), col("s_name"),
                col("n_name"),
                Det.r4(col("l_extendedprice") / col("l_quantity")).as("unit_price"))
        .distinct()
      val best = offers.groupBy("partkey").agg(min(col("unit_price")).as("min_price"))
        .select(col("partkey").as("best_key"), col("min_price"))
      part(s, d).filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .join(offers, col("partkey") === col("p_partkey"))
        .join(best, col("partkey") === col("best_key") &&
                    col("unit_price") === col("min_price"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "n_name", "unit_price")
        .orderBy("p_partkey", "s_suppkey")
    },

    // TPC-H Q6: the forecasting-revenue-change scan — pure predicate
    // pushdown + one global sum; the whole query should compile to a
    // filtered parquet scan with map-side partial aggregation.
    OpDef(
      "q_tpch_q6",
      s"""SELECT ${Det.sql("sum(l_extendedprice * l_discount)", 4)} AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
                col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(Det.r4(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"))
    },

    // TPC-H Q7: volume shipping between two nations — the two-role
    // dimension join (nation joined twice under different keys) with a
    // symmetric OR filter, grouped by both roles and ship year.
    OpDef(
      "q_tpch_q7",
      s"""SELECT supp_nation, cust_nation, l_year, $revSql AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         EXTRACT(year FROM l_shipdate) AS l_year,
        |         l_extendedprice, l_discount
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    ) { (s, d) =>
      val n1 = nation(s, d).select(col("n_nationkey").as("n1_key"),
                                   col("n_name").as("supp_nation"))
      val n2 = nation(s, d).select(col("n_nationkey").as("n2_key"),
                                   col("n_name").as("cust_nation"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
                (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
        .withColumn("l_year", year(col("l_shipdate")).cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(revCol.as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q8: national market share — conditional-sum ratio per order
    // year over the full 7-table star join.
    OpDef(
      "q_tpch_q8",
      s"""SELECT o_year,
        |  ${Det.sql("sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume)", 6)}
        |    AS mkt_share
        |FROM (
        |  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin
    ) { (s, d) =>
      val n1 = nation(s, d).select(col("n_nationkey").as("n1_key"),
                                   col("n_regionkey"))
      val n2 = nation(s, d).select(col("n_nationkey").as("n2_key"),
                                   col("n_name").as("nation"))
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_type") === "PROMO")),
              col("p_partkey") === col("l_partkey"))
        .join(broadcast(supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(orders(s, d)
                .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                        col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
              col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy("o_year")
        .agg(Det.r(sum(when(col("nation") === "NATION_3", col("volume")).otherwise(0.0)) /
                     sum(col("volume")), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q9: product-type profit — profit per supplier nation per year.
    // ps_supplycost is absent, so cost is proxied by 10% of the part's
    // retail price per unit; the shape (part-name LIKE filter, 6-way join,
    // two-key group) is the original's.
    OpDef(
      "q_tpch_q9",
      s"""SELECT nation, o_year,
        |  ${Det.sql("sum(l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity)", 4)}
        |    AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
        |         l_extendedprice, l_discount, p_retailprice, l_quantity
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%')
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_name").like("%red%"))),
              col("p_partkey") === col("l_partkey"))
        .join(broadcast(supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
                year(col("o_orderdate")).cast("long").as("o_year"),
                (col("l_extendedprice") * (lit(1) - col("l_discount")) -
                 lit(0.1) * col("p_retailprice") * col("l_quantity")).as("amount"))
        .groupBy("nation", "o_year")
        .agg(Det.r4(sum(col("amount"))).as("sum_profit"))
        .orderBy(col("nation").asc, col("o_year").desc)
    },

    // TPC-H Q11 shape: important stock — per-part value share against a
    // scalar-subquery threshold. Value = shipped quantity × unit price
    // from one nation's suppliers; both the per-part value and the global
    // threshold are rounded before the comparison so the cut is
    // bit-identical on both engines.
    OpDef(
      "q_tpch_q11",
      s"""WITH val AS (
        |  SELECT l_partkey AS partkey,
        |         ${Det.sql("sum(l_extendedprice * (1 - l_discount))", 4)} AS value
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY l_partkey)
        |SELECT partkey, value
        |FROM val
        |WHERE value > (SELECT ${Det.sql("sum(value) * 0.001", 4)} FROM val)
        |ORDER BY value DESC, partkey""".stripMargin
    ) { (s, d) =>
      val value = lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_3")),
              col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("l_partkey").as("partkey"))
        .agg(revCol.as("value"))
      val thresh = value.agg(Det.r4(sum(col("value")) * lit(0.001)).as("t"))
      value.crossJoin(broadcast(thresh)).filter(col("value") > col("t"))
        .select("partkey", "value")
        .orderBy(col("value").desc, col("partkey").asc)
    },

    // TPC-H Q13: customer order-count distribution — the left-outer join
    // with an ON-clause filter (NOT a WHERE, so zero-order customers
    // survive) followed by a two-level aggregation.
    OpDef(
      "q_tpch_q13",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |                  AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
              col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q14: promotion-effect percentage — conditional-sum ratio over
    // one ship month; the part side is a broadcast.
    OpDef(
      "q_tpch_q14",
      s"""SELECT ${Det.sql("100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / sum(l_extendedprice * (1 - l_discount))", 6)}
        |    AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin
    ) { (s, d) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(Det.r(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) /
                     sum(rev), 6).as("promo_revenue"))
    },

    // TPC-H Q15: top supplier — the view + scalar-subquery-max pattern.
    // Revenue is rounded inside the aggregation, so the MAX and the
    // equality against it compare identical doubles on both engines.
    OpDef(
      "q_tpch_q15",
      s"""WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no, $revSql AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier
        |JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin
    ) { (s, d) =>
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(revCol.as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("best"))
      supplier(s, d)
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(top), col("total_revenue") === col("best"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // TPC-H Q16 shape: supplier diversity per part group — COUNT(DISTINCT)
    // after excluding a NOT-IN subquery side (negative-balance suppliers
    // stand in for the original's complaint filter; Catalyst plans the
    // exclusion as a left-anti join since the key is non-nullable).
    OpDef(
      "q_tpch_q16",
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'STANDARD'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin
    ) { (s, d) =>
      val badSupp = supplier(s, d).filter(col("s_acctbal") < 0).select("s_suppkey")
      lineitem(s, d)
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(part(s, d)
                .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "STANDARD" &&
                        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))),
              col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
                 col("p_type").asc, col("p_size").asc)
    },

    // TPC-H Q17: small-quantity-order revenue — the correlated scalar-AVG
    // subquery (per-part average quantity), decorrelated to an aggregate +
    // join-back. l_quantity is integral, so the per-part AVG is IEEE-exact
    // in any summation order and the threshold needs no rounding.
    OpDef(
      "q_tpch_q17",
      s"""SELECT ${Det.sql("sum(l_extendedprice) / 7.0", 4)} AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin
    ) { (s, d) =>
      val partAvg = lineitem(s, d)
        .groupBy(col("l_partkey").as("avg_key"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_brand") === "Brand#3")),
              col("p_partkey") === col("l_partkey"))
        .join(partAvg, col("l_partkey") === col("avg_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(Det.r4(sum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },

    // TPC-H Q19: discounted-revenue — three disjunctive (brand, size,
    // quantity) branches OR-ed into one predicate; Catalyst pushes the
    // common part filter into the scan and the join stays a single
    // broadcast-hash join rather than a union of three.
    OpDef(
      "q_tpch_q19",
      s"""SELECT $revSql AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin
    ) { (s, d) =>
      val c1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
               col("l_quantity") >= 1 && col("l_quantity") <= 11
      val c2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
               col("l_quantity") >= 10 && col("l_quantity") <= 20
      val c3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
               col("l_quantity") >= 20 && col("l_quantity") <= 30
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("p_partkey") === col("l_partkey"))
        .filter(c1 || c2 || c3)
        .agg(revCol.as("revenue"))
    },

    // TPC-H Q20 shape: promotion-candidate suppliers — IN-subquery with a
    // HAVING aggregate inside (suppliers who shipped >100 units of PROMO
    // parts in 1997), semi-joined back to the supplier×nation list. The
    // original's single-nation cut is dropped: the sf0.001 fixture has 10
    // suppliers total, so any one nation is usually empty there.
    // Quantity sums are integral-exact, so the HAVING cut is deterministic.
    OpDef(
      "q_tpch_q20",
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey
        |    FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_type = 'PROMO'
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_suppkey
        |    HAVING sum(l_quantity) > 100)
        |ORDER BY s_suppkey""".stripMargin
    ) { (s, d) =>
      val shippers = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(part(s, d).filter(col("p_type") === "PROMO")),
              col("p_partkey") === col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 100)
        .select("l_suppkey")
      supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    },

    // TPC-H Q21: suppliers who kept orders waiting — the EXISTS +
    // NOT-EXISTS double correlation on the same fact table ("another
    // supplier contributed to the order" / "no other supplier was also
    // late"). Late = shipped >90 days after the order date (the fixture
    // has no receipt/commit dates). Spark plans the pair as a left-semi
    // then left-anti join with the date condition folded into the anti
    // side's join predicate. As with Q20, the original's single-nation
    // filter is dropped (too selective for the 10-supplier sf0.001
    // fixture); n_name joins into the group key instead.
    OpDef(
      "q_tpch_q21",
      """SELECT s_name, n_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name, n_name""".stripMargin
    ) { (s, d) =>
      val l1 = lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val l2 = lineitem(s, d)
        .select(col("l_orderkey").as("l2_okey"), col("l_suppkey").as("l2_skey"))
      val l3 = lineitem(s, d)
        .select(col("l_orderkey").as("l3_okey"), col("l_suppkey").as("l3_skey"),
                col("l_shipdate").as("l3_ship"))
      l1.join(orders(s, d).filter(col("o_orderstatus") === "F"),
              col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > expr("o_orderdate + INTERVAL 90 DAY"))
        .join(l2, col("l2_okey") === col("l_orderkey") &&
                  col("l2_skey") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("l3_okey") === col("l_orderkey") &&
                  col("l3_skey") =!= col("l_suppkey") &&
                  col("l3_ship") > expr("o_orderdate + INTERVAL 90 DAY"), "left_anti")
        .join(broadcast(supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc, col("n_name").asc)
    },

    // TPC-H Q22: global sales opportunity — above-average-balance
    // customers with no RECENT orders (every fixture customer has at
    // least one order ever, so the original's all-time NOT EXISTS is
    // time-windowed), grouped by country code (nationkey mod 5 stands in
    // for the phone prefix). The AVG threshold is rounded on both sides
    // before the comparison (sum order differs across engines; the round
    // absorbs the ulp).
    OpDef(
      "q_tpch_q22",
      s"""WITH pos AS (
        |  SELECT (c_nationkey % 5) AS cntrycode, c_custkey, c_acctbal
        |  FROM customer
        |  WHERE (c_nationkey % 5) IN (0, 1, 2)),
        |thresh AS (
        |  SELECT ${Det.sql("avg(c_acctbal)", 4)} AS a
        |  FROM pos WHERE c_acctbal > 0.0)
        |SELECT cntrycode, count(*) AS numcust,
        |       ${Det.sql("sum(c_acctbal)", 4)} AS totacctbal
        |FROM pos
        |WHERE c_acctbal > (SELECT a FROM thresh)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin
    ) { (s, d) =>
      val pos = customer(s, d)
        .withColumn("cntrycode", pmod(col("c_nationkey"), lit(5)))
        .filter(col("cntrycode").isin(0, 1, 2))
        .select("cntrycode", "c_custkey", "c_acctbal")
      val thresh = pos.filter(col("c_acctbal") > 0.0)
        .agg(Det.r4(avg(col("c_acctbal"))).as("a"))
      pos
        .crossJoin(broadcast(thresh)).filter(col("c_acctbal") > col("a"))
        .join(orders(s, d)
                .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
                .select("o_custkey"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
             Det.r4(sum(col("c_acctbal"))).as("totacctbal"))
        .orderBy("cntrycode")
    }
  )
}
