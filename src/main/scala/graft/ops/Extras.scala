package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Coverage beyond SURVEY §2's core inventory: pivot, exact percentiles,
  * correlation/covariance, ordered string aggregation, generator (UDTF)
  * surface, and deterministic hash-sampling — operators a training-data
  * pipeline reaches for constantly.
  */
object Extras {
  import Tables._

  val ops: Seq[OpDef] = Seq(

    // pivot: one column per event_type (explicit value list → stable
    // schema; Spark pivots with map-side partial aggs, no extra shuffle
    // vs a plain groupBy)
    OpDef(
      "q_agg_pivot",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click')    AS click,
        |  count(*) FILTER (WHERE event_type = 'error')    AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  count(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // exact interpolated percentiles (Spark percentile ≡ DuckDB
    // quantile_cont)
    OpDef(
      "q_agg_percentile",
      """SELECT o_orderstatus,
        |  floor((quantile_cont(o_totalprice, 0.25)) * 10000.0 + 0.5) / 10000.0 AS p25,
        |  floor((quantile_cont(o_totalprice, 0.50)) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor((quantile_cont(o_totalprice, 0.75)) * 10000.0 + 0.5) / 10000.0 AS p75
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      // one array-percentile aggregate instead of three scalar ones
      // (r16): Spark plans one `percentile` buffer per DISTINCT
      // (child, percentage) aggregate, so the scalar spelling built and
      // sorted the same value buffer three times; graft_exact_pct is
      // additionally primitive (no boxed value map), bit-identical
      // results either way
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(transform(
          expr("graft_exact_pct(o_totalprice, array(0.25D, 0.5D, 0.75D))"),
          q => Det.r4(q)).as("ps"))
        .select(col("o_orderstatus"),
                col("ps").getItem(0).as("p25"),
                col("ps").getItem(1).as("p50"),
                col("ps").getItem(2).as("p75"))
        .orderBy("o_orderstatus")
    },

    OpDef(
      "q_agg_corr",
      """SELECT l_returnflag,
        |  floor((corr(l_quantity, l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS corr_qp,
        |  floor((covar_samp(l_quantity, l_extendedprice)) * 100.0 + 0.5) / 100.0 AS cov_qp,
        |  floor((covar_pop(l_quantity, l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS cov_qd
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(Det.r6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
             Det.r2(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cov_qp"),
             Det.r6(covar_pop(col("l_quantity"), col("l_discount"))).as("cov_qd"))
        .orderBy("l_returnflag")
    },

    // ordered string aggregation
    OpDef(
      "q_agg_stragg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin
    ) { (s, d) =>
      nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
               .as("nations_csv"))
        .orderBy("r_name")
    },

    // generator / UDTF surface: posexplode ≡ unnest-with-position
    OpDef(
      "q_explode_pos",
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS tok
        |FROM docs, unnest(range(1, len(toks) + 1)) AS t(i)
        |ORDER BY doc_id, pos""".stripMargin
    ) { (s, d) =>
      documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
                posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .orderBy("doc_id", "pos")
    },

    OpDef(
      "q_fn_string2",
      """SELECT p_partkey,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tr,
        |  reverse(p_name) AS rev,
        |  repeat(p_brand, 2) AS rep,
        |  left(p_name, 5) AS l5,
        |  right(p_name, 5) AS r5,
        |  contains(p_name, 'bolt') AS has_bolt,
        |  starts_with(p_name, 'red') AS is_red,
        |  ends_with(p_name, 'gear') AS is_gear,
        |  upper(left(lower(p_type), 1)) || substring(lower(p_type), 2) AS cap_type,
        |  CAST(levenshtein(p_name, translate(p_name, 'aeiou', 'AEIOU')) AS BIGINT)
        |    AS n_vowels,
        |  CAST(ascii(p_name) AS BIGINT) AS first_code,
        |  chr(65 + (p_size % 26)) AS size_chr
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        reverse(col("p_name")).as("rev"),
        repeat(col("p_brand"), 2).as("rep"),
        expr("left(p_name, 5)").as("l5"),
        expr("right(p_name, 5)").as("r5"),
        col("p_name").contains("bolt").as("has_bolt"),
        col("p_name").startsWith("red").as("is_red"),
        col("p_name").endsWith("gear").as("is_gear"),
        initcap(lower(col("p_type"))).as("cap_type"),
        levenshtein(col("p_name"),
                    translate(col("p_name"), "aeiou", "AEIOU"))
          .cast("long").as("n_vowels"),
        ascii(col("p_name")).cast("long").as("first_code"),
        expr("char(65 + (p_size % 26))").as("size_chr"))
        .orderBy("p_partkey")
    },

    // arg-extremum aggregates (deterministic on this data: per-group
    // extremum rows are unique, verified against the fixtures)
    OpDef(
      "q_agg_minmax_by",
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, o_totalprice) AS biggest_order,
        |  arg_min(o_orderkey, o_totalprice) AS smallest_order,
        |  max(o_totalprice) AS max_price,
        |  min(o_totalprice) AS min_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("biggest_order"),
             min_by(col("o_orderkey"), col("o_totalprice")).as("smallest_order"),
             max(col("o_totalprice")).as("max_price"),
             min(col("o_totalprice")).as("min_price"))
        .orderBy("o_orderpriority")
    },

    OpDef(
      "q_agg_bool",
      """SELECT event_type,
        |  bool_and(value > 0.005) AS all_nonzero,
        |  bool_or(value > 450) AS any_huge,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(bool_and(col("value") > 0.005).as("all_nonzero"),
             bool_or(col("value") > 450).as("any_huge"),
             count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // deterministic hash-sampling: a reproducible 1-in-10 sample keyed on
    // md5 (portable across engines/runs, unlike TABLESAMPLE/rand) — at
    // 100 TB this is the sampling primitive that stays stable across
    // retries and engines
    OpDef(
      "q_sample_hash",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE strpos('0123456789abcdef',
        |             substring(md5(l_orderkey || '-' || l_linenumber), 1, 1)) - 1 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(expr("instr('0123456789abcdef', " +
          "substring(md5(concat(l_orderkey, '-', l_linenumber)), 1, 1)) - 1 = 0"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // deterministic stratified downsample: keep the same number of docs
    // per lang (the smallest stratum's size) so a skewed corpus becomes a
    // balanced training mix. "Random" order within a stratum is
    // md5(doc_id) — engine-identical, reproducible, and re-runnable with
    // a seed by salting the hashed string. At scale: one window sort per
    // stratum (shuffled by lang) + one broadcast of the 1-row min — no
    // global sort, no driver collect.
    OpDef(
      "q_sample_stratified",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT min(n) AS target FROM c),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |          AS rn
        |      FROM documents)
        |SELECT doc_id, lang, rn FROM r, m WHERE rn <= m.target
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val c = documents(s, d).groupBy("lang").agg(count(lit(1)).as("n"))
      val m = c.agg(min(col("n")).as("target"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .crossJoin(broadcast(m))
        .filter(col("rn") <= col("target"))
        .select("doc_id", "lang", "rn")
        .orderBy("doc_id")
    },

    // PII scrubbing: mask digit runs and phone-shaped tokens before text
    // reaches a training corpus — pure regexp_replace projections, fully
    // codegen'd, no shuffle (the map-only shape a 100 TB scrub pass needs).
    // DuckDB regexp_replace is first-match-only without the 'g' flag;
    // Spark's is always global.
    OpDef(
      "q_scrub_pii",
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |  regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS name_tokenized,
        |  CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS BIGINT)
        |    AS digits_removed
        |FROM customer
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("name_tokenized"),
        length(regexp_replace(col("c_name"), "[^0-9]", ""))
          .cast("long").as("digits_removed"))
        .orderBy("c_custkey")
    },

    // Spark 4 VARIANT: the semi-structured type for JSON whose shape
    // isn't known at write time — parse once, extract typed paths with
    // shredding-friendly variant_get (the open-format answer to
    // schema-on-read JSON at 100 TB, vs re-parsing strings per access).
    // Output columns are plain scalars; the oracle extracts the same
    // paths with DuckDB's JSON operators.
    OpDef(
      "q_json_variant",
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INT) AS k,
        |  CAST(props->>'$.k' AS INT) IS NULL AS k_missing
        |FROM events
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
                variant_get(col("v"), "$.k", "int").as("k"),
                variant_get(col("v"), "$.k", "int").isNull.as("k_missing"))
        .orderBy("event_id")
    },

    // SQL-standard LISTAGG (Spark 4 native) — ordered string aggregation
    // through the built-in instead of the array_join(sort_array(
    // collect_list)) composition q_agg_stragg documents
    OpDef(
      "q_agg_listagg",
      """SELECT c_nationkey, string_agg(c_mktsegment, ',' ORDER BY c_mktsegment)
        |  AS segs
        |FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin
    ) { (s, d) =>
      val v = Views.reg(customer(s, d)
        .select("c_nationkey", "c_mktsegment").distinct(), "listagg_src")
      s.sql(
        s"""SELECT c_nationkey,
           |  listagg(c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment)
           |    AS segs
           |FROM $v
           |GROUP BY c_nationkey
           |ORDER BY c_nationkey""".stripMargin)
    },

    // unpivot/melt: wide → long without touching the data (a generator
    // projection — no shuffle until the final sort). The oracle spells
    // the portable UNION ALL equivalent; values are raw column reads, so
    // no rounding is needed for cross-engine parity.
    OpDef(
      "q_unpivot",
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber",
                "l_discount", "l_extendedprice", "l_quantity", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_discount"), col("l_extendedprice"),
                col("l_quantity"), col("l_tax")),
          "metric", "val")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },

    // struct (nested record) surface: build, re-extract, serialize to
    // JSON — Spark struct() ≡ DuckDB struct_pack, field order preserved
    // by both to_json implementations, so the JSON strings compare
    // byte-identical (int + string fields only: float formatting would
    // differ).
    OpDef(
      "q_fn_struct",
      """SELECT o_orderkey,
        |  struct_pack(st := o_orderstatus, ck := o_custkey).st AS st,
        |  struct_pack(st := o_orderstatus, ck := o_custkey).ck AS ck,
        |  to_json(struct_pack(st := o_orderstatus, ck := o_custkey)) AS js
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
                struct(col("o_orderstatus").as("st"),
                       col("o_custkey").as("ck")).as("os"))
        .select(col("o_orderkey"),
                col("os.st").as("st"), col("os.ck").as("ck"),
                to_json(col("os")).as("js"))
        .orderBy("o_orderkey")
    },

    // SCD type-2 interval build: each customer's order history becomes
    // [valid_from, valid_to) rows, open interval on the latest — the
    // standard warehouse dimension-versioning shape. One lead() window
    // per customer key: hash shuffle on o_custkey, per-key sort, no
    // global sort — the partition strategy is unchanged at 1000×.
    OpDef(
      "q_scd2_build",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                col("o_orderdate").as("valid_from"),
                lead(col("o_orderdate"), 1).over(w).as("valid_to"),
                lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    },

    // data-quality audit (the dbt-style pipeline gate): PK uniqueness,
    // FK orphans, value-domain and not-null constraints, one row per
    // check. Each branch is a shuffle-bounded aggregate; the FK check is
    // a left-anti join AQE broadcasts when the key side is small. At
    // scale this is the pre-publish gate a 100 TB table runs nightly.
    OpDef(
      "q_dq_checks",
      """SELECT * FROM (
        |  SELECT 'lineitem_fk_orders' AS check_name,
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))
        |      AS n_violations
        |  UNION ALL
        |  SELECT 'lineitem_qty_positive',
        |    (SELECT count(*) FROM lineitem WHERE NOT (l_quantity > 0))
        |  UNION ALL
        |  SELECT 'orders_pk_unique',
        |    (SELECT count(*) FROM (SELECT o_orderkey FROM orders
        |                           GROUP BY 1 HAVING count(*) > 1))
        |  UNION ALL
        |  SELECT 'orders_price_nonneg',
        |    (SELECT count(*) FROM orders WHERE NOT (o_totalprice >= 0))
        |  UNION ALL
        |  SELECT 'orders_status_domain',
        |    (SELECT count(*) FROM orders
        |     WHERE o_orderstatus NOT IN ('F', 'O', 'P')))
        |ORDER BY check_name""".stripMargin
    ) { (s, d) =>
      def one(name: String, n: org.apache.spark.sql.DataFrame) =
        n.select(lit(name).as("check_name"),
                 col("n").cast("long").as("n_violations"))
      val li = lineitem(s, d)
      val o = orders(s, d)
      one("lineitem_fk_orders",
          li.join(o.select("o_orderkey"),
                  li("l_orderkey") === o("o_orderkey"), "left_anti")
            .agg(count(lit(1)).as("n")))
        .unionByName(one("lineitem_qty_positive",
          li.filter(!(col("l_quantity") > 0)).agg(count(lit(1)).as("n"))))
        .unionByName(one("orders_pk_unique",
          o.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
            .filter(col("c") > 1).agg(count(lit(1)).as("n"))))
        .unionByName(one("orders_price_nonneg",
          o.filter(!(col("o_totalprice") >= 0)).agg(count(lit(1)).as("n"))))
        .unionByName(one("orders_status_domain",
          o.filter(!col("o_orderstatus").isin("F", "O", "P"))
            .agg(count(lit(1)).as("n"))))
        .orderBy("check_name")
    },

    // deterministic train/val/test split (~80/10/10): bucket =
    // md5("split:" || doc_id) first byte. Map-only (no shuffle), seedable
    // by changing the salt, reproducible across engines and runs — the
    // property a training pipeline needs so re-runs never leak val/test
    // docs into train.
    OpDef(
      "q_sample_split",
      """SELECT doc_id, lang,
        |  CASE WHEN b < 205 THEN 'train'
        |       WHEN b < 230 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |        CAST('0x' || substring(md5('split:' || doc_id), 1, 2) AS BIGINT)
        |          AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val b = conv(substring(md5(concat(lit("split:"), col("doc_id"))), 1, 2),
                   16, 10).cast("long")
      documents(s, d)
        .select(col("doc_id"), col("lang"),
                when(b < 205, "train").when(b < 230, "val")
                  .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // MERGE INTO / upsert semantics expressed relationally — the nightly
    // warehouse apply-changes step (matched → update, not-matched →
    // insert, untouched rows kept), as one full-outer join on the merge
    // key: exactly the shuffle-on-key plan a MERGE executes inside Delta/
    // Iceberg, minus their file-rewrite commit. Base = orders with key %
    // 3 ≠ 0; change set = re-priced orders with key % 2 = 0, so the
    // result exercises all three actions. One shuffle each side on the
    // merge key at any scale; AQE broadcasts a small change set.
    OpDef(
      "q_merge_upsert",
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |chg AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice * CAST(1.1 AS DOUBLE) AS DOUBLE) AS new_price
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT
        |  coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
        |  floor((coalesce(c.new_price, b.o_totalprice)) * 100.0 + 0.5) / 100.0
        |    AS price,
        |  CASE WHEN c.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
        |         THEN 'updated'
        |       WHEN c.o_orderkey IS NOT NULL THEN 'inserted'
        |       ELSE 'kept' END AS action
        |FROM base b FULL JOIN chg c ON b.o_orderkey = c.o_orderkey
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      val base = orders(s, d).filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val chg = orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("c_orderkey"),
                col("o_custkey").as("c_custkey"),
                (col("o_totalprice") * lit(1.1)).as("new_price"))
      base.join(chg, col("o_orderkey") === col("c_orderkey"), "full")
        .select(
          coalesce(col("c_orderkey"), col("o_orderkey")).as("o_orderkey"),
          coalesce(col("c_custkey"), col("o_custkey")).as("o_custkey"),
          Det.r2(coalesce(col("new_price"), col("o_totalprice"))).as("price"),
          when(col("c_orderkey").isNotNull && col("o_orderkey").isNotNull,
               "updated")
            .when(col("c_orderkey").isNotNull, "inserted")
            .otherwise("kept").as("action"))
        .orderBy("o_orderkey")
    },

    // CDC apply with tombstones — the DELETE half MERGE needs before it
    // can consume a real change feed (q_merge_upsert covers update/
    // insert only; an append-only source never exercises the third
    // action). Change rows carry op ∈ {'U','D'}: matched 'D' removes the
    // base row (WHEN MATCHED AND op='D' THEN DELETE), matched 'U'
    // updates, unmatched 'U' inserts, unmatched 'D' is a no-op (late
    // tombstone for a row never seen — dropped, not inserted). Spelled
    // as the SAME one full-outer join on the merge key as q_merge_upsert
    // plus ONE post-join filter (tombstones and their targets fall out
    // together) — no second pass, no anti-join: one shuffle per side at
    // any scale, AQE broadcasts a small feed. Deletions here are exactly
    // the keys q_dq_snapshot_diff classifies 'removed' when auditing
    // base vs applied (OpsSpec asserts the apply and the audit agree,
    // plus row conservation: |out| = |base| + inserted - deleted).
    OpDef(
      "q_merge_cdc",
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |cdc AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(o_totalprice * CAST(1.1 AS DOUBLE) AS DOUBLE) AS new_price
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
        |  floor((coalesce(c.new_price, b.o_totalprice)) * 100.0 + 0.5) / 100.0
        |    AS price,
        |  CASE WHEN c.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
        |         THEN 'updated'
        |       WHEN c.o_orderkey IS NOT NULL THEN 'inserted'
        |       ELSE 'kept' END AS action
        |FROM base b FULL JOIN cdc c ON b.o_orderkey = c.o_orderkey
        |WHERE coalesce(c.op, '') <> 'D'
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      val base = orders(s, d).filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cdc = orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("c_orderkey"),
                col("o_custkey").as("c_custkey"),
                when(col("o_orderkey") % 10 === 0, "D").otherwise("U")
                  .as("op"),
                (col("o_totalprice") * lit(1.1)).as("new_price"))
      base.join(cdc, col("o_orderkey") === col("c_orderkey"), "full")
        .filter(coalesce(col("op"), lit("")) =!= "D")
        .select(
          coalesce(col("c_orderkey"), col("o_orderkey")).as("o_orderkey"),
          coalesce(col("c_custkey"), col("o_custkey")).as("o_custkey"),
          Det.r2(coalesce(col("new_price"), col("o_totalprice"))).as("price"),
          when(col("c_orderkey").isNotNull && col("o_orderkey").isNotNull,
               "updated")
            .when(col("c_orderkey").isNotNull, "inserted")
            .otherwise("kept").as("action"))
        .orderBy("o_orderkey")
    },

    // table profiling — the data-catalog job every warehouse runs on
    // landing: per-column row count, null count, exact distinct count and
    // numeric min/max for lineitem's key/measure columns, ONE ROW PER
    // COLUMN. One wide aggregation (Spark expands the multi-DISTINCT into
    // its internal Expand — still a single corpus pass per distinct
    // column group, no driver iteration) followed by a 6-way stack of the
    // 1-row result: the corpus-sized work is the aggregation; everything
    // after is constant-sized. Numeric-only column set keeps min/max
    // engine-portable as doubles (string formatting of floats differs
    // between engines; profiling string columns would report lengths
    // instead).
    OpDef(
      "q_profile_table", {
        def one(c: String) =
          s"""SELECT '$c' AS column_name, count(*) AS n_rows,
             |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min($c) AS DOUBLE) AS vmin, CAST(max($c) AS DOUBLE) AS vmax
             |FROM lineitem""".stripMargin
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount")
          .map(one).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
                             ")\nORDER BY column_name")
      }
    ) { (s, d) =>
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount")
      val li = lineitem(s, d)
      val agg = li.agg(
        count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          (count(lit(1)) - count(col(c))).as(s"${c}_null"),
          countDistinct(col(c)).as(s"${c}_dist"),
          min(col(c)).cast("double").as(s"${c}_min"),
          max(col(c)).cast("double").as(s"${c}_max"))): _*)
      val rows = cols.map(c => struct(
        lit(c).as("column_name"), col("n_rows").as("n_rows"),
        col(s"${c}_null").as("n_null"), col(s"${c}_dist").as("n_distinct"),
        col(s"${c}_min").as("vmin"), col(s"${c}_max").as("vmax")))
      agg.select(explode(array(rows: _*)).as("r"))
        .select("r.*")
        .orderBy("column_name")
    },

    /** 2-D skyline (Pareto frontier): parts dominated by no other part
      * that is both strictly cheaper AND strictly bigger. NOT the naive
      * O(n²) anti-join: group to the distinct-price table, cummax the
      * per-price max size over a rows-frame of strictly-cheaper prices
      * (distinctness makes the rows-frame exactly "price < current"),
      * and a part survives iff that cummax doesn't exceed its size. The
      * ordered pass runs over DISTINCT prices — at 100 TB the range
      * partitioner shards that sort; everything else is groupBy/join on
      * the price key. */
    OpDef(
      "q_agg_skyline",
      """WITH ps AS (
        |  SELECT p_retailprice AS price, max(p_size) AS ms
        |  FROM part GROUP BY 1),
        |cm AS (
        |  SELECT price,
        |    max(ms) OVER (ORDER BY price ASC
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS cheaper_max
        |  FROM ps)
        |SELECT p.p_partkey, p.p_retailprice AS price,
        |       CAST(p.p_size AS BIGINT) AS psize
        |FROM part p JOIN cm ON p.p_retailprice = cm.price
        |WHERE cm.cheaper_max IS NULL OR cm.cheaper_max <= p.p_size
        |ORDER BY price, p_partkey""".stripMargin
    ) { (s, d) =>
      val ps = part(s, d).groupBy(col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("ms"))
      val w = Window.orderBy(col("price").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cm = ps.select(col("price"), max(col("ms")).over(w).as("cheaper_max"))
      part(s, d).join(cm, col("p_retailprice") === col("price"))
        .filter(col("cheaper_max").isNull || col("cheaper_max") <= col("p_size"))
        .select(col("p_partkey"), col("price"),
                col("p_size").cast("long").as("psize"))
        .orderBy("price", "p_partkey")
    },

    /** Benford first-digit audit — the fraud/synthetic-data screen every
      * financial DQ suite runs: observed first-digit frequencies of order
      * totals vs Benford's log₁₀(1 + 1/d), with per-digit χ²-style
      * deviation terms. One 9-group aggregation; digit extraction is a
      * map-only string op (identical on both engines, unlike float
      * log-arithmetic on the value itself). */
    OpDef(
      "q_dq_benford",
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |                             AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders WHERE o_totalprice >= 1.0),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        |  floor((n * 1.0 / total) * 1000000.0 + 0.5) / 1000000.0 AS obs,
        |  floor(log10(1.0 + 1.0 / digit) * 1000000.0 + 0.5) / 1000000.0
        |    AS expected,
        |  floor((((n * 1.0 / total) - log10(1.0 + 1.0 / digit))
        |         * ((n * 1.0 / total) - log10(1.0 + 1.0 / digit))
        |         / log10(1.0 + 1.0 / digit)) * 1000000.0 + 0.5) / 1000000.0
        |    AS dev
        |FROM c, t ORDER BY digit""".stripMargin
    ) { (s, d) =>
      val dg = orders(s, d).filter(col("o_totalprice") >= 1.0)
        .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
                          1, 1).cast("long").as("digit"))
      val c = dg.groupBy("digit").agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).as("total"))
      val obs = col("n") * lit(1.0) / col("total")
      val ben = log10(lit(1.0) + lit(1.0) / col("digit"))
      c.crossJoin(broadcast(t))
        .select(col("digit"), col("n").cast("long").as("n"),
                Det.r6(obs).as("obs"), Det.r6(ben).as("expected"),
                Det.r6((obs - ben) * (obs - ben) / ben).as("dev"))
        .orderBy("digit")
    },

    /** Population Stability Index between time halves of the order stream
      * — the canonical ML-monitoring drift metric (has the price
      * distribution shifted since the reference window?): decile
      * boundaries from the BASELINE half (broadcast, the q_agg_eqdepth
      * route — no global ntile sort), map-only bucket assignment for both
      * halves, add-1-smoothed shares, per-bucket (pA−pB)·ln(pA/pB)
      * contributions. Everything after the two bucket aggregates is
      * 10-row arithmetic. Shares are r6-rounded BEFORE the log-ratio so
      * both engines feed ln identical doubles. */
    OpDef(
      "q_dq_psi",
      """WITH a AS (
        |  SELECT o_totalprice AS v FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |bt AS (
        |  SELECT o_totalprice AS v FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
        |bo AS (
        |  SELECT list_transform(
        |    quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    q -> floor(q * 10000.0 + 0.5) / 10000.0) AS bs
        |  FROM a),
        |ca AS (
        |  SELECT CAST(len(list_filter(bo.bs, x -> a.v > x)) AS BIGINT) AS bin,
        |         count(*) AS n_a
        |  FROM a, bo GROUP BY 1),
        |cb AS (
        |  SELECT CAST(len(list_filter(bo.bs, x -> bt.v > x)) AS BIGINT) AS bin,
        |         count(*) AS n_b
        |  FROM bt, bo GROUP BY 1),
        |t AS (SELECT (SELECT count(*) FROM a) AS ta,
        |             (SELECT count(*) FROM bt) AS tb),
        |j AS (
        |  SELECT coalesce(ca.bin, cb.bin) AS bin,
        |    coalesce(ca.n_a, 0) AS n_a, coalesce(cb.n_b, 0) AS n_b
        |  FROM ca FULL JOIN cb ON ca.bin = cb.bin),
        |p AS (
        |  SELECT bin, n_a, n_b,
        |    floor(((n_a + 1.0) / (t.ta + 10.0)) * 1000000.0 + 0.5) / 1000000.0
        |      AS pa,
        |    floor(((n_b + 1.0) / (t.tb + 10.0)) * 1000000.0 + 0.5) / 1000000.0
        |      AS pb
        |  FROM j, t)
        |SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  pa, pb,
        |  floor(((pa - pb) * ln(pa / pb)) * 1000000.0 + 0.5) / 1000000.0
        |    AS contrib
        |FROM p ORDER BY bin""".stripMargin
    ) { (s, d) =>
      val cut = lit("1998-01-01").cast("timestamp")
      val o = orders(s, d)
      val a = o.filter(col("o_orderdate") < cut).select(col("o_totalprice").as("v"))
      val bt = o.filter(col("o_orderdate") >= cut).select(col("o_totalprice").as("v"))
      graft.GraftFunctions.register(s)
      val bounds = a.agg(transform(
        expr("graft_exact_pct(v, " +
             "array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D, 0.9D))"),
        q => Det.r4(q)).as("bs"))
      def binCounts(df: org.apache.spark.sql.DataFrame, cn: String) =
        df.crossJoin(broadcast(bounds))
          .select(size(filter(col("bs"), x => col("v") > x)).cast("long").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as(cn))
      val t = a.agg(count(lit(1)).as("ta"))
        .crossJoin(bt.agg(count(lit(1)).as("tb")))
      val j = binCounts(a, "n_a").join(binCounts(bt, "n_b"), Seq("bin"), "full")
        .select(col("bin"),
                coalesce(col("n_a"), lit(0L)).as("n_a"),
                coalesce(col("n_b"), lit(0L)).as("n_b"))
        .crossJoin(broadcast(t))
      val pa = Det.r6((col("n_a") + lit(1.0)) / (col("ta") + lit(10.0)))
      val pb = Det.r6((col("n_b") + lit(1.0)) / (col("tb") + lit(10.0)))
      j.select(col("bin"), col("n_a"), col("n_b"), pa.as("pa"), pb.as("pb"))
        .select(col("bin"), col("n_a"), col("n_b"), col("pa"), col("pb"),
                Det.r6((col("pa") - col("pb")) * log(col("pa") / col("pb")))
                  .as("contrib"))
        .orderBy("bin")
    },

    /** Two-sample Kolmogorov–Smirnov drift test between the first and
      * second time-halves of the event value stream — the
      * distribution-free companion to q_dq_psi (PSI needs binning; KS
      * compares the full ECDFs): D = max |F₁(v) − F₂(v)| evaluated at
      * every distinct value, flagged against the 1.36·√((n₁+n₂)/(n₁n₂))
      * α=0.05 critical line. Tie-safe by construction: cumulative counts
      * run over per-DISTINCT-value rows, so equal values never straddle
      * an ECDF step. All counts are exact integers; each engine derives
      * the per-step double from the same integer pair, so max picks the
      * same step.
      *
      * SCALE NOTE: the ECDF window is a GLOBAL order over distinct
      * values — one reducer, the documented exact baseline (fine for the
      * audit-sized samples a drift monitor pulls). The 100 TB path is
      * the absolute-grid variant: quantize values onto a fixed 1 k-point
      * grid (q_text_lmbuckets' pattern), when D is only needed to
      * grid resolution. */
    OpDef(
      "q_dq_ks_drift",
      """WITH b AS (
        |  SELECT (min(epoch_us(CAST(ts AS TIMESTAMP)))
        |          + max(epoch_us(CAST(ts AS TIMESTAMP)))) // 2 AS mid
        |  FROM events),
        |s AS (
        |  SELECT value AS v,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) < mid THEN 0 ELSE 1 END
        |      AS side
        |  FROM events, b),
        |t AS (SELECT count(*) FILTER (WHERE side = 0) AS n1,
        |             count(*) FILTER (WHERE side = 1) AS n2 FROM s),
        |g AS (SELECT v, count(*) FILTER (WHERE side = 0) AS c1,
        |             count(*) FILTER (WHERE side = 1) AS c2
        |      FROM s GROUP BY v),
        |c AS (SELECT v,
        |        sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS k1,
        |        sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS k2
        |      FROM g),
        |d AS (SELECT max(abs(k1 * 1.0 / t.n1 - k2 * 1.0 / t.n2)) AS ks
        |      FROM c, t)
        |SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
        |  floor(d.ks * 1000000.0 + 0.5) / 1000000.0 AS ks_d,
        |  floor(1.36 * sqrt((t.n1 + t.n2) * 1.0 / (t.n1 * t.n2))
        |        * 1000000.0 + 0.5) / 1000000.0 AS crit,
        |  CAST(CASE WHEN d.ks > 1.36 * sqrt((t.n1 + t.n2) * 1.0
        |                                    / (t.n1 * t.n2))
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_drift
        |FROM d, t""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d)
        .select(col("value").as("v"), unix_micros(col("ts")).as("us"))
      // integer `div`: epoch-µs sums exceed double's 2^53 exact range
      // (the q_agg_cuped discipline)
      val b = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx_"))
        .select(expr("(mn + mx_) div 2").as("mid"))
      val sdf = ev.crossJoin(broadcast(b))
        .select(col("v"),
                when(col("us") < col("mid"), 0).otherwise(1).as("side"))
      val t = sdf.agg(
        count(when(col("side") === 0, 1)).as("n1"),
        count(when(col("side") === 1, 1)).as("n2"))
      val g = sdf.groupBy("v").agg(
        count(when(col("side") === 0, 1)).as("c1"),
        count(when(col("side") === 1, 1)).as("c2"))
      val wc = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val c = g.select(col("v"),
                       sum(col("c1")).over(wc).as("k1"),
                       sum(col("c2")).over(wc).as("k2"))
      val ks = c.crossJoin(broadcast(t))
        .agg(max(abs(col("k1") * lit(1.0) / col("n1")
                     - col("k2") * lit(1.0) / col("n2"))).as("ks"))
      val crit = lit(1.36) * sqrt((col("n1") + col("n2")) * lit(1.0)
                                  / (col("n1") * col("n2")))
      ks.crossJoin(broadcast(t))
        .select(col("n1").cast("long").as("n1"),
                col("n2").cast("long").as("n2"),
                Det.r6(col("ks")).as("ks_d"),
                Det.r6(crit).as("crit"),
                when(col("ks") > crit, 1L).otherwise(0L).as("is_drift"))
    },

    /** Per-nation Gini coefficient of customer spend — the inequality /
      * concentration metric (is revenue dominated by a few accounts?).
      * Spend is centi-quantized so the rank-weighted sums are EXACT
      * BIGINTs (Σi·xᵢ with i from a per-nation row_number window —
      * bounded by nation size, never corpus-wide), then
      * G = (2Σi·xᵢ − (n+1)Σxᵢ) / (n·Σxᵢ) rounds once. */
    OpDef(
      "q_agg_gini",
      """WITH sp AS (
        |  SELECT c.c_nationkey AS nation, c.c_custkey,
        |    CAST(floor(sum(o.o_totalprice) * 100.0 + 0.5) AS BIGINT) AS x
        |  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT nation, x,
        |    row_number() OVER (PARTITION BY nation
        |                       ORDER BY x ASC, c_custkey ASC) AS i
        |  FROM sp),
        |g AS (
        |  SELECT nation, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(i * x) AS BIGINT) AS six
        |  FROM r GROUP BY nation)
        |SELECT nation, CAST(n AS BIGINT) AS n_cust,
        |  floor(((2.0 * six - (n + 1.0) * sx) / (n * 1.0 * sx))
        |        * 1000000.0 + 0.5) / 1000000.0 AS gini
        |FROM g WHERE sx > 0 ORDER BY nation""".stripMargin
    ) { (s, d) =>
      val sp = customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey").as("nation"), col("c_custkey"))
        .agg(floor(sum(col("o_totalprice")) * lit(100.0) + lit(0.5))
               .cast("long").as("x"))
      val w = Window.partitionBy(col("nation"))
        .orderBy(col("x").asc, col("c_custkey").asc)
      val r = sp.withColumn("i", row_number().over(w))
      r.groupBy("nation")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("i") * col("x")).as("six"))
        .filter(col("sx") > 0)
        .select(col("nation"), col("n").cast("long").as("n_cust"),
          Det.r6((lit(2.0) * col("six") - (col("n") + lit(1.0)) * col("sx"))
                 / (col("n") * lit(1.0) * col("sx"))).as("gini"))
        .orderBy("nation")
    },

    /** Per-source ingestion freshness audit — the first page of every
      * pipeline dashboard: how far behind the most-recent record is each
      * source (event type), and which sources have gone quiet? One
      * bounded per-type aggregate + a 1-row global-max broadcast; lag is
      * exact integer µs → minutes (no float), stale = lag > 60 min. At
      * 100 TB the per-type max comes from partition-pruned metadata scans
      * — the query shape (bounded agg + scalar broadcast) is the same. */
    OpDef(
      "q_dq_freshness",
      """WITH g AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS gmax
        |           FROM events),
        |t AS (SELECT event_type, count(*) AS n,
        |             max(epoch_us(CAST(ts AS TIMESTAMP))) AS tmax
        |      FROM events GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST((gmax - tmax) // 60000000 AS BIGINT) AS lag_min,
        |  CAST(CASE WHEN gmax - tmax > 3600000000 THEN 1 ELSE 0 END
        |       AS BIGINT) AS is_stale
        |FROM t, g ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      val ev = events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      val g = ev.agg(max(col("us")).as("gmax"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), max(col("us")).as("tmax"))
        .crossJoin(broadcast(g))
        .select(col("event_type"), col("n_events"),
                expr("(gmax - tmax) div 60000000").as("lag_min"),
                when(col("gmax") - col("tmax") > lit(3600000000L), 1L)
                  .otherwise(0L).as("is_stale"))
        .orderBy("event_type")
    },

    /** Snapshot diff / CDC reconciliation — the "did the backfill change
      * anything it shouldn't have?" audit run between two versions of a
      * keyed aggregate: per-key full-outer join of the old snapshot
      * (orders before 1999) against the new (all orders), each key
      * classified added / changed / unchanged (removed is the fourth
      * class; append-only fixtures cannot produce it, a real CDC feed
      * can). Totals are centi-quantized BIGINT so equality is exact, not
      * float-fuzzy. One shuffle per side on the key, AQE broadcasts
      * whichever side is small; output is key-bounded. */
    OpDef(
      "q_dq_snapshot_diff",
      """WITH snap_old AS (
        |  SELECT o_custkey, count(*) AS n,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
        |  GROUP BY 1),
        |snap_new AS (
        |  SELECT o_custkey, count(*) AS n,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(snap_old.o_custkey, snap_new.o_custkey) AS custkey,
        |  CAST(coalesce(snap_old.n, 0) AS BIGINT) AS old_n,
        |  CAST(coalesce(snap_new.n, 0) AS BIGINT) AS new_n,
        |  coalesce(snap_old.cents, 0) AS old_cents,
        |  coalesce(snap_new.cents, 0) AS new_cents,
        |  CASE WHEN snap_old.o_custkey IS NULL THEN 'added'
        |       WHEN snap_new.o_custkey IS NULL THEN 'removed'
        |       WHEN snap_old.n = snap_new.n
        |            AND snap_old.cents = snap_new.cents THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM snap_old FULL JOIN snap_new
        |  ON snap_old.o_custkey = snap_new.o_custkey
        |ORDER BY custkey""".stripMargin
    ) { (s, d) =>
      def snap(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
             sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                 .cast("long")).cast("long").as("cents"))
      val old_ = snap(orders(s, d)
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp")))
        .select(col("o_custkey").as("ok"), col("n").as("old_n"),
                col("cents").as("old_cents"))
      val new_ = snap(orders(s, d))
        .select(col("o_custkey").as("nk"), col("n").as("new_n"),
                col("cents").as("new_cents"))
      old_.join(new_, col("ok") === col("nk"), "full")
        .select(
          coalesce(col("ok"), col("nk")).as("custkey"),
          coalesce(col("old_n"), lit(0L)).as("old_n"),
          coalesce(col("new_n"), lit(0L)).as("new_n"),
          coalesce(col("old_cents"), lit(0L)).as("old_cents"),
          coalesce(col("new_cents"), lit(0L)).as("new_cents"),
          when(col("ok").isNull, "added")
            .when(col("nk").isNull, "removed")
            .when(col("old_n") === col("new_n")
                  && col("old_cents") === col("new_cents"), "unchanged")
            .otherwise("changed").as("status"))
        .orderBy("custkey")
    },

    /** Robust location estimates — 10%-trimmed and winsorized mean of
      * order value per priority, the outlier-resistant KPI pair. Exact
      * per-group ranks define the cut points (lo = floor(n/10) dropped /
      * clamped on each side); all summation runs in BIGINT cents
      * (prices quantized once, up front) because a double sum's value
      * depends on accumulation order — the q_events_ltv discipline — and
      * only the final mean division happens in floating point.
      *
      * Scale shape: one rank window per priority (5 groups) + one
      * aggregate + a broadcast join of the 5-row boundary table back onto
      * the ranked rows for the winsor clamp. The exact global-rank sort
      * per group is the oracle-checkable baseline; at 100 TB the same
      * shape runs off approx-quantile cut points instead (q_agg_eqdepth's
      * broadcast-boundary pattern) without changing the downstream
      * arithmetic. */
    OpDef(
      "q_agg_trimmed",
      """WITH r AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |c AS (SELECT pri, CAST(n // 10 AS BIGINT) AS lo, n FROM r
        |      GROUP BY pri, n),
        |b AS (
        |  SELECT r.pri,
        |    max(CASE WHEN r.rn = c.lo + 1 THEN r.cents END) AS lo_cents,
        |    max(CASE WHEN r.rn = c.n - c.lo THEN r.cents END) AS hi_cents
        |  FROM r JOIN c ON r.pri = c.pri GROUP BY r.pri)
        |SELECT r.pri,
        |  CAST(max(c.n) AS BIGINT) AS n,
        |  floor((sum(CASE WHEN r.rn > c.lo AND r.rn <= c.n - c.lo
        |                  THEN r.cents END)
        |           / (100.0 * max(c.n - 2 * c.lo))) * 10000.0 + 0.5) / 10000.0
        |    AS trimmed_mean,
        |  floor((sum(greatest(least(r.cents, b.hi_cents), b.lo_cents))
        |           / (100.0 * max(c.n))) * 10000.0 + 0.5) / 10000.0
        |    AS winsor_mean
        |FROM r JOIN c ON r.pri = c.pri JOIN b ON r.pri = b.pri
        |GROUP BY r.pri
        |ORDER BY r.pri""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("pri"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val wn = Window.partitionBy(col("pri"))
      val r = orders(s, d)
        .select(col("o_orderpriority").as("pri"), col("o_totalprice"),
                col("o_orderkey"),
                floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                  .cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("lo", (col("n") / 10).cast("long"))
      val b = r.groupBy("pri")
        .agg(max(when(col("rn") === col("lo") + 1, col("cents"))).as("lo_cents"),
             max(when(col("rn") === col("n") - col("lo"), col("cents")))
               .as("hi_cents"))
      r.join(broadcast(b), Seq("pri"))
        .groupBy("pri")
        .agg(
          max(col("n")).as("n"),
          Det.r4(sum(when(col("rn") > col("lo")
                          && col("rn") <= col("n") - col("lo"), col("cents")))
                   / (lit(100.0) * max(col("n") - lit(2) * col("lo"))))
            .as("trimmed_mean"),
          Det.r4(sum(greatest(least(col("cents"), col("hi_cents")),
                              col("lo_cents")))
                   / (lit(100.0) * max(col("n")))).as("winsor_mean"))
        .orderBy("pri")
    },

    /** Point-in-time snapshot of the SCD2 dimension — the query half of
      * the q_scd2_build pair: the state valid AT a timestamp is the row
      * whose half-open [valid_from, valid_to) contains it (open latest row
      * = NULL valid_to). Same-day state changes collapse correctly: the
      * superseded row's valid_to equals its valid_from, so the interval is
      * empty and only the survivor matches. One window + a map-only
      * filter; at 100 TB the dim is partitioned by key and the filter
      * prunes on valid_from. */
    OpDef(
      "q_scd2_snapshot",
      """WITH dim AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS state_cents,
        |    o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, state_cents, valid_from
        |FROM dim
        |WHERE valid_from <= TIMESTAMP '1998-06-01'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '1998-06-01')
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val at = lit("1998-06-01").cast("timestamp")
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
                floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                  .cast("long").as("state_cents"),
                col("o_orderdate").as("valid_from"),
                lead(col("o_orderdate"), 1).over(w).as("valid_to"))
        .filter(col("valid_from") <= at
                && (col("valid_to").isNull || col("valid_to") > at))
        .select("o_custkey", "o_orderkey", "state_cents", "valid_from")
        .orderBy("o_custkey", "o_orderkey")
    },

    /** Tukey-fence outlier audit — per-event-type IQR bounds and the count
      * of values outside q1 − 1.5·IQR / q3 + 1.5·IQR. Quartiles are
      * type-1 (exact ranked elements, idx = ⌊(n−1)/4⌋+1 — no
      * interpolation, so no cross-engine float arithmetic), and the fence
      * comparison is scaled ×2 (2c < 2q1 − 3·IQR) so the whole predicate
      * stays in exact BIGINT cents. Complements the model-based screens
      * (q_win_zscore_roll, q_win_hampel, q_vec_outliers) with the
      * distribution-free battery a DQ gate runs first.
      *
      * Scale: one rank window per group + one aggregate; at 100 TB the
      * same fences come from approx quantiles (q_agg_eqdepth's broadcast
      * pattern) with this exact form as the auditable baseline. */
    OpDef(
      "q_dq_outlier_iqr",
      """WITH r AS (
        |  SELECT event_type AS flag,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value ASC, event_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |q AS (
        |  SELECT flag,
        |    max(CASE WHEN rn = (n - 1) // 4 + 1 THEN cents END) AS q1c,
        |    max(CASE WHEN rn = (3 * (n - 1)) // 4 + 1 THEN cents END) AS q3c
        |  FROM r GROUP BY flag)
        |SELECT r.flag, CAST(max(r.n) AS BIGINT) AS n,
        |  floor((max(q.q1c) / 100.0) * 10000.0 + 0.5) / 10000.0 AS q1,
        |  floor((max(q.q3c) / 100.0) * 10000.0 + 0.5) / 10000.0 AS q3,
        |  CAST(count(CASE WHEN 2 * r.cents < 2 * q.q1c - 3 * (q.q3c - q.q1c)
        |               OR 2 * r.cents > 2 * q.q3c + 3 * (q.q3c - q.q1c)
        |             THEN 1 END) AS BIGINT) AS n_outliers,
        |  floor((count(CASE WHEN 2 * r.cents < 2 * q.q1c - 3 * (q.q3c - q.q1c)
        |                 OR 2 * r.cents > 2 * q.q3c + 3 * (q.q3c - q.q1c)
        |               THEN 1 END) * 1.0 / max(r.n)) * 10000.0 + 0.5)
        |    / 10000.0 AS outlier_rate
        |FROM r JOIN q ON r.flag = q.flag
        |GROUP BY r.flag ORDER BY r.flag""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("flag"))
        .orderBy(col("value").asc, col("event_id").asc)
      val wn = Window.partitionBy(col("flag"))
      val r = events(s, d)
        .select(col("event_type").as("flag"),
                floor(col("value") * lit(100.0) + lit(0.5))
                  .cast("long").as("cents"),
                col("value"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
      val q = r.groupBy("flag")
        .agg(max(when(col("rn") === expr("(n - 1) div 4") + 1, col("cents")))
               .as("q1c"),
             max(when(col("rn") === expr("(3 * (n - 1)) div 4") + 1,
                      col("cents"))).as("q3c"))
      val out = col("cents") * 2 < col("q1c") * 2 - (col("q3c") - col("q1c")) * 3 ||
        col("cents") * 2 > col("q3c") * 2 + (col("q3c") - col("q1c")) * 3
      r.join(broadcast(q), Seq("flag"))
        .groupBy("flag")
        .agg(max(col("n")).as("n"),
             Det.r4(max(col("q1c")) / lit(100.0)).as("q1"),
             Det.r4(max(col("q3c")) / lit(100.0)).as("q3"),
             count(when(out, lit(1))).as("n_outliers"),
             Det.r4(count(when(out, lit(1))) * lit(1.0) / max(col("n")))
               .as("outlier_rate"))
        .orderBy("flag")
    },

    /** k-anonymity audit (k=5) over the customer quasi-identifier tuple
      * (nation, market segment, account-balance band) — the
      * re-identification screen run before releasing or training on
      * user-adjacent data: any QI group smaller than k means those
      * customers are distinguishable from fewer than k-1 others, and a
      * released row could be linked back to a person. Complements
      * q_scrub_pii (which masks DIRECT identifiers; this audits the
      * indirect ones that survive masking).
      *
      * The acctbal band (1000-wide floor) is the generalization step
      * that makes a continuous column auditable at all. One groupBy on
      * the QI tuple — group count bounded by the QI domain product, not
      * the corpus; partial aggregation collapses each group map-side. */
    OpDef(
      "q_dq_kanon",
      """WITH g AS (
        |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT nation, segment, bal_band, n, n < 5 AS risky
        |FROM g ORDER BY nation, segment, bal_band""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .groupBy(col("c_nationkey").as("nation"),
                 col("c_mktsegment").as("segment"),
                 floor(col("c_acctbal") / lit(1000.0)).cast("long")
                   .as("bal_band"))
        .agg(count(lit(1)).as("n"))
        .select(col("nation"), col("segment"), col("bal_band"), col("n"),
                (col("n") < 5).as("risky"))
        .orderBy("nation", "segment", "bal_band")
    },

    /** l-diversity audit (l=3) — k-anonymity's mandatory companion:
      * a QI class can be large (k-anonymous) yet still leak if every
      * member shares the SAME sensitive value (the homogeneity attack —
      * "all 50 people in this group bought the same segment"). Here the
      * QI is (nation, acctbal band) and the sensitive attribute is the
      * market segment; a class is risky when fewer than 3 distinct
      * segments appear. Entropy l-diversity is reported alongside via
      * the exact H = ln(n) − Σc·ln(c)/n identity (one aggregation pass,
      * no per-row p=c/n join; ≤5 summands per class, so float
      * accumulation order is harmless — the q_text_entropy precedent).
      *
      * Two stacked groupBys, both bounded by the QI × segment domain
      * product, never the corpus; partial aggregation collapses each
      * map-side. */
    OpDef(
      "q_dq_ldiv",
      """WITH c AS (
        |  SELECT c_nationkey AS nation,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS cnt
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT nation, bal_band, CAST(sum(cnt) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS l_distinct,
        |  floor((ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt))
        |        * 1000000.0 + 0.5) / 1000000.0 AS sens_entropy,
        |  count(*) < 3 AS risky
        |FROM c GROUP BY nation, bal_band
        |ORDER BY nation, bal_band""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .groupBy(col("c_nationkey").as("nation"),
                 floor(col("c_acctbal") / lit(1000.0)).cast("long")
                   .as("bal_band"),
                 col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("nation", "bal_band")
        .agg(sum(col("cnt")).cast("long").as("n"),
             count(lit(1)).cast("long").as("l_distinct"),
             Det.r6(log(sum(col("cnt")))
                      - sum(col("cnt") * log(col("cnt"))) / sum(col("cnt")))
               .as("sens_entropy"))
        .select(col("nation"), col("bal_band"), col("n"), col("l_distinct"),
                col("sens_entropy"), (col("l_distinct") < 3).as("risky"))
        .orderBy("nation", "bal_band")
    }
  )
}
