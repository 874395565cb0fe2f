package graft.ops

import org.apache.spark.sql.functions._

/** §2.8 — scalar function surface, one composite query per family. Every
  * expression here is a codegen'd built-in (`org.apache.spark.sql.functions`),
  * never a Scala UDF — the whole projection stays inside one
  * WholeStageCodegen span over the parquet scan.
  *
  * Cross-engine notes baked into the oracle SQL (verified against DuckDB
  * 1.0 this session): DuckDB `length/strpos/year/...` return BIGINT where
  * Spark returns INT (both sides cast to BIGINT); DuckDB `dayofweek` is
  * Sunday=0 vs Spark's Sunday=1; DuckDB `regexp_replace` needs the 'g'
  * flag to replace all; DuckDB CAST(double AS BIGINT) rounds where Spark
  * truncates (oracle goes through trunc()); DuckDB `epoch` returns DOUBLE;
  * DuckDB `sign` returns TINYINT.
  */
object Functions {
  import Tables._

  val ops: Seq[OpDef] = Seq(

    OpDef(
      "q_fn_string",
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_type) AS lo,
        |  trim(concat('  ', p_name, '  ')) AS trimmed,
        |  ltrim(concat('xx', p_name), 'x') AS ltrimmed,
        |  rtrim(concat(p_name, 'xx'), 'x') AS rtrimmed,
        |  substring(p_name, 1, 4) AS sub4,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  concat_ws('-', p_brand, p_type) AS joined,
        |  lpad(p_brand, 12, '*') AS lpadded,
        |  rpad(p_brand, 12, '*') AS rpadded,
        |  replace(p_name, ' ', '_') AS replaced,
        |  string_split(p_name, ' ')[1] AS first_tok,
        |  regexp_extract(p_type, '([A-Z]+)', 1) AS rex,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
        |  CAST(strpos(p_name, 'o') AS BIGINT) AS o_pos
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"), lower(col("p_type")).as("lo"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        ltrim(concat(lit("xx"), col("p_name")), "x").as("ltrimmed"),
        rtrim(concat(col("p_name"), lit("xx")), "x").as("rtrimmed"),
        substring(col("p_name"), 1, 4).as("sub4"),
        length(col("p_name")).cast("long").as("len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
        lpad(col("p_brand"), 12, "*").as("lpadded"),
        rpad(col("p_brand"), 12, "*").as("rpadded"),
        regexp_replace(col("p_name"), " ", "_").as("replaced"),
        element_at(split(col("p_name"), " "), 1).as("first_tok"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("rex"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
        instr(col("p_name"), "o").cast("long").as("o_pos"))
        .orderBy("p_partkey")
    },

    OpDef(
      "q_fn_date",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |    AS days_since_95,
        |  CAST(trunc(epoch(o_orderdate)) AS BIGINT) AS unix_sec,
        |  make_date(2020, CAST(month(o_orderdate) AS INTEGER), 15) AS mid_month_2020,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        to_date(col("o_orderdate")).as("od"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"),
        unix_timestamp(col("o_orderdate")).as("unix_sec"),
        make_date(lit(2020), month(col("o_orderdate")), lit(15)).as("mid_month_2020"),
        last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")
    },

    OpDef(
      "q_fn_math",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.04) AS absdev,
        |  CAST(trunc(ceil(l_extendedprice)) AS BIGINT) AS ceilp,
        |  CAST(trunc(floor(l_extendedprice)) AS BIGINT) AS floorp,
        |  sqrt(l_quantity) AS sqrtq,
        |  pow(l_quantity, 2) AS q2,
        |  floor((exp(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS expd,
        |  floor((ln(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS lnq,
        |  floor((log10(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS log10p,
        |  CAST(((l_partkey - 10) % 7 + 7) % 7 AS BIGINT) AS pm7,
        |  CAST(sign(l_discount - 0.04) AS INTEGER) AS sg,
        |  greatest(l_quantity, l_discount * 100, 25.0) AS gr,
        |  least(l_quantity, l_discount * 100, 25.0) AS le
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.04).as("absdev"),
        ceil(col("l_extendedprice")).as("ceilp"),
        floor(col("l_extendedprice")).as("floorp"),
        sqrt(col("l_quantity")).as("sqrtq"),
        pow(col("l_quantity"), 2).as("q2"),
        Det.r6(exp(col("l_discount"))).as("expd"),
        Det.r6(log(col("l_quantity"))).as("lnq"),
        Det.r6(log10(col("l_extendedprice"))).as("log10p"),
        pmod(col("l_partkey") - 10, lit(7)).cast("long").as("pm7"),
        signum(col("l_discount") - 0.04).cast("int").as("sg"),
        greatest(col("l_quantity"), col("l_discount") * 100, lit(25.0)).as("gr"),
        least(col("l_quantity"), col("l_discount") * 100, lit(25.0)).as("le"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    OpDef(
      "q_fn_cond",
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  coalesce(nullif(o_orderpriority, '5-LOW'), 'relaxed') AS pri_or,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) AS key_dbl,
        |  CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS pri_num,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
          .as("status_or_open"),
        nvl(nullif(col("o_orderpriority"), lit("5-LOW")), lit("relaxed"))
          .as("pri_or"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_totalprice").cast("long").as("price_int"),
        col("o_orderkey").cast("string").cast("double").as("key_dbl"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("pri_num"),
        to_date(col("o_orderdate")).cast("string").as("date_str"))
        .orderBy("o_orderkey")
    },

    OpDef(
      "q_fn_array",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |  list_contains(string_split(text, ' '), 'data') AS has_data,
        |  coalesce(array_to_string(
        |    list_sort(list_distinct(string_split(text, ' '))), ' '), '')
        |    AS sorted_uniq,
        |  coalesce(array_to_string(
        |    list_slice(list_sort(string_split(text, ' ')), 1, 3), ' '), '')
        |    AS first3,
        |  coalesce(array_to_string(list_transform(
        |    list_slice(list_sort(string_split(text, ' ')), 1, 3),
        |    x -> upper(x)), ' '), '') AS first3_up,
        |  coalesce(array_to_string(
        |    list_sort(list_filter(list_distinct(string_split(text, ' ')),
        |                          x -> length(x) > 5)), ' '), '')
        |    AS longtoks_uniq,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |                               x -> length(x))) AS BIGINT) AS tok_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // the array ops (sort/distinct/slice/transform/filter/aggregate) are
      // the exercise; the final projection serializes every array to a
      // scalar string — oracle-checked outputs must be scalar-only (the
      // comparator can't hash arrays)
      val toks = split(col("text"), " ")
      documents(s, d).select(
        col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        array_contains(toks, "data").as("has_data"),
        array_join(sort_array(array_distinct(toks)), " ").as("sorted_uniq"),
        array_join(slice(sort_array(toks), 1, 3), " ").as("first3"),
        array_join(transform(slice(sort_array(toks), 1, 3), x => upper(x)), " ")
          .as("first3_up"),
        array_join(sort_array(filter(array_distinct(toks), x => length(x) > 5)), " ")
          .as("longtoks_uniq"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("tok_chars"))
        .orderBy("doc_id")
    },

    OpDef(
      "q_fn_bitwise",
      """SELECT event_id,
        |  event_id & 255 AS band,
        |  event_id | 4096 AS bor,
        |  xor(event_id, user_id) AS bxor,
        |  (event_id << 2) AS shl,
        |  (event_id >> 3) AS shr,
        |  CAST(bit_count(event_id) AS INTEGER) AS popcnt
        |FROM events
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      events(s, d).select(
        col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("band"),
        col("event_id").bitwiseOR(lit(4096L)).as("bor"),
        col("event_id").bitwiseXOR(col("user_id")).as("bxor"),
        expr("shiftleft(event_id, 2)").as("shl"),
        expr("shiftright(event_id, 3)").as("shr"),
        bit_count(col("event_id")).cast("int").as("popcnt"))
        .orderBy("event_id")
    },

    OpDef(
      "q_fn_date2",
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  CAST((CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH) AS DATE) AS plus3m,
        |  CAST(date_trunc('year', o_orderdate) AS DATE) AS year_start,
        |  CAST(hour(o_orderdate) AS BIGINT) AS h,
        |  CAST(greatest(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01'), 0)
        |       AS BIGINT) AS days_to_y2k
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
        trunc(col("o_orderdate"), "year").as("year_start"),
        hour(col("o_orderdate")).cast("long").as("h"),
        greatest(datediff(lit("2000-01-01").cast("date"),
                          to_date(col("o_orderdate"))), lit(0))
          .cast("long").as("days_to_y2k"))
        .orderBy("o_orderkey")
    },

    OpDef(
      "q_fn_map",
      """SELECT event_id,
        |  coalesce(array_to_string(json_keys(props), ','), '') AS ks,
        |  coalesce(array_to_string(
        |    [CAST(json_extract_string(props, '$.k') AS INTEGER)], ','), '') AS vs,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      // map_keys/map_values are the exercise; the projection joins them to
      // scalar strings (oracle-checked outputs must be scalar-only)
      val m = from_json(col("props"), lit("MAP<STRING, INT>"))
      events(s, d).select(
        col("event_id"),
        array_join(map_keys(m), ",").as("ks"),
        array_join(transform(map_values(m), v => v.cast("string")), ",").as("vs"),
        element_at(m, "k").as("k_val"))
        .orderBy("event_id")
    },

    OpDef(
      "q_fn_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled
        |FROM events
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_int"),
        (from_json(col("props"), lit("k INT")).getField("k") * 2).as("k_doubled"))
        .orderBy("event_id")
    },

    /** Regex function family: extract / extract-all count / replace-all /
      * match test. All codegen'd string expressions — map-only. The
      * patterns stay in the ASCII subset where Java's regex (Spark) and
      * RE2 (DuckDB) agree; note DuckDB's regexp_replace needs the
      * explicit 'g' flag to match Spark's replace-ALL default. */
    OpDef(
      "q_fn_regex",
      """SELECT doc_id,
        |  regexp_extract(text, '^([a-z]+)', 1) AS first_word,
        |  CAST(len(regexp_extract_all(text, 'data')) AS BIGINT) AS n_data,
        |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
        |    AS len_novowel,
        |  CAST(regexp_matches(text, 'merge [a-z]+ sort') AS BIGINT)
        |    AS has_pattern
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
        size(expr("regexp_extract_all(text, 'data', 0)")).cast("long")
          .as("n_data"),
        length(regexp_replace(col("text"), "[aeiou]", ""))
          .cast("long").as("len_novowel"),
        col("text").rlike("merge [a-z]+ sort").cast("long").as("has_pattern"))
        .orderBy("doc_id")
    },

    /** URL function family over deterministically constructed crawl-style
      * URLs (the fixture has no URL column, so the op builds one from
      * source/doc_id/lang — the extraction surface is what's under test):
      * protocol / host / path / query / per-key query-param extraction,
      * all via Spark's codegen'd `parse_url`. DuckDB has no parse_url, so
      * the oracle spells the identical extractions as RE2 regexes —
      * equality on well-formed URLs is exactly the contract. Map-only. */
    OpDef(
      "q_fn_url",
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/docs/' || doc_id ||
        |    '?lang=' || lang || '&ref=' || (doc_id % 7) AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS proto,
        |  regexp_extract(url, '^[a-z]+://([^/?]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?]+([^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS query,
        |  regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang,
        |  regexp_extract(url, '[?&]ref=([^&]*)', 1) AS q_ref,
        |  string_split(regexp_extract(url, '^[a-z]+://([^/?]+)', 1), '.')[2]
        |    AS domain
        |FROM u ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val url = concat(lit("https://"), col("source"), lit(".example.com/docs/"),
        col("doc_id"), lit("?lang="), col("lang"), lit("&ref="),
        col("doc_id") % 7)
      documents(s, d).select(col("doc_id"), url.as("url"))
        .select(
          col("doc_id"), col("url"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("q_lang"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("q_ref"),
          element_at(split(parse_url(col("url"), lit("HOST")), "\\."), 2)
            .as("domain"))
        .orderBy("doc_id")
    },

    /** Error-safe ("try") function family — ANSI-mode error handling as
      * data: division by zero, unparseable casts, invalid calendar dates
      * and out-of-bounds element access all yield NULL instead of failing
      * the job (the semantics a 100 TB batch needs — one malformed row
      * must never kill a 10-hour job). Spark's try_* builtins map to
      * DuckDB TRY_CAST / nullif-guarded division / native NULL-on-OOB
      * list indexing; each column mixes success and failure rows so both
      * paths are hash-verified. Map-only, whole-stage codegen. */
    OpDef(
      "q_fn_try",
      """SELECT doc_id,
        |  floor((n_chars / nullif(doc_id % 5, 0)) * 10000.0 + 0.5) / 10000.0
        |    AS safe_div,
        |  TRY_CAST(CASE WHEN doc_id % 7 = 0 THEN CAST(doc_id AS VARCHAR)
        |                ELSE string_split(text, ' ')[1] END AS INTEGER)
        |    AS maybe_num,
        |  TRY_CAST('2024-01-' || lpad(CAST(doc_id % 40 AS VARCHAR), 2, '0')
        |           AS TIMESTAMP) AS ts_parsed,
        |  string_split(text, ' ')[75] AS tok75
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      documents(s, d).select(
          col("doc_id"),
          Det.r4(expr("try_divide(n_chars, doc_id % 5)")).as("safe_div"),
          expr("try_cast(CASE WHEN doc_id % 7 = 0 THEN CAST(doc_id AS STRING)" +
               " ELSE split(text, ' ')[0] END AS INT)").as("maybe_num"),
          expr("try_to_timestamp(concat('2024-01-', " +
               "lpad(CAST(doc_id % 40 AS STRING), 2, '0')))").as("ts_parsed"),
          expr("try_element_at(split(text, ' '), 75)").as("tok75"))
        .orderBy("doc_id")
    },

    /** Higher-order-function family beyond q_fn_array's basics: lambda
      * fold (aggregate), existential / universal predicates, nested-array
      * flatten and sequence folding — the in-row compute surface that
      * keeps per-element logic inside whole-stage codegen instead of a
      * UDF or an explode→groupBy round trip. DuckDB lacks an initial-
      * value fold, so the oracle spells aggregate as
      * list_reduce(list_prepend(0, ...)) — same left fold, same values. */
    OpDef(
      "q_fn_hof",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(list_reduce(list_prepend(0, list_transform(toks,
        |         x -> length(x))), (a, b) -> a + b) AS BIGINT) AS fold_chars,
        |  len(list_filter(toks, x -> length(x) > 7)) > 0 AS has_long,
        |  len(list_filter(toks, x -> length(x) >= 10)) = 0 AS all_short,
        |  CAST(len(flatten([toks[1:3], toks[-3:]])) AS BIGINT) AS ends_len,
        |  CAST(list_reduce(list_prepend(0,
        |         range(1, CAST(doc_id % 10 AS BIGINT) + 2)),
        |         (a, b) -> a + b) AS BIGINT) AS tri_sum
        |FROM t ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          expr("CAST(aggregate(transform(toks, x -> length(x)), 0, " +
               "(a, b) -> a + b) AS BIGINT)").as("fold_chars"),
          expr("exists(toks, x -> length(x) > 7)").as("has_long"),
          expr("forall(toks, x -> length(x) < 10)").as("all_short"),
          expr("CAST(size(flatten(array(slice(toks, 1, 3), " +
               "slice(toks, -3, 3)))) AS BIGINT)").as("ends_len"),
          expr("CAST(aggregate(sequence(1L, doc_id % 10 + 1), 0L, " +
               "(a, b) -> a + b) AS BIGINT)").as("tri_sum"))
        .orderBy("doc_id")
    }
  )
}
