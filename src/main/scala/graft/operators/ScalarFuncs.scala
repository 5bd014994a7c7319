package graft.operators

import graft.{Dets, QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2.H — scalar function families, one query per family.
  *
  * All expressions are per-row and codegen'd (whole-stage), so values are
  * bit-identical across engines except transcendentals, which are rounded
  * to 4 dp. Cross-engine trap notes live next to each oracle (DuckDB
  * regexp_replace needs the 'g' flag, dayofweek is 0-based, CAST
  * double->int rounds instead of truncating, etc.).
  */
object ScalarFuncs extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String family.
    "q_fn_string" -> ((s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"), col("p_name"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        substring(col("p_name"), 1, 5).as("name5"),
        big(length(col("p_name"))).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("novowel"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        reverse(col("p_name")).as("rev_name"),
        // try_element_at: ANSI mode (Spark 4 default) makes plain
        // element_at THROW on a one-word name; oracle returns NULL.
        try_element_at(split(col("p_name"), " "), lit(2)).as("second_word"),
        lpad(col("p_brand"), 10, "*").as("pad_brand"),
        expr("replace(p_type, 'O', '0')").as("zeroed_type"),
        big(instr(col("p_name"), "a")).as("pos_a"),
        col("p_type").like("PRO%").as("is_promo"),
        big(levenshtein(col("p_brand"), lit("Brand#11"))).as("lev_b11"),
        trim(lpad(col("p_brand"), 12, " ")).as("trimmed"))
        .orderBy("p_partkey")),

    // Date/time family (o_orderdate is TIMESTAMP_NTZ; d = DATE view of it).
    "q_fn_date" -> ((s, dir) => {
      val d = col("o_orderdate").cast("date")
      Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderdate"),
        big(year(col("o_orderdate"))).as("yr"),
        big(month(col("o_orderdate"))).as("mo"),
        big(dayofmonth(col("o_orderdate"))).as("dom"),
        big(dayofweek(col("o_orderdate"))).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        big(datediff(lit("1998-01-01").cast("date"), d)).as("days_to_98"),
        add_months(d, 3).as("plus3m"),
        date_add(d, 30).as("plus30d"),
        last_day(d).as("eom"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("month_first"),
        expr("o_orderdate + INTERVAL 7 DAY").as("next_week"),
        expr("unix_timestamp(CAST(o_orderdate AS TIMESTAMP))").as("epoch_s"))
        .orderBy("o_orderkey")
    }),

    // Math family (supplier has negative balances).
    "q_fn_math" -> ((s, dir) =>
      Tables(s, dir, "supplier").select(
        col("s_suppkey"), col("s_acctbal"),
        round(col("s_acctbal"), 1).as("bal_r1"),
        // Banker's rounding on an exactly-representable .5: a 2-dp money
        // double like 8623.05 is NOT the decimal 8623.05, and Spark's
        // bround rounds the shortest decimal repr while DuckDB rounds the
        // binary value — they disagree on such pseudo-ties. x.5 is exact.
        bround(col("s_suppkey") + lit(0.5), 0).as("bank_round"),
        floor(col("s_acctbal")).as("fl"),
        ceil(col("s_acctbal")).as("ce"),
        abs(col("s_acctbal")).as("ab"),
        signum(col("s_acctbal")).as("sg"),
        big(pmod(col("s_suppkey"), lit(7L))).as("m7"),
        big(pmod(col("s_suppkey") - 500L, lit(7L))).as("m7_neg"),
        round(sqrt(abs(col("s_acctbal"))), 4).as("sqrt_ab"),
        round(pow(col("s_acctbal") / 1000.0, 2), 4).as("pow2"),
        round(exp(col("s_acctbal") / 10000.0), 4).as("exp_v"),
        round(log(abs(col("s_acctbal")) + 1.0), 4).as("ln_v"),
        round(log10(abs(col("s_acctbal")) + 1.0), 4).as("log10_v"),
        greatest(col("s_acctbal"), lit(0.0)).as("g0"),
        least(col("s_acctbal"), lit(0.0)).as("l0"))
        .orderBy("s_suppkey")),

    // Conditional family.
    "q_fn_cond" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("pending").as("status_word"),
        expr("CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 ELSE 9 END AS BIGINT)").as("prio_rank"),
        coalesce(expr("nullif(o_orderstatus, 'P')"), lit("was_p")).as("st_coal"),
        expr("ifnull(nullif(o_orderstatus, 'F'), 'was_f')").as("st_ifnull"),
        (col("o_totalprice") > 100000.0 && col("o_orderstatus") =!= "P").as("big_np"),
        (col("o_totalprice") > 400000.0 || col("o_orderpriority") === "1-URGENT").as("hot"))
        .orderBy("o_orderkey")),

    // Cast matrix. Note: Spark CAST(double AS BIGINT) truncates while
    // DuckDB rounds — both sides use floor() for the double->int path.
    "q_fn_cast" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_orderkey").cast("string").cast("bigint").as("key_roundtrip"),
        // decimal cast stays in-plan but is emitted as double: a raw
        // DECIMAL output column is the one type the driver's hash
        // canonicalization and DuckDB disagree on (round-1 ADVICE.md).
        money(col("o_totalprice")).cast("double").as("price_dbl"),
        money(col("o_totalprice")).cast("string").as("price_str"),
        floor(col("o_totalprice")).as("price_floor"),
        col("o_orderdate").cast("date").as("od_date"),
        col("o_orderdate").cast("date").cast("timestamp_ntz").as("od_midnight"),
        expr("try_cast(o_orderstatus AS INT)").as("st_int"),
        lit("1996-03-13").cast("date").as("const_date"))
        .orderBy("o_orderkey")),

    // Array / higher-order family over the 64-dim embeddings.
    "q_fn_array" -> ((s, dir) => {
      val vd = transform(col("embedding"), x => x.cast("double"))
      Tables(s, dir, "embeddings").select(
        col("vec_id"), col("label"),
        big(size(col("embedding"))).as("dim"),
        // direct element values stay UNROUNDED: a float cast to double is
        // the same dyadic rational in both engines, while round() can
        // disagree on its shortest-repr boundary (see q_text_quality note)
        try_element_at(vd, lit(1)).as("first_val"),
        round(aggregate(slice(vd, 1, 8), lit(0.0), (a, x) => a + x), 4).as("sum_first8"),
        big(size(filter(vd, _ > 0.0))).as("n_pos"),
        round(sqrt(aggregate(vd, lit(0.0), (a, x) => a + x * x)), 4).as("l2_norm"),
        try_element_at(array_sort(vd), lit(1)).as("min_val"),
        try_element_at(array_sort(vd), lit(64)).as("max_val"))
        .orderBy("vec_id")
    }),

    // Map family: build map(lang -> count) per source, emit scalars only.
    "q_fn_map" -> ((s, dir) => {
      val perLang = Tables(s, dir, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      perLang.groupBy("source")
        .agg(map_from_entries(collect_list(struct(col("lang"), col("cnt")))).as("m"))
        .select(col("source"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("langs"),
          // try_element_at: under ANSI mode element_at throws NO_SUCH_KEY
          // when a source has no docs in that lang; oracle yields 0.
          coalesce(try_element_at(col("m"), lit("en")), lit(0L)).as("n_en"),
          coalesce(try_element_at(col("m"), lit("zh")), lit(0L)).as("n_zh"),
          big(size(col("m"))).as("n_langs"))
        .orderBy("source")
    }),

    // JSON family: parse events.props two ways, aggregate the extracts.
    "q_fn_json" -> ((s, dir) =>
      Tables(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .withColumn("k2", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").cast("bigint"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          big(sum(col("k"))).as("sum_k"),
          (dbl(sum(col("k"))) / count(lit(1))).as("avg_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          big(sum(col("k2"))).as("sum_k2"))
        .orderBy("event_type")),

    // Hash family — synthetic _id generation (the reference's id-less
    // mode); only md5/sha2 are cross-engine.
    "q_fn_hash" -> ((s, dir) =>
      Tables(s, dir, "customer").select(
        col("c_custkey"),
        md5(col("c_name")).as("name_md5"),
        sha2(concat_ws("|", col("c_custkey"), col("c_name")), 256).as("id_sha"),
        substring(md5(col("c_name")), 1, 8).as("short_id"))
        .orderBy("c_custkey")),

    // Struct family — nested records built, navigated, and flattened
    // back to scalars (output stays flat: engines serialize struct
    // columns differently, so nested values are extracted, never
    // emitted raw).
    "q_fn_struct" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .withColumn("addr", struct(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment")))
        .withColumn("acct", struct(col("c_custkey").as("id"),
          struct(money(col("c_acctbal")).as("bal")).as("inner")))
        .select(col("c_custkey"),
          big(col("addr.nation")).as("nation"),
          col("addr.segment").as("segment"),
          dbl(col("acct.inner.bal")).as("bal"),
          (col("acct.id") % 2 === 0).as("even_id"))
        .orderBy("c_custkey")),

    // Bitwise family — routing-mask / bit-flag manipulation. The shifted
    // operand is bounded (mod 1024) so << can't overflow in either engine;
    // `^` is xor in Spark SQL but POWER in DuckDB (oracle uses xor()).
    "q_fn_bitwise" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        expr("o_orderkey & o_custkey").as("b_and"),
        expr("o_orderkey | o_custkey").as("b_or"),
        expr("o_orderkey ^ o_custkey").as("b_xor"),
        expr("~o_orderkey").as("b_not"),
        expr("shiftleft(o_orderkey % 1024, 3)").as("b_shl"),
        expr("shiftright(o_orderkey, 2)").as("b_shr"),
        big(expr("bit_count(o_custkey)")).as("n_bits"))
        .orderBy("o_orderkey")),

    // Regex family beyond q_fn_string's extract/replace basics — the
    // Hive-surface staples a log-parsing sync leans on: boolean rlike,
    // match counting, and multi-group capture. Patterns stay inside the
    // character-class/anchor/quantifier subset where Java regex (Spark)
    // and RE2 (DuckDB) agree; no backrefs, no lookaround.
    "q_fn_regex" -> ((s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)$", 1).cast("bigint")
          .as("brand_num"),
        regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)", 2).as("noun"),
        col("p_name").rlike("(widget|gear)$").as("is_widgetish"),
        big(regexp_count(col("p_name"), lit("[aeiou]+"))).as("n_vowel_runs"),
        regexp_replace(col("p_name"), "[aeiou]{2,}", "*").as("squeezed"))
        .orderBy("p_partkey")),

    // URL parsing — the web-corpus staple (crawl pipelines key dedup and
    // rate limits on host/path/params): parse_url (codegen'd built-in)
    // over URLs CONSTRUCTED from fixture fields, so the oracle can
    // certify the parse as the exact inverse of the construction (the
    // multimodal_header pattern, in strings). DuckDB has no parse_url —
    // its oracle rebuilds host/path/params from the same source fields.
    "q_fn_url" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), expr("CAST(doc_id AS STRING)"),
          lit("?lang="), col("lang"),
          lit("&page="), expr("CAST(n_chars % 10 AS STRING)")))
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"),
          expr("CAST(parse_url(url, 'QUERY', 'page') AS BIGINT)").as("q_page"))
        .orderBy("doc_id")),
  )

  def oracles: Map[String, String] = Map(
    // regexp_replace needs the 'g' flag (DuckDB replaces first-only by
    // default where Spark replaces all); rlike -> regexp_matches;
    // regexp_count -> len(regexp_extract_all).
    "q_fn_regex" -> ("SELECT p_partkey, " +
      "CAST(regexp_extract(p_brand, '([0-9]+)$', 1) AS BIGINT) AS brand_num, " +
      "regexp_extract(p_name, '^([a-z]+) ([a-z]+)', 2) AS noun, " +
      "regexp_matches(p_name, '(widget|gear)$') AS is_widgetish, " +
      "CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs, " +
      "regexp_replace(p_name, '[aeiou]{2,}', '*', 'g') AS squeezed " +
      "FROM part ORDER BY p_partkey"),

    // the parse must be the exact inverse of the construction — the
    // oracle rebuilds every component from the source fields directly
    "q_fn_url" -> ("SELECT doc_id, " +
      "'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR) || " +
      "'?lang=' || lang || '&page=' || CAST(n_chars % 10 AS VARCHAR) AS url, " +
      "source || '.example.com' AS host, " +
      "'/docs/' || CAST(doc_id AS VARCHAR) AS path, " +
      "lang AS q_lang, " +
      "CAST(n_chars % 10 AS BIGINT) AS q_page " +
      "FROM documents ORDER BY doc_id"),

    "q_fn_string" -> ("SELECT p_partkey, p_name, upper(p_name) AS up_name, " +
      "lower(p_brand) AS lo_brand, substr(p_name, 1, 5) AS name5, " +
      "length(p_name) AS name_len, concat_ws('/', p_brand, p_type) AS brand_type, " +
      "regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowel, " +
      "regexp_extract(p_name, '^(\\w+)', 1) AS first_word, " +
      "reverse(p_name) AS rev_name, " +
      "string_split(p_name, ' ')[2] AS second_word, " +
      "lpad(p_brand, 10, '*') AS pad_brand, " +
      "replace(p_type, 'O', '0') AS zeroed_type, " +
      "instr(p_name, 'a') AS pos_a, " +
      "(p_type LIKE 'PRO%') AS is_promo, " +
      "CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev_b11, " +
      "trim(lpad(p_brand, 12, ' ')) AS trimmed " +
      "FROM part ORDER BY p_partkey"),

    "q_fn_date" -> ("SELECT o_orderkey, o_orderdate, " +
      "CAST(year(o_orderdate) AS BIGINT) AS yr, " +
      "CAST(month(o_orderdate) AS BIGINT) AS mo, " +
      "CAST(day(o_orderdate) AS BIGINT) AS dom, " +
      "CAST(date_part('dow', o_orderdate) + 1 AS BIGINT) AS dow, " +
      "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, " +
      "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98, " +
      "CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m, " +
      "CAST(o_orderdate AS DATE) + 30 AS plus30d, " +
      "last_day(CAST(o_orderdate AS DATE)) AS eom, " +
      "make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_first, " +
      "o_orderdate + INTERVAL 7 DAY AS next_week, " +
      "CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s " +
      "FROM orders ORDER BY o_orderkey"),

    "q_fn_math" -> ("SELECT s_suppkey, s_acctbal, " +
      "round(s_acctbal, 1) AS bal_r1, " +
      "round_even(s_suppkey + 0.5, 0) AS bank_round, " +
      "CAST(floor(s_acctbal) AS BIGINT) AS fl, " +
      "CAST(ceil(s_acctbal) AS BIGINT) AS ce, " +
      "abs(s_acctbal) AS ab, " +
      "CAST(sign(s_acctbal) AS DOUBLE) AS sg, " +
      "s_suppkey % 7 AS m7, " +
      "((s_suppkey - 500) % 7 + 7) % 7 AS m7_neg, " +
      "round(sqrt(abs(s_acctbal)), 4) AS sqrt_ab, " +
      "round(pow(s_acctbal / 1000.0, 2), 4) AS pow2, " +
      "round(exp(s_acctbal / 10000.0), 4) AS exp_v, " +
      "round(ln(abs(s_acctbal) + 1.0), 4) AS ln_v, " +
      "round(log10(abs(s_acctbal) + 1.0), 4) AS log10_v, " +
      "greatest(s_acctbal, 0.0) AS g0, " +
      "least(s_acctbal, 0.0) AS l0 " +
      "FROM supplier ORDER BY s_suppkey"),

    "q_fn_cond" -> ("SELECT o_orderkey, " +
      "CASE WHEN o_orderstatus = 'F' THEN 'finished' WHEN o_orderstatus = 'O' THEN 'open' ELSE 'pending' END AS status_word, " +
      "CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 ELSE 9 END AS BIGINT) AS prio_rank, " +
      "coalesce(nullif(o_orderstatus, 'P'), 'was_p') AS st_coal, " +
      "ifnull(nullif(o_orderstatus, 'F'), 'was_f') AS st_ifnull, " +
      "(o_totalprice > 100000.0 AND o_orderstatus != 'P') AS big_np, " +
      "(o_totalprice > 400000.0 OR o_orderpriority = '1-URGENT') AS hot " +
      "FROM orders ORDER BY o_orderkey"),

    "q_fn_cast" -> ("SELECT o_orderkey, " +
      "CAST(o_orderkey AS VARCHAR) AS key_str, " +
      "CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip, " +
      "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dbl, " +
      "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str, " +
      "CAST(floor(o_totalprice) AS BIGINT) AS price_floor, " +
      "CAST(o_orderdate AS DATE) AS od_date, " +
      "CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS od_midnight, " +
      "TRY_CAST(o_orderstatus AS INTEGER) AS st_int, " +
      "DATE '1996-03-13' AS const_date " +
      "FROM orders ORDER BY o_orderkey"),

    "q_fn_array" -> ("SELECT vec_id, label, " +
      "len(embedding) AS dim, " +
      "CAST(embedding[1] AS DOUBLE) AS first_val, " +
      "round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 4) AS sum_first8, " +
      "len(list_filter(embedding, x -> x > 0.0)) AS n_pos, " +
      "round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm, " +
      "CAST(list_min(embedding) AS DOUBLE) AS min_val, " +
      "CAST(list_max(embedding) AS DOUBLE) AS max_val " +
      "FROM embeddings ORDER BY vec_id"),

    "q_fn_map" -> ("SELECT source, " +
      "string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs, " +
      "count(*) FILTER (WHERE lang = 'en') AS n_en, " +
      "count(*) FILTER (WHERE lang = 'zh') AS n_zh, " +
      "count(DISTINCT lang) AS n_langs " +
      "FROM documents GROUP BY source ORDER BY source"),

    "q_fn_json" -> ("SELECT event_type, count(*) AS n, " +
      "CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, " +
      "CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE) / count(*) AS avg_k, " +
      "min(CAST(props->>'$.k' AS BIGINT)) AS min_k, " +
      "max(CAST(props->>'$.k' AS BIGINT)) AS max_k, " +
      "CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k2 " +
      "FROM events GROUP BY event_type ORDER BY event_type"),

    "q_fn_hash" -> ("SELECT c_custkey, md5(c_name) AS name_md5, " +
      "sha256(concat_ws('|', c_custkey, c_name)) AS id_sha, " +
      "substr(md5(c_name), 1, 8) AS short_id " +
      "FROM customer ORDER BY c_custkey"),

    "q_fn_struct" -> ("SELECT c_custkey, " +
      "CAST((struct_pack(nation := c_nationkey, segment := c_mktsegment)).nation " +
      "AS BIGINT) AS nation, " +
      "(struct_pack(nation := c_nationkey, segment := c_mktsegment)).segment " +
      "AS segment, " +
      "CAST((struct_pack(id := c_custkey, inner_s := struct_pack(" +
      "bal := CAST(c_acctbal AS DECIMAL(12,2))))).inner_s.bal AS DOUBLE) AS bal, " +
      "((struct_pack(id := c_custkey, inner_s := struct_pack(" +
      "bal := CAST(c_acctbal AS DECIMAL(12,2))))).id % 2 = 0) AS even_id " +
      "FROM customer ORDER BY c_custkey"),

    "q_fn_bitwise" -> ("SELECT o_orderkey, " +
      "o_orderkey & o_custkey AS b_and, " +
      "o_orderkey | o_custkey AS b_or, " +
      "xor(o_orderkey, o_custkey) AS b_xor, " +
      "~o_orderkey AS b_not, " +
      "(o_orderkey % 1024) << 3 AS b_shl, " +
      "o_orderkey >> 2 AS b_shr, " +
      "CAST(bit_count(o_custkey) AS BIGINT) AS n_bits " +
      "FROM orders ORDER BY o_orderkey"),
  )
}
