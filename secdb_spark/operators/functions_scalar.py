"""§2.H — Scalar functions: string / date / math / array / map / json.

Reference semantics: SQLite's scalar SQL functions + Python ETL string
handling (mount empty — SURVEY §2.H). All ops here are per-row expressions
that stay inside WholeStageCodegen — zero shuffle, scale linearly.

Cross-engine notes baked into each oracle:
- regex: POSIX-common subset (Java regex vs DuckDB RE2 agree);
- day-of-week: via date_format 'EEEE'/dayname (numbering differs);
- transcendental fns (ln/log10) round(.,6): libm vs java.lang.Math may
  differ in the last ulp; sqrt is IEEE-correctly-rounded so it's exact;
- months_between has no DuckDB twin -> calendar month diff formulation;
- array fns: DuckDB lists are 1-indexed (slice/element) — offsets adjusted;
- map lookups returned as scalars (pandas MAP dtype mapping differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register


@register(
    "fn_str_basic",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 10, 5) AS name_mid,
           length(c_name) AS name_len,
           trim(concat('  ', c_name, '  ')) AS name_trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key
    FROM customer
    """,
)
def fn_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/upper/lower/substring/length/trim/lpad (1-based substr both)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
    )


@register(
    "fn_str_regex",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, '^(small|large)') AS sized
    FROM part
    """,
)
def fn_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / regexp_extract / regexp_replace / rlike (common regex subset).
    NOTE: Spark regexp_replace is global by default; DuckDB needs the 'g'
    flag — a classic cross-dialect trap, handled in the oracle."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("^(small|large)").alias("sized"),
    )


@register(
    "fn_str_search",
    oracle="""
    SELECT p_partkey, p_name,
           strpos(p_name, 'gear') AS gear_pos,
           translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
           starts_with(p_name, 'small') AS is_small,
           contains(p_name, 'widget') AS has_widget
    FROM part
    """,
)
def fn_str_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """instr/position, translate, startswith, contains (1-based, 0=missing)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        F.instr("p_name", "gear").alias("gear_pos"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.col("p_name").contains("widget").alias("has_widget"),
    )


@register(
    "fn_date_extract",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           dayname(o_orderdate) AS dow_name,
           CAST(strftime(o_orderdate, '%j') AS INT) AS doy
    FROM orders
    """,
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar part extraction. Day-of-week via NAME (numbering differs:
    Spark dayofweek Sun=1, DuckDB dow Sun=0 — §4.4 rule 7)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format("o_orderdate", "EEEE").alias("dow_name"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@register(
    "fn_date_trunc",
    oracle="""
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           date_trunc('day', l_shipdate) AS ship_day,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation to month/day — the batch tumbling-window primitive."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.date_trunc("month", "l_shipdate").alias("ship_month"),
            F.date_trunc("day", "l_shipdate").alias("ship_day"),
        )
        .groupBy("ship_month", "ship_day")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           (2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS months_to_2002,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_add / datediff / month-diff / last_day. months_between has no
    DuckDB twin -> expressed as calendar month difference both sides.
    DATE outputs stringified: pandas maps them differently per engine
    (datetime64 midnight vs date object)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).cast("string").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        ((2002 - F.year(d)) * 12 + (1 - F.month(d))).alias("months_to_2002"),
        F.last_day(d).cast("string").alias("month_end"),
    )


@register(
    "fn_ts_convert",
    oracle="""
    SELECT event_id,
           epoch_us(ts) // 1000000 AS epoch_sec,
           epoch_us(ts) AS epoch_us,
           make_timestamp(epoch_us(ts)) AS ts_roundtrip,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_formatted,
           CAST(strptime('2024-06-01 12:00:00', '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS parsed_ts
    FROM events
    """,
)
def fn_ts_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch round-trips + format/parse (UTC session pinned in session.py)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_sec"),
        F.unix_micros("ts").alias("epoch_us"),
        F.timestamp_micros(F.unix_micros("ts")).alias("ts_roundtrip"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_formatted"),
        F.to_timestamp(F.lit("2024-06-01 12:00:00"), "yyyy-MM-dd HH:mm:ss").alias("parsed_ts"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS dist_from_25,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           mod(CAST(l_quantity AS BIGINT), 7) AS qty_mod7,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS sign_dist,
           power(l_quantity, 2) AS qty_sq
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions. sqrt/abs/ceil/floor/mod/sign/x^2 are IEEE-exact ->
    unrounded; ln/log10 are libm-dependent -> round(.,6) (§4.4)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("dist_from_25"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.pmod(F.col("l_quantity").cast("bigint"), F.lit(7)).alias("qty_mod7"),
        F.signum(F.col("l_quantity") - 25).alias("sign_dist"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
    )


@register(
    "fn_null",
    oracle="""
    SELECT c_custkey,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, -1) AS bal_or_neg1,
           nullif(c_mktsegment, 'BUILDING') AS seg_nullif,
           greatest(c_acctbal, 0) AS bal_floor0,
           least(c_acctbal, 1000) AS bal_cap1000
    FROM customer
    """,
)
def fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least."""
    c = table(spark, sf_dir, "customer")
    masked = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(masked, F.lit(-1.0)).alias("bal_or_neg1"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullif"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1000"),
    )


@register(
    "fn_arr_basic",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5_vocab,
           len(list_distinct(string_split(text, ' '))) AS n_vocab
    FROM documents
    """,
)
def fn_arr_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construct/size/contains/distinct/sort/slice over doc tokens."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), ",").alias(
            "first5_vocab"
        ),
        F.size(F.array_distinct(toks)).alias("n_vocab"),
    )


@register(
    "fn_arr_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents
    """,
)
def fn_arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->N row expansion (tokenization explode)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))


@register(
    "fn_arr_hof",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(string_split(text, ' ')[1:8], t -> upper(t)), ',') AS first8_upper,
           len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS n_long_tokens,
           list_aggregate(list_transform(string_split(text, ' '), t -> length(t)),
                          'sum')::BIGINT AS total_chars
    FROM documents
    """,
)
def fn_arr_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array fns: transform / filter / aggregate(fold).
    PERF NOTE (SURVEY §6): Catalyst does NOT CSE repeated HOF expressions;
    here the split() appears once per output column only — never repeat a
    HOF result inside ORDER BY/WHERE, materialize it as a column first."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(F.transform(F.slice(toks, 1, 8), lambda t: F.upper(t)), ",").alias(
            "first8_upper"
        ),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT doc_id,
           map(['lang', 'source'], [lang, source])['lang'][1] AS lang_val,
           cardinality(map(['lang', 'source'], [lang, source])) AS n_keys,
           array_to_string(map_keys(map(['lang', 'source'], [lang, source])), ',') AS keys_csv
    FROM documents
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build/keys/lookup (XBRL dimension-map model, SURVEY §1.1) —
    results surfaced as scalars because pandas MAP dtypes differ per
    engine."""
    d = table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        m.getItem("lang").alias("lang_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (string JSON column)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )
