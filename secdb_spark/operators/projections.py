"""§2.B — Projection / filter / predicate operators.

Reference semantics: plain SQL SELECT/WHERE over SQLite tables (the
reference delegates to SQLite's engine; mount empty — SURVEY §0/§2.B).
Spark-first notes: every query here compiles to a single WholeStageCodegen
stage with the predicate and projection pushed into the Parquet scan
(verified via .explain: PushedFilters + pruned ReadSchema) — zero shuffle,
so these scale linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register


@register(
    "prj_select",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS customer_name, c_mktsegment AS segment
    FROM customer
    """,
)
def prj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename — column pruning reaches the scan."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "prj_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def prj_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived columns; stays in codegen (no Python). No rounding: the same
    IEEE expression over identical inputs is bit-identical across engines —
    rounding would only ADD tie-break divergence (§4.4 lesson)."""
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charge"),
    )


@register(
    "prj_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS price_dec,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR) AS price_dec_str,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip
    FROM orders
    """,
)
def prj_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit casts: double->decimal (exact money per §1) shown via both a
    double round-trip and its exact string form, ts->date, str<->int.
    DATE and DECIMAL are stringified for comparison because pandas maps
    them differently per engine (datetime64 vs date obj; float vs Decimal)."""
    o = table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    return o.select(
        "o_orderkey",
        dec.cast("double").alias("price_dec"),
        dec.cast("string").alias("price_dec_str"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
    )


@register(
    "flt_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount <= 0.05) OR NOT (l_returnflag = 'N')
    """,
)
def flt_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/NOT predicate — pushed to the Parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.05)) | ~(
        F.col("l_returnflag") == "N"
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "flt_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def flt_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "flt_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1995-12-31 23:59:59'
      AND l_quantity BETWEEN 10 AND 20
    """,
)
def flt_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates incl. a date range — row-group pruning at scale."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1995-01-01 00:00:00", "1995-12-31 23:59:59")
        & F.col("l_quantity").between(10, 20)
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@register(
    "flt_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%ECO%' OR regexp_matches(p_name, '^[a-f]')
    """,
)
def flt_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regexp match (POSIX-common subset so Java and RE2 agree)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%ECO%") | F.col("p_name").rlike("^[a-f]")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "flt_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS is_masked
    FROM customer
    WHERE (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL
       OR c_acctbal > 5000
    """,
)
def flt_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL three-valued logic (testdata has no natural nulls —
    mask negatives to NULL first, then filter on nullness)."""
    c = table(spark, sf_dir, "customer")
    masked = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return (
        c.select(
            "c_custkey",
            masked.alias("bal_or_null"),
            masked.isNull().alias("is_masked"),
        )
        .filter(F.col("bal_or_null").isNull() | (F.col("c_acctbal") > 5000))
    )


@register(
    "cond_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
                WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS size_class,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END AS status_word
    FROM orders
    """,
)
def cond_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladder + simple CASE."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
    )
