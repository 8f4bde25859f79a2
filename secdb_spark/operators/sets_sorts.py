"""§2.F/§2.G — Sorts, top-k, and set operations.

Reference semantics: SQL ORDER BY / LIMIT / UNION / INTERSECT / EXCEPT
(SQLite; mount empty — SURVEY §2.F/G).
Spark-first notes: a global ORDER BY is a range-partitioned shuffle
(sampled split points) — fine for final presentation, never as a mid-plan
step at scale. Global top-k compiles to TakeOrderedAndProject: per-
partition heaps of size k, then a k-merge on the driver — no full sort.
Set ops with DISTINCT semantics are hash aggregations on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin


@register(
    "sort_multi",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total order (tie-safe: PK appended)."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    )


@register(
    "sort_nulls",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
    FROM customer
    ORDER BY bal ASC NULLS LAST, c_custkey
    """,
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST/LAST control (negatives masked to null to create them)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    ).orderBy(F.col("bal").asc_nulls_last(), F.col("c_custkey"))


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 — TakeOrderedAndProject (per-partition heap + driver
    merge; no full shuffle even at 100 TB). Tie-safe ordering."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS side
    FROM customer
    UNION ALL
    SELECT s_nationkey, s_acctbal, 'supplier' FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (no dedup) — zero-shuffle concatenation of partitions."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("side"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return c.unionByName(s)


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union (hash-dedup after concat)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct intersection (nations having both customers and suppliers)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct difference: nations with customers but no high-balance
    supplier (the unfiltered difference is vacuously EMPTY at sf>=0.01 —
    suppliers cover every nation — which would make the oracle check
    trivial; the filter keeps a real difference at every scale)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@register(
    "set_bag_ops",
    oracle="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
    SELECT 'intersect_all' AS op, k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'except_all', k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    """,
)
def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL / EXCEPT ALL (duplicate-count semantics)."""
    li = table(spark, sf_dir, "lineitem")
    # pinned: each side feeds BOTH bag ops — un-pinned intersectAll and
    # exceptAll each re-scanned the fact table (plan-audit, SCALE.md §50).
    a = pin(li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k")))
    b = pin(li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k")))
    inter = a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "k")
    exc = a.exceptAll(b).select(F.lit("except_all").alias("op"), "k")
    return inter.unionByName(exc)
