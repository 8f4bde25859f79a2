"""Round-7 additions, batch 37 — weekend lift, dedup token savings,
join-strategy hint surface.

Reference semantics: SURVEY §2 extension policy (mount empty).
weekend_lift is the day-type normalization behind every "is weekend
traffic different" readout; dedup_savings_report prices exact dedup in
the currency that matters for LLM training (tokens removed, per source);
join_hint_merge exercises Spark's join-strategy HINT surface (MERGE) the
way join_broadcast exercises BROADCAST — the result is plain SQL, the
plan pin is the product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import r4


# ---------------------------------------------------------------------------
# weekend_lift — per-day event rate, weekend vs weekday
# ---------------------------------------------------------------------------

@register(
    "weekend_lift",
    oracle="""
    WITH days AS (
      SELECT CAST(sum(CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_we_days,
             CAST(sum(CASE WHEN isodow(d) < 6 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wd_days
      FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
    ), counts AS (
      SELECT event_type,
             CAST(sum(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_we,
             CAST(sum(CASE WHEN isodow(CAST(ts AS DATE)) < 6
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_wd
      FROM events GROUP BY 1
    )
    SELECT c.event_type, c.n_we AS weekend_events, c.n_wd AS weekday_events,
           round(CAST(c.n_we AS DOUBLE) / d.n_we_days, 4)
             AS weekend_daily_rate,
           round(CAST(c.n_wd AS DOUBLE) / d.n_wd_days, 4)
             AS weekday_daily_rate,
           round((CAST(c.n_we AS DOUBLE) / d.n_we_days)
                 / (CAST(c.n_wd AS DOUBLE) / d.n_wd_days), 4) AS lift
    FROM counts c CROSS JOIN days d
    """,
)
def weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend lift per event type: events per WEEKEND DAY over events
    per WEEKDAY — normalized by how many of each day type the corpus
    actually contains (the raw 2:5 volume split lies whenever the data
    window is partial weeks).  Day classification uses ISO weekday
    (Mon=1..Sun=7; Spark `weekday()`+1 ≡ DuckDB `isodow()` — probed,
    since the engines' default dayofweek disagree on Sunday).  One
    combinable conditional aggregate over the scan + a distinct-days
    aggregate re-entering as a one-row broadcast."""
    ev = table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    isodow = F.weekday(d) + 1
    days = (
        ev.select(d.alias("d"))
        .distinct()
        .agg(
            F.sum(F.when(F.weekday("d") + 1 >= 6, 1).otherwise(0))
            .cast("long").alias("n_we_days"),
            F.sum(F.when(F.weekday("d") + 1 < 6, 1).otherwise(0))
            .cast("long").alias("n_wd_days"),
        )
    )
    counts = ev.groupBy("event_type").agg(
        F.sum(F.when(isodow >= 6, 1).otherwise(0))
        .cast("long").alias("weekend_events"),
        F.sum(F.when(isodow < 6, 1).otherwise(0))
        .cast("long").alias("weekday_events"),
    )
    we_rate = F.col("weekend_events").cast("double") / F.col("n_we_days")
    wd_rate = F.col("weekday_events").cast("double") / F.col("n_wd_days")
    return counts.crossJoin(F.broadcast(days)).select(
        "event_type",
        "weekend_events",
        "weekday_events",
        r4(we_rate).alias("weekend_daily_rate"),
        r4(wd_rate).alias("weekday_daily_rate"),
        r4(we_rate / wd_rate).alias("lift"),
    )


# ---------------------------------------------------------------------------
# dedup_savings_report — what exact dedup buys, in tokens, per source
# ---------------------------------------------------------------------------

@register(
    "dedup_savings_report",
    oracle="""
    WITH docs AS (
      SELECT doc_id, source, sha256(text) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), keepers AS (
      SELECT h, min(doc_id) AS keeper FROM docs GROUP BY h
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_docs,
           CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN d.n_tokens
                         ELSE 0 END) AS BIGINT) AS dup_tokens,
           round(CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN d.n_tokens
                              ELSE 0 END) AS DOUBLE) / sum(d.n_tokens), 4)
             AS savings_ratio
    FROM docs d JOIN keepers k ON d.h = k.h
    GROUP BY 1
    """,
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What exact dedup is WORTH, in the currency a training-data owner
    budgets in: tokens.  Rides dedup_exact's certified convention
    (sha256 content hash, min-doc_id keeper) and attributes every
    non-keeper copy's tokens to the SOURCE THAT CONTRIBUTED THE COPY —
    the table that settles "which feed is paying us in duplicates"
    before anyone tunes mixer weights (mix_unique_mass answers
    ownership; this answers cost).  One scan computes hash + token
    count; the keeper table re-aggregates the same hash key (exchange
    reuse) and joins back co-located on h — no second text scan, no
    token explode (len(split) is a scalar)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.sha2("text", 256).alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    keepers = d.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    dup = F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
    dup_toks = F.when(
        F.col("doc_id") != F.col("keeper"), F.col("n_tokens")
    ).otherwise(0)
    return (
        d.join(keepers, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(dup).cast("long").alias("dup_docs"),
            F.sum(dup_toks).cast("long").alias("dup_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "dup_docs",
            "dup_tokens",
            r4(
                F.col("dup_tokens").cast("double") / F.col("total_tokens")
            ).alias("savings_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# join_hint_merge — the MERGE join-strategy hint surface
# ---------------------------------------------------------------------------

@register(
    "join_hint_merge",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount))
                         AS BIGINT)) AS BIGINT) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def join_hint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE join-strategy hint — the explicit-control counterpart
    of join_broadcast's BROADCAST hint: `hint("merge")` pins the
    fact-fact join to sort-merge even when AQE or size estimates would
    pick something else.  Why a user reaches for it: broadcast picks can
    OOM when size estimates lie (post-filter explosion, wide rows), and
    a pinned SMJ is the predictable-memory choice for two fact-sized
    inputs at 100 TB.  Result is deliberately plain (revenue by
    priority) — the TESTED artifact is the physical plan, pinned to
    SortMergeJoin in tests/test_plans.py."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).cast("long").alias("rev"),
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        li.hint("merge")
        .join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("rev").cast("long").alias("revenue"),
        )
    )
