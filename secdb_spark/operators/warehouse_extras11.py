"""Round-7 additions, batch 12b — behavioral entropy bands, retention
decay fitting, per-supplier lead-time drift.

Reference semantics: SURVEY §2 extension policy (mount empty).  Entropy
and log-fit sums follow the quantize-then-sum DECIMAL(38,12) discipline
(text_entropy_tokens / warehouse_extras10); regressions are exact
integer moment machines until the final shared IEEE division.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4

LN2 = repr(math.log(2))
DEC12 = "decimal(38,12)"


# ---------------------------------------------------------------------------
# user_hour_entropy — activity-clock entropy bands (bot/burst profile)
# ---------------------------------------------------------------------------

@register(
    "user_hour_entropy",
    oracle=f"""
    WITH hc AS (
      SELECT user_id, hour(ts) AS h, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), u AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             (ln(CAST(sum(c) AS DOUBLE))
              - CAST(sum(CAST(c * ln(CAST(c AS DOUBLE))
                              AS DECIMAL(38,12))) AS DOUBLE) / sum(c))
             / {LN2} AS h_bits
      FROM hc GROUP BY user_id
    )
    SELECT CAST(floor(h_bits) AS INT) AS band,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(n_events) AS DOUBLE) / count(*), 4)
             AS avg_events
    FROM u GROUP BY 1
    """,
)
def user_hour_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity entropy per user, banded — the bot/burst
    profile: band 0 users fire all events in one clock hour (scripted),
    users near log2(24) are uniformly spread (also scripted, the other
    way).  Two cascaded combinable aggregates ((user, hour) counts,
    then per-user entropy) and a final |bands|-key aggregate; the
    c·ln(c) terms exact-sum as DECIMAL(38,12) so h_bits is bit-identical
    cross-engine and the floor() banding can never straddle an engine
    difference."""
    hc = table(spark, sf_dir, "events").groupBy(
        "user_id", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("long")
    s = F.sum(
        (F.col("c") * F.log(F.col("c").cast("double"))).cast(DEC12)
    ).cast("double")
    u = hc.groupBy("user_id").agg(
        n.alias("n_events"),
        ((F.log(n.cast("double")) - s / F.sum("c")) / float(LN2)).alias(
            "h_bits"
        ),
    )
    return u.groupBy(
        F.floor(F.col("h_bits")).cast("int").alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        r4(
            F.sum("n_events").cast("double") / F.count(F.lit(1))
        ).alias("avg_events"),
    )


# ---------------------------------------------------------------------------
# retention_halflife — exponential-decay fit of pooled monthly retention
# ---------------------------------------------------------------------------

@register(
    "retention_halflife",
    oracle=f"""
    WITH om AS (
      SELECT o_custkey AS cust,
             year(o_orderdate) * 12 + month(o_orderdate) AS m
      FROM orders GROUP BY 1, 2
    ), coh AS (
      SELECT cust, min(m) AS cm FROM om GROUP BY cust
    ), act AS (
      SELECT om.cust, om.m - coh.cm AS age
      FROM om JOIN coh ON om.cust = coh.cust
    ), mx AS (SELECT max(m) AS maxm FROM om),
    sizes AS (
      SELECT cm, CAST(count(*) AS BIGINT) AS sz FROM coh GROUP BY cm
    ), num AS (
      SELECT age, CAST(count(*) AS BIGINT) AS n_active
      FROM act WHERE age >= 1 GROUP BY age
    ), den AS (
      SELECT n.age, CAST(sum(s.sz) AS BIGINT) AS n_eligible
      FROM num n, sizes s, mx
      WHERE s.cm + n.age <= mx.maxm
      GROUP BY n.age
    ), r AS (
      SELECT n.age,
             ln(CAST(n.n_active AS DOUBLE) / d.n_eligible) AS lr
      FROM num n JOIN den d ON n.age = d.age
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(age) AS BIGINT) AS sx,
             CAST(sum(age * age) AS BIGINT) AS sxx,
             CAST(sum(CAST(lr AS DECIMAL(38,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(age * lr AS DECIMAL(38,12))) AS DOUBLE) AS sxy
      FROM r
    )
    SELECT k AS n_ages,
           round((CAST(k AS DOUBLE) * sxy - sx * sy)
                 / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4)
             AS slope,
           round(-{LN2}
                 / ((CAST(k AS DOUBLE) * sxy - sx * sy)
                    / (CAST(k AS DOUBLE) * sxx
                       - CAST(sx AS DOUBLE) * sx)), 4) AS halflife_months
    FROM m
    """,
)
def retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer retention half-life: pool monthly cohort retention
    R(age) = active(age) / eligible(age) — eligible counts only cohorts
    old enough to reach that age (right-censoring, or late cohorts would
    fake a cliff) — then least-squares fit ln R(age) ~ age and report
    the decay slope and half-life -ln2/slope in months.  Cohorts and
    activity are combinable aggregates on (cust, month) keys; the
    age x cohort eligibility product joins two MODEL-SIZED aggregates
    (|ages| x |cohort months|); the regression runs over the ≤|ages|-row
    frame with integer x-moments and DECIMAL(38,12)-quantized ln terms,
    so the fitted slope is bit-identical cross-engine."""
    o = table(spark, sf_dir, "orders")
    om = o.select(
        F.col("o_custkey").alias("cust"),
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("m"),
    ).distinct()
    # om/coh/num each feed 2-3 consumers: pinned so the orders scan and
    # the cohort aggregate run once (plan-audit, SCALE.md §50).
    om = pin(om)
    coh = pin(om.groupBy("cust").agg(F.min("m").alias("cm")))
    act = om.join(coh, "cust").select(
        "cust", (F.col("m") - F.col("cm")).alias("age")
    )
    mx = om.agg(F.max("m").alias("maxm"))
    sizes = coh.groupBy("cm").agg(F.count(F.lit(1)).alias("sz"))
    num = pin(
        act.filter(F.col("age") >= 1)
        .groupBy("age")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    den = (
        num.select("age")
        .crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("cm") + F.col("age") <= F.col("maxm"))
        .groupBy("age")
        .agg(F.sum("sz").cast("long").alias("n_eligible"))
    )
    r = num.join(den, "age").select(
        "age",
        F.log(
            F.col("n_active").cast("double") / F.col("n_eligible")
        ).alias("lr"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("age").cast("long").alias("sx"),
        F.sum(F.col("age") * F.col("age")).cast("long").alias("sxx"),
        F.sum(F.col("lr").cast(DEC12)).cast("double").alias("sy"),
        F.sum((F.col("age") * F.col("lr")).cast(DEC12))
        .cast("double")
        .alias("sxy"),
    )
    k, sx = F.col("k"), F.col("sx")
    slope = (k.cast("double") * F.col("sxy") - sx * F.col("sy")) / (
        k.cast("double") * F.col("sxx") - sx.cast("double") * sx
    )
    return m.select(
        k.alias("n_ages"),
        r4(slope).alias("slope"),
        r4(-float(LN2) / slope).alias("halflife_months"),
    )


# ---------------------------------------------------------------------------
# supplier_leadtime_drift — per-supplier lead-time trend (days/year)
# ---------------------------------------------------------------------------

@register(
    "supplier_leadtime_drift",
    oracle="""
    WITH f AS (
      SELECT l.l_suppkey,
             year(o.o_orderdate) AS x,
             datediff('day', o.o_orderdate, l.l_shipdate) AS y
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), m AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM f GROUP BY l_suppkey
    )
    SELECT l_suppkey, n AS n_lines,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4)
             AS drift_days_per_year
    FROM m
    """,
)
def supplier_leadtime_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier lead-time trend: the least-squares slope of
    order-to-ship days against order year — a supplier whose drift is
    positive is getting slower every year (the vendor-management early
    warning beside supplier_otd's point-in-time scorecard).  One
    orderkey-co-partitioned join, then a single combinable aggregate of
    five exact integer moments per supplier; the slope divides once in
    a shared IEEE tree.  Moment bound: x·y products stay under 2^63 to
    ~2e9 lines per supplier (year ~2e3, lag ~1e2); past that the moment
    sums widen to DECIMAL(38,0)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    f = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        F.year("o_orderdate").alias("x"),
        F.datediff("l_shipdate", "o_orderdate").alias("y"),
    )
    m = f.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n, sx = F.col("n"), F.col("sx")
    return m.select(
        "l_suppkey",
        n.alias("n_lines"),
        r4(
            (n.cast("double") * F.col("sxy") - sx.cast("double") * F.col("sy"))
            / (n.cast("double") * F.col("sxx") - sx.cast("double") * sx)
        ).alias("drift_days_per_year"),
    )
