"""Round-6 additions, batch 14 — SURVEY §2.AB: inferential statistics —
Wilson confidence intervals on conversion rates, the two-proportion
z-test over a deterministic A/B hash split, and Kaplan-Meier survival
over inter-purchase times with censoring.

Determinism notes: every closed form here composes +, −, ×, ÷ and sqrt
— all correctly rounded IEEE ops, so identical inputs give bit-identical
outputs in both engines (unlike sin/cos/pow, which are libm-dependent
and never reach certified values in this repo).  The KM product uses
the ln-quantization idiom (PMI/entropy ops): Π(1−d/n) = exp(Σ ln q)
with each ln quantized to integer 1e9 fixed-point, making the
order-dependent accumulation exact bigint arithmetic; significance
flags compare QUANTIZED statistics so no boundary can flip between
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4
from .pipeline_extras import _hash_bucket, _sql_hash_bucket

Z95 = 1.96  # two-sided 95% normal quantile (shared literal)


# ---------------------------------------------------------------------------
# conversion_rate_ci — Wilson score interval per nation
# ---------------------------------------------------------------------------

@register(
    "conversion_rate_ci",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
    ), flags AS (
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS n_cust,
             CAST(count_if(n_orders >= 2) AS BIGINT) AS n_repeat
      FROM per_cust
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, n_cust, n_repeat,
           round(CAST(n_repeat AS DOUBLE) / n_cust, 4) AS rate,
           round(((CAST(n_repeat AS DOUBLE) / n_cust)
                  + {Z95} * {Z95} / (2 * n_cust)
                  - {Z95} * sqrt((CAST(n_repeat AS DOUBLE) / n_cust)
                                 * (1 - CAST(n_repeat AS DOUBLE) / n_cust)
                                 / n_cust
                                 + {Z95} * {Z95} / (4 * CAST(n_cust AS DOUBLE)
                                                    * n_cust)))
                 / (1 + {Z95} * {Z95} / n_cust), 4) AS ci_lo,
           round(((CAST(n_repeat AS DOUBLE) / n_cust)
                  + {Z95} * {Z95} / (2 * n_cust)
                  + {Z95} * sqrt((CAST(n_repeat AS DOUBLE) / n_cust)
                                 * (1 - CAST(n_repeat AS DOUBLE) / n_cust)
                                 / n_cust
                                 + {Z95} * {Z95} / (4 * CAST(n_cust AS DOUBLE)
                                                    * n_cust)))
                 / (1 + {Z95} * {Z95} / n_cust), 4) AS ci_hi
    FROM flags
    """,
)
def conversion_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase conversion rate per nation with a Wilson 95%
    score interval — the interval that behaves at small n and extreme
    rates where the naive Wald ±z√(pq/n) collapses (never exits [0,1],
    never zero-width at p∈{{0,1}}).  The closed form composes only
    correctly rounded IEEE ops on exact integer inputs, written as the
    IDENTICAL expression tree in both engines, then rounds to 4 dp.

    Scale: per-customer order counts (custkey exchange), dim joins
    broadcast, 25-row output.  The interval math is free — the
    expensive part is the grouped count it annotates."""
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    flags = (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.count_if(F.col("n_orders") >= 2).alias("n_repeat"),
        )
    )
    n = F.col("n_cust")
    p = F.col("n_repeat").cast("double") / n
    z2 = Z95 * Z95
    half = p * (1 - p) / n + z2 / (4 * n.cast("double") * n)
    centre = p + z2 / (2 * n)
    denom = 1 + z2 / n
    return flags.select(
        "n_name",
        F.col("n_cust").cast("long").alias("n_cust"),
        F.col("n_repeat").cast("long").alias("n_repeat"),
        r4(p).alias("rate"),
        r4((centre - Z95 * F.sqrt(half)) / denom).alias("ci_lo"),
        r4((centre + Z95 * F.sqrt(half)) / denom).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# abtest_ztest — two-proportion z-test over a deterministic hash split
# ---------------------------------------------------------------------------

Z_SIG_E4 = 19600  # |z| >= 1.96 compared in 1e4 fixed point
VAL_SCALE = 10**4  # event-value fixed point


@register(
    "abtest_ztest",
    oracle=f"""
    WITH assign AS (
      SELECT CASE WHEN {_sql_hash_bucket("'ab:' || CAST(user_id AS VARCHAR)", 2)}
                       = 0 THEN 'A' ELSE 'B' END AS arm,
             CAST(floor(value * {VAL_SCALE} + 0.5) AS BIGINT) AS v
      FROM events
    ), m AS (
      SELECT arm, count(*) AS n,
             sum(CAST(v AS DECIMAL(38,0))) AS s,
             sum(CAST(v * v AS DECIMAL(38,0))) AS sq
      FROM assign GROUP BY arm
    ), wide AS (
      SELECT
        max(CASE WHEN arm = 'A' THEN n END) AS na,
        max(CASE WHEN arm = 'B' THEN n END) AS nb,
        max(CASE WHEN arm = 'A' THEN s END) AS sa,
        max(CASE WHEN arm = 'B' THEN s END) AS sb,
        max(CASE WHEN arm = 'A' THEN sq END) AS sqa,
        max(CASE WHEN arm = 'B' THEN sq END) AS sqb
      FROM m
    )
    SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           round((CAST(sa AS DOUBLE) / na) / {VAL_SCALE}, 4) AS mean_a,
           round((CAST(sb AS DOUBLE) / nb) / {VAL_SCALE}, 4) AS mean_b,
           round(((CAST(sa AS DOUBLE) / na) - (CAST(sb AS DOUBLE) / nb))
                 / sqrt((CAST(CAST(na AS DECIMAL(38,0)) * sqa - sa * sa
                              AS DOUBLE) / (CAST(na AS DOUBLE) * na * (na - 1)))
                        + (CAST(CAST(nb AS DECIMAL(38,0)) * sqb - sb * sb
                                AS DOUBLE) / (CAST(nb AS DOUBLE) * nb * (nb - 1)))),
                 4) AS z_score,
           (CAST(floor(abs(((CAST(sa AS DOUBLE) / na) - (CAST(sb AS DOUBLE) / nb))
                 / sqrt((CAST(CAST(na AS DECIMAL(38,0)) * sqa - sa * sa
                              AS DOUBLE) / (CAST(na AS DOUBLE) * na * (na - 1)))
                        + (CAST(CAST(nb AS DECIMAL(38,0)) * sqb - sb * sb
                                AS DOUBLE) / (CAST(nb AS DOUBLE) * nb * (nb - 1)))))
                 * 10000 + 0.5) AS BIGINT) >= {Z_SIG_E4}) AS significant
    FROM wide
    """,
)
def abtest_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z-test on mean event value between a deterministic
    50/50 hash split of USERS (the md5-threshold assignment discipline:
    an arm is a pure function of the user id, so reruns and engines
    agree on every assignment — split_train_test's property applied to
    experimentation).  Arm means and sample variances come from
    DECIMAL(38,0) moment sums of 1e4 fixed-point values (exact,
    combinable); the Welch-style z closes with the shared IEEE tree
    and the significance flag compares the 1e4-QUANTIZED |z| so the
    boolean cannot flip on a last-ulp divergence.  On a hash split of
    one population the truth is H0 — the A/A-test sanity check
    (pinned: z stays small).

    Scale: one scan, one 2-key moment aggregate (map-side combinable);
    the statistic itself is free.  The same moment layout serves any
    metric column; binomial-rate variants divide by zero when a tiny
    corpus saturates (every user converts), which is why the certified
    op tests MEANS — the variance never collapses on continuous
    values."""
    ev = table(spark, sf_dir, "events")
    arm = F.when(
        _hash_bucket(
            F.concat(F.lit("ab:"), F.col("user_id").cast("string")), 2
        )
        == 0,
        "A",
    ).otherwise("B")
    v = F.floor(F.col("value") * VAL_SCALE + 0.5).cast("long")
    d0 = "decimal(38,0)"
    m = ev.select(arm.alias("arm"), v.alias("v")).groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(d0)).alias("s"),
        F.sum((F.col("v") * F.col("v")).cast(d0)).alias("sq"),
    )
    wide = m.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "A", F.col("s"))).alias("sa"),
        F.max(F.when(F.col("arm") == "B", F.col("s"))).alias("sb"),
        F.max(F.when(F.col("arm") == "A", F.col("sq"))).alias("sqa"),
        F.max(F.when(F.col("arm") == "B", F.col("sq"))).alias("sqb"),
    )
    na, nb = F.col("na"), F.col("nb")
    sa, sb = F.col("sa"), F.col("sb")
    ma = sa.cast("double") / na
    mb = sb.cast("double") / nb
    d0c = lambda c: c.cast(d0)  # noqa: E731
    var_a = (d0c(na) * F.col("sqa") - sa * sa).cast("double") / (
        na.cast("double") * na * (na - 1)
    )
    var_b = (d0c(nb) * F.col("sqb") - sb * sb).cast("double") / (
        nb.cast("double") * nb * (nb - 1)
    )
    z = (ma - mb) / F.sqrt(var_a + var_b)
    z_e4 = F.floor(F.abs(z) * 10000 + 0.5).cast("long")
    return wide.select(
        na.cast("long").alias("na"),
        nb.cast("long").alias("nb"),
        r4(ma / VAL_SCALE).alias("mean_a"),
        r4(mb / VAL_SCALE).alias("mean_b"),
        r4(z).alias("z_score"),
        (z_e4 >= Z_SIG_E4).alias("significant"),
    )


# ---------------------------------------------------------------------------
# survival_km — Kaplan-Meier over inter-purchase times with censoring
# ---------------------------------------------------------------------------

KM_LN_SCALE = 10**9


@register(
    "survival_km",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             min(o_orderdate) AS first_dt,
             min(CASE WHEN rn = 2 THEN o_orderdate END) AS second_dt
      FROM (
        SELECT o_custkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
      ) GROUP BY o_custkey
    ), anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
    subjects AS (
      SELECT o_custkey,
             CASE WHEN second_dt IS NOT NULL
                  THEN datediff('day', CAST(first_dt AS DATE),
                                CAST(second_dt AS DATE))
                  ELSE datediff('day', CAST(first_dt AS DATE),
                                CAST((SELECT mx FROM anchor) AS DATE))
             END AS t,
             CAST(second_dt IS NOT NULL AS INT) AS event
      FROM per_cust
    ), times AS (
      SELECT t, CAST(sum(event) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM subjects GROUP BY t HAVING sum(event) > 0
    ), risk AS (
      SELECT t, d,
             CAST((SELECT count(*) FROM subjects s WHERE s.t >= times.t)
                  AS BIGINT) AS n_risk
      FROM times
    ), q AS (
      SELECT t, d, n_risk,
             CAST(floor(ln(1 - CAST(d AS DOUBLE) / n_risk) * {KM_LN_SCALE}
                        + 0.5) AS BIGINT) AS lnq
      FROM risk WHERE d < n_risk
    )
    SELECT t AS day, d AS n_events, n_risk,
           round(exp(CAST(sum(lnq) OVER (ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS DOUBLE) / {KM_LN_SCALE}), 4) AS survival
    FROM q
    """,
)
def survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of the repeat-purchase process: for each
    customer, time-to-second-order in days (event) or time to the
    corpus anchor (right-censored) — the estimator marketing calls
    "days until customers come back", with censoring handled correctly
    instead of dropped.  S(t) = Π_{{t_i≤t}} (1 − d_i/n_i); the product
    runs as exp(Σ ln q_i) with each ln quantized to 1e9 fixed-point
    (the PMI/entropy idiom), so the cumulative sum is exact bigint and
    the closing exp is one IEEE op on identical inputs — certifiable
    where a float running product is engine-order dependent.

    Scale: subjects derive from one custkey window; the risk table is
    |distinct event times| rows (the correlated count in the oracle is
    a window cumulative in the engine — same values); everything after
    the subject table is model-sized."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey",
        "o_orderdate",
        F.row_number().over(w).alias("rn"),
    )
    per_cust = ranked.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt"),
        F.min(F.when(F.col("rn") == 2, F.col("o_orderdate"))).alias(
            "second_dt"
        ),
    )
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    subjects = per_cust.crossJoin(F.broadcast(anchor)).select(
        F.when(
            F.col("second_dt").isNotNull(),
            F.datediff(
                F.col("second_dt").cast("date"), F.col("first_dt").cast("date")
            ),
        )
        .otherwise(
            F.datediff(
                F.col("mx").cast("date"), F.col("first_dt").cast("date")
            )
        )
        .alias("t"),
        F.col("second_dt").isNotNull().cast("int").alias("event"),
    )
    # pinned: subjects feeds the event table AND the risk spine — un-
    # pinned each re-ran the per-customer rank window (plan-audit,
    # SCALE.md §50).
    subjects = pin(subjects)
    times = (
        subjects.groupBy("t")
        .agg(F.sum("event").alias("d"), F.count(F.lit(1)).alias("leaving"))
        .filter(F.col("d") > 0)
    )
    # n_risk(t) = subjects with observed time >= t: total - cumulative
    # leavers before t (window form of the oracle's correlated count).
    # The total is a window over the |times|-sized aggregate — no
    # separate count action, no second pass over subjects.
    all_times = subjects.groupBy("t").agg(F.count(F.lit(1)).alias("lv"))
    wall = Window.partitionBy()
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk_all = all_times.select(
        "t",
        (
            F.sum("lv").over(wall)
            - F.coalesce(F.sum("lv").over(wcum), F.lit(0))
        ).alias("n_risk"),
    )
    risk = times.join(risk_all, "t").filter(F.col("d") < F.col("n_risk"))
    lnq = F.floor(
        F.log(1 - F.col("d").cast("double") / F.col("n_risk")) * KM_LN_SCALE
        + 0.5
    ).cast("long")
    q = risk.select("t", "d", "n_risk", lnq.alias("lnq"))
    wrun = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return q.select(
        F.col("t").alias("day"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        r4(
            F.exp(F.sum("lnq").over(wrun).cast("double") / KM_LN_SCALE)
        ).alias("survival"),
    )
