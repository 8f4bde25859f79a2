"""Round-7 additions, batch 32 — window-frame modes Spark lacks natively,
second-digit Benford forensics, seasonal-naive forecast skill.

Reference semantics: SURVEY §2 extension policy (mount empty).
win_groups_frame delivers ANSI GROUPS-mode frames (peer-group offsets) on
an engine that only has ROWS/RANGE; win_exclude_current delivers the ANSI
EXCLUDE CURRENT ROW clause the same way.  Both oracles run DuckDB's OWN
machinery for the semantics (date-level lag/lead; native EXCLUDE), so the
differential certifies the emulation, not a shared formula.
audit_benford2 extends audit_benford to the second significant digit (the
standard forensic escalation); forecast_snaive_mase scores a lag-7
seasonal-naive forecast with the MASE scale-free error ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4

#: epoch anchor for integer day arithmetic (same convention both engines).
DAY0 = "1970-01-01"

#: leave-one-out frame half-width (days) for win_exclude_current.
LOO_DAYS = 3


# ---------------------------------------------------------------------------
# win_groups_frame — GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING, emulated
# ---------------------------------------------------------------------------

@register(
    "win_groups_frame",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(o_orderdate AS DATE) AS d,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), by_date AS (
      SELECT o_orderpriority, mon, d,
             CAST(sum(cents) AS BIGINT) AS g
      FROM base GROUP BY 1, 2, 3
    ), framed AS (
      SELECT o_orderpriority, mon, d,
             CAST(coalesce(lag(g) OVER w, 0) + g
                  + coalesce(lead(g) OVER w, 0) AS BIGINT) AS frame_cents
      FROM by_date
      WINDOW w AS (PARTITION BY o_orderpriority, mon ORDER BY d)
    )
    SELECT b.o_orderkey, b.o_orderpriority,
           CAST(b.d AS TIMESTAMP) AS o_orderdate, f.frame_cents
    FROM base b
    JOIN framed f
      ON b.o_orderpriority = f.o_orderpriority
     AND b.mon = f.mon AND b.d = f.d
    """,
)
def win_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI **GROUPS-mode** window frame — `sum(cents) OVER (... ORDER BY
    o_orderdate GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING)` — on an
    engine with no GROUPS support: peers (rows tied on the sort key) are
    collapsed to a dense_rank, and a RANGE frame of ±1 **on the rank**
    reproduces peer-group offsets exactly (every peer shares the rank, so
    rank-distance 1 = one whole peer group).  The oracle never sees the
    emulation — DuckDB derives the same frame from date-level lag/lead
    sums joined back to rows — so the hash match certifies GROUPS
    semantics, not a shared formula.  Partitioning is (priority × month):
    calendar-bounded partitions, so no single-partition window exists at
    any scale; dense_rank and the frame sum share one shuffle."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").alias("mon"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    wr = Window.partitionBy("o_orderpriority", "mon").orderBy("d")
    ranked = o.withColumn("dr", F.dense_rank().over(wr))
    frame = (
        Window.partitionBy("o_orderpriority", "mon")
        .orderBy("dr")
        .rangeBetween(-1, 1)
    )
    return ranked.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("d").cast("timestamp").alias("o_orderdate"),
        F.sum("cents").over(frame).cast("long").alias("frame_cents"),
    )


# ---------------------------------------------------------------------------
# win_exclude_current — EXCLUDE CURRENT ROW, emulated as frame minus self
# ---------------------------------------------------------------------------

@register(
    "win_exclude_current",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             datediff('day', DATE '{DAY0}', CAST(ts AS DATE)) AS day_int,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, CAST(day AS TIMESTAMP) AS day, day_cents,
           CAST(count(*) OVER loo AS BIGINT) AS n_peer_days,
           round(avg(CAST(day_cents AS DOUBLE)) OVER loo, 4) AS loo_avg_cents
    FROM daily
    WINDOW loo AS (PARTITION BY event_type ORDER BY day_int
                   RANGE BETWEEN {LOO_DAYS} PRECEDING AND {LOO_DAYS} FOLLOWING
                   EXCLUDE CURRENT ROW)
    """,
)
def win_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI **EXCLUDE CURRENT ROW** — the leave-one-out peer average every
    anomaly screen wants (compare each day against its ±{LOO_DAYS}-day
    neighbors WITHOUT self-contamination) — on an engine whose frames
    cannot exclude: take the full RANGE frame's sum and count, subtract
    the current row from both.  The oracle runs DuckDB's native EXCLUDE
    clause, so the differential certifies the subtraction trick against
    the real semantics.  Day-level aggregate first (combinable), then one
    (event_type)-partitioned calendar-bounded window; day_cents is exact
    int64 fixed-point so sum-minus-self is exact."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("long")
            ).cast("long").alias("day_cents")
        )
        .withColumn(
            "day_int",
            F.datediff(F.col("day"), F.lit(DAY0).cast("date")),
        )
    )
    frame = (
        Window.partitionBy("event_type")
        .orderBy("day_int")
        .rangeBetween(-LOO_DAYS, LOO_DAYS)
    )
    fsum = F.sum("day_cents").over(frame)
    fcnt = F.count(F.lit(1)).over(frame)
    n_peer = (fcnt - 1).cast("long")
    return daily.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        "day_cents",
        n_peer.alias("n_peer_days"),
        r4(
            (fsum - F.col("day_cents")).cast("double")
            / F.nullif(n_peer, F.lit(0))
        ).alias("loo_avg_cents"),
    )


# ---------------------------------------------------------------------------
# audit_benford2 — second-digit Benford screen
# ---------------------------------------------------------------------------

@register(
    "audit_benford2",
    oracle="""
    WITH obs AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         2, 1) AS INT) AS d2,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM orders WHERE o_totalprice >= 10 GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs
    ), expct AS (
      SELECT d2, sum(log10(1.0 + 1.0 / (10 * d1 + d2))) AS p
      FROM generate_series(1, 9) s(d1), generate_series(0, 9) s2(d2)
      GROUP BY d2
    )
    SELECT o.d2, o.n_obs,
           round(CAST(o.n_obs AS DOUBLE) / t.n, 4) AS obs_share,
           round(e.p, 4) AS exp_share,
           round(t.n * (CAST(o.n_obs AS DOUBLE) / t.n - e.p)
                     * (CAST(o.n_obs AS DOUBLE) / t.n - e.p) / e.p, 4)
             AS chi2_term
    FROM obs o JOIN expct e ON o.d2 = e.d2 CROSS JOIN tot t
    """,
)
def audit_benford2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-significant-digit Benford screen — the standard forensic
    escalation after the first-digit test (audit_benford): fabricated
    amounts that survive the first digit usually fail the second.
    Expected P(d₂)=Σ_{{d₁=1..9}} log10(1+1/(10·d₁+d₂)) is computed by BOTH
    engines from the formula (Spark: HOF `aggregate` over `sequence`,
    no UDF; DuckDB: generate_series cross join), never hardcoded.  One
    scan → 10-row combinable aggregate → broadcast total; chi² terms per
    digit let the caller sum for the test statistic."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 10)
    obs = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 2, 1
        ).cast("int").alias("d2")
    ).groupBy("d2").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    expected = F.expr(
        "aggregate(sequence(1, 9), 0D,"
        " (acc, d1) -> acc + log10(1D + 1D / (10 * d1 + d2)))"
    )
    share = F.col("n_obs").cast("double") / F.col("n")
    return (
        obs.crossJoin(F.broadcast(tot))
        .withColumn("p", expected)
        .select(
            "d2",
            "n_obs",
            r4(share).alias("obs_share"),
            r4(F.col("p")).alias("exp_share"),
            r4(
                F.col("n") * (share - F.col("p")) * (share - F.col("p"))
                / F.col("p")
            ).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# forecast_snaive_mase — seasonal-naive forecast skill (MASE)
# ---------------------------------------------------------------------------

@register(
    "forecast_snaive_mase",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority,
             datediff('day', DATE '{DAY0}', CAST(o_orderdate AS DATE))
               AS day_int,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ), e7 AS (
      SELECT a.o_orderpriority,
             CAST(count(*) AS BIGINT) AS n7,
             CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS sae7
      FROM daily a JOIN daily b
        ON a.o_orderpriority = b.o_orderpriority
       AND b.day_int = a.day_int - 7
      GROUP BY 1
    ), e1 AS (
      SELECT a.o_orderpriority,
             CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS sae1
      FROM daily a JOIN daily b
        ON a.o_orderpriority = b.o_orderpriority
       AND b.day_int = a.day_int - 1
      GROUP BY 1
    )
    SELECT e7.o_orderpriority, e7.n7 AS n_days_snaive, e1.n1 AS n_days_naive,
           round(CAST(e7.sae7 AS DOUBLE) / e7.n7 / 100, 4) AS mae_snaive,
           round(CAST(e1.sae1 AS DOUBLE) / e1.n1 / 100, 4) AS mae_naive,
           round((CAST(e7.sae7 AS DOUBLE) / e7.n7)
                 / (CAST(e1.sae1 AS DOUBLE) / e1.n1), 4) AS mase
    FROM e7 JOIN e1 ON e7.o_orderpriority = e1.o_orderpriority
    """,
)
def forecast_snaive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast skill: predict each day's revenue with the
    value 7 days earlier, score with MAE, and normalize by the lag-1
    naive MAE — the MASE ratio (Hyndman-Koehler), the scale-free "is
    weekly seasonality real signal?" test (<1 = the weekly pattern beats
    persistence).  Calendar shifts are EXACT self-joins on day−7 / day−1
    (never `lag(7)` over rows, which silently misaligns across date
    gaps).  Daily totals are exact int64 cents so every |error| is an
    integer; division only at the final 5-row projection.  Both joins
    co-locate on (priority, day) — one combinable daily aggregate feeds
    both sides."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(DAY0).cast("date")
        ).alias("day_int"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).cast("long").alias("cents")
    )
    # pinned: daily feeds both sides of BOTH shift joins (plan-audit,
    # SCALE.md §50; un-pinned: 4 orders scans).
    daily = pin(daily)

    def err(shift: int, n_name: str, sae_name: str) -> DataFrame:
        b = daily.select(
            F.col("o_orderpriority").alias("bp"),
            (F.col("day_int") + shift).alias("bd"),
            F.col("cents").alias("bcents"),
        )
        return (
            daily.join(
                b,
                (daily.o_orderpriority == b.bp)
                & (daily.day_int == b.bd),
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias(n_name),
                F.sum(F.abs(F.col("cents") - F.col("bcents")))
                .cast("long").alias(sae_name),
            )
        )

    e7 = err(7, "n_days_snaive", "sae7")
    e1 = err(1, "n_days_naive", "sae1")
    mae7 = F.col("sae7").cast("double") / F.col("n_days_snaive")
    mae1 = F.col("sae1").cast("double") / F.col("n_days_naive")
    return e7.join(e1, "o_orderpriority").select(
        "o_orderpriority",
        "n_days_snaive",
        "n_days_naive",
        r4(mae7 / 100).alias("mae_snaive"),
        r4(mae1 / 100).alias("mae_naive"),
        r4(mae7 / mae1).alias("mase"),
    )
