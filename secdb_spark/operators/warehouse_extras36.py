"""Round-9 additions, batch 1 — SURVEY §2.AZ: risk/exact-test statistics,
trimmed aggregation, incremental join maintenance, Spark-4 SQL surface,
and corpus/tokenizer analytics.

Fills 16 of the 46 free R12 certification slots (round-9 widening cap).
House conventions throughout: DEC12-quantized addends for every float
sum (order-independent, bit-identical across engines), he4 for presented
ratios that can tie at 4dp, repr-literal shared constants, tie-safe
orderings, and a scale note per op.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import he4, pin, sql_he4

DEC12 = "decimal(38,12)"
DEC18 = "decimal(38,18)"
SQRT365 = repr(math.sqrt(365.0))

# Shared daily-close-return CTE (the ts_sharpe shape,
# warehouse_extras15.py): last event value per (type, day) is the close;
# returns round to 6dp FIRST so both engines hold identical doubles.
_SQL_DAILY_RETURNS = """
    f AS (
      SELECT event_type, date_trunc('day', ts) AS day, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), daily AS (
      SELECT event_type, day, value AS close FROM f WHERE rn = 1
    ), r AS (
      SELECT event_type, day,
             round(close / lag(close) OVER (PARTITION BY event_type
                                            ORDER BY day) - 1, 6) AS ret
      FROM daily
    )
"""


def _daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SQL_DAILY_RETURNS: (event_type, day, ret)."""
    ev = table(spark, sf_dir, "events")
    wf = Window.partitionBy(
        "event_type", F.date_trunc("day", F.col("ts"))
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    daily = (
        ev.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("value").alias("close"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        F.round(F.col("close") / F.lag("close").over(w) - 1, 6).alias("ret"),
    )


# ---------------------------------------------------------------------------
# ts_sortino — downside-risk-adjusted return (Sortino ratio)
# ---------------------------------------------------------------------------

@register(
    "ts_sortino",
    oracle=f"""
    WITH {_SQL_DAILY_RETURNS}, m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(ret AS DECIMAL(38,12))) AS DOUBLE) AS s,
             CAST(sum(CAST(CASE WHEN ret < 0 THEN ret * ret ELSE 0 END
                           AS DECIMAL(38,12))) AS DOUBLE) AS sdq
      FROM r WHERE ret IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           {sql_he4("s / n * 10000")} AS mean_ret_bp,
           CASE WHEN sdq > 0 THEN
             {sql_he4(f"(s / n) / sqrt(sdq / n) * {SQRT365}")}
           END AS sortino_ann
    FROM m
    """,
)
def ts_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sortino ratio per event type: mean daily return over
    the DOWNSIDE deviation (root mean square of negative returns only) —
    the risk metric that doesn't punish upside volatility, next to
    ts_sharpe's symmetric stddev.  Returns round to 6dp first; the
    return sum and the downside square sum quantize to DECIMAL(38,12)
    before their exact sums; the ratio and sqrt(365) annualization run
    one shared IEEE tree with a repr-literal constant.

    Scale: one (type, day) window pass over the calendar-bounded daily
    series, then a single map-side-combinable aggregate per type."""
    r = _daily_returns(spark, sf_dir).filter(F.col("ret").isNotNull())
    down_sq = F.when(F.col("ret") < 0, F.col("ret") * F.col("ret")).otherwise(
        F.lit(0.0)
    )
    m = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("ret").cast(DEC12)).cast("double").alias("s"),
        F.sum(down_sq.cast(DEC12)).cast("double").alias("sdq"),
    )
    mean = F.col("s") / F.col("n")
    dd = F.sqrt(F.col("sdq") / F.col("n"))
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        he4(mean * 10000).alias("mean_ret_bp"),
        # NULL when no negative returns exist: sdq = 0 would divide by
        # zero, and inf/NaN round-tripping diverges across engines
        F.when(F.col("sdq") > 0, he4(mean / dd * float(SQRT365)))
        .alias("sortino_ann"),
    )


# ---------------------------------------------------------------------------
# ts_var_cvar — historical Value-at-Risk and expected shortfall
# ---------------------------------------------------------------------------

@register(
    "ts_var_cvar",
    oracle=f"""
    WITH {_SQL_DAILY_RETURNS}, rr AS (
      SELECT event_type, ret,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ret, day) AS rnk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM r WHERE ret IS NOT NULL
    ), k AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             CAST(ceil(n * 0.05) AS BIGINT) AS kk
      FROM rr GROUP BY event_type, n
    )
    SELECT rr.event_type, k.n AS n_days, k.kk AS n_tail,
           {sql_he4("max(rr.ret) * 10000")} AS var05_bp,
           {sql_he4("CAST(sum(CAST(rr.ret AS DECIMAL(38,12))) AS DOUBLE)"
                    " / k.kk * 10000")} AS cvar05_bp
    FROM rr JOIN k ON rr.event_type = k.event_type AND rr.rnk <= k.kk
    GROUP BY rr.event_type, k.n, k.kk
    """,
)
def ts_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 5% Value-at-Risk and CVaR (expected shortfall) per
    event type: VaR = the k-th worst daily return (k = ceil(0.05 n),
    rank-based with a day tie-break so ties at the cut are resolved
    identically in both engines), CVaR = exact decimal mean of those k
    tail returns.  Both in basis points via the shared he4 tree.

    Scale: the rank runs per type over the calendar-bounded daily
    series (|days| rows per type — model-sized); the tail aggregate is
    map-side combinable."""
    r = _daily_returns(spark, sf_dir).filter(F.col("ret").isNotNull())
    w = Window.partitionBy("event_type").orderBy("ret", "day")
    rr = r.select(
        "event_type",
        "ret",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    # one window pass computes rank AND group size, so the tail filter
    # is a plain predicate — no self-join, no second scan
    tail = rr.withColumn(
        "kk", F.ceil(F.col("n") * 0.05).cast("long")
    ).filter(F.col("rnk") <= F.col("kk")).select(
        "event_type", "ret", F.col("n").cast("long").alias("n"), "kk"
    )
    return tail.groupBy("event_type", "n", "kk").agg(
        he4(F.max("ret") * 10000).alias("var05_bp"),
        he4(
            F.sum(F.col("ret").cast(DEC12)).cast("double")
            / F.first("kk")
            * 10000
        ).alias("cvar05_bp"),
    ).select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("kk").alias("n_tail"),
        "var05_bp",
        "cvar05_bp",
    )


# ---------------------------------------------------------------------------
# ts_ljungbox — portmanteau autocorrelation test on the daily series
# ---------------------------------------------------------------------------

_LB_LAGS = 5

@register(
    "ts_ljungbox",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), mb AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(c AS DECIMAL(38,12))) AS DOUBLE)
               / count(*) AS xbar
      FROM daily GROUP BY event_type
    ), d AS (
      SELECT daily.event_type, daily.day,
             daily.c - mb.xbar AS dev, mb.n
      FROM daily JOIN mb ON daily.event_type = mb.event_type
    ), lagged AS (
      SELECT event_type, n, dev,
             lag(dev, 1) OVER w AS d1, lag(dev, 2) OVER w AS d2,
             lag(dev, 3) OVER w AS d3, lag(dev, 4) OVER w AS d4,
             lag(dev, 5) OVER w AS d5
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), s AS (
      SELECT event_type, n,
             CAST(sum(CAST(dev * dev AS DECIMAL(38,12))) AS DOUBLE) AS c0,
             CAST(sum(CAST(dev * d1 AS DECIMAL(38,12))) AS DOUBLE) AS c1,
             CAST(sum(CAST(dev * d2 AS DECIMAL(38,12))) AS DOUBLE) AS c2,
             CAST(sum(CAST(dev * d3 AS DECIMAL(38,12))) AS DOUBLE) AS c3,
             CAST(sum(CAST(dev * d4 AS DECIMAL(38,12))) AS DOUBLE) AS c4,
             CAST(sum(CAST(dev * d5 AS DECIMAL(38,12))) AS DOUBLE) AS c5
      FROM lagged GROUP BY event_type, n
    )
    SELECT event_type, n AS n_days,
           {sql_he4(
               "n * (n + 2) * ("
               "(c1/c0)*(c1/c0)/(n-1) + (c2/c0)*(c2/c0)/(n-2)"
               " + (c3/c0)*(c3/c0)/(n-3) + (c4/c0)*(c4/c0)/(n-4)"
               " + (c5/c0)*(c5/c0)/(n-5))"
           )} AS lb_q5
    FROM s
    """,
)
def ts_ljungbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q statistic (lags 1..5) on the per-type daily event
    counts — the standard "is this series white noise?" portmanteau
    test.  rho_k = c_k / c_0 with c_k the DEC12-exact sum of
    dev_t * dev_(t-k); dev uses the decimal-exact mean, so every input
    to the shared Q expression tree is bit-identical across engines.

    Scale: one per-type mean (model-sized, broadcast back), one window
    pass producing all five lags at once over the calendar-bounded daily
    series, one combinable aggregate."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    mb = pin(
        daily.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.sum(F.col("c").cast(DEC12)).cast("double")
                / F.count(F.lit(1))
            ).alias("xbar"),
        )
    )
    d = daily.join(F.broadcast(mb), "event_type").select(
        "event_type", "day", (F.col("c") - F.col("xbar")).alias("dev"), "n"
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = d.select(
        "event_type",
        "n",
        "dev",
        *[F.lag("dev", i).over(w).alias(f"d{i}") for i in range(1, _LB_LAGS + 1)],
    )
    aggs = [
        F.sum((F.col("dev") * F.col("dev")).cast(DEC12))
        .cast("double")
        .alias("c0")
    ] + [
        F.sum((F.col("dev") * F.col(f"d{i}")).cast(DEC12))
        .cast("double")
        .alias(f"c{i}")
        for i in range(1, _LB_LAGS + 1)
    ]
    s = lagged.groupBy("event_type", "n").agg(*aggs)
    n = F.col("n")
    q = sum(
        (
            (F.col(f"c{i}") / F.col("c0"))
            * (F.col(f"c{i}") / F.col("c0"))
            / (n - i)
            for i in range(2, _LB_LAGS + 1)
        ),
        (F.col("c1") / F.col("c0")) * (F.col("c1") / F.col("c0")) / (n - 1),
    )
    return s.select(
        "event_type",
        n.cast("long").alias("n_days"),
        he4(n * (n + 2) * q).alias("lb_q5"),
    )


# ---------------------------------------------------------------------------
# ts_seasonal_strength — STL-style trend/seasonal strength measures
# ---------------------------------------------------------------------------

@register(
    "ts_seasonal_strength",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), tr AS (
      SELECT event_type, day, c,
             CAST(sum(CAST(c AS DECIMAL(38,12))) OVER w AS DOUBLE)
               / 7 AS trend,
             count(*) OVER w AS w_n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), detr AS (
      SELECT event_type, day, c - trend AS dt,
             CAST(isodow(day) AS INTEGER) - 1 AS wd
      FROM tr WHERE w_n = 7
    ), seas AS (
      SELECT event_type, wd,
             CAST(sum(CAST(dt AS DECIMAL(38,12))) AS DOUBLE)
               / count(*) AS s
      FROM detr GROUP BY 1, 2
    ), rem AS (
      SELECT detr.event_type, detr.dt, detr.dt - seas.s AS rm
      FROM detr JOIN seas
        ON detr.event_type = seas.event_type AND detr.wd = seas.wd
    ), v AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(dt AS DECIMAL(38,12))) AS DOUBLE) AS sd,
             CAST(sum(CAST(dt * dt AS DECIMAL(38,12))) AS DOUBLE) AS sdd,
             CAST(sum(CAST(rm AS DECIMAL(38,12))) AS DOUBLE) AS sr,
             CAST(sum(CAST(rm * rm AS DECIMAL(38,12))) AS DOUBLE) AS srr
      FROM rem GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CASE WHEN (sdd - sd * sd / n) > 0 THEN
             {sql_he4("greatest(0.0, 1.0 - ((srr - sr * sr / n) / n)"
                      " / ((sdd - sd * sd / n) / n))")}
           END AS seasonal_strength
    FROM v
    """,
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength measure per event type (the STL diagnostic
    F_s = max(0, 1 - var(remainder)/var(detrended))): trend = centered
    7-day moving average (full windows only), seasonal = weekday mean of
    the detrended series, remainder = detrended - seasonal.  All moment
    sums DEC12-exact; weekday via the shared Monday=0 convention (Spark
    `weekday` == DuckDB `isodow - 1`).

    Scale: two window passes and one join against the 7-row-per-type
    weekday means, all over the calendar-bounded daily aggregate."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "c",
        (F.sum(F.col("c").cast(DEC12)).over(w).cast("double") / 7).alias(
            "trend"
        ),
        F.count(F.lit(1)).over(w).alias("w_n"),
    )
    detr = tr.filter(F.col("w_n") == 7).select(
        "event_type",
        "day",
        (F.col("c") - F.col("trend")).alias("dt"),
        F.weekday("day").alias("wd"),
    )
    seas = pin(
        detr.groupBy("event_type", "wd").agg(
            (
                F.sum(F.col("dt").cast(DEC12)).cast("double")
                / F.count(F.lit(1))
            ).alias("s")
        )
    )
    rem = detr.join(F.broadcast(seas), ["event_type", "wd"]).select(
        "event_type", "dt", (F.col("dt") - F.col("s")).alias("rm")
    )
    v = rem.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("dt").cast(DEC12)).cast("double").alias("sd"),
        F.sum((F.col("dt") * F.col("dt")).cast(DEC12))
        .cast("double")
        .alias("sdd"),
        F.sum(F.col("rm").cast(DEC12)).cast("double").alias("sr"),
        F.sum((F.col("rm") * F.col("rm")).cast(DEC12))
        .cast("double")
        .alias("srr"),
    )
    n = F.col("n")
    var_rem = (F.col("srr") - F.col("sr") * F.col("sr") / n) / n
    var_dt = (F.col("sdd") - F.col("sd") * F.col("sd") / n) / n
    return v.select(
        "event_type",
        n.alias("n_days"),
        # NULL for a constant detrended series: 0/0 is NaN and Spark's
        # greatest() treats NaN as largest where DuckDB propagates —
        # the one edge where the shared tree splits
        F.when(
            F.col("sdd") - F.col("sd") * F.col("sd") / n > 0,
            he4(F.greatest(F.lit(0.0), 1.0 - var_rem / var_dt)),
        ).alias("seasonal_strength"),
    )


# ---------------------------------------------------------------------------
# exact tests: shared distributed log-factorial table
# ---------------------------------------------------------------------------

_LOGFACT_MAX = 100_000


def _logfact(spark: SparkSession, max_n: int) -> DataFrame:
    """(m, lf) for m in 0..max_n with lf = ln(m!) as an exact
    DEC12-quantized sum of ln(k) terms — order-independent, so both
    engines hold bit-identical doubles for every lf value.  Built as a
    theta join (max_n^2 pairs of a max_n-row range — model-sized for
    the bounded group sizes exact tests apply to); the SQL twin is the
    generate_series self-join in each oracle.

    Refuses max_n > {_LOGFACT_MAX}: the quadratic pair count stops
    being model-sized (10^10 pairs at n=10^5), and at those sample
    sizes an EXACT test is statistically pointless anyway — use the
    certified asymptotic siblings (abtest_ztest, stat_welch_ttest,
    chi2_independence)."""
    if max_n > _LOGFACT_MAX:
        raise ValueError(
            f"exact-test log-factorial table capped at n={_LOGFACT_MAX} "
            f"(got {max_n}); use the asymptotic siblings (abtest_ztest / "
            "stat_welch_ttest / chi2_independence) at this sample size"
        )
    ks = spark.range(1, max_n + 1).select(
        F.col("id").alias("k"), F.ln("id").cast(DEC12).alias("t")
    )
    ms = spark.range(0, max_n + 1).select(F.col("id").alias("m"))
    return ms.join(ks, ks.k <= ms.m, "left").groupBy("m").agg(
        F.coalesce(F.sum("t"), F.lit(0).cast(DEC12))
        .cast("double")
        .alias("lf")
    )


def _sql_logfact(bound_expr: str) -> str:
    """DuckDB twin of _logfact: CTE text for lf(m), m in 0..bound."""
    return f"""
    ks AS (
      SELECT k, CAST(ln(k) AS DECIMAL(38,12)) AS t
      FROM (SELECT unnest(generate_series(1, {bound_expr})) AS k)
    ), lf AS (
      SELECT m, CAST(coalesce(sum(ks.t), 0) AS DOUBLE) AS lf
      FROM (SELECT unnest(generate_series(0, {bound_expr})) AS m)
      LEFT JOIN ks ON ks.k <= m GROUP BY m
    )"""


# ---------------------------------------------------------------------------
# stat_fisher_exact — 2x2 Fisher exact test (one-sided), fully distributed
# ---------------------------------------------------------------------------

@register(
    "stat_fisher_exact",
    oracle=f"""
    WITH cells AS (
      SELECT
        CAST(count(*) FILTER (s_nationkey < 12 AND s_acctbal > 4500)
             AS BIGINT) AS a,
        CAST(count(*) FILTER (s_nationkey < 12) AS BIGINT) AS r1,
        CAST(count(*) FILTER (s_acctbal > 4500) AS BIGINT) AS c1,
        CAST(count(*) AS BIGINT) AS n
      FROM supplier
    ), {_sql_logfact("(SELECT n FROM cells)")}, tail AS (
      SELECT cells.a, cells.r1, cells.c1, cells.n, kk.k
      FROM cells, LATERAL (
        SELECT unnest(generate_series(cells.a, least(cells.r1, cells.c1)))
               AS k) kk
    ), terms AS (
      SELECT t.a, t.r1, t.c1, t.n,
             CAST(exp(
               lc1.lf - lk.lf - lc1k.lf
               + lnc1.lf - lr1k.lf - lrest.lf
               - (ln_.lf - lr1.lf - lnr1.lf)
             ) AS DECIMAL(38,18)) AS p_k
      FROM tail t
      JOIN lf lc1  ON lc1.m  = t.c1
      JOIN lf lk   ON lk.m   = t.k
      JOIN lf lc1k ON lc1k.m = t.c1 - t.k
      JOIN lf lnc1 ON lnc1.m = t.n - t.c1
      JOIN lf lr1k ON lr1k.m = t.r1 - t.k
      JOIN lf lrest ON lrest.m = t.n - t.c1 - t.r1 + t.k
      JOIN lf ln_  ON ln_.m  = t.n
      JOIN lf lr1  ON lr1.m  = t.r1
      JOIN lf lnr1 ON lnr1.m = t.n - t.r1
    )
    SELECT a, r1, c1, n,
           {sql_he4('CAST(sum(p_k) AS DOUBLE)')} AS p_one_sided
    FROM terms GROUP BY a, r1, c1, n
    """,
)
def stat_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided Fisher exact test on the supplier 2x2 (nation block x
    account-balance tier): P(X >= a) under the hypergeometric null,
    computed EXACTLY — tail pmf terms from a distributed log-factorial
    table (DEC12-exact ln sums, so lf values are bit-identical across
    engines), the log-pmf a fixed shared IEEE tree, each exp() term
    quantized to DECIMAL(38,18) before the exact tail sum (order-free
    within each engine); the presented p goes through he4 because exp()
    itself is allowed 1-ulp error per engine (JVM Math.exp vs DuckDB) —
    the one stage of this pipeline that is not a shared IEEE tree.  No
    stats library, no approximation beyond that final quantization.

    Scale: the 2x2 cells are one combinable aggregate over the fact
    table; lf is bounded by the margin sizes (the tested cohort), and
    the tail explode is at most min(r1, c1) rows — both model-sized
    next to the input scan.  Cites SURVEY §2.AK's exact-test family
    (chi2_independence, stat_mannwhitney) as the approximate siblings."""
    s = table(spark, sf_dir, "supplier")
    cells = pin(
        s.agg(
            F.count_if(
                (F.col("s_nationkey") < 12) & (F.col("s_acctbal") > 4500)
            ).alias("a"),
            F.count_if(F.col("s_nationkey") < 12).alias("r1"),
            F.count_if(F.col("s_acctbal") > 4500).alias("c1"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a, r1, c1, n = cells.head()
    lf = pin(_logfact(spark, int(n)))
    tail = cells.select(
        "a", "r1", "c1", "n",
        F.explode(F.sequence(F.col("a"), F.least("r1", "c1"))).alias("k"),
    )

    def j(df, alias, key):
        lfa = lf.select(
            F.col("m").alias(f"_m_{alias}"), F.col("lf").alias(alias)
        )
        return df.join(
            F.broadcast(lfa), key == F.col(f"_m_{alias}")
        ).drop(f"_m_{alias}")

    t = tail
    t = j(t, "lc1", F.col("c1"))
    t = j(t, "lk", F.col("k"))
    t = j(t, "lc1k", F.col("c1") - F.col("k"))
    t = j(t, "lnc1", F.col("n") - F.col("c1"))
    t = j(t, "lr1k", F.col("r1") - F.col("k"))
    t = j(t, "lrest", F.col("n") - F.col("c1") - F.col("r1") + F.col("k"))
    t = j(t, "ln_", F.col("n"))
    t = j(t, "lr1", F.col("r1"))
    t = j(t, "lnr1", F.col("n") - F.col("r1"))
    logp = (
        F.col("lc1") - F.col("lk") - F.col("lc1k")
        + F.col("lnc1") - F.col("lr1k") - F.col("lrest")
        - (F.col("ln_") - F.col("lr1") - F.col("lnr1"))
    )
    return (
        t.withColumn("p_k", F.exp(logp).cast(DEC18))
        .groupBy("a", "r1", "c1", "n")
        .agg(he4(F.sum("p_k").cast("double")).alias("p_one_sided"))
    )


# ---------------------------------------------------------------------------
# stat_binom_test — grouped exact binomial tail test
# ---------------------------------------------------------------------------

_BINOM_P0 = repr(math.log(0.9))
_BINOM_Q0 = repr(math.log(1.0 - 0.9))

@register(
    "stat_binom_test",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey AS nation,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (c_acctbal > 0) AS BIGINT) AS x
      FROM customer GROUP BY 1
    ), {_sql_logfact("(SELECT max(n) FROM g)")}, tail AS (
      SELECT g.nation, g.n, g.x, kk.k
      FROM g, LATERAL (
        SELECT unnest(generate_series(g.x, g.n)) AS k) kk
    ), terms AS (
      SELECT t.nation, t.n, t.x,
             CAST(exp(ln_.lf - lk.lf - lnk.lf
                      + t.k * {_BINOM_P0} + (t.n - t.k) * {_BINOM_Q0})
                  AS DECIMAL(38,18)) AS p_k
      FROM tail t
      JOIN lf ln_ ON ln_.m = t.n
      JOIN lf lk  ON lk.m  = t.k
      JOIN lf lnk ON lnk.m = t.n - t.k
    )
    SELECT nation, n, x,
           {sql_he4('CAST(sum(p_k) AS DOUBLE)')} AS p_upper
    FROM terms GROUP BY nation, n, x
    """,
)
def stat_binom_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-sided binomial test per nation: P(X >= x | n, p0=0.9)
    for x = customers with positive balance out of n — "is this
    nation's positive-balance rate above the fleet norm?".  Same exact
    machinery as stat_fisher_exact: shared lf table (DEC12 ln sums),
    repr-literal ln(p0)/ln(1-p0) constants, per-term DECIMAL(38,18)
    quantization before the exact tail sum.

    Scale: cells are one combinable aggregate; the per-group tail
    explode is at most the group size, and lf is bounded by the LARGEST
    group — the explode joins lf by key, all broadcast-sized."""
    c = table(spark, sf_dir, "customer")
    g = pin(
        c.groupBy(F.col("c_nationkey").alias("nation")).agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("c_acctbal") > 0).alias("x"),
        )
    )
    max_n = g.agg(F.max("n")).head()[0]
    lf = pin(_logfact(spark, int(max_n)))
    tail = g.select(
        "nation", "n", "x",
        F.explode(F.sequence(F.col("x"), F.col("n"))).alias("k"),
    )

    def j(df, alias, key):
        lfa = lf.select(
            F.col("m").alias(f"_m_{alias}"), F.col("lf").alias(alias)
        )
        return df.join(
            F.broadcast(lfa), key == F.col(f"_m_{alias}")
        ).drop(f"_m_{alias}")

    t = j(tail, "ln_", F.col("n"))
    t = j(t, "lk", F.col("k"))
    t = j(t, "lnk", F.col("n") - F.col("k"))
    logp = (
        F.col("ln_") - F.col("lk") - F.col("lnk")
        + F.col("k") * float(_BINOM_P0)
        + (F.col("n") - F.col("k")) * float(_BINOM_Q0)
    )
    return (
        t.withColumn("p_k", F.exp(logp).cast(DEC18))
        .groupBy("nation", "n", "x")
        .agg(he4(F.sum("p_k").cast("double")).alias("p_upper"))
    )


# ---------------------------------------------------------------------------
# agg_trimmed_mean — exact two-sided 10% trimmed mean, gate-dispatched
# ---------------------------------------------------------------------------

@register(
    "agg_trimmed_mean",
    oracle=f"""
    WITH rnk AS (
      SELECT l_extendedprice AS v,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                l_linenumber) AS r,
             count(*) OVER () AS n
      FROM lineitem
    ), b AS (SELECT n, CAST(floor(n * 0.1) AS BIGINT) AS t FROM rnk LIMIT 1)
    SELECT CAST(b.n AS BIGINT) AS n_rows, b.t AS n_trimmed_each,
           {sql_he4("CAST(sum(CAST(rnk.v AS DECIMAL(38,6))) AS DOUBLE)"
                    " / (b.n - 2 * b.t)")} AS trimmed_mean
    FROM rnk JOIN b ON rnk.r > b.t AND rnk.r <= b.n - b.t
    GROUP BY b.n, b.t
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sided 10% trimmed mean of l_extendedprice: drop the
    floor(0.1 n) lowest- and highest-ranked rows under the total order
    (price, orderkey, linenumber — unique tie-break, so the trim is
    row-exact, not value-approximate) and decimal-mean the rest.  The
    robust-location companion to winsorize_group (which CLIPS instead
    of dropping).

    Dual kernel on the orders-scale gate: below, one global window;
    above, bucketed_global_rank (approx-quantile buckets, no
    single-partition Exchange) — rank semantics identical by the unique
    tie-break."""
    from ..catalog import table_rows
    from ._global_order import GLOBAL_WINDOW_GATE, bucketed_global_rank

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    if table_rows(sf_dir, "lineitem") > GLOBAL_WINDOW_GATE:
        ranked = bucketed_global_rank(
            li, "v", ["l_orderkey", "l_linenumber"], out="r"
        )
    else:
        ranked = li.withColumn(
            "r",
            F.row_number().over(
                Window.orderBy("v", "l_orderkey", "l_linenumber")
            ),
        )
    # total row count via a broadcast 1-row aggregate, NOT a
    # partition-less count window (that would funnel the full input
    # through one task — the exact shape the gate exists to avoid)
    bounds = pin(
        li.agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.count(F.lit(1)) * 0.1).cast("long").alias("t"),
        )
    )
    kept = ranked.crossJoin(F.broadcast(bounds)).filter(
        (F.col("r") > F.col("t")) & (F.col("r") <= F.col("n") - F.col("t"))
    )
    return kept.groupBy("n", "t").agg(
        he4(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double")
            / (F.col("n") - 2 * F.col("t"))
        ).alias("trimmed_mean")
    ).select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("t").alias("n_trimmed_each"),
        "trimmed_mean",
    )


# ---------------------------------------------------------------------------
# ivm_delta_join — incremental maintenance of a join view (delta rule)
# ---------------------------------------------------------------------------

_IVM_CUTOFF = "1998-01-01"

@register(
    "ivm_delta_join",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6)))
                      AS DOUBLE), 4) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view (the delta rule
    Delta(R join S) = DeltaR join S when S is static): the per-nation
    revenue view is maintained as merge(V_old, DeltaOrders join dims)
    — the base orders BEFORE the cutoff are aggregated once into V_old
    and never re-joined when the delta arrives; only the delta batch
    touches the join.  The oracle recomputes the view from scratch, so
    the driver hash certifies maintained == recomputed (the IVM
    correctness contract; ivm_delta_agg covers the aggregate-only
    rule).

    Scale: the merge is a union of two keyed aggregates re-aggregated
    on the model-sized nation key — at 100 TB the V_old side is a
    stored materialization, so a monthly delta costs
    |delta| join + |nations| merge instead of a full recompute."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    dims = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).select("c_custkey", "n_name")
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp_ntz")

    def view_of(orders_part: DataFrame) -> DataFrame:
        return (
            orders_part.join(dims, orders_part.o_custkey == dims.c_custkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias(
                    "_rev"
                ),
            )
        )

    v_old = view_of(o.filter(F.col("o_orderdate") < cutoff))
    delta = view_of(o.filter(F.col("o_orderdate") >= cutoff))
    merged = v_old.unionByName(delta).groupBy("nation").agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.round(F.sum("_rev").cast("double"), 4).alias("revenue"),
    )
    return merged


# ---------------------------------------------------------------------------
# fn_try_arith — ANSI-safe arithmetic surface (try_* family)
# ---------------------------------------------------------------------------

@register(
    "fn_try_arith",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 10 THEN NULL
                ELSE {sql_he4("l_extendedprice / (l_quantity - 10)")}
           END AS div_safe,
           CASE WHEN l_orderkey > 9 THEN NULL
                ELSE l_orderkey * 1000000000000000000 END AS mul_safe,
           CASE WHEN l_orderkey > 7 THEN NULL
                ELSE l_orderkey + 9223372036854775800 END AS add_safe,
           CASE WHEN l_linenumber = 1 THEN NULL
                ELSE l_orderkey % (l_linenumber - 1) END AS mod_safe
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* arithmetic surface (Spark 3.5+/4 ANSI-safe family):
    try_divide / try_multiply / try_add / try_mod return NULL on
    division-by-zero and int64 overflow instead of raising under ANSI
    mode.  The overflow probes sit ON the boundary (9 * 10^18 fits,
    10 * 10^18 overflows; +9223372036854775800 overflows from
    l_orderkey = 8), so the NULL pattern certifies the exact overflow
    semantics, mirrored in the oracle as guard predicates (DuckDB
    raises on overflow, so the guard IS the portable spelling).

    Scale: pure row-local expressions inside whole-stage codegen; the
    orderkey slice predicate pushes to the parquet scan."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        he4(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 10)
        ).alias("div_safe"),
        F.try_multiply(
            F.col("l_orderkey").cast("long"),
            F.lit(1000000000000000000).cast("long"),
        ).alias("mul_safe"),
        F.try_add(
            F.col("l_orderkey").cast("long"),
            F.lit(9223372036854775800).cast("long"),
        ).alias("add_safe"),
        F.try_mod(
            F.col("l_orderkey").cast("long"),
            (F.col("l_linenumber") - 1).cast("long"),
        ).alias("mod_safe"),
    )


# ---------------------------------------------------------------------------
# fn_collate_lcase — Spark 4 collation surface (UTF8_LCASE)
# ---------------------------------------------------------------------------

@register(
    "fn_collate_lcase",
    oracle="""
    WITH variants AS (
      SELECT upper(n_name) AS v FROM nation
      UNION ALL
      SELECT upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2)) AS v
      FROM nation
    )
    SELECT CAST(count(*) AS BIGINT) AS n_variants,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_binary,
           CAST(count(DISTINCT lower(v)) AS BIGINT) AS n_distinct_lcase,
           CAST((SELECT count(*) FROM variants a JOIN variants b
                 ON lower(a.v) = lower(b.v) AND a.v < b.v) AS BIGINT)
             AS n_cross_case_pairs
    FROM variants
    """,
)
def fn_collate_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface: distinct-count and join equality under
    the UTF8_LCASE collation over a deliberately case-split corpus (the
    upper and Sentence-case variants of every nation name).  The Spark
    side uses REAL collation operators — `collate(v, 'UTF8_LCASE')` in
    the distinct and the join predicate — while the oracle spells the
    same semantics portably with lower() (exactly equivalent for this
    ASCII domain, which is the point of certifying on it).

    Scale: the distinct and self-join operate on the model-sized
    dimension.  Note Spark 4.1 cannot HASH-join on UTF8_LCASE keys
    ("keys that don't support binary equality" — it falls back to a
    broadcast nested-loop here): at scale, join on lower(key) instead
    and keep collation for comparisons/distinct — which is exactly what
    the oracle's portable spelling does."""
    nt = table(spark, sf_dir, "nation")
    upper = nt.select(F.upper("n_name").alias("v"))
    sentence = nt.select(
        F.concat(
            F.upper(F.substring("n_name", 1, 1)),
            F.lower(F.expr("substring(n_name, 2)")),
        ).alias("v")
    )
    variants = pin(upper.unionByName(sentence))
    coll = F.collate(F.col("v"), "UTF8_LCASE")
    a = variants.select(F.col("v").alias("va"))
    b = variants.select(F.col("v").alias("vb"))
    pairs = a.join(
        F.broadcast(b),
        (
            F.collate(F.col("va"), "UTF8_LCASE")
            == F.collate(F.col("vb"), "UTF8_LCASE")
        )
        & (F.col("va") < F.col("vb")),
    ).count()
    return variants.agg(
        F.count(F.lit(1)).cast("long").alias("n_variants"),
        F.countDistinct("v").cast("long").alias("n_distinct_binary"),
        F.countDistinct(coll).cast("long").alias("n_distinct_lcase"),
        F.lit(pairs).cast("long").alias("n_cross_case_pairs"),
    )


# ---------------------------------------------------------------------------
# bpe_merge_topk — first-iteration BPE merge candidates
# ---------------------------------------------------------------------------

_BPE_TOPK = 50

@register(
    "bpe_merge_topk",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair
      FROM words, LATERAL (
        SELECT unnest(generate_series(1, length(w) - 1)) AS i) t
      WHERE length(w) >= 2
    ), counted AS (
      SELECT pair, CAST(count(*) AS BIGINT) AS n_pair FROM pairs GROUP BY 1
    )
    SELECT pair, n_pair, CAST(rn AS INTEGER) AS rn FROM (
      SELECT pair, n_pair,
             row_number() OVER (ORDER BY n_pair DESC, pair) AS rn
      FROM counted
    ) WHERE rn <= {_BPE_TOPK}
    """,
)
def bpe_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training iteration, distributed: count every
    adjacent character pair inside every whitespace word of the corpus
    and rank the top {k} merge candidates (count desc, pair asc —
    tie-safe).  This is the inner loop a distributed tokenizer trainer
    runs per merge round; one round certifies the counting kernel.

    Scale: the pair explode is map-side only (sequence+substring inside
    codegen, no UDF); one combinable count shuffle on the pair key
    (vocabulary-bounded cardinality: |charset|^2); the global top-k is
    a TakeOrderedAndProject, never a full sort."""
    d = table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    )
    top = counted.orderBy(
        F.col("n_pair").desc(), F.col("pair")
    ).limit(_BPE_TOPK)
    w = Window.orderBy(F.col("n_pair").desc(), F.col("pair"))
    return top.withColumn("rn", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# graph_jaccard_neighbors — supplier similarity by co-supplied parts
# ---------------------------------------------------------------------------

@register(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), deg AS (
      SELECT s, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1
    ), common AS (
      SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS c
      FROM edges a JOIN edges b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    )
    SELECT common.s1, common.s2, common.c AS n_common,
           {sql_he4("CAST(common.c AS DOUBLE) / (d1.d + d2.d - common.c)")}
             AS jaccard
    FROM common
    JOIN deg d1 ON d1.s = common.s1
    JOIN deg d2 ON d2.s = common.s2
    WHERE common.c >= 2
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity on the bipartite supply graph:
    suppliers are similar when they ship the same parts —
    |parts(s1) ∩ parts(s2)| / |parts(s1) ∪ parts(s2)| for every pair
    sharing >= 2 parts.  The node-similarity primitive under
    collaborative filtering and entity resolution, computed by
    co-occurrence join (never all-pairs).

    Scale: pair generation via the shared cooccur_pairs kernel
    (warehouse_extras37 — r11 judge directive #2) joins edges with edges
    ON THE PART KEY, so cost is sum over parts of (suppliers-per-part
    choose 2) — bounded by the co-supply density, not |suppliers|^2; a
    pathologically hot part wants salting (the join_skew_salted recipe).
    Degrees are a model-sized pinned broadcast."""
    from .warehouse_extras37 import cooccur_pairs

    li = table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    deg = pin(
        edges.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    common = cooccur_pairs(edges, "p", "s", 2).select(
        F.col("n1").alias("s1"), F.col("n2").alias("s2"), F.col("n").alias("c")
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    return (
        common.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            F.col("c").alias("n_common"),
            he4(
                F.col("c").cast("double")
                / (F.col("d1") + F.col("d2") - F.col("c"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# text_char_trigram_lm — char-trigram LM score per document
# ---------------------------------------------------------------------------

@register(
    "text_char_trigram_lm",
    oracle=f"""
    WITH tris AS (
      SELECT doc_id, substr(text, CAST(i AS INT), 3) AS tri
      FROM documents, LATERAL (
        SELECT unnest(generate_series(1, length(text) - 2)) AS i) t
      WHERE length(text) >= 3
    ), model AS (
      SELECT tri, CAST(count(*) AS BIGINT) AS c FROM tris GROUP BY 1
    ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM model),
    scored AS (
      SELECT tris.doc_id,
             CAST(floor(ln(CAST(model.c AS DOUBLE) / tot.total) * 1000000
                        + 0.5) AS BIGINT) AS lp6
      FROM tris JOIN model ON tris.tri = model.tri CROSS JOIN tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
           {sql_he4("CAST(sum(lp6) AS DOUBLE) / 1000000 / count(*)")}
             AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def text_char_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average log-probability under the corpus-wide
    character-trigram MLE model — the classic cheap language-model
    quality/language-fit score (gibberish and wrong-language docs score
    far below the corpus norm).  Log-probs quantize to integer
    micro-nats (floor(ln(p)*1e6 + 0.5), the tfidf_topk discipline) so
    the per-doc sum is exact integer arithmetic; only the final
    presented average divides.

    Scale: trigram explode is map-side; the model is
    vocabulary-bounded (|charset|^3 distinct trigrams), pinned and
    broadcast into the scoring join, so the corpus is scanned twice
    (model build + scoring) and shuffled only on doc_id for the final
    combinable aggregate."""
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    # scan-spread gate (r14, guide §2.5): both tokenize passes (model
    # build + scoring) explode ~4M substr trigrams inside the scan
    # stage, and documents is one parquet row group at the benched SFs —
    # each pass ran as ONE task.  The footer-gated repartition spreads
    # both (2.03 -> 0.48 s warm at sf0.1); never fires at warehouse
    # scale.
    from .llm_pipeline import _spread_docs

    d = _spread_docs(spark, sf_dir, d)
    tris = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("tri"),
    )
    model = pin(
        tris.groupBy("tri")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    total = model.agg(F.sum("c").cast("long").alias("total"))
    model_t = model.crossJoin(F.broadcast(total))
    scored = tris.join(F.broadcast(model_t), "tri").select(
        "doc_id",
        F.floor(
            F.ln(F.col("c").cast("double") / F.col("total")) * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lp6"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        he4(
            F.sum("lp6").cast("double") / 1000000 / F.count(F.lit(1))
        ).alias("avg_logp"),
    )


# ---------------------------------------------------------------------------
# corpus_boilerplate_sentences — cross-document repeated-sentence audit
# ---------------------------------------------------------------------------

_BOILER_MIN_DOCS = 5
_BOILER_MIN_LEN = 10

@register(
    "corpus_boilerplate_sentences",
    oracle=f"""
    WITH sents AS (
      SELECT source, doc_id, trim(s) AS sent
      FROM documents, LATERAL (
        SELECT unnest(string_split_regex(text, '\\.\\s+')) AS s) t
      WHERE length(trim(s)) >= {_BOILER_MIN_LEN}
    ), per_sent AS (
      SELECT source, sent,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM sents GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_distinct_sentences,
           CAST(count(*) FILTER (n_docs >= {_BOILER_MIN_DOCS}) AS BIGINT)
             AS n_boilerplate,
           {sql_he4(f"CAST(count(*) FILTER (n_docs >= {_BOILER_MIN_DOCS})"
                    " AS DOUBLE) / count(*)")} AS boilerplate_share
    FROM per_sent GROUP BY source
    """,
)
def corpus_boilerplate_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector per source: sentences (split on '.' +
    whitespace, trimmed, >= {min_len} chars) that recur in >=
    {min_docs} DISTINCT documents of the same source — headers,
    footers, legal disclaimers; the standard pre-training cleanup pass
    that document-level dedup cannot see.  Returns per source the
    distinct-sentence count, the boilerplate count, and its share.

    Scale: sentence explode is map-side; the (source, sentence)
    aggregate is one combinable shuffle keyed well above source
    cardinality (no skew funnel); the distinct-doc count inside it is
    the one Expand pass.  Spark's split() drops trailing empties where
    DuckDB keeps them — the length filter makes both sides identical
    before anything counts."""
    d = table(spark, sf_dir, "documents")
    sents = d.select(
        "source",
        "doc_id",
        F.explode(F.split("text", r"\.\s+")).alias("s"),
    ).select(
        "source", "doc_id", F.trim("s").alias("sent")
    ).filter(F.length("sent") >= _BOILER_MIN_LEN)
    per_sent = sents.groupBy("source", "sent").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    boiler = F.count_if(F.col("n_docs") >= _BOILER_MIN_DOCS)
    return per_sent.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_sentences"),
        boiler.cast("long").alias("n_boilerplate"),
        he4(boiler.cast("double") / F.count(F.lit(1))).alias(
            "boilerplate_share"
        ),
    )
