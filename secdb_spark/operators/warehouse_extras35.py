"""Round-8 additions, batch 2 — MACD / ATR oscillators, market beta,
audience overlap, concentration trend, weighted moving average.

Reference semantics: SURVEY §2 extension policy (mount empty).  The
time-series family gains the two classic indicator chains still
missing after RSI/Bollinger/stochastic (MACD's nested EMA chain and
Wilder's ATR over true ranges), plus per-brand market beta (the OLS
regression against the market aggregate), day-over-day active-user
Jaccard (audience churn at the set level), a quarterly
supplier-concentration trend (is a nation's supply base concentrating
over time), and the linearly-weighted moving average (exact integer
weights — the WMA the EWMA family approximates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import he4, r4, sql_he4

D0 = "decimal(38,0)"

#: MACD parameters (classic 12/26/9) with bounded-lookback truncation.
MACD_FAST_ALPHA = 2.0 / 13.0
MACD_SLOW_ALPHA = 2.0 / 27.0
MACD_SIG_ALPHA = 2.0 / 10.0
MACD_K = 32       # truncation: (1-2/27)^32 ≈ 8.5% tail for the slow EMA
MACD_SIG_K = 16

#: ATR parameters (Wilder's 14-period smoothing, bounded lookback).
ATR_ALPHA = 1.0 / 14.0
ATR_K = 14

#: WMA-5 integer weights, most-recent first.
WMA_WEIGHTS = (5, 4, 3, 2, 1)

#: anchor for integer week buckets (no engine week-start dependence).
BETA_ANCHOR = "1995-01-01"


def _ewma_sql(col: str, alpha: float, k: int, win: str = "w") -> str:
    """Truncated renormalized EWMA as an explicit lag sum — the win_ewma
    idiom: weight constants are repr'd Python doubles, so both engines
    evaluate the IDENTICAL literal tree."""
    num = " + ".join(
        f"CASE WHEN lag({col}, {i}) OVER {win} IS NOT NULL "
        f"THEN {(1 - alpha) ** i * alpha!r} * lag({col}, {i}) OVER {win} "
        f"ELSE 0 END"
        for i in range(k)
    )
    den = " + ".join(
        f"CASE WHEN lag({col}, {i}) OVER {win} IS NOT NULL "
        f"THEN {(1 - alpha) ** i * alpha!r} ELSE 0 END"
        for i in range(k)
    )
    return f"(({num}) / ({den}))"


def _lag_cols(col: str, k: int, w) -> list[Column]:
    """Bind lag(col, 0..k-1) ONCE as named columns in a single window
    projection.  The EWMA folds then reference plain columns instead of
    repeating each lag expression 3x (value, numerator presence, and
    denominator presence) — same values, same IEEE fold tree, but the
    analyzed plan carries k window expressions instead of 6k (ts_macd's
    analysis dropped 3.9s -> ~1s on the swap)."""
    return [F.lag(col, i).over(w).alias(f"_{col}_l{i}") for i in range(k)]


def _ewma_from_lags(col: str, alpha: float, k: int) -> Column:
    """Truncated renormalized EWMA over the `_lag_cols` projection —
    term order and literal weights identical to `_ewma_sql`, so both
    engines evaluate the same left-associated IEEE sum."""
    num = sum(
        (
            F.when(
                F.col(f"_{col}_l{i}").isNotNull(),
                F.lit((1 - alpha) ** i * alpha) * F.col(f"_{col}_l{i}"),
            ).otherwise(F.lit(0.0))
            for i in range(k)
        ),
        start=F.lit(0.0),
    )
    den = sum(
        (
            F.when(
                F.col(f"_{col}_l{i}").isNotNull(),
                F.lit((1 - alpha) ** i * alpha),
            ).otherwise(F.lit(0.0))
            for i in range(k)
        ),
        start=F.lit(0.0),
    )
    return num / den


# ---------------------------------------------------------------------------
# ts_macd — MACD 12/26/9 over the daily revenue series
# ---------------------------------------------------------------------------

@register(
    "ts_macd",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) / 100.0 AS rev
      FROM orders GROUP BY 1
    ), m1 AS (
      SELECT day, rev,
             {_ewma_sql("rev", MACD_FAST_ALPHA, MACD_K)} AS ema_fast,
             {_ewma_sql("rev", MACD_SLOW_ALPHA, MACD_K)} AS ema_slow
      FROM daily
      WINDOW w AS (ORDER BY day)
    ), m2 AS (
      SELECT day, rev, ema_fast - ema_slow AS macd,
             {_ewma_sql("(ema_fast - ema_slow)", MACD_SIG_ALPHA, MACD_SIG_K)}
               AS signal
      FROM m1
      WINDOW w AS (ORDER BY day)
    )
    SELECT day, {sql_he4("rev")} AS rev,
           {sql_he4("macd")} AS macd,
           {sql_he4("signal")} AS signal,
           {sql_he4("macd - signal")} AS histogram
    FROM m2
    """,
)
def ts_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD (12/26/9) over the daily order-revenue series: fast/slow
    truncated EWMAs, their difference (the MACD line), a 9-period EWMA
    of that difference (the signal line) and the histogram — the
    momentum-crossover chain ts_ewma_cross simplifies, completed with
    the nested second-stage smoothing.  The infinite EMA recursion uses
    win_ewma's bounded-lookback expansion (K={MACD_K} lags sharing ONE
    window spec each stage, weights repr'd into both engines so the
    fold tree is literal-identical); the daily series is an exact
    integer-cents aggregate, so both engines smooth the same doubles.
    Scale: one combinable daily aggregate, then two calendar-bounded
    window passes over |days| rows — model-sized at any order count."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            / 100.0
        ).alias("rev")
    )
    w = Window.orderBy("day")
    m1 = daily.select(
        "day", "rev", *_lag_cols("rev", MACD_K, w)
    ).select(
        "day",
        "rev",
        _ewma_from_lags("rev", MACD_FAST_ALPHA, MACD_K).alias("ema_fast"),
        _ewma_from_lags("rev", MACD_SLOW_ALPHA, MACD_K).alias("ema_slow"),
    )
    m2 = m1.select(
        "day",
        "rev",
        (F.col("ema_fast") - F.col("ema_slow")).alias("macd"),
    ).select(
        "day", "rev", "macd", *_lag_cols("macd", MACD_SIG_K, w)
    ).select(
        "day",
        "rev",
        "macd",
        _ewma_from_lags("macd", MACD_SIG_ALPHA, MACD_SIG_K).alias("signal"),
    )
    return m2.select(
        "day",
        he4(F.col("rev")).alias("rev"),
        he4(F.col("macd")).alias("macd"),
        he4(F.col("signal")).alias("signal"),
        he4(F.col("macd") - F.col("signal")).alias("histogram"),
    )


# ---------------------------------------------------------------------------
# ts_atr — Wilder average true range over daily bars per event type
# ---------------------------------------------------------------------------

@register(
    "ts_atr",
    oracle=f"""
    WITH flagged AS (
      SELECT event_type, date_trunc('day', ts) AS day, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    ), bars AS (
      SELECT event_type, day,
             max(value) AS high, min(value) AS low,
             max(CASE WHEN rn_d = 1 THEN value END) AS close
      FROM flagged GROUP BY 1, 2
    ), tr AS (
      SELECT event_type, day, high, low, close,
             CASE WHEN lag(close) OVER pw IS NULL THEN high - low
                  ELSE greatest(high - low,
                                abs(high - lag(close) OVER pw),
                                abs(low - lag(close) OVER pw))
             END AS true_range
      FROM bars
      WINDOW pw AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, {sql_he4("true_range")} AS true_range,
           {sql_he4(_ewma_sql("true_range", ATR_ALPHA, ATR_K, "pw"))} AS atr
    FROM tr
    WINDOW pw AS (PARTITION BY event_type ORDER BY day)
    """,
)
def ts_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder's Average True Range over daily bars per event type: true
    range = max(high−low, |high−prev close|, |low−prev close|) — the
    gap-aware volatility measure — smoothed by a 1/{ATR_K} EWMA
    (bounded-lookback expansion, win_ewma's idiom).  Completes the
    volatility family next to ts_bollinger (which sees only closes and
    misses gaps).  Bars come from tie-safe row_number flags folded into
    the bar aggregate (ts_ohlc's single-Exchange shape); the TR and ATR
    windows ride the (type, day) bar table — calendar-bounded,
    model-sized at any tick volume."""
    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    w_d = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    bars = (
        ev.withColumn("rn_d", F.row_number().over(w_d))
        .groupBy("event_type", "day")
        .agg(
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        )
    )
    pw = Window.partitionBy("event_type").orderBy("day")
    prev_close = F.lag("close").over(pw)
    tr = bars.select(
        "event_type",
        "day",
        F.when(
            prev_close.isNull(), F.col("high") - F.col("low")
        )
        .otherwise(
            F.greatest(
                F.col("high") - F.col("low"),
                F.abs(F.col("high") - prev_close),
                F.abs(F.col("low") - prev_close),
            )
        )
        .alias("true_range"),
    )
    return tr.select(
        "event_type", "day", "true_range",
        *_lag_cols("true_range", ATR_K, pw),
    ).select(
        "event_type",
        "day",
        he4(F.col("true_range")).alias("true_range"),
        he4(_ewma_from_lags("true_range", ATR_ALPHA, ATR_K)).alias("atr"),
    )


# ---------------------------------------------------------------------------
# ts_beta — per-brand market beta over weekly revenue
# ---------------------------------------------------------------------------

@register(
    "ts_beta",
    oracle=f"""
    WITH bw AS (
      SELECT p.p_brand AS brand,
             CAST(floor(date_diff('day', DATE '{BETA_ANCHOR}',
                                  l.l_shipdate) / 7) AS BIGINT) AS wk,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), mkt AS (
      SELECT wk, CAST(sum(y) AS BIGINT) AS x FROM bw GROUP BY wk
    ), m AS (
      SELECT brand, count(*) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx,
             sum(CAST(y AS DECIMAL(38,0))) AS sy,
             sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
             sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      FROM bw JOIN mkt USING (wk) GROUP BY brand
    )
    SELECT brand, CAST(n AS BIGINT) AS n_weeks,
           {sql_he4('''CAST(CAST(n AS DECIMAL(38,0)) * sxy
                      - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                        - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)''')}
             AS beta
    FROM m
    """,
)
def ts_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand market beta: the OLS slope of a brand's weekly revenue
    on TOTAL market weekly revenue — β>1 brands amplify market swings,
    β≈0 brands are defensive; the portfolio lens brand_revenue_corr's
    pairwise correlations don't give (correlation strips the amplitude;
    beta IS the amplitude).  Weeks are integer buckets from a fixed
    anchor; revenue is exact cents; the market series derives from the
    SAME brand-week aggregate (one fact scan), and the regression runs
    on exact DECIMAL(38,0) integer moments with the shared closing
    num/den tree (corpus_zipf_slope's discipline).  Scale: one
    combinable (brand, week) aggregate, a week-keyed re-aggregate, and
    a broadcast-sized join back — |brands|x|weeks| rows end to end."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bw = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.floor(
                F.datediff(F.col("l_shipdate"), F.lit(BETA_ANCHOR).cast("date"))
                / 7
            )
            .cast("long")
            .alias("wk"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("y")
        )
    )
    mkt = bw.groupBy("wk").agg(F.sum("y").cast("bigint").alias("x"))
    j = bw.join(F.broadcast(mkt), "wk")
    m = j.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(D0)).alias("sx"),
        F.sum(F.col("y").cast(D0)).alias("sy"),
        F.sum(F.col("x").cast(D0) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(D0) * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast(D0)
    num = nd * F.col("sxy") - F.col("sx").cast(D0) * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx").cast(D0) * F.col("sx")
    return m.select(
        "brand",
        F.col("n").cast("long").alias("n_weeks"),
        # he4, not r4: the slope is a raw ratio of shared-IEEE doubles and
        # can land exactly on a 4-dp half-tie (the changepoint_binary class)
        he4(num.cast("double") / den.cast("double")).alias("beta"),
    )


# ---------------------------------------------------------------------------
# events_audience_overlap — day-over-day active-user Jaccard
# ---------------------------------------------------------------------------

@register(
    "events_audience_overlap",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ), daily AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_users FROM act GROUP BY day
    ), ov AS (
      SELECT a.day,
             CAST(count(*) AS BIGINT) AS n_both
      FROM act a JOIN act b
        ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
      GROUP BY a.day
    )
    SELECT d1.day, d1.n_users AS n_today, d2.n_users AS n_next,
           coalesce(o.n_both, 0) AS n_both,
           {sql_he4(
               "CAST(coalesce(o.n_both, 0) AS DOUBLE)"
               " / (d1.n_users + d2.n_users - coalesce(o.n_both, 0))"
           )} AS jaccard
    FROM daily d1
    JOIN daily d2 ON d2.day = d1.day + INTERVAL 1 DAY
    LEFT JOIN ov o ON o.day = d1.day
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience Jaccard: |active(d) ∩ active(d+1)| /
    |active(d) ∪ active(d+1)| — set-level audience churn, the DAU
    continuity number that rolling_active_users (a count) and
    stickiness_ratio (DAU/MAU) both miss: two days can have identical
    DAU with zero overlap.

    Scale shape (round-8 plan audit): the naive form referenced the
    (user, day) distinct from FOUR consumers, and Catalyst dutifully
    recomputed it — four full scans of the raw events table.  This form
    scans ONCE: distinct -> lead(day) over each user's sorted active
    days (a user is in the d/d+1 intersection iff their next active day
    is exactly day+1) -> one groupBy(day) emits n_today and n_both
    together; n_next then rides a self-join of the |days|-row aggregate.
    Shuffles: the distinct, a DAU-aggregate-sized user window, one day
    aggregate — nothing else touches data.  Jaccard closes from exact
    integers with the shared he4 tree."""
    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("day")
    per_day = (
        act.withColumn("nxt", F.lead("day").over(wu))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_today"),
            F.sum(
                F.when(
                    F.col("nxt") == F.col("day") + F.expr("INTERVAL 1 DAY"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_both"),
        )
    )
    nxt_day = per_day.select(
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("n_today").alias("n_next"),
    )
    return (
        per_day.join(nxt_day, "day")
        .select(
            "day",
            "n_today",
            "n_next",
            "n_both",
            he4(
                F.col("n_both").cast("double")
                / (F.col("n_today") + F.col("n_next") - F.col("n_both"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# hhi_trend — quarterly supplier-concentration trend per nation
# ---------------------------------------------------------------------------

@register(
    "hhi_trend",
    oracle=f"""
    WITH sq AS (
      SELECT s.s_nationkey, l.l_suppkey,
             (year(l.l_shipdate) - 1995) * 4 + quarter(l.l_shipdate) - 1
               AS qidx,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS x
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2, 3
    ), hhi AS (
      SELECT s_nationkey, qidx,
             CAST(floor(CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)
                        / (CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
                        * 10000 * 10000 + 0.5) AS BIGINT) AS y
      FROM sq GROUP BY 1, 2
    ), m AS (
      SELECT s_nationkey, count(*) AS n,
             sum(CAST(qidx AS DECIMAL(38,0))) AS sx,
             sum(CAST(y AS DECIMAL(38,0))) AS sy,
             sum(CAST(qidx AS DECIMAL(38,0)) * qidx) AS sxx,
             sum(CAST(qidx AS DECIMAL(38,0)) * y) AS sxy
      FROM hhi GROUP BY 1
    )
    SELECT s_nationkey, CAST(n AS BIGINT) AS n_quarters,
           {sql_he4('''CAST(CAST(n AS DECIMAL(38,0)) * sxy
                      - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                        - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                 / 10000''')} AS hhi_slope_per_quarter
    FROM m
    """,
)
def hhi_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly supplier-concentration trend per nation: the OLS slope
    of the supplier-revenue HHI (agg_hhi's 0-10000 scale) over quarter
    index — a positive slope means the nation's supply base is
    CONCENTRATING (part_supplier_concentration shows today's level;
    this shows the direction).  HHI per quarter uses the integer
    identity sum(x²)/sum(x)² (no per-row float shares), quantized to an
    exact 1e4-grid integer with the shared floor tree; the regression
    then runs on integer moments only (corpus_zipf_slope's discipline)
    and the slope is presented back on the HHI scale.  Scale: one
    (nation, supplier, quarter) combinable aggregate, a model-sized
    re-aggregate per (nation, quarter), and a |nations|-row close."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sq = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            "s_nationkey",
            "l_suppkey",
            (
                (F.year("l_shipdate") - 1995) * 4
                + F.quarter("l_shipdate")
                - 1
            ).alias("qidx"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("x")
        )
    )
    ssum = F.sum("x").cast("double")
    qsum = F.sum(F.col("x").cast(D0) * F.col("x")).cast("double")
    hhi = sq.groupBy("s_nationkey", "qidx").agg(
        F.floor(qsum / (ssum * ssum) * 10000 * 10000 + 0.5)
        .cast("bigint")
        .alias("y")
    )
    m = hhi.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qidx").cast(D0)).alias("sx"),
        F.sum(F.col("y").cast(D0)).alias("sy"),
        F.sum(F.col("qidx").cast(D0) * F.col("qidx")).alias("sxx"),
        F.sum(F.col("qidx").cast(D0) * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast(D0)
    num = nd * F.col("sxy") - F.col("sx").cast(D0) * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx").cast(D0) * F.col("sx")
    return m.select(
        "s_nationkey",
        F.col("n").cast("long").alias("n_quarters"),
        # he4, not r4: raw ratio can tie at 4 dp (changepoint_binary class)
        he4(num.cast("double") / den.cast("double") / 10000).alias(
            "hhi_slope_per_quarter"
        ),
    )


# ---------------------------------------------------------------------------
# win_weighted_moving_avg — exact integer-weight WMA over daily revenue
# ---------------------------------------------------------------------------

def _wma_sql() -> tuple[str, str]:
    num = " + ".join(
        f"CASE WHEN lag(cents, {i}) OVER pw IS NOT NULL "
        f"THEN {w} * lag(cents, {i}) OVER pw ELSE 0 END"
        for i, w in enumerate(WMA_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN lag(cents, {i}) OVER pw IS NOT NULL "
        f"THEN {w} ELSE 0 END"
        for i, w in enumerate(WMA_WEIGHTS)
    )
    return num, den


_WMA_NUM, _WMA_DEN = _wma_sql()


@register(
    "win_weighted_moving_avg",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, day,
           CAST(cents AS BIGINT) AS cents,
           {sql_he4(f"CAST({_WMA_NUM} AS DOUBLE) / ({_WMA_DEN}) / 100")}
             AS wma
    FROM daily
    WINDOW pw AS (PARTITION BY o_orderpriority ORDER BY day)
    """,
)
def win_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted moving average (WMA-{len(WMA_WEIGHTS)}, weights
    {WMA_WEIGHTS}) of daily order revenue per priority — the
    triangular-weight smoother between the SMA (win_moving) and the
    EWMA (win_ewma), and the only one of the three whose value is an
    EXACT rational: integer weights times integer cents over an integer
    weight sum, with partial windows renormalized at series heads.
    Only the final presentation divide is floating point (shared he4
    tree).  The lag chain shares one (priority, day) window spec —
    single Exchange over the calendar-bounded daily aggregate."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    pw = Window.partitionBy("o_orderpriority").orderBy("day")
    num = sum(
        (
            F.when(
                F.lag("cents", i).over(pw).isNotNull(),
                F.lit(w) * F.lag("cents", i).over(pw),
            ).otherwise(F.lit(0))
            for i, w in enumerate(WMA_WEIGHTS)
        ),
        start=F.lit(0),
    )
    den = sum(
        (
            F.when(
                F.lag("cents", i).over(pw).isNotNull(), F.lit(w)
            ).otherwise(F.lit(0))
            for i, w in enumerate(WMA_WEIGHTS)
        ),
        start=F.lit(0),
    )
    return daily.select(
        "o_orderpriority",
        "day",
        "cents",
        he4(num.cast("double") / den / 100).alias("wma"),
    )
