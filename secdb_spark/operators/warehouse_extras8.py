"""Round-7 additions, batch 2 — supply-chain reliability, funnel
latency, corpus-overlap, and momentum/geometric aggregates.

Reference semantics: SURVEY §2 extension policy (mount empty) — classic
warehouse KPL shapes re-expressed Spark-first with the package's
determinism conventions: exact integer day/µs arithmetic, e4/e6
fixed-point quantization before any float accumulation, shared IEEE
expression trees for derived doubles, round(x, 4) at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table, table_rows
from ..registry import register
from ._global_order import GLOBAL_WINDOW_GATE, grouped_range_prefix_sum
from ._helpers import pin, r4

# ---------------------------------------------------------------------------
# supplier_otd — on-time-delivery scorecard per supplier
# ---------------------------------------------------------------------------

OTD_SLA_DAYS = 60  # ship-within-N-days commitment


@register(
    "supplier_otd",
    oracle=f"""
    WITH s AS (
      SELECT l.l_suppkey,
             datediff('day', o.o_orderdate, l.l_shipdate) AS lag
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), f AS (
      SELECT l_suppkey,
             CASE WHEN lag > {OTD_SLA_DAYS} THEN 1 ELSE 0 END AS late,
             CASE WHEN lag > {OTD_SLA_DAYS} THEN lag - {OTD_SLA_DAYS}
                  ELSE 0 END AS delay
      FROM s
    )
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(late) AS BIGINT) AS n_late,
           round(CAST(sum(late) AS DOUBLE) / count(*), 4) AS late_ratio,
           CAST(max(delay) AS BIGINT) AS max_delay_days,
           round(CAST(sum(delay) AS DOUBLE)
                 / greatest(sum(late), 1), 4) AS avg_late_delay_days
    FROM f GROUP BY l_suppkey
    """,
)
def supplier_otd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier on-time-delivery scorecard: share of lines shipped past
    the {OTD_SLA_DAYS}-day order-to-ship SLA per supplier, plus delay
    severity — the vendor scorecard behind TPC-H Q21's "who keeps orders
    waiting" (the corpus carries ship dates, so the SLA is order→ship;
    with receipt/commit columns the same plan scores receipt vs commit).
    All exact integer day arithmetic; the two ratios divide exact
    integers in shared trees.  One orderkey-co-partitioned join + one
    map-side-combinable aggregate on l_suppkey."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    late = F.when(lag > OTD_SLA_DAYS, 1).otherwise(0)
    delay = F.when(lag > OTD_SLA_DAYS, lag - OTD_SLA_DAYS).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_suppkey", late.alias("late"), delay.alias("delay"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("late").cast("long").alias("n_late"),
            r4(F.sum("late").cast("double") / F.count(F.lit(1))).alias(
                "late_ratio"
            ),
            F.max("delay").cast("long").alias("max_delay_days"),
            r4(
                F.sum("delay").cast("double")
                / F.greatest(F.sum("late"), F.lit(1))
            ).alias("avg_late_delay_days"),
        )
    )


# ---------------------------------------------------------------------------
# funnel_latency — time-to-convert percentiles per funnel stage pair
# ---------------------------------------------------------------------------

@register(
    "funnel_latency",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
      GROUP BY e.user_id
    ), gaps AS (
      SELECT 'view->click' AS stage, c.t_click - v.t_view AS gap_us
      FROM v JOIN c ON v.user_id = c.user_id
      UNION ALL
      SELECT 'click->purchase' AS stage, p.t_purchase - c.t_click AS gap_us
      FROM c JOIN p ON c.user_id = p.user_id
    )
    SELECT stage,
           CAST(count(*) AS BIGINT) AS n_users,
           round(quantile_cont(gap_us, 0.50) / 1000000, 4) AS p50_s,
           round(quantile_cont(gap_us, 0.95) / 1000000, 4) AS p95_s
    FROM gaps GROUP BY stage
    """,
)
def funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel LATENCY: how long users take between ordered stages
    (first view -> first subsequent click -> first subsequent purchase),
    as p50/p95 per stage pair — funnel_events counts who converts, this
    measures how fast (the metric that decides nudge timing).  Gaps are
    exact integer µs; interpolated percentiles over integers are exact
    binary arithmetic (the agg_percentile semantics), divided to seconds
    by the same 10^6 literal both engines.

    Scale: three combinable per-user min-aggregates chained by user_id
    equi-joins (all co-partitioned on the same key — one shuffle
    lineage), then a 2-group percentile over the per-user gaps."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("t"),
    )
    # v/c/p are per-user min aggregates with 2-3 consumers each (the
    # next stage + the gap projections): pinned so the event scans run
    # once per stage (plan-audit, SCALE.md §50; un-pinned: 8 scans).
    v = pin(
        ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
            F.min("t").alias("t_view")
        )
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("t") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    c = pin(c)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    p = pin(p)
    g1 = v.join(c, "user_id").select(
        F.lit("view->click").alias("stage"),
        (F.col("t_click") - F.col("t_view")).alias("gap_us"),
    )
    g2 = c.join(p, "user_id").select(
        F.lit("click->purchase").alias("stage"),
        (F.col("t_purchase") - F.col("t_click")).alias("gap_us"),
    )
    return (
        g1.unionAll(g2)
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            r4(F.percentile("gap_us", F.lit(0.50)) / 1000000).alias("p50_s"),
            r4(F.percentile("gap_us", F.lit(0.95)) / 1000000).alias("p95_s"),
        )
    )


# ---------------------------------------------------------------------------
# source_vocab_overlap — pairwise source vocabulary Jaccard
# ---------------------------------------------------------------------------

@register(
    "source_vocab_overlap",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT source, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ), sz AS (
      SELECT source, count(*) AS n FROM vocab GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_common
      FROM vocab a JOIN vocab b
        ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           round(CAST(i.n_common AS DOUBLE)
                 / (sa.n + sb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sz sa ON i.source_a = sa.source
    JOIN sz sb ON i.source_b = sb.source
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-level
    similarity matrix that finds mirror/scraped source pairs BEFORE
    doc-level dedup spends compute on them (two sources at 0.9 vocab
    overlap are the same crawl twice).  Candidates form only through the
    term-postings equi-join (sim_containment's plan shape) — never a
    source × source × vocab product; output is |sources|²/2 rows.

    Exactness: integer intersection / derived-integer union in one
    shared tree, round 4."""
    d = table(spark, sf_dir, "documents")
    # pinned: the (source, term) vocab feeds sizes + both join sides
    # (plan-audit, SCALE.md §50; un-pinned: 4 tokenize scans).
    vocab = pin(d.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).distinct())
    sz = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = vocab.select(F.col("source").alias("source_a"), "term")
    b = vocab.select(F.col("source").alias("source_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("long").alias("n_common"),
            r4(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# ts_rsi — relative strength index on the daily series (SMA variant)
# ---------------------------------------------------------------------------

RSI_DAYS = 14


@register(
    "ts_rsi",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS close_e4
      FROM events GROUP BY 1, 2
    ), delta AS (
      SELECT event_type, day, close_e4,
             close_e4 - lag(close_e4) OVER (PARTITION BY event_type
                                            ORDER BY day) AS d
      FROM daily
    ), gl AS (
      SELECT event_type, day,
             CASE WHEN d > 0 THEN d ELSE 0 END AS gain,
             CASE WHEN d < 0 THEN -d ELSE 0 END AS loss,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM delta WHERE d IS NOT NULL
    ), win AS (
      SELECT event_type, day, rn,
             sum(gain) OVER fr AS sg,
             sum(loss) OVER fr AS sl
      FROM gl
      WINDOW fr AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN {RSI_DAYS - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(day AS TIMESTAMP) AS day,
           round(CASE WHEN sl = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + CAST(sg AS DOUBLE) / sl)
                 END, 4) AS rsi
    FROM win WHERE rn >= {RSI_DAYS}
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (simple-moving-average variant, not
    Wilder's recursive smoothing — the SMA form is windowable and
    engine-exact; the recursion is sequential state) over the daily
    aggregate value per event type — the momentum indicator beside
    ts_bollinger/win_drawdown.  Gains/losses are e4-quantized bigints,
    so the {RSI_DAYS}-day sums are exact and `100 - 100/(1+sg/sl)` is a
    shared IEEE tree on exact integers; the all-loss-zero edge pins to
    100 exactly.

    Scale: one day-keyed combinable aggregate, then lag + one ROWS
    frame on the (type, day) series — calendar-bounded partitions."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long")).alias(
            "close_e4"
        )
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    delta = daily.withColumn(
        "d", F.col("close_e4") - F.lag("close_e4").over(wo)
    ).filter(F.col("d").isNotNull())
    gl = delta.select(
        "event_type",
        "day",
        F.when(F.col("d") > 0, F.col("d")).otherwise(0).alias("gain"),
        F.when(F.col("d") < 0, -F.col("d")).otherwise(0).alias("loss"),
        F.row_number().over(wo).alias("rn"),
    )
    fr = wo.rowsBetween(-(RSI_DAYS - 1), 0)
    win = gl.select(
        "event_type",
        "day",
        "rn",
        F.sum("gain").over(fr).alias("sg"),
        F.sum("loss").over(fr).alias("sl"),
    ).filter(F.col("rn") >= RSI_DAYS)
    rsi = F.when(F.col("sl") == 0, F.lit(100.0)).otherwise(
        100.0 - 100.0 / (1.0 + F.col("sg").cast("double") / F.col("sl"))
    )
    return win.select("event_type", "day", r4(rsi).alias("rsi"))


# ---------------------------------------------------------------------------
# agg_geomean — geometric mean via quantized log moments
# ---------------------------------------------------------------------------

GEOMEAN_Q = 1_000_000  # ln quantization (price_elasticity's basis)


@register(
    "agg_geomean",
    oracle=f"""
    WITH q AS (
      SELECT o_orderpriority,
             CAST(floor(ln(o_totalprice) * {GEOMEAN_Q} + 0.5) AS BIGINT)
               AS lq
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(exp(CAST(sum(lq) AS DOUBLE) / count(*) / {GEOMEAN_Q}), 4)
             AS geomean_price
    FROM q GROUP BY o_orderpriority
    """,
)
def agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean order value per priority class — the right average
    for multiplicative quantities (price distributions are log-normal-
    ish; the arithmetic mean over-weights whales).  Exactness via the
    price_elasticity basis: each ln is quantized to an e6 BIGINT before
    summation, so the accumulation is exact integer in any order, and
    exp(sum/n/10^6) is one shared IEEE tree.

    Scale: one map-side-combinable aggregate; the quantized log moment
    is the same trick that keeps any log-domain statistic (geo-std,
    log-regression) hash-certifiable."""
    o = table(spark, sf_dir, "orders")
    lq = F.floor(F.log(F.col("o_totalprice")) * GEOMEAN_Q + 0.5).cast("long")
    return (
        o.select("o_orderpriority", lq.alias("lq"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r4(
                F.exp(
                    F.sum("lq").cast("double")
                    / F.count(F.lit(1))
                    / GEOMEAN_Q
                )
            ).alias("geomean_price"),
        )
    )


# ---------------------------------------------------------------------------
# discount_band_rev — pricing-ladder revenue analysis
# ---------------------------------------------------------------------------

@register(
    "discount_band_rev",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(l_discount * 100 + 0.5) AS INTEGER) AS discount_pct,
             CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(38,6)) AS rev,
             CAST(l_extendedprice * l_discount AS DECIMAL(38,6)) AS given_up,
             l_quantity
      FROM lineitem
    )
    SELECT discount_pct,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(rev) AS DOUBLE), 4) AS revenue,
           round(CAST(sum(given_up) AS DOUBLE), 4) AS discount_given,
           CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             AS total_qty
    FROM b GROUP BY discount_pct
    """,
)
def discount_band_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-ladder analysis: revenue, discount dollars given up, and
    volume per integer discount band — the table a pricing team reads to
    see whether deeper discounts buy proportional volume (the aggregate
    twin of price_elasticity's fitted slope).  Band is exact integer
    (floor(disc*100+0.5)); money accumulates in DECIMAL(38,6).

    Scale: one map-side-combinable aggregate on an 11-value key."""
    li = table(spark, sf_dir, "lineitem")
    band = F.floor(F.col("l_discount") * 100 + 0.5).cast("int")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    given = (F.col("l_extendedprice") * F.col("l_discount")).cast(
        "decimal(38,6)"
    )
    qty = F.floor(F.col("l_quantity") + 0.5).cast("long")
    return (
        li.select(
            band.alias("discount_pct"),
            rev.alias("rev"),
            given.alias("given_up"),
            qty.alias("qty"),
        )
        .groupBy("discount_pct")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            r4(F.sum("rev").cast("double")).alias("revenue"),
            r4(F.sum("given_up").cast("double")).alias("discount_given"),
            F.sum("qty").cast("long").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# customer_reorder_rate — repeat-purchase share per nation (round-7 batch 3)
# ---------------------------------------------------------------------------

@register(
    "customer_reorder_rate",
    oracle="""
    WITH per AS (
      SELECT c.c_nationkey, o.o_custkey, count(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS reorder_rate,
           round(CAST(sum(n_orders) AS DOUBLE) / count(*), 4)
             AS avg_orders
    FROM per GROUP BY c_nationkey
    """,
)
def customer_reorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate per nation: of customers who ordered at all,
    how many came back — the top-line loyalty KPI that new_vs_returning
    tracks over time and this op slices by geography.  Exact integer
    counts, shared-tree divisions.

    Scale: the per-customer rollup shuffles once on o_custkey; the
    nation dimension joins broadcast; the closing aggregate is 25
    rows."""
    o = table(spark, sf_dir, "orders").select("o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    rep = F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    return per.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(rep).cast("long").alias("n_repeat"),
        r4(F.sum(rep).cast("double") / F.count(F.lit(1))).alias(
            "reorder_rate"
        ),
        r4(F.sum("n_orders").cast("double") / F.count(F.lit(1))).alias(
            "avg_orders"
        ),
    )


# ---------------------------------------------------------------------------
# ts_rolling_corr — rolling view/purchase correlation (round-7 batch 3)
# ---------------------------------------------------------------------------

CORR_DAYS = 14


@register(
    "ts_rolling_corr",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(count_if(event_type = 'view') AS BIGINT) AS x,
             CAST(count_if(event_type = 'purchase') AS BIGINT) AS y
      FROM events GROUP BY 1
    ), w AS (
      SELECT day, x, y,
             count(*) OVER fr AS n,
             sum(x) OVER fr AS sx, sum(y) OVER fr AS sy,
             sum(x * x) OVER fr AS sxx, sum(y * y) OVER fr AS syy,
             sum(x * y) OVER fr AS sxy,
             row_number() OVER (ORDER BY day) AS rn
      FROM daily
      WINDOW fr AS (ORDER BY day
                    ROWS BETWEEN {CORR_DAYS - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 4) AS corr_vp
    FROM w WHERE rn >= {CORR_DAYS}
    """,
)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {CORR_DAYS}-day Pearson correlation between daily view
    and purchase volumes — the demand-coupling monitor (a collapse says
    views stopped converting; ts_cross_corr finds the LAG, this tracks
    the strength over time).  All five windowed moments are exact
    integer sums; the correlation closes in one shared IEEE tree,
    round 4.

    Scale: one day-keyed combinable aggregate, then a single ROWS frame
    over the calendar-bounded daily series (the users_cumulative
    allowlist class)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    wo = Window.orderBy("day")
    fr = wo.rowsBetween(-(CORR_DAYS - 1), 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("x").over(fr).alias("sx"),
        F.sum("y").over(fr).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(fr).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(fr).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(fr).alias("sxy"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("rn") >= CORR_DAYS)
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    corr = (n * F.col("sxy") - sx * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - sx * F.col("sx"))
        * F.sqrt(n * F.col("syy") - sy * F.col("sy"))
    )
    return w.select("day", r4(corr).alias("corr_vp"))


# ---------------------------------------------------------------------------
# ts_trend_slope — least-squares time trend per event type (round-7 batch 4)
# ---------------------------------------------------------------------------

TREND_EPOCH = "2024-01-01"  # x origin (any fixed date; slope is shift-free)


@register(
    "ts_trend_slope",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '{TREND_EPOCH}',
                      CAST(date_trunc('day', ts) AS DATE)) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4)
             AS slope_per_day
    FROM m
    """,
)
def ts_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of daily volume per event type (events/day of
    growth or decay) — the single number behind every "is this metric
    trending" question; agg_regression fits price-vs-quantity, this fits
    volume-vs-TIME.  x is integer days since a fixed origin and y exact
    counts, so all four moments are exact bigints and the slope closes
    in one shared IEEE tree (round 4).

    Scale: one day-keyed combinable aggregate, then a per-type moment
    rollup (model-sized) — no window at all."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit(TREND_EPOCH).cast("date")
        ).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    slope = (n * F.col("sxy") - sx * F.col("sy")) / (
        n * F.col("sxx") - sx * F.col("sx")
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        r4(slope).alias("slope_per_day"),
    )


# ---------------------------------------------------------------------------
# events_dispersion — index of dispersion per event type (round-7 batch 4)
# ---------------------------------------------------------------------------

@register(
    "events_dispersion",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                 / (n - 1) / (CAST(sy AS DOUBLE) / n), 4)
             AS dispersion
    FROM m WHERE n >= 2
    """,
)
def events_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of daily volume per
    event type — the burstiness test: ~1 means Poisson-like arrivals,
    >1 clumped (campaign spikes, incident storms), <1 regularized
    (rate-limited).  The companion to events_burst: that finds WHEN,
    this scores HOW MUCH overall.  Integer count moments, one shared
    IEEE closing tree, round 4.

    Scale: a day-keyed combinable aggregate + a per-type moment rollup;
    no window."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    ).filter(F.col("n") >= 2)
    n = F.col("n").cast("double")
    sy = F.col("sy").cast("double")
    disp = (F.col("syy") - sy * F.col("sy") / n) / (n - 1) / (sy / n)
    return m.select(
        "event_type", F.col("n").alias("n_days"), r4(disp).alias("dispersion")
    )


# ---------------------------------------------------------------------------
# brand_return_rate — merchandising returns scorecard (round-7 batch 4)
# ---------------------------------------------------------------------------

@register(
    "brand_return_rate",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count_if(l.l_returnflag = 'R') AS BIGINT) AS n_returned,
           round(CAST(count_if(l.l_returnflag = 'R') AS DOUBLE)
                 / count(*), 4) AS return_rate,
           round(CAST(sum(CASE WHEN l.l_returnflag = 'R'
                               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                         AS DECIMAL(38,6))
                               ELSE CAST(0 AS DECIMAL(38,6)) END)
                      AS DOUBLE), 4) AS returned_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def brand_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate and returned revenue per brand — the merchandising
    quality scorecard (a brand whose return share spikes is a defect or
    a listing-accuracy problem).  Exact counts; returned revenue
    accumulates in DECIMAL(38,6).

    Scale: part is the broadcast dim; one fact-side combinable
    aggregate on the |brands|-value key."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    rev = F.when(
        F.col("l_returnflag") == "R",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(38,6)"
        ),
    ).otherwise(F.lit(0).cast("decimal(38,6)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_brand", ret.alias("ret"), rev.alias("rev"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("ret").cast("long").alias("n_returned"),
            r4(F.sum("ret").cast("double") / F.count(F.lit(1))).alias(
                "return_rate"
            ),
            r4(F.sum("rev").cast("double")).alias("returned_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# nation_tax_rate — effective tax by supplier nation (round-7 batch 4)
# ---------------------------------------------------------------------------

@register(
    "nation_tax_rate",
    oracle="""
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(CAST(l.l_extendedprice * l.l_tax
                               AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,6)))
                        AS DOUBLE), 4) AS effective_tax_rate
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def nation_tax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted effective tax rate per supplier nation — the
    compliance sanity view (a nation whose effective rate drifts from
    its statutory band has misconfigured tax codes upstream).  Both
    sums accumulate in DECIMAL(38,6); the rate is one exact-over-exact
    division, round 4.

    Scale: supplier broadcasts; one combinable aggregate on the 25-value
    nation key."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_tax"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    taxed = (F.col("l_extendedprice") * F.col("l_tax")).cast("decimal(38,6)")
    base = F.col("l_extendedprice").cast("decimal(38,6)")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("s_nationkey", taxed.alias("taxed"), base.alias("base"))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            r4(
                F.sum("taxed").cast("double") / F.sum("base").cast("double")
            ).alias("effective_tax_rate"),
        )
    )


# ---------------------------------------------------------------------------
# session_bounce_rate — single-event-session share per entry type (batch 4)
# ---------------------------------------------------------------------------

BOUNCE_GAP_US = 30 * 60 * 1_000_000  # 30-min session boundary


@register(
    "session_bounce_rate",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t
      FROM events
    ), marked AS (
      SELECT user_id, event_id, event_type, t,
             CASE WHEN t - lag(t) OVER w IS NULL
                    OR t - lag(t) OVER w > {BOUNCE_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ), sess AS (
      SELECT user_id, event_type, t, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ), per AS (
      SELECT user_id, sid,
             CAST(count(*) AS BIGINT) AS n_events,
             min({{'t': t, 'event_id': event_id, 'event_type': event_type}})
               AS first_row
      FROM sess GROUP BY user_id, sid
    )
    SELECT (first_row).event_type AS entry_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count_if(n_events = 1) AS BIGINT) AS n_bounce,
           round(CAST(count_if(n_events = 1) AS DOUBLE) / count(*), 4)
             AS bounce_rate
    FROM per GROUP BY 1
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session ENTRY type: sessionize on the 30-minute
    inactivity gap (events_sessionize's boundary), classify each session
    by its first event, and report the share that ended after one event
    — the landing-quality metric per acquisition surface (the funnel's
    step-zero complement to first_touch_mix).

    The entry pick is a tie-safe min-struct on (t, event_id); session
    ids are per-user running sums of boundary flags — one user_id
    shuffle shared by the lag, the cumsum, and the per-session
    aggregate.  Exact integers throughout."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gap = F.col("t") - F.lag("t").over(w)
    marked = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > BOUNCE_GAP_US), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.struct("t", "event_id", "event_type")).alias("first_row"),
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return (
        per.select(
            F.col("first_row.event_type").alias("entry_type"),
            F.col("n_events"),
        )
        .groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(bounce).cast("long").alias("n_bounce"),
            r4(F.sum(bounce).cast("double") / F.count(F.lit(1))).alias(
                "bounce_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# agg_percentile_disc — discrete percentiles per group (round-7 batch 6)
# ---------------------------------------------------------------------------

PD_PS = ((1, 4), (1, 2), (3, 4))  # exact rationals: p25 / p50 / p75


@register(
    "agg_percentile_disc",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           {", ".join(
               f"quantile_disc(l_extendedprice, {num}.0/{den})"
               f" AS p{int(num * 100 // den)}"
               for num, den in PD_PS)}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (quantile_disc / SQL percentile_disc
    semantics: the value at rank ceil(p·n) of the ordered inputs —
    always an actual data point, unlike agg_percentile's interpolation;
    rule probe-verified against DuckDB and computed below in pure
    integer arithmetic: rank = (num·n + den − 1) div den).

    Computed without any fact-table window: aggregate to distinct
    (flag, price) counts, run the grouped bucketed prefix sum over the
    per-price counts (`_global_order.grouped_range_prefix_sum` — the
    agg_weighted_median kernel with weight = row count, so the
    low-cardinality flag key never funnels), then each percentile is a
    min-over-threshold pick.  Raw parquet doubles cross engines
    untouched; ranks are exact integers — no FP in the pick at all.

    This shape IS the scale kernel (no below-gate variant needed: the
    pre-aggregate + bucketed cumsum is also the cheapest plan at small
    scale, unlike the window kernels the gates arbitrate)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    )
    cum = grouped_range_prefix_sum(
        li.withColumn("one", F.lit(1)),
        ["l_returnflag"],
        "price",
        "one",
        out="_cum",
        small=table_rows(sf_dir, "lineitem") <= GLOBAL_WINDOW_GATE,
    )
    tot = cum.groupBy("l_returnflag").agg(
        F.sum("_v").cast("long").alias("n")
    )
    j = cum.join(F.broadcast(tot), "l_returnflag")
    picks = []
    for num, den in PD_PS:
        threshold = F.floor(
            (F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den)
        ).cast("long")
        picks.append(
            F.min(
                F.when(F.col("_cum") >= threshold, F.col("price"))
            ).alias(f"p{int(num * 100 // den)}")
        )
    return j.groupBy("l_returnflag").agg(F.max("n").alias("n"), *picks)
