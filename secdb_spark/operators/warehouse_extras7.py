"""Round-6 additions, batch 10 — SURVEY §2.X: session-scoped reset
cumulative sums (the gaps-and-islands window composition), the
lines-per-order size distribution, and the corpus Zipf slope (rank-
frequency power-law fit from quantized log moments).

Design rules as everywhere in this package: one declarative DataFrame
plan per op, broadcast what is model-sized, every float reaching the
driver integer-quantized or produced by an identical IEEE expression
tree in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import r4

D0 = "decimal(38,0)"

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity boundary


# ---------------------------------------------------------------------------
# win_reset_cumsum — cumulative sum that RESETS at session boundaries
# ---------------------------------------------------------------------------

@register(
    "win_reset_cumsum",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > {SESSION_GAP_US}
                  OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, event_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS running_value_e4
    FROM sess
    """,
)
def win_reset_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative value per user that RESETS whenever a 30-minute
    inactivity gap opens — the session-scoped running total behind
    "spend so far this visit".  SQL has no RESET clause, so the
    canonical composition is gaps-and-islands: flag boundaries with a
    lag, number sessions with a running sum of flags, then run the
    cumulative inside the (user, session) partition.  Values are 1e4
    fixed-point bigints, so every running total is exact.

    Scale: all three windows order by the same (ts, event_id) within
    the user partition — ONE hash exchange on user_id serves the whole
    chain (the session_id repartition is a subset-key refinement Spark
    evaluates within the same sorted run).  State per window is O(1)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(run)
    )
    wrun = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sess.select(
        "user_id",
        "event_id",
        F.col("session_id").cast("long").alias("session_id"),
        F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long"))
        .over(wrun)
        .cast("long")
        .alias("running_value_e4"),
    )


# ---------------------------------------------------------------------------
# orders_linecount_dist — lines-per-order size distribution
# ---------------------------------------------------------------------------

@register(
    "orders_linecount_dist",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1
    )
    SELECT CAST(n_lines AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(count(*)) OVER () AS BIGINT) AS total_orders
    FROM per_order GROUP BY n_lines
    """,
)
def orders_linecount_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size distribution: how many orders have k line items — the
    fan-out histogram that sizes every orderkey join and explodes-per-
    parent estimate in the warehouse.  Two cascaded combinable
    aggregates (order → size, size → count) plus the windowed total for
    ratio computation downstream; all exact integers.

    Scale: the same shape as dedup_histogram — the second aggregate's
    input is |orders| rows and its key space is the max fan-out (~7 in
    TPC-H), so the global total window runs over a handful of rows."""
    li = table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    dist = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return dist.select(
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.sum("n_orders").over(Window.partitionBy()).cast("long").alias(
            "total_orders"
        ),
    )


# ---------------------------------------------------------------------------
# corpus_zipf_slope — rank-frequency power-law fit
# ---------------------------------------------------------------------------

LN_SCALE = 10**6


@register(
    "corpus_zipf_slope",
    oracle=f"""
    WITH tf AS (
      SELECT term, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ), ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rnk
      FROM tf
    ), q AS (
      SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * {LN_SCALE} + 0.5) AS BIGINT)
               AS x,
             CAST(floor(ln(CAST(freq AS DOUBLE)) * {LN_SCALE} + 0.5) AS BIGINT)
               AS y
      FROM ranked
    ), m AS (
      SELECT count(*) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx,
             sum(CAST(y AS DECIMAL(38,0))) AS sy,
             sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             sum(CAST(x * y AS DECIMAL(38,0))) AS sxy
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round(CAST(CAST(n AS DECIMAL(38,0)) * sxy
                      - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                        - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE), 4)
             AS zipf_slope
    FROM m
    """,
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope of the corpus rank-frequency curve: the least-squares
    slope of ln(freq) on ln(rank) — natural corpora sit near −1, and a
    slope far from it flags templated/machine-generated text (this
    corpus's tiny synthetic vocabulary reads ≈ −0.6).  ln values
    quantize to 1e6 fixed-point (the events_entropy idiom) so the
    regression moments are exact decimal integers; the slope closes
    with the shared num/den IEEE tree.

    Scale: one tokenize scan → term counts (combinable) → a rank window
    over the |vocab|-sized aggregate → one 5-moment pass.  The global
    rank window is the model-sized-spine class (§9): vocabulary, not
    corpus, determines its input."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = tf.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.desc("freq"), "term"))
        .alias("rnk"),
    )
    x = F.floor(F.log(F.col("rnk").cast("double")) * LN_SCALE + 0.5).cast(
        "long"
    )
    y = F.floor(F.log(F.col("freq").cast("double")) * LN_SCALE + 0.5).cast(
        "long"
    )
    q = ranked.select(x.alias("x"), y.alias("y"))
    m = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(D0)).alias("sx"),
        F.sum(F.col("y").cast(D0)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(D0)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(D0)).alias("sxy"),
    )
    nd = F.col("n").cast(D0)
    num = nd * F.col("sxy") - F.col("sx").cast(D0) * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx").cast(D0) * F.col("sx")
    return m.select(
        F.col("n").cast("long").alias("n_terms"),
        r4(num.cast("double") / den.cast("double")).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# win_moving_median — moving median over the daily series
# ---------------------------------------------------------------------------

MOVMED_DAYS = 7


@register(
    "win_moving_median",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(day AS TIMESTAMP) AS day, c,
           round(median(c) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN {MOVMED_DAYS - 1} PRECEDING
                                 AND CURRENT ROW), 4) AS moving_median
    FROM daily
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median of the daily event count ({MOVMED_DAYS}-day
    trailing frame) — the robust trend line (a median frame shrugs off
    the single-day spikes that drag a moving average).  Spark cannot
    window `median` with a frame (INVALID_WINDOW_SPEC), so the engine
    collects the bounded frame into a sorted array and picks the
    middle element(s) — exact for integer counts, interpolating two
    ints as (a+b)/2 (exact in binary), matching DuckDB's native
    windowed `median` semantics.

    Scale: the frame is BOUNDED ({MOVMED_DAYS} rows), so the collected
    array is O(1) per row — this is the one place a collect_list window
    is scale-legitimate; the window input is the daily aggregate
    (model-sized per type), not the raw stream."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    fr = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(MOVMED_DAYS - 1), Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("c").over(fr))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return daily.select(
        "event_type",
        "day",
        F.col("c").cast("long").alias("c"),
        F.round((lo + hi) / 2.0, 4).alias("moving_median"),
    )


# ---------------------------------------------------------------------------
# win_fill_forward — LOCF imputation via IGNORE NULLS window
# ---------------------------------------------------------------------------

@register(
    "win_fill_forward",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 10000 + 0.5) AS BIGINT) END
               AS purchase_e4
      FROM events
    )
    SELECT user_id, event_id, purchase_e4,
           last_value(purchase_e4 IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_e4
    FROM marked
    """,
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) imputation: every event
    row carries the user's most recent PURCHASE value forward — the
    fill-forward idiom behind as-of feature joins and sensor-gap
    imputation, and the IGNORE NULLS window surface (§2.E's last
    uncovered modifier).  Spark expresses it as `last(col,
    ignorenulls=True)` over the running frame, DuckDB as `last_value(x
    IGNORE NULLS)` — identical semantics; the carried value is a 1e4
    fixed-point bigint so equality is exact.  Rows before a user's
    first purchase stay NULL (LOCF's defining edge).

    Scale: one user_id exchange, running frame with O(1) state (the
    single last non-null).  Contrast rollup_gapfill, which fills a
    generated SPINE — this fills in-stream rows; the two compose."""
    ev = table(spark, sf_dir, "events")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 10000 + 0.5).cast("long"),
        ).alias("purchase_e4"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return marked.select(
        "user_id",
        "event_id",
        "purchase_e4",
        F.last("purchase_e4", ignorenulls=True)
        .over(w)
        .alias("last_purchase_e4"),
    )
