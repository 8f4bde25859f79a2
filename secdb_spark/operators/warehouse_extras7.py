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
from ._helpers import pin, r4

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


# ---------------------------------------------------------------------------
# users_cumulative — DAU + cumulative distinct users per day (round 7)
# ---------------------------------------------------------------------------

@register(
    "users_cumulative",
    oracle="""
    WITH firstd AS (
      SELECT user_id, min(date_trunc('day', ts)) AS d
      FROM events GROUP BY user_id
    ), newu AS (
      SELECT d, count(*) AS new_users FROM firstd GROUP BY d
    ), act AS (
      SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    )
    SELECT CAST(a.day AS TIMESTAMP) AS day,
           CAST(a.dau AS BIGINT) AS dau,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0))
                  OVER (ORDER BY a.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_users
    FROM act a LEFT JOIN newu n ON a.day = n.d
    """,
)
def users_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + cumulative distinct users — the growth chart
    every product dashboard opens with.  Cumulative DISTINCT is made
    windowable by the first-occurrence trick (vocab_growth's pattern on
    users): a user contributes to the cumulative count exactly once, at
    min(day), so cum_users is a running SUM of per-day first-seen
    counts — exact integers end to end.

    Scale: first-day and DAU are combinable aggregates (one user_id and
    one (day, user_id) shuffle); the running sum rides the per-DAY
    aggregate, whose cardinality is calendar-bounded — the one global
    window in this module that is structurally model-sized."""
    ev = table(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("d")
    )
    newu = firstd.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    act = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    j = act.join(newu, "day", "left").select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.select(
        "day",
        "dau",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# graph_degree_dist — copurchase-graph degree distribution (round 7)
# ---------------------------------------------------------------------------

@register(
    "graph_degree_dist",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT p, count(*) AS degree FROM (
        SELECT pa AS p, pb FROM edges
        UNION ALL
        SELECT pb AS p, pa FROM edges
      ) GROUP BY p
    )
    SELECT CAST(length(bin(CAST(degree AS INTEGER))) - 1 AS INTEGER)
             AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(min(degree) AS BIGINT) AS min_degree,
           CAST(max(degree) AS BIGINT) AS max_degree
    FROM deg GROUP BY 1
    """,
)
def graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (parts sharing an
    order), log2-bucketed — the first thing to look at before running
    pagerank/triangles on a graph: a heavy tail here predicts hot-key
    skew in every downstream graph shuffle.  The log2 bucket is computed
    via BINARY STRING LENGTH (length(bin(degree)) - 1), i.e. pure
    integer floor(log2) — no FP log whose last bit could disagree
    across engines at bucket boundaries.

    Scale: edge generation is the basket_copurchase O(k²)-per-order
    fan-out (bounded by lines-per-order); degrees and buckets are
    combinable aggregates."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    # pinned: edges feeds both endpoint-union halves — un-pinned the
    # O(k^2) pair join ran twice (plan-audit, SCALE.md §50).
    edges = pin(edges)
    deg = (
        edges.select(F.col("pa").alias("p"))
        .unionAll(edges.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    bucket = (
        F.length(F.conv(F.col("degree").cast("string"), 10, 2)) - 1
    ).cast("int")
    return deg.groupBy(bucket.alias("log2_bucket")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("degree").cast("long").alias("min_degree"),
        F.max("degree").cast("long").alias("max_degree"),
    )


# ---------------------------------------------------------------------------
# events_props_stats — typed aggregation over the JSON props column (round 7)
# ---------------------------------------------------------------------------

@register(
    "events_props_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                      AS DOUBLE) / count(*), 4) AS avg_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a semi-structured payload: extract the integer
    property from the JSON props string and roll it up per event type —
    the ubiquitous "stats over a JSON column" warehouse query (fn_json
    certifies the scalar extraction; this certifies extraction FUSED
    into a combinable aggregate).  avg is an exact-integer / count
    rational, rounded identically both engines.

    Scale: get_json_object is JVM-side (Jackson) inside codegen — the
    parse fuses into the scan; one map-side-combinable shuffle on
    event_type."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        r4(F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        F.min(k).cast("long").alias("min_k"),
        F.max(k).cast("long").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# orders_seasonality_index — monthly revenue index (round 7)
# ---------------------------------------------------------------------------

@register(
    "orders_seasonality_index",
    oracle="""
    WITH m AS (
      SELECT month(o_orderdate) AS month,
             sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT sum(rev) AS total, count(*) AS n_months FROM m
    )
    SELECT m.month,
           round(CAST(m.rev AS DOUBLE), 4) AS revenue,
           round(CAST(m.rev AS DOUBLE) * t.n_months
                 / CAST(t.total AS DOUBLE), 4) AS seasonality_index
    FROM m CROSS JOIN tot t
    """,
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonality index: each calendar month's revenue over the
    all-months average (index > 1 = hot month) — the demand-planning
    query behind safety-stock and staffing decisions.  Sums accumulate
    in DECIMAL(38,6) (order-independent), and the index is computed by
    the IDENTICAL IEEE tree `rev * n_months / total` on exact-decimal
    inputs, so the rounded doubles agree bit-for-bit.

    Scale: one map-side-combinable month aggregate (12 rows), grand
    total broadcast back as one row."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.month("o_orderdate").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev")
    )
    tot = m.agg(
        F.sum("rev").alias("total"), F.count(F.lit(1)).alias("n_months")
    )
    return m.crossJoin(F.broadcast(tot)).select(
        "month",
        r4(F.col("rev").cast("double")).alias("revenue"),
        r4(
            F.col("rev").cast("double")
            * F.col("n_months")
            / F.col("total").cast("double")
        ).alias("seasonality_index"),
    )
