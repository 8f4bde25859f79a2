"""Round-7 additions, batch 24 — robust trend, changepoint detection,
price-forensics, term burstiness.

Reference semantics: SURVEY §2 extension policy (mount empty).
ts_theilsen_slope and changepoint_binary extend the per-day-aggregate
time-series family (every window/pair runs over the calendar-bounded
daily frame, never the event stream); audit_round_prices joins the
audit family (Benford / dup-payments); term_burstiness is the
Church-Gale cf/df statistic over the corpus vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, he4, r4, sql_he4

DEC6 = "decimal(38,6)"
DEC12 = "decimal(38,12)"

TS_ANCHOR = "2024-01-01"


def _daily_sql() -> str:
    return f"""
      SELECT event_type,
             datediff('day', TIMESTAMP '{TS_ANCHOR}', date_trunc('day', ts))
               AS di,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# ts_theilsen_slope — robust pairwise-median trend per type
# ---------------------------------------------------------------------------

@register(
    "ts_theilsen_slope",
    oracle=f"""
    WITH daily AS ({_daily_sql()}),
    pairs AS (
      SELECT a.event_type,
             (b.x - a.x) / (b.di - a.di) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.di < b.di
    ), mom AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(di AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(di * x AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(CAST(di AS DOUBLE) * di AS DECIMAL(38,12)))
                  AS DOUBLE) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT m.event_type, m.n_days,
           CAST(count(p.slope) AS BIGINT) AS n_pairs,
           round(median(p.slope), 4) AS theil_sen_slope,
           round((m.n_days * m.sxy - m.sx * m.sy)
                 / (m.n_days * m.sxx - m.sx * m.sx), 4) AS ols_slope
    FROM mom m JOIN pairs p ON m.event_type = p.event_type
    GROUP BY m.event_type, m.n_days, m.sx, m.sy, m.sxy, m.sxx
    """,
)
def ts_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the per-type daily value series — the
    median of all pairwise slopes, the estimator that shrugs off the
    outlier days that drag OLS around (reported side by side with the
    OLS slope so the gap itself is the outlier diagnostic).  The
    pairwise self-join runs over the PER-DAY AGGREGATE (days²/2 pairs
    per type — calendar-bounded, never event-count); each slope is one
    shared IEEE division of exact-decimal daily sums, and the median
    interpolates the two middle values identically in both engines
    (percentile_cont(0.5) semantics).  OLS moments are
    DECIMAL-quantized sums."""
    ev = table(spark, sf_dir, "events")
    anchor = F.lit(TS_ANCHOR).cast("timestamp")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", F.col("ts")), anchor).alias("di"),
    ).agg(F.sum(F.col("value").cast(DEC6)).cast("double").alias("x"))
    # pinned: daily feeds both pair-join sides + the OLS moments
    # (plan-audit, SCALE.md §50).
    daily = pin(daily)
    a = daily.select(
        "event_type", F.col("di").alias("di1"), F.col("x").alias("x1")
    )
    b = daily.select(
        "event_type", F.col("di").alias("di2"), F.col("x").alias("x2")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("di1") < F.col("di2"))
        .select(
            "event_type",
            (
                (F.col("x2") - F.col("x1"))
                / (F.col("di2") - F.col("di1"))
            ).alias("slope"),
        )
    )
    med = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.percentile(F.col("slope"), F.lit(0.5)).alias("med_slope"),
    )
    di_d = F.col("di").cast("double")
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("di").cast(DEC12)).cast("double").alias("sx"),
        F.sum(F.col("x").cast(DEC12)).cast("double").alias("sy"),
        F.sum((F.col("di") * F.col("x")).cast(DEC12)).cast("double").alias("sxy"),
        F.sum((di_d * F.col("di")).cast(DEC12)).cast("double").alias("sxx"),
    )
    return mom.join(med, "event_type").select(
        "event_type", "n_days", "n_pairs",
        r4(F.col("med_slope")).alias("theil_sen_slope"),
        r4(
            (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("ols_slope"),
    )


# ---------------------------------------------------------------------------
# changepoint_binary — best single mean-shift split per type (binary seg)
# ---------------------------------------------------------------------------

@register(
    "changepoint_binary",
    oracle=f"""
    WITH daily AS ({_daily_sql()}),
    idx AS (
      SELECT event_type, di, x,
             row_number() OVER (PARTITION BY event_type ORDER BY di) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM daily
    ), cum AS (
      SELECT event_type, di, rn, n,
             CAST(sum(CAST(x AS DECIMAL(38,12)))
                  OVER (PARTITION BY event_type ORDER BY rn) AS DOUBLE) AS s1,
             CAST(sum(CAST(x * x AS DECIMAL(38,12)))
                  OVER (PARTITION BY event_type ORDER BY rn) AS DOUBLE) AS s2
      FROM idx
    ), tot AS (
      SELECT event_type, max(n) AS n,
             max(CASE WHEN rn = n THEN s1 END) AS t1,
             max(CASE WHEN rn = n THEN s2 END) AS t2
      FROM cum GROUP BY 1
    ), gains AS (
      SELECT c.event_type, c.rn AS k, c.di, t.n,
             (t.t2 - t.t1 * t.t1 / t.n)
             - ((c.s2 - c.s1 * c.s1 / c.rn)
                + ((t.t2 - c.s2)
                   - (t.t1 - c.s1) * (t.t1 - c.s1) / (t.n - c.rn)))
               AS gain,
             c.s1 / c.rn AS mean_left,
             (t.t1 - c.s1) / (t.n - c.rn) AS mean_right
      FROM cum c JOIN tot t ON c.event_type = t.event_type
      WHERE c.rn < t.n
    ), best AS (
      SELECT event_type, n, k, di, gain, mean_left, mean_right,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY gain DESC, k) AS r
      FROM gains
    )
    SELECT event_type, n AS n_days, k AS split_after,
           di AS split_day_idx, {sql_he4('gain')} AS sse_gain,
           {sql_he4('mean_left')} AS mean_left,
           {sql_he4('mean_right')} AS mean_right
    FROM best WHERE r = 1
    """,
)
def changepoint_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection (the first step of binary
    segmentation): per event type, the split of the daily series that
    maximizes the SSE reduction of a two-mean model over a one-mean
    model — "when did the level shift?".  All O(n) candidate splits are
    scored from ONE pass of DECIMAL-quantized prefix sums (Σx, Σx²) —
    sse_left(k) = s2_k − s1_k²/k and its right mirror need no second
    scan — and the argmax tie-breaks on the earliest split.  Everything
    beyond the daily groupBy runs over the |types|·|days| aggregate;
    the prefix windows are calendar-bounded.  The presented means/gain
    are he4-quantized (floor(x*1e4+0.5) on the shared IEEE tree, not
    round()): mean_left = s1/rn is a raw ratio that can land exactly on
    a 4-dp tie (24255.51/8 at sf0.01), where round() diverges between
    engines."""
    ev = table(spark, sf_dir, "events")
    anchor = F.lit(TS_ANCHOR).cast("timestamp")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", F.col("ts")), anchor).alias("di"),
    ).agg(F.sum(F.col("value").cast(DEC6)).cast("double").alias("x"))
    wi = Window.partitionBy("event_type").orderBy("di")
    wn = Window.partitionBy("event_type")
    wcum = wi.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "event_type", "di",
        F.row_number().over(wi).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        F.sum(F.col("x").cast(DEC12)).over(wcum).cast("double").alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast(DEC12)).over(wcum)
        .cast("double").alias("s2"),
    )
    tot = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("s1"))).alias("t1"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("s2"))).alias("t2"),
    )
    g = cum.join(F.broadcast(tot.select("event_type", "t1", "t2")), "event_type")
    sse0 = F.col("t2") - F.col("t1") * F.col("t1") / F.col("n")
    sse_l = F.col("s2") - F.col("s1") * F.col("s1") / F.col("rn")
    sse_r = (F.col("t2") - F.col("s2")) - (
        (F.col("t1") - F.col("s1")) * (F.col("t1") - F.col("s1"))
        / (F.col("n") - F.col("rn"))
    )
    gains = g.filter(F.col("rn") < F.col("n")).select(
        "event_type", F.col("rn").alias("k"), "di", "n",
        (sse0 - (sse_l + sse_r)).alias("gain"),
        (F.col("s1") / F.col("rn")).alias("mean_left"),
        (
            (F.col("t1") - F.col("s1")) / (F.col("n") - F.col("rn"))
        ).alias("mean_right"),
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("gain"), "k")
    return (
        gains.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("k").alias("split_after"),
            F.col("di").alias("split_day_idx"),
            he4(F.col("gain")).alias("sse_gain"),
            he4(F.col("mean_left")).alias("mean_left"),
            he4(F.col("mean_right")).alias("mean_right"),
        )
    )


# ---------------------------------------------------------------------------
# audit_round_prices — round-number forensics on order totals
# ---------------------------------------------------------------------------

@register(
    "audit_round_prices",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 100 AS cents
      FROM orders
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN cents = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_round_dollar,
           round(CAST(sum(CASE WHEN cents = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS share_round,
           round(CAST(sum(CASE WHEN cents = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) / 0.01, 4) AS lift_vs_uniform,
           round(CAST(sum(CASE WHEN cents = 99 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS share_99
    FROM c GROUP BY o_orderpriority
    """,
)
def audit_round_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number forensics: the share of order totals landing on
    whole dollars (and the psychological .99) per priority, with the
    lift against the 1% uniform-cents baseline — the classic fraud /
    hand-keyed-entry screen next to audit_benford and
    audit_dup_payments (humans invent round numbers; processes don't).
    Cents are extracted with the same floor(x·100+0.5) fixed-point used
    everywhere (bit-identical cross-engine); one map-side-combinable
    aggregate, nothing else."""
    o = table(spark, sf_dir, "orders")
    cents = (
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long") % 100
    )
    is0 = F.when(cents == 0, 1).otherwise(0)
    is99 = F.when(cents == 99, 1).otherwise(0)
    n = F.count(F.lit(1))
    return o.groupBy("o_orderpriority").agg(
        n.cast("long").alias("n_orders"),
        F.sum(is0).cast("long").alias("n_round_dollar"),
        r4(F.sum(is0).cast("double") / n).alias("share_round"),
        r4(F.sum(is0).cast("double") / n / 0.01).alias("lift_vs_uniform"),
        r4(F.sum(is99).cast("double") / n).alias("share_99"),
    )


# ---------------------------------------------------------------------------
# term_burstiness — Church-Gale cf/df over the corpus vocabulary
# ---------------------------------------------------------------------------

BURST_TOPK = 25


@register(
    "term_burstiness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ), pt AS (
      SELECT term, CAST(count(*) AS BIGINT) AS cf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok WHERE term <> '' GROUP BY 1
    )
    SELECT term, cf, df,
           round(CAST(cf AS DOUBLE) / df, 4) AS burstiness
    FROM pt
    ORDER BY cf DESC, term
    LIMIT {BURST_TOPK}
    """,
)
def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness (collection frequency / document
    frequency) for the {BURST_TOPK} most frequent terms — cf/df ≈ 1
    marks evenly-sprinkled function words, large cf/df marks topical
    terms that clump into few documents (the signal behind stopword
    lists, keyword extraction, and BM25's saturation term).  One
    tokenize pass feeds a per-(doc, term) combine, cascaded into the
    vocabulary-sized (cf, df) aggregate; the top-k is an
    ORDER-BY-complete TakeOrderedAndProject with a term tie-break —
    never a bare LIMIT."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    per_doc = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pt = per_doc.groupBy("term").agg(
        F.sum("c").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    return (
        pt.select(
            "term", "cf", "df",
            r4(F.col("cf").cast("double") / F.col("df")).alias("burstiness"),
        )
        .orderBy(F.desc("cf"), "term")
        .limit(BURST_TOPK)
    )
