"""Round-6 additions, batch 4 — SURVEY §2.R: running nth_value window
surface, temperature-scaled training-mix weights, the boolean aggregate
family (count_if / bool_and / bool_or), lag-1 autocorrelation of the
daily event series, exact embedding L2 norms via a scan-fused quantized
array fold, and an R-class zlib compressibility signal (the classic
Gopher/C4 boilerplate screen, Arrow-batched).

Design rules as everywhere in this package: one declarative DataFrame
plan per op (Catalyst owns the physical strategy), broadcast what is
model-sized, shuffle only on the op's natural key, every float that
reaches the driver either integer-quantized or produced by an identical
single-IEEE-op expression tree in both engines (registry.py header lists
the six determinism conventions).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import r4

D0 = "decimal(38,0)"


# ---------------------------------------------------------------------------
# win_nth_value — running nth_value over an explicit ROWS frame
# ---------------------------------------------------------------------------

@register(
    "win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_totalprice, 3) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS third_seen_price,
           first_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_seen_price
    FROM orders
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running `nth_value` surface (the §2.E family member not covered by
    win_first_last): at each order, the customer's third-ever order value
    so far — NULL until three orders have been seen, which is nth_value's
    defining semantics vs first/last.  The frame is an EXPLICIT ROWS
    UNBOUNDED PRECEDING → CURRENT ROW in both engines: the engines'
    default frames differ (RANGE with peers vs ROWS in some dialects),
    and with a tie-safe ORDER BY (orderkey breaks same-day ties) the
    explicit ROWS frame makes every row's frame contents identical
    cross-engine.

    Scale: one exchange on o_custkey; nth_value over a running frame is
    bounded state (the executor keeps the first 3 values per partition
    prefix, not the whole frame)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 3).over(w).alias("third_seen_price"),
        F.first("o_totalprice").over(w).alias("first_seen_price"),
    )


# ---------------------------------------------------------------------------
# mix_temperature — temperature-scaled domain-mixing weights (T = 1/2)
# ---------------------------------------------------------------------------

MIX_SCALE = 10**12  # sqrt(p) quantization: exact bigint mixing arithmetic


@register(
    "mix_temperature",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ), q AS (
      SELECT source, n,
             CAST(sum(n) OVER () AS BIGINT) AS total,
             CAST(floor(sqrt(CAST(n AS DOUBLE)
                             / CAST(sum(n) OVER () AS BIGINT))
                        * {MIX_SCALE} + 0.5) AS BIGINT) AS qw
      FROM s
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(CAST(n AS DOUBLE) / total, 4) AS p_natural,
           round(CAST(qw AS DOUBLE) / CAST(sum(qw) OVER () AS BIGINT), 4)
             AS mix_weight,
           round((CAST(qw AS DOUBLE) / CAST(sum(qw) OVER () AS BIGINT))
                 / (CAST(n AS DOUBLE) / total), 4) AS upsample_factor
    FROM q
    """,
)
def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (T = 1/2): sampling weight
    w_s ∝ p_s^T over the per-source natural distribution — the standard
    way multilingual / multi-domain training mixes upsample the tail
    (GPT-3 / XLM-R style).  T is fixed at 1/2 so the power is a SINGLE
    correctly rounded IEEE sqrt (identical cross-engine, unlike pow's
    libm-dependent last ulp); each sqrt then quantizes to a 1e12
    fixed-point bigint so the normalizing sum is exact integer
    arithmetic, not an order-dependent float fold.  Outputs the natural
    share, the tempered mix weight, and the implied upsample factor.

    Scale: one count-by-source pass (map-side combinable); the window
    normalizations run over the |sources|-row aggregate — model-sized,
    the same class as percent_of_total's share window.  The weights then
    drive `sample_fraction`-style hash-threshold sampling per source."""
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy()
    total = F.sum("n").over(wall).cast("long")
    qw = F.floor(
        F.sqrt(F.col("n").cast("double") / total) * MIX_SCALE + 0.5
    ).cast("long")
    q = s.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        (F.col("n").cast("double") / total).alias("p_nat_raw"),
        qw.alias("qw"),
    )
    qtot = F.sum("qw").over(wall).cast("long")
    mix = F.col("qw").cast("double") / qtot
    return q.select(
        "source",
        "n_docs",
        r4(F.col("p_nat_raw")).alias("p_natural"),
        r4(mix).alias("mix_weight"),
        r4(mix / F.col("p_nat_raw")).alias("upsample_factor"),
    )


# ---------------------------------------------------------------------------
# agg_bool — the boolean aggregate family (count_if / bool_and / bool_or)
# ---------------------------------------------------------------------------

@register(
    "agg_bool",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_large,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'F') AS any_finished,
           bool_and(o_orderdate >= TIMESTAMP '1995-01-01') AS all_in_range
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: count_if / bool_and (= every) /
    bool_or (= any) — the predicate-aggregation family used by data-
    quality assertions (`bool_and(valid)`) and guarded rollups.  All
    three are single-pass, map-side-combinable aggregates over exact
    predicates (integer/string/date comparisons — no float boundary),
    grouped by the 5-value priority key.

    Scale: one exchange on the tiny group key with partial aggregation;
    the fused predicates stay inside whole-stage codegen (no CASE
    explosion — Spark compiles count_if to count(CASE) internally but
    within the same generated stage)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_large"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("all_in_range"),
    )


# ---------------------------------------------------------------------------
# ts_autocorr — lag-1 autocorrelation of the daily event series
# ---------------------------------------------------------------------------

@register(
    "ts_autocorr",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT event_type,
             lag(c) OVER (PARTITION BY event_type ORDER BY day) AS x,
             c AS y
      FROM daily
    ), m AS (
      SELECT event_type, count(*) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx,
             sum(CAST(y AS DECIMAL(38,0))) AS sy,
             sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             sum(CAST(y * y AS DECIMAL(38,0))) AS syy,
             sum(CAST(x * y AS DECIMAL(38,0))) AS sxy
      FROM pairs WHERE x IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           round(CAST(CAST(n AS DECIMAL(38,0)) * sxy
                      - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                 / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                             - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                        * CAST(CAST(n AS DECIMAL(38,0)) * syy
                               - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)),
                 4) AS acf1
    FROM m
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series per type —
    the seasonality/persistence screen (acf1 ≈ 0 is white noise, high
    acf1 means momentum; the feature behind "is this series worth a
    forecasting model").  Consecutive observations pair via a window lag
    over the ordered daily aggregate; the Pearson correlation then
    closes from five DECIMAL(38,0) moments of EXACT integer counts (no
    quantization needed — counts are already ints), with the identical
    num/sqrt(da·db) IEEE tree both engines.

    Scale: daily pre-aggregation collapses the stream (map-side
    combine on (type, day)); the lag window and the moment rollup both
    ride the event_type partitioning.  Higher lags are the same plan
    with lag(c, k)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.select(
        "event_type",
        F.lag("c").over(w).alias("x"),
        F.col("c").alias("y"),
    ).filter(F.col("x").isNotNull())
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(D0)).alias("sx"),
        F.sum(F.col("y").cast(D0)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(D0)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(D0)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(D0)).alias("sxy"),
    )
    nd = F.col("n").cast(D0)
    num = nd * F.col("sxy") - F.col("sx").cast(D0) * F.col("sy")
    da = nd * F.col("sxx") - F.col("sx").cast(D0) * F.col("sx")
    db = nd * F.col("syy") - F.col("sy").cast(D0) * F.col("sy")
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        r4(
            num.cast("double")
            / F.sqrt(da.cast("double") * db.cast("double"))
        ).alias("acf1"),
    )


# ---------------------------------------------------------------------------
# embed_norm — exact L2 norms via a scan-fused quantized array fold
# ---------------------------------------------------------------------------

NORM_SCALE = 10**12  # x² quantization (unit-scale components, 64 dims)


@register(
    "embed_norm",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(sqrt(CAST(CAST(list_sum(list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                 * {NORM_SCALE} + 0.5) AS BIGINT)))
               AS BIGINT) AS DOUBLE) / {NORM_SCALE}), 4) AS l2_norm
    FROM embeddings
    """,
)
def embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact L2 norm per embedding vector — the normalization audit for
    a vector corpus (cosine kernels assume unit-ish norms; this op is
    how you check).  Each float32 component is exactly a double; x² is
    one IEEE multiply, quantized to a 1e12 fixed-point bigint so the
    64-term reduction is EXACT integer addition — order-independent,
    where a raw float fold would depend on the engines' reduction order.
    The closing sqrt(total/1e12) is the identical 2-op IEEE tree.

    Scale: the whole op is a scan-fused `F.aggregate` lambda — NO
    explode, NO shuffle, zero Exchanges (plan-pinned): at 100 TB it
    streams through whole-stage codegen at scan speed.  Headroom:
    64 dims × unit-scale x² × 1e12 ≈ 6e13 per row — int64 holds vectors
    to ~10^5 dims."""
    emb = table(spark, sf_dir, "embeddings")
    acc = F.aggregate(
        "embedding",
        F.lit(0).cast("long"),
        lambda a, x: a
        + F.floor(
            x.cast("double") * x.cast("double") * NORM_SCALE + 0.5
        ).cast("long"),
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        r4(F.sqrt(acc.cast("double") / NORM_SCALE)).alias("l2_norm"),
    )


# ---------------------------------------------------------------------------
# text_compressibility — zlib ratio, the classic boilerplate screen (R)
# ---------------------------------------------------------------------------

@register("text_compressibility", oracle=None)  # R class: no SQL zlib
def text_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per document — the Gopher/C4-family
    boilerplate screen (highly repetitive text compresses far below
    natural prose; ratio thresholds gate machine-generated spam).  No
    SQL engine exposes zlib, so this is a genuine Pandas-UDF op:
    Arrow-batched Series→Series, fixed compression level 6 so the
    output is deterministic (R class only because DuckDB cannot REPLAY
    it, not because it varies).

    Scale: map-only — zero shuffles; the UDF costs one Arrow round-trip
    per batch and zlib is ~100 MB/s/core, so at 100 TB this is
    compute-bound and embarrassingly parallel (scale executors, not
    design).  The plumbing (batch shape, schema) is exactly what a real
    codec-based quality model would ride."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def zratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t: str) -> float:
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        return texts.map(one)

    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        zratio(F.col("text")).alias("comp_ratio"),
    )
