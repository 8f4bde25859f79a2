"""Round-7 additions, batch 39 — one-pass calendar-grain rollup, embedding
angle geometry, price-volume-mix decomposition.

Reference semantics: SURVEY §2 extension policy (mount empty).
rollup_calendar_grains is the hypertable continuous-aggregate shape: one
fact pass emits year/quarter/month grains via GROUPING SETS (and
exercises Spark 4's new DataFrame.groupingSets API — agg_grouping_sets
predates it and goes through SQL).  embed_angle_hist is the
corpus-geometry diagnostic (are embeddings anisotropic/collapsed?) via
hash-bucketed pair sampling — never all pairs.  price_volume_mix is the
FP&A decomposition revenue_bridge stops short of: Δrevenue split exactly
into volume and price effects per brand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4

#: hash buckets for embedding pair sampling: pairs form only inside a
#: bucket, so sampled-pair count ~ n²/ANGLE_BUCKETS (set ∝ n in production
#: for a constant per-vector sampling rate; fixed here for determinism).
ANGLE_BUCKETS = 256

PVM_Y1, PVM_Y2 = 1995, 1996


# ---------------------------------------------------------------------------
# rollup_calendar_grains — year/quarter/month in ONE pass (GROUPING SETS)
# ---------------------------------------------------------------------------

@register(
    "rollup_calendar_grains",
    oracle="""
    WITH base AS (
      SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS y,
             CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CASE WHEN m IS NOT NULL THEN 'month'
                WHEN q IS NOT NULL THEN 'quarter' ELSE 'year' END AS grain,
           CAST(coalesce(m, q, y) AS TIMESTAMP) AS period_start,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM base
    GROUP BY GROUPING SETS ((y), (y, q), (y, q, m))
    """,
)
def rollup_calendar_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year + quarter + month aggregates from ONE fact pass — the
    continuous-aggregate / materialized-rollup shape (TimescaleDB
    hypertables, Druid granularities): GROUPING SETS ((y),(y,q),(y,q,m))
    makes Spark expand each row into its three grains BEFORE the
    combinable aggregate, so the fact table is scanned and shuffled
    once, not three times.  Uses Spark 4's DataFrame `groupingSets` API
    directly (agg_grouping_sets documents the SQL route that Spark 3
    required).  Grain labels derive from NULL structure — the same
    coalesce/CASE in both engines — and every measure is exact int64
    cents."""
    o = table(spark, sf_dir, "orders").select(
        F.date_trunc("year", "o_orderdate").cast("date").alias("y"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("q"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    gs = o.groupingSets(
        [["y"], ["y", "q"], ["y", "q", "m"]], "y", "q", "m"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    grain = (
        F.when(F.col("m").isNotNull(), "month")
        .when(F.col("q").isNotNull(), "quarter")
        .otherwise("year")
    )
    return gs.select(
        grain.alias("grain"),
        F.coalesce("m", "q", "y").cast("timestamp").alias("period_start"),
        "n_orders",
        "revenue_cents",
    )


# ---------------------------------------------------------------------------
# embed_angle_hist — pairwise-cosine histogram from bucketed pair sampling
# ---------------------------------------------------------------------------

@register(
    "embed_angle_hist",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             ('0x' || substr(md5('ang:' || CAST(vec_id AS VARCHAR)), 1, 8))
               ::BIGINT % {ANGLE_BUCKETS} AS b
      FROM embeddings
    ), pairs AS (
      SELECT list_reduce(list_transform(list_zip(a.e, c.e),
                                        p -> p[1] * p[2]),
                         (acc, x) -> acc + x)
             / (sqrt(list_reduce(list_transform(a.e, x -> x * x),
                                 (acc, x) -> acc + x))
                * sqrt(list_reduce(list_transform(c.e, x -> x * x),
                                   (acc, x) -> acc + x))) AS cos
      FROM v a JOIN v c ON a.b = c.b AND a.vec_id < c.vec_id
    )
    SELECT CAST(floor(cos * 10) AS BIGINT) AS cos_band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 4)
             AS share
    FROM pairs GROUP BY 1
    """,
)
def embed_angle_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram of the embedding corpus — the
    anisotropy/collapse diagnostic (a healthy space piles mass near 0;
    mass near 1 across RANDOM pairs means representation collapse,
    CCA-style).  Pairs are HASH-BUCKET SAMPLED: vectors pair only
    inside one of {ANGLE_BUCKETS} md5 buckets, so the pair count is
    ~n²/{ANGLE_BUCKETS} and the join is a bucketed equi-join — never an
    all-pairs cartesian (set buckets ∝ n in production for a constant
    per-vector rate).  Each cosine is the embed_kmeans-certified
    strict-left-fold IEEE tree (zip_with dot / √(ΣxΣy)), so both
    engines band identically at floor(10·cos)."""
    emb = table(spark, sf_dir, "embeddings")
    e_d = F.col("embedding").cast("array<double>")
    v = emb.select(
        "vec_id",
        e_d.alias("e"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ang:"), F.col("vec_id").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % ANGLE_BUCKETS
        ).alias("b"),
    )
    # pinned: v feeds both bucket-join sides (and the histogram total)
    # — un-pinned each re-hashed the corpus (plan-audit, SCALE.md §50).
    v = pin(v)
    a, c = v.alias("a"), v.alias("c")
    dot = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("c.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(f"{side}.e"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pairs = a.join(
        c,
        (F.col("a.b") == F.col("c.b"))
        & (F.col("a.vec_id") < F.col("c.vec_id")),
    ).select((dot / (norm("a") * norm("c"))).alias("cos"))
    hist = pairs.groupBy(
        F.floor(F.col("cos") * 10).cast("long").alias("cos_band")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    tot = hist.agg(F.sum("n_pairs").cast("long").alias("t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "cos_band",
        "n_pairs",
        r4(F.col("n_pairs").cast("double") / F.col("t")).alias("share"),
    )


# ---------------------------------------------------------------------------
# price_volume_mix — Δrevenue = volume effect + price effect, per brand
# ---------------------------------------------------------------------------

@register(
    "price_volume_mix",
    oracle=f"""
    WITH yr AS (
      SELECT p.p_brand AS brand,
             CAST(year(l.l_shipdate) AS INT) AS y,
             CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS q,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                 * 100 + 0.5) AS BIGINT)) AS BIGINT) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) IN ({PVM_Y1}, {PVM_Y2})
      GROUP BY 1, 2
    ), w AS (
      SELECT a.brand, a.q AS q1, a.r AS r1, b.q AS q2, b.r AS r2
      FROM yr a JOIN yr b ON a.brand = b.brand
      WHERE a.y = {PVM_Y1} AND b.y = {PVM_Y2}
    )
    SELECT brand, q1, q2, r1 AS rev1_cents, r2 AS rev2_cents,
           round((q2 - q1) * (CAST(r1 AS DOUBLE) / q1), 4)
             AS volume_effect_cents,
           round((CAST(r2 AS DOUBLE) / q2 - CAST(r1 AS DOUBLE) / q1) * q2, 4)
             AS price_effect_cents
    FROM w
    """,
)
def price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix decomposition ({PVM_Y1}→{PVM_Y2}, per brand):
    Δrevenue splits EXACTLY into a volume effect (Δq at old unit price)
    and a price effect (Δp at new volume) — the identity
    (q₂−q₁)p₁ + (p₂−p₁)q₂ = r₂−r₁ holds algebraically with these
    definitions, which is why FP&A uses this pairing.  One broadcast-dim
    fact pass (part joined broadcast, year filter PUSHED into the scan),
    a (brand, year) combinable aggregate, then a brand-keyed self-join
    of two model-sized year slices.  Quantities and revenue cents are
    exact ints; unit prices are the only doubles, derived identically."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(PVM_Y1, PVM_Y2)
    ).select(
        "l_partkey",
        F.year("l_shipdate").alias("y"),
        F.floor("l_quantity").cast("long").alias("qty"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
        ).cast("long").alias("cents"),
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "y")
        .agg(
            F.sum("qty").cast("long").alias("q"),
            F.sum("cents").cast("long").alias("r"),
        )
    )
    a = yr.filter(F.col("y") == PVM_Y1).select(
        "brand", F.col("q").alias("q1"), F.col("r").alias("r1")
    )
    b = yr.filter(F.col("y") == PVM_Y2).select(
        "brand", F.col("q").alias("q2"), F.col("r").alias("r2")
    )
    w = a.join(b, "brand")
    p1 = F.col("r1").cast("double") / F.col("q1")
    p2 = F.col("r2").cast("double") / F.col("q2")
    return w.select(
        "brand",
        "q1",
        "q2",
        F.col("r1").alias("rev1_cents"),
        F.col("r2").alias("rev2_cents"),
        r4((F.col("q2") - F.col("q1")) * p1).alias("volume_effect_cents"),
        r4((p2 - p1) * F.col("q2")).alias("price_effect_cents"),
    )
