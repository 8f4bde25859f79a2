"""Round-7 additions, batch 30 — robust anomaly flags, price
dispersion, brand loyalty.

Reference semantics: SURVEY §2 extension policy (mount empty).
anomaly_robust_z completes the anomaly family (zscore/iqr/burst) with
the median/MAD flag that survives the outliers it hunts;
part_price_dispersion is the pricing-inefficiency screen over the
part×supplier price grid; customer_brand_loyalty turns brand_breadth's
count into the concentration share merchandisers actually track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4

DEC6 = "decimal(38,6)"
DEC12 = "decimal(38,12)"

ROBUST_Z_CUT = 2.0  # flag threshold (classic I-H 3.5 never fires on
#                     the smooth synthetic series; the SCORE is the output)


# ---------------------------------------------------------------------------
# anomaly_robust_z — median/MAD day-level anomaly flags per type
# ---------------------------------------------------------------------------

@register(
    "anomaly_robust_z",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type, median(x) AS med FROM daily GROUP BY 1
    ), mad AS (
      SELECT d.event_type, m.med, median(abs(d.x - m.med)) AS mad
      FROM daily d JOIN med m USING (event_type)
      GROUP BY d.event_type, m.med
    ), scored AS (
      SELECT d.event_type, d.d, d.x, a.med, a.mad,
             0.6745 * (d.x - a.med) / a.mad AS rz
      FROM daily d JOIN mad a USING (event_type)
      WHERE a.mad > 0
    )
    SELECT event_type, d AS day, round(x, 4) AS x,
           round(rz, 4) AS robust_z,
           abs(rz) > {ROBUST_Z_CUT} AS is_anomaly
    FROM scored
    """,
)
def anomaly_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust day-level anomaly scores: every day scored by its deviation
    from the per-type MEDIAN in robust z-units (0.6745·(x−med)/MAD,
    Iglewicz-Hoaglin), flagged above {ROBUST_Z_CUT} — the detector that still
    works when the anomaly itself has dragged the mean and stddev
    (anomaly_zscore's blind spot).  Median and MAD are exact
    percentile_cont(0.5) twins over the per-day aggregate (two passes,
    both |types|·|days|-sized); scoring is one shared IEEE tree;
    MAD = 0 series (constant) flag nothing by construction.  Only the
    daily groupBy touches data."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.col("value").cast(DEC6)).cast("double").alias("x"))
    # pinned: daily feeds the median, the MAD join, and the scoring join
    # (plan-audit, SCALE.md §50).
    daily = pin(daily)
    med = daily.groupBy("event_type").agg(
        F.percentile(F.col("x"), F.lit(0.5)).alias("med")
    )
    dm = daily.join(F.broadcast(med), "event_type")
    mad = dm.groupBy("event_type", "med").agg(
        F.percentile(F.abs(F.col("x") - F.col("med")), F.lit(0.5)).alias(
            "mad"
        )
    )
    scored = (
        daily.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_type", "d", "x",
            (
                0.6745 * (F.col("x") - F.col("med")) / F.col("mad")
            ).alias("rz"),
        )
    )
    return scored.select(
        "event_type",
        F.col("d").alias("day"),
        r4(F.col("x")).alias("x"),
        r4(F.col("rz")).alias("robust_z"),
        (F.abs(F.col("rz")) > ROBUST_Z_CUT).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# part_price_dispersion — cross-supplier price spread per part
# ---------------------------------------------------------------------------

DISP_TOPK = 20
DISP_MIN_SUPPLIERS = 3


@register(
    "part_price_dispersion",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS unit_cents_sum,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2
    ), up AS (
      SELECT l_partkey, l_suppkey,
             CAST(unit_cents_sum AS DOUBLE) / n AS unit_cents
      FROM ps
    ), d AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(CAST(unit_cents AS DECIMAL(38,12))) AS DOUBLE)
               / count(*) AS mean_c,
             min(unit_cents) AS lo, max(unit_cents) AS hi
      FROM up GROUP BY 1 HAVING count(*) >= {DISP_MIN_SUPPLIERS}
    )
    SELECT l_partkey, n_suppliers,
           round(mean_c, 4) AS mean_unit_cents,
           round((hi - lo) / mean_c, 4) AS rel_range
    FROM d
    ORDER BY (hi - lo) / mean_c DESC, l_partkey
    LIMIT {DISP_TOPK}
    """,
)
def part_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-supplier price dispersion: for parts sold by ≥
    {DISP_MIN_SUPPLIERS} suppliers, the relative spread of average
    realized unit price ((max−min)/mean) — the top-{DISP_TOPK} list a
    procurement team reads to find parts paying a supplier premium.
    Unit prices are int64 fixed-point cents at the scan; the
    per-(part, supplier) combine and the per-part fold are both
    map-side-combinable; the ranking is an ORDER-BY-complete top-k
    with a partkey tie-break.  Nothing after the first groupBy is
    data-sized."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.floor(
            F.col("l_extendedprice") / F.col("l_quantity") * 100 + 0.5
        ).cast("long").alias("unit_cents"),
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("unit_cents").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    up = ps.select(
        "l_partkey", "l_suppkey",
        (F.col("s").cast("double") / F.col("n")).alias("unit_cents"),
    )
    d = (
        up.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            (
                F.sum(F.col("unit_cents").cast(DEC12)).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_c"),
            F.min("unit_cents").alias("lo"),
            F.max("unit_cents").alias("hi"),
        )
        .filter(F.col("n_suppliers") >= DISP_MIN_SUPPLIERS)
    )
    rel = (F.col("hi") - F.col("lo")) / F.col("mean_c")
    return (
        d.select(
            "l_partkey", "n_suppliers",
            r4(F.col("mean_c")).alias("mean_unit_cents"),
            r4(rel).alias("rel_range"),
        )
        .orderBy(F.desc("rel_range"), "l_partkey")
        .limit(DISP_TOPK)
    )


# ---------------------------------------------------------------------------
# customer_brand_loyalty — top-brand spend share per customer, by nation
# ---------------------------------------------------------------------------

@register(
    "customer_brand_loyalty",
    oracle="""
    WITH cb AS (
      SELECT o.o_custkey, p.p_brand,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount))
                           AS BIGINT)) AS BIGINT) AS spend
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), cust AS (
      SELECT o_custkey, CAST(sum(spend) AS BIGINT) AS total,
             CAST(max(spend) AS BIGINT) AS top_spend,
             CAST(count(*) AS BIGINT) AS n_brands
      FROM cb GROUP BY 1
    ), j AS (
      SELECT n.n_name,
             CAST(c.top_spend AS DOUBLE) / c.total AS loyalty,
             c.n_brands
      FROM cust c
      JOIN customer cu ON c.o_custkey = cu.c_custkey
      JOIN nation n ON cu.c_nationkey = n.n_nationkey
      WHERE c.total > 0
    )
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(CAST(loyalty AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 4) AS avg_top_brand_share,
           round(CAST(sum(CASE WHEN loyalty > 0.5 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS share_majority_loyal,
           round(CAST(sum(n_brands) AS DOUBLE) / count(*), 4)
             AS avg_brands
    FROM j GROUP BY n_name
    """,
)
def customer_brand_loyalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand loyalty as spend concentration: per customer, the share of
    lifetime spend going to their single biggest brand; rolled up per
    nation as the average share and the fraction of customers who are
    majority-loyal (> 50% on one brand) — brand_breadth counts brands,
    this weighs them.  The customer×brand aggregate is the only
    data-sized step (one combinable groupBy over the dim-broadcast
    join); the per-customer top/total fold is max/sum over that
    aggregate — no window, no ranking; customer→nation is a broadcast
    join.  Spend is exact int64 fixed-point throughout."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).cast("long").alias("rev"),
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("o_custkey", "p_brand")
        .agg(F.sum("rev").cast("long").alias("spend"))
    )
    cust = cb.groupBy("o_custkey").agg(
        F.sum("spend").cast("long").alias("total"),
        F.max("spend").cast("long").alias("top_spend"),
        F.count(F.lit(1)).cast("long").alias("n_brands"),
    )
    cu = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        cust.filter(F.col("total") > 0)
        .join(F.broadcast(cu), cust.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .select(
            "n_name",
            (F.col("top_spend").cast("double") / F.col("total")).alias(
                "loyalty"
            ),
            "n_brands",
        )
    )
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        r4(
            F.sum(F.col("loyalty").cast(DEC12)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_top_brand_share"),
        r4(
            F.sum(F.when(F.col("loyalty") > 0.5, 1).otherwise(0))
            .cast("double") / F.count(F.lit(1))
        ).alias("share_majority_loyal"),
        r4(
            F.sum("n_brands").cast("double") / F.count(F.lit(1))
        ).alias("avg_brands"),
    )
