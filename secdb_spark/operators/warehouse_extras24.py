"""Round-7 additions, batch 29 — dedup-aware mixing mass, trade
relationship stickiness, quantization error report.

Reference semantics: SURVEY §2 extension policy (mount empty).
mix_unique_mass composes the cross-source fingerprint (batch 20's
cross_source_dup_matrix key) with first-source-wins ownership into the
effective unique mass a mixer should weight by; trade_repeat_rate is
the relationship-stickiness report over the customer×supplier pair
aggregate; embed_quantize_error closes the embed_quantize loop with
the reconstruction-error numbers that justify (or veto) int8 storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4
from .warehouse_extras18 import DUP_PREFIX_WORDS

DEC12 = "decimal(38,12)"


# ---------------------------------------------------------------------------
# mix_unique_mass — effective unique documents per source after dedup
# ---------------------------------------------------------------------------

@register(
    "mix_unique_mass",
    oracle=f"""
    WITH d AS (
      SELECT source,
             md5(array_to_string(
               list_slice(string_split(lower(text), ' '),
                          1, {DUP_PREFIX_WORDS}), ' ')) AS h
      FROM documents
    ), owner AS (
      SELECT h, min(source) AS owner FROM d GROUP BY h
    ), per AS (
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN o.owner = d.source THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_owned
      FROM d JOIN owner o ON d.h = o.h
      GROUP BY d.source
    ), tot AS (
      SELECT CAST(sum(n_owned) AS BIGINT) AS owned_total FROM per
    )
    SELECT p.source, p.n_docs, p.n_owned,
           round(CAST(p.n_owned AS DOUBLE) / p.n_docs, 4) AS keep_rate,
           round(CAST(p.n_owned AS DOUBLE) / t.owned_total, 4)
             AS unique_mass_share
    FROM per p, tot t
    """,
)
def mix_unique_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware mixing mass: when the same {DUP_PREFIX_WORDS}-word
    fingerprint appears in several sources, FIRST source (by name)
    wins ownership; each source then reports how many of its docs it
    actually owns, its keep rate, and its share of the corpus's unique
    mass — the weights a mixer should use instead of raw doc counts
    (raw counts double-weight content that rode in on two feeds).
    Ownership is one groupBy(h) min + a fingerprint-keyed join back
    (per-hash fan ≤ |sources|); everything after the fingerprint scan
    is aggregate-sized, and the grand total re-enters as a one-row
    broadcast."""
    d = table(spark, sf_dir, "documents").select(
        "source",
        F.md5(
            F.array_join(
                F.slice(
                    F.split(F.lower(F.col("text")), " "), 1, DUP_PREFIX_WORDS
                ),
                " ",
            )
        ).alias("h"),
    )
    # pinned: d feeds ownership + the join-back; per feeds the total +
    # the report (plan-audit, SCALE.md §50).
    d = pin(d)
    owner = d.groupBy("h").agg(F.min("source").alias("owner"))
    per = (
        d.join(owner, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("owner") == F.col("source"), 1).otherwise(0)
            ).cast("long").alias("n_owned"),
        )
    )
    per = pin(per)
    tot = per.agg(F.sum("n_owned").cast("long").alias("owned_total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_owned",
        r4(F.col("n_owned").cast("double") / F.col("n_docs")).alias(
            "keep_rate"
        ),
        r4(
            F.col("n_owned").cast("double") / F.col("owned_total")
        ).alias("unique_mass_share"),
    )


# ---------------------------------------------------------------------------
# trade_repeat_rate — customer×supplier relationship stickiness
# ---------------------------------------------------------------------------

@register(
    "trade_repeat_rate",
    oracle="""
    WITH pair AS (
      SELECT o.o_custkey, l.l_suppkey,
             CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ), j AS (
      SELECT n.n_name, p.n_orders
      FROM pair p
      JOIN supplier s ON p.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS repeat_pairs,
           round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS repeat_rate,
           round(CAST(sum(n_orders) AS DOUBLE) / count(*), 4)
             AS avg_orders_per_pair
    FROM j GROUP BY n_name
    """,
)
def trade_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationship stickiness: of all customer×supplier pairs that
    ever traded, what share traded across ≥ 2 separate orders — per
    supplier nation — the repeat-business number behind account
    management and the empirical basis for graph_kcore's dense core.
    The pair aggregate is the only data-sized step (one
    map-combinable groupBy on the order join); supplier→nation are
    broadcast dim joins over the pair aggregate."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.countDistinct("o_orderkey").cast("long").alias("n_orders"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        pair.join(F.broadcast(s), pair.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "n_orders")
    )
    rep = F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(rep).cast("long").alias("repeat_pairs"),
        r4(F.sum(rep).cast("double") / F.count(F.lit(1))).alias(
            "repeat_rate"
        ),
        r4(
            F.sum("n_orders").cast("double") / F.count(F.lit(1))
        ).alias("avg_orders_per_pair"),
    )


# ---------------------------------------------------------------------------
# embed_quantize_error — int8 reconstruction error per label
# ---------------------------------------------------------------------------

QLEVELS = 255  # int8 symmetric range


@register(
    "embed_quantize_error",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e,
             list_min(embedding::DOUBLE[]) AS lo,
             list_max(embedding::DOUBLE[]) AS hi
      FROM embeddings
    ), err AS (
      SELECT vec_id, label,
             CASE WHEN hi > lo THEN
               list_reduce(
                 list_transform(e, x ->
                   pow(x - (lo + round((x - lo) / (hi - lo) * {QLEVELS})
                            * ((hi - lo) / {QLEVELS})), 2)),
                 (a, b) -> a + b) / len(e)
             ELSE 0.0 END AS mse,
             CASE WHEN hi > lo THEN
               list_max(
                 list_transform(e, x ->
                   abs(x - (lo + round((x - lo) / (hi - lo) * {QLEVELS})
                            * ((hi - lo) / {QLEVELS})))))
             ELSE 0.0 END AS max_abs
      FROM v
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(CAST(mse AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) AS avg_mse,
           round(max(max_abs), 6) AS max_abs_err
    FROM err GROUP BY label
    """,
)
def embed_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction error of per-vector min/max int8 quantization
    ({QLEVELS} levels): average MSE and worst absolute error per label
    — the report that decides whether 4× cheaper embedding storage
    (embed_quantize's code path) costs recall.  Everything is
    map-only array math fused into the scan: per-vector lo/hi, a
    zip-free transform computing x − dequant(quant(x)) as ONE shared
    IEEE tree per element (both engines round half-away identically
    via round()), a strict-fold MSE, then one combinable aggregate
    with DECIMAL-quantized means.  No shuffle before the |labels|-row
    groupBy."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    lo = F.array_min(e)
    hi = F.array_max(e)
    step = (hi - lo) / QLEVELS
    deq = lambda x: lo + F.round((x - lo) / (hi - lo) * QLEVELS) * step  # noqa: E731
    sq = F.transform(e, lambda x: F.pow(x - deq(x), 2))
    ab = F.transform(e, lambda x: F.abs(x - deq(x)))
    mse = F.when(
        hi > lo,
        F.aggregate(sq, F.lit(0.0), lambda a, b: a + b) / F.size(e),
    ).otherwise(0.0)
    mx = F.when(hi > lo, F.array_max(ab)).otherwise(0.0)
    err = emb.select("label", mse.alias("mse"), mx.alias("max_abs"))
    return err.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(
            F.sum(F.col("mse").cast(DEC12)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_mse"),
        F.round(F.max("max_abs"), 6).alias("max_abs_err"),
    )
