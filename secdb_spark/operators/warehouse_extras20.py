"""Round-7 additions, batch 22 — cluster label purity, packing
efficiency, long-range dependence.

Reference semantics: SURVEY §2 extension policy (mount empty).
embed_cluster_purity composes the CERTIFIED embed_kmeans assignment
with the label column into the external-validation report;
pack_fill_stats is the one-row efficiency summary every pretraining
batch-prep job prints, riding seq_pack's gated kernel unchanged;
ts_hurst brings rescaled-range analysis onto the per-day aggregate
with every float sum DECIMAL-quantized (the entropy-family
discipline), so R, S and the log-log slope are bit-stable
cross-engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4
from .pipeline_extras import KMEANS_K, _KMEANS_SEED_SQL, embed_kmeans
from .text_analysis import SEQ_LEN, seq_pack

LN2 = repr(math.log(2))

DEC6 = "decimal(38,6)"
DEC12 = "decimal(38,12)"

#: R/S window lengths (days).  The synthetic corpus spans 30 days, so
#: 4/8/16 give 7/3/1 complete windows — three points for the log-log
#: slope.  At production scale (years of days) the list extends, but
#: the kernel is unchanged: everything runs over the per-day aggregate.
HURST_WINDOWS = (4, 8, 16)


# ---------------------------------------------------------------------------
# embed_cluster_purity — external validation of the seeded k-means split
# ---------------------------------------------------------------------------

@register(
    "embed_cluster_purity",
    oracle=f"""
    WITH seeds AS (
      SELECT row_number() OVER (ORDER BY {_KMEANS_SEED_SQL}, vec_id) - 1
               AS c_idx,
             embedding::DOUBLE[] AS c
      FROM embeddings
      ORDER BY {_KMEANS_SEED_SQL}, vec_id
      LIMIT {KMEANS_K}
    ), pairs AS (
      SELECT e.vec_id, s.c_idx,
             list_reduce(
               list_transform(list_zip(e.embedding::DOUBLE[], s.c),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) AS d2
      FROM embeddings e CROSS JOIN seeds s
    ), best AS (
      SELECT vec_id, c_idx, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_idx) AS rn
      FROM pairs
    ), lab AS (
      SELECT b.c_idx AS cluster, e.label, CAST(count(*) AS BIGINT) AS c
      FROM best b JOIN embeddings e USING (vec_id)
      WHERE b.rn = 1 GROUP BY 1, 2
    ), tot AS (
      SELECT cluster, CAST(sum(c) AS BIGINT) AS n FROM lab GROUP BY 1
    ), top AS (
      SELECT cluster, label AS top_label, c AS top_c,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY c DESC, label) AS rk
      FROM lab
    ), ent AS (
      SELECT cluster,
             CAST(sum(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,12)))
                  AS DOUBLE) AS s
      FROM lab GROUP BY 1
    )
    SELECT CAST(t.cluster AS INTEGER) AS cluster, t.n AS n_vecs,
           p.top_label,
           round(CAST(p.top_c AS DOUBLE) / t.n, 4) AS purity,
           round((ln(CAST(t.n AS DOUBLE)) - e.s / t.n) / {LN2}, 4)
             AS label_entropy_bits
    FROM tot t
    JOIN top p ON t.cluster = p.cluster AND p.rk = 1
    JOIN ent e ON t.cluster = e.cluster
    """,
)
def embed_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External validation of the certified one-iteration k-means split:
    per cluster, the majority label, its purity, and the label entropy
    in bits — the first question after any unsupervised split ("do the
    clusters mean anything?").  The assignment is embed_kmeans's exact
    kernel REUSED (same seeds, same strict-fold distance, so this op is
    certified end to end on top of an already-certified stage); the
    label cross-tab is one groupBy on the K-labelled assignment, and
    purity/entropy run over the ≤ K·|labels| aggregate with the
    quantize-then-sum entropy discipline.  At 100 TB the only
    data-sized work is the assignment scan itself."""
    asg = embed_kmeans(spark, sf_dir).select("vec_id", "cluster")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    # pinned: the K x labels cross-tab feeds tot/top/ent — un-pinned
    # each re-ran the k-means assignment (plan-audit, SCALE.md §50).
    lab = pin(asg.join(emb, "vec_id").groupBy("cluster", "label").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ))
    tot = lab.groupBy("cluster").agg(F.sum("c").cast("long").alias("n"))
    wr = Window.partitionBy("cluster").orderBy(F.desc("c"), "label")
    top = (
        lab.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "cluster",
            F.col("label").alias("top_label"),
            F.col("c").alias("top_c"),
        )
    )
    ent = lab.groupBy("cluster").agg(
        F.sum(
            (F.col("c") * F.log(F.col("c").cast("double"))).cast(DEC12)
        ).cast("double").alias("s")
    )
    ln2 = float(LN2)
    return (
        tot.join(top, "cluster")
        .join(ent, "cluster")
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            F.col("n").alias("n_vecs"),
            "top_label",
            r4(F.col("top_c").cast("double") / F.col("n")).alias("purity"),
            r4(
                (
                    F.log(F.col("n").cast("double"))
                    - F.col("s") / F.col("n")
                )
                / ln2
            ).alias("label_entropy_bits"),
        )
    )


# ---------------------------------------------------------------------------
# pack_fill_stats — one-row packing-efficiency summary over seq_pack
# ---------------------------------------------------------------------------

@register(
    "pack_fill_stats",
    oracle=f"""
    WITH counts AS (
      SELECT doc_id, len(string_split(lower(text), ' ')) AS n_toks
      FROM documents
    ), offsets AS (
      SELECT doc_id, n_toks,
             sum(n_toks) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS doc_offset
      FROM counts
    ), toks AS (
      SELECT d.doc_id,
             coalesce(o.doc_offset, 0) + t.pos - 1 AS global_idx
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks_arr
            FROM documents) d
      JOIN offsets o ON d.doc_id = o.doc_id,
           unnest(generate_series(1, len(toks_arr))) AS t(pos)
    ), seqs AS (
      SELECT CAST(global_idx // {SEQ_LEN} AS BIGINT) AS seq_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM toks GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(sum(CASE WHEN n_tokens = {SEQ_LEN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_full_seqs,
           round(CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS multi_doc_share,
           round(CAST(sum(n_docs) AS DOUBLE) / count(*), 4)
             AS avg_docs_per_seq,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_tokens) % {SEQ_LEN} AS BIGINT) AS tail_tokens
    FROM seqs
    """,
)
def pack_fill_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row packing-efficiency report over the SEQ_LEN-token training
    sequences: how many sequences, how many are full, what share mixes
    ≥2 documents (attention-mask fragmentation), average docs per
    sequence, and the wasted tail — the numbers a pretraining batch-prep
    job prints before a run.  Entirely a reuse composition: seq_pack's
    gated kernel (bucketed doc-offset prefix sum above the gate) builds
    the per-sequence aggregate; this op adds ONE combinable global
    aggregate over it, so the scale story is exactly seq_pack's."""
    sp = seq_pack(spark, sf_dir)
    return sp.agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.sum(
            F.when(F.col("n_tokens") == SEQ_LEN, 1).otherwise(0)
        ).cast("long").alias("n_full_seqs"),
        r4(
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("double") / F.count(F.lit(1))
        ).alias("multi_doc_share"),
        r4(
            F.sum("n_docs").cast("double") / F.count(F.lit(1))
        ).alias("avg_docs_per_seq"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_tokens") % SEQ_LEN).cast("long").alias("tail_tokens"),
    )


# ---------------------------------------------------------------------------
# ts_hurst — rescaled-range (R/S) long-range-dependence exponent
# ---------------------------------------------------------------------------

def _hurst_windows_sql() -> str:
    return ", ".join(f"({w})" for w in HURST_WINDOWS)


@register(
    "ts_hurst",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY d) - 1
               AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_days
      FROM daily
    ), wins AS (
      SELECT i.event_type, w.w, CAST(i.rn // w.w AS BIGINT) AS win,
             i.rn, i.x, i.n_days
      FROM idx i CROSS JOIN (VALUES {_hurst_windows_sql()}) AS w(w)
      WHERE i.rn < (i.n_days // w.w) * w.w
    ), dev AS (
      SELECT event_type, w, win, rn, x, n_days,
             CAST(sum(CAST(x AS DECIMAL(38,12)))
                  OVER (PARTITION BY event_type, w, win) AS DOUBLE) / w
               AS m
      FROM wins
    ), cum AS (
      SELECT event_type, w, win, n_days, x, m,
             CAST(sum(CAST(x - m AS DECIMAL(38,12)))
                  OVER (PARTITION BY event_type, w, win ORDER BY rn)
                  AS DOUBLE) AS cd
      FROM dev
    ), rs AS (
      SELECT event_type, w, win, max(n_days) AS n_days,
             max(cd) - min(cd) AS r,
             sqrt(CAST(sum(CAST((x - m) * (x - m) AS DECIMAL(38,12)))
                       AS DOUBLE) / w) AS s
      FROM cum GROUP BY 1, 2, 3
    ), rsm AS (
      SELECT event_type, w, max(n_days) AS n_days,
             CAST(sum(CAST(r / s AS DECIMAL(38,12))) AS DOUBLE)
               / count(*) AS mean_rs
      FROM rs WHERE s > 0 GROUP BY 1, 2
    ), pts AS (
      SELECT event_type, max(n_days) AS n_days,
             CAST(count(*) AS BIGINT) AS np,
             CAST(sum(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(38,12)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(ln(mean_rs) AS DECIMAL(38,12)))
                  AS DOUBLE) AS sy,
             CAST(sum(CAST(ln(CAST(w AS DOUBLE)) * ln(mean_rs)
                           AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(ln(CAST(w AS DOUBLE)) * ln(CAST(w AS DOUBLE))
                           AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             round(max(CASE WHEN w = {HURST_WINDOWS[0]} THEN mean_rs END), 4)
               AS rs_w{HURST_WINDOWS[0]},
             round(max(CASE WHEN w = {HURST_WINDOWS[1]} THEN mean_rs END), 4)
               AS rs_w{HURST_WINDOWS[1]},
             round(max(CASE WHEN w = {HURST_WINDOWS[2]} THEN mean_rs END), 4)
               AS rs_w{HURST_WINDOWS[2]}
      FROM rsm GROUP BY event_type
    )
    SELECT event_type, n_days,
           round((np * sxy - sx * sy) / (np * sxx - sx * sx), 4) AS hurst,
           rs_w{HURST_WINDOWS[0]}, rs_w{HURST_WINDOWS[1]},
           rs_w{HURST_WINDOWS[2]}
    FROM pts WHERE np >= 2
    """,
)
def ts_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) Hurst exponent of the per-type daily value
    series — the long-range-dependence diagnostic (H≈0.5 random walk,
    H>0.5 trending/persistent, H<0.5 mean-reverting) that decides
    whether yesterday's volume predicts tomorrow's.  Method: split the
    day-indexed series into complete windows of {HURST_WINDOWS} days;
    per window R = range of the cumulative deviations from the window
    mean and S = population std; H = least-squares slope of
    ln(mean R/S) on ln(window).  Every sum (window mean, cumulative
    deviation, squared deviation, R/S average, regression moments) is
    DECIMAL(38,12)-quantized before summation, so all floats are
    shared IEEE trees over exact sums — bit-stable cross-engine.
    Scale: all windows run over the PER-DAY AGGREGATE (one
    map-combinable groupBy touches data; the aggregate is
    |types|·|days| rows — years of days stay model-sized), never the
    event stream."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.col("value").cast(DEC6)).cast("double").alias("x"))
    wi = Window.partitionBy("event_type").orderBy("d")
    wn = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type", "x",
        (F.row_number().over(wi) - 1).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_days"),
    )
    wdf = spark.createDataFrame([(w,) for w in HURST_WINDOWS], "w int")
    wins = (
        idx.crossJoin(F.broadcast(wdf))
        .filter(F.col("rn") < F.expr("(n_days div w) * w"))
        .withColumn("win", F.expr("rn div w").cast("long"))
    )
    wm = Window.partitionBy("event_type", "w", "win")
    dev = wins.withColumn(
        "m",
        F.sum(F.col("x").cast(DEC12)).over(wm).cast("double") / F.col("w"),
    )
    wc = (
        Window.partitionBy("event_type", "w", "win")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dev.withColumn(
        "cd",
        F.sum((F.col("x") - F.col("m")).cast(DEC12)).over(wc).cast("double"),
    )
    rs = cum.groupBy("event_type", "w", "win").agg(
        F.max("n_days").alias("n_days"),
        (F.max("cd") - F.min("cd")).alias("r"),
        F.sqrt(
            F.sum(
                ((F.col("x") - F.col("m")) * (F.col("x") - F.col("m")))
                .cast(DEC12)
            ).cast("double") / F.col("w")
        ).alias("s"),
    )
    rsm = (
        rs.filter(F.col("s") > 0)
        .groupBy("event_type", "w")
        .agg(
            F.max("n_days").alias("n_days"),
            (
                F.sum((F.col("r") / F.col("s")).cast(DEC12)).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_rs"),
        )
    )
    lw = F.log(F.col("w").cast("double"))
    ly = F.log(F.col("mean_rs"))
    pts = rsm.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(lw.cast(DEC12)).cast("double").alias("sx"),
        F.sum(ly.cast(DEC12)).cast("double").alias("sy"),
        F.sum((lw * ly).cast(DEC12)).cast("double").alias("sxy"),
        F.sum((lw * lw).cast(DEC12)).cast("double").alias("sxx"),
        *[
            F.round(
                F.max(F.when(F.col("w") == w, F.col("mean_rs"))), 4
            ).alias(f"rs_w{w}")
            for w in HURST_WINDOWS
        ],
    )
    return pts.filter(F.col("np") >= 2).select(
        "event_type", "n_days",
        r4(
            (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("hurst"),
        *[F.col(f"rs_w{w}") for w in HURST_WINDOWS],
    )
