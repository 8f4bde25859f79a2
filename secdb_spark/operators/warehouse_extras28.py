"""Round-7 additions, batch 34 — LSH design-space sweep, LM-quality band
mix, trade-flow reciprocity.

Reference semantics: SURVEY §2 extension policy (mount empty).
lsh_band_sweep is the tuning tool BEHIND lsh_candidates/dedup_near: one
signature pass, every (bands × rows) banding evaluated side by side so an
operator can pick the S-curve before launching a 100 TB dedup.
quality_band_mix folds text_unigram_logprob's LM score into integer bands
and reports each source's quality mix (the CCNet head/middle/tail split).
trade_reciprocity folds trade_matrix's directed flows into unordered
pairs with a symmetry index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, DEC, r4

#: 8 engine-portable md5-min signature seeds (minhash_sig's basis, widened
#: so the sweep has enough rows to band as 1×8 / 2×4 / 4×2 / 8×1).
SWEEP_SEEDS = [f"sw{i}:" for i in range(8)]

#: (n_bands, rows_per_band) configurations swept — all use all 8 sigs.
SWEEP_CONFIGS = [(1, 8), (2, 4), (4, 2), (8, 1)]


# ---------------------------------------------------------------------------
# lsh_band_sweep — candidate economics of every banding, one signature pass
# ---------------------------------------------------------------------------

def _sweep_sig_sql(i: int, s: str) -> str:
    return f"min(md5('{s}' || term)) AS sig{i}"


def _sweep_bands_sql() -> str:
    selects = []
    for b, r in SWEEP_CONFIGS:
        for band in range(b):
            sig_concat = " || ".join(
                f"sig{band * r + j}" for j in range(r)
            )
            selects.append(
                f"SELECT doc_id, 'b{b}r{r}' AS config, {band} AS band, "
                f"{sig_concat} AS sig FROM sigs"
            )
    return " UNION ALL ".join(selects)


@register(
    "lsh_band_sweep",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
      FROM documents
    ), sigs AS (
      SELECT doc_id,
             {", ".join(_sweep_sig_sql(i, s) for i, s in enumerate(SWEEP_SEEDS))}
      FROM toks GROUP BY doc_id
    ), bands AS (
      {_sweep_bands_sql()}
    ), hits AS (
      SELECT a.config, a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_band_hits
      FROM bands a JOIN bands b
        ON a.config = b.config AND a.band = b.band AND a.sig = b.sig
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3
    )
    SELECT config,
           CAST(CAST(substr(config, 2, strpos(config, 'r') - 2) AS INT)
                AS BIGINT) AS n_bands,
           CAST(CAST(substr(config, strpos(config, 'r') + 1) AS INT)
                AS BIGINT) AS rows_per_band,
           round(pow(1.0 / CAST(substr(config, 2, strpos(config, 'r') - 2)
                                AS INT),
                     1.0 / CAST(substr(config, strpos(config, 'r') + 1)
                                AS INT)), 4) AS est_threshold,
           CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(sum(n_band_hits) AS BIGINT) AS n_band_hits
    FROM hits GROUP BY 1
    """,
)
def lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding design sweep — the tuning run every large-scale
    MinHash dedup should do FIRST: from ONE 8-signature pass (the
    portable md5-min basis), band the same signatures as 1×8, 2×4, 4×2
    and 8×1 and measure, per configuration, the candidate-pair volume
    and the theoretical S-curve midpoint (1/b)^(1/r).  Loose bandings
    (8×1) explode candidates, tight ones (1×8) only catch
    near-identical docs — this table shows the trade before a 100 TB
    run commits to one.  Scale shape identical to lsh_candidates: one
    tokenize, one doc-keyed signature aggregate, one stack (4 configs ×
    bands, still one row per (doc, config, band)), one equi-self-join
    on (config, band, sig) — candidates never leave their hash bucket,
    so the sweep costs one banded join, not four."""
    from .llm_pipeline import _spread_docs

    d = _spread_docs(spark, sf_dir, table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
    )
    sigs = toks.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(s), F.col("term")))).alias(f"sig{i}")
            for i, s in enumerate(SWEEP_SEEDS)
        ]
    )
    # r13 COUNT-ALGEBRA rewrite (guide §1.2 first-principles, §8 "decide
    # with small rows"): the output is four per-config COUNT rows, yet
    # the previous form materialized every within-bucket doc pair
    # (89.7M pair rows at sf0.1 — the loose 8x1 banding alone emits
    # 61.7M) through a pair-keyed aggregate: 83 s.  Both counts are
    # functions of GROUP sizes, where a group is a full 8-signature
    # vector (docs with identical sigvecs are interchangeable in every
    # banding; the sf0.1 corpus collapses 5000 docs -> 1099 groups, so
    # pair volume shrinks quadratically, ~20x):
    #   n_band_hits(cfg)       = sum over (cfg, band, sig) buckets of
    #                            C(M, 2), M = docs in bucket — needs NO
    #                            pair join at all;
    #   n_candidate_pairs(cfg) = sum over distinct colliding group
    #                            pairs of mX*mY, plus sum C(m, 2) over
    #                            groups (identical sigvecs collide in
    #                            every band of every config).
    # The only join left is the group-level band self-join (~1/20th the
    # rows); all arithmetic is exact integers.  The DuckDB oracle keeps
    # the doc-pair form, so the algebra is re-certified every round.
    gsig = [f"sig{i}" for i in range(len(SWEEP_SEEDS))]
    groups = pin(
        sigs.groupBy(*gsig).agg(
            F.count(F.lit(1)).alias("m"), F.min("doc_id").alias("gid")
        )
    )
    rows = []
    for b, r in SWEEP_CONFIGS:
        for band in range(b):
            sig_concat = ", ".join(f"sig{band * r + j}" for j in range(r))
            rows.append(f"'b{b}r{r}', {band}, concat({sig_concat})")
    bands_g = groups.select(
        "gid",
        "m",
        F.expr(
            f"stack({len(rows)}, {', '.join(rows)}) AS (config, band, sig)"
        ),
    )
    bucket = bands_g.groupBy("config", "band", "sig").agg(
        F.sum("m").alias("bm")
    )
    hits_cfg = bucket.groupBy("config").agg(
        F.sum(F.expr("bm * (bm - 1) div 2")).cast("long").alias("n_band_hits")
    )
    ga = bands_g.select(
        F.col("gid").alias("ga"), F.col("m").alias("ma"),
        "config", "band", "sig",
    )
    gb = bands_g.select(
        F.col("gid").alias("gb"), F.col("m").alias("mb"),
        "config", "band", "sig",
    )
    cross_cfg = (
        ga.join(gb, ["config", "band", "sig"])
        .filter(F.col("ga") < F.col("gb"))
        .select("config", "ga", "gb", "ma", "mb")
        .distinct()
        .groupBy("config")
        .agg(F.sum(F.col("ma") * F.col("mb")).alias("cross_pairs"))
    )
    self_pairs = groups.agg(
        F.sum(F.expr("m * (m - 1) div 2")).cast("long").alias("self_pairs")
    )
    nb = F.substring_index(
        F.substring(F.col("config"), 2, 99), "r", 1
    ).cast("int")
    rpb = F.substring_index(F.col("config"), "r", -1).cast("int")
    return hits_cfg.join(cross_cfg, "config", "left").crossJoin(
        F.broadcast(self_pairs)
    ).select(
        "config",
        (
            F.coalesce(F.col("cross_pairs"), F.lit(0))
            + F.coalesce(F.col("self_pairs"), F.lit(0))
        ).cast("long").alias("n_candidate_pairs"),
        "n_band_hits",
    ).select(
        "config",
        nb.cast("long").alias("n_bands"),
        rpb.cast("long").alias("rows_per_band"),
        r4(
            F.pow(1.0 / nb.cast("double"), 1.0 / rpb.cast("double"))
        ).alias("est_threshold"),
        "n_candidate_pairs",
        "n_band_hits",
    )


# ---------------------------------------------------------------------------
# quality_band_mix — LM-quality band composition per source
# ---------------------------------------------------------------------------

@register(
    "quality_band_mix",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
    ), freq AS (
      SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n FROM freq
    ), scored AS (
      SELECT doc_id,
             floor(CAST(sum(CAST(
                     tf * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   AS DECIMAL(38,6))) AS DOUBLE) / sum(tf) * 100) AS band
      FROM tf JOIN freq USING (tok) CROSS JOIN tot
      GROUP BY doc_id
    )
    SELECT d.source, CAST(s.band AS BIGINT) AS logp_cband,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY d.source), 4)
             AS share_of_source
    FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    GROUP BY 1, 2
    """,
)
def quality_band_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-band composition per source — the CCNet move (Wenzek et
    al. 2020 split CommonCrawl into head/middle/tail by LM perplexity)
    on text_unigram_logprob's score: each document's avg token
    ln-probability floors into a CENTI-NAT band (floor(100·avg_logp) —
    ~1% perplexity steps, sized to the corpus's tight LM spread) and each source reports its band mix, exposing which
    sources are high-quality-heavy before mixing weights are set.
    Same certified one-tokenize shape as text_unigram_logprob (freq
    broadcast, no token-keyed shuffle of tf); the band floor happens on
    the identical decimal-quantized double both sides, and the final
    per-source share is a |sources×bands|-row window — model-sized."""
    d = table(spark, sf_dir, "documents")
    # tf / freq / mix are each multi-consumer (freq+scored, tot+join,
    # per_source+final): pinned so tokenize and the LM scoring run once
    # (un-pinned: 8 executed scans; plan-audit, SCALE.md §50).
    tf = pin(
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    freq = pin(tf.groupBy("tok").agg(F.sum("tf").cast("long").alias("c")))
    tot = freq.agg(F.sum("c").cast("long").alias("n"))
    addend = (
        F.col("tf")
        * F.log(F.col("c").cast("double") / F.col("n").cast("double"))
    ).cast(DEC)
    scored = (
        tf.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.floor(
                F.sum(addend).cast("double") / F.sum("tf") * 100
            ).alias("band")
        )
    )
    mix = (
        scored.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source", F.col("band").cast("long").alias("logp_cband"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    mix = pin(mix)
    per_source = mix.groupBy("source").agg(
        F.sum("n_docs").alias("src_total")
    )
    return mix.join(F.broadcast(per_source), "source").select(
        "source",
        "logp_cband",
        "n_docs",
        r4(
            F.col("n_docs").cast("double") / F.col("src_total")
        ).alias("share_of_source"),
    )


# ---------------------------------------------------------------------------
# trade_reciprocity — flow symmetry per unordered nation pair
# ---------------------------------------------------------------------------

@register(
    "trade_reciprocity",
    oracle="""
    WITH flow AS (
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount))
                           AS BIGINT)) AS BIGINT) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY 1, 2
    ), lo AS (
      SELECT cust_nation AS nation_lo, supp_nation AS nation_hi,
             revenue AS flow_lo_buys FROM flow
      WHERE cust_nation < supp_nation
    ), hi AS (
      SELECT supp_nation AS nation_lo, cust_nation AS nation_hi,
             revenue AS flow_hi_buys FROM flow
      WHERE cust_nation > supp_nation
    )
    SELECT coalesce(l.nation_lo, h.nation_lo) AS nation_lo,
           coalesce(l.nation_hi, h.nation_hi) AS nation_hi,
           CAST(coalesce(l.flow_lo_buys, 0) AS BIGINT) AS flow_lo_buys,
           CAST(coalesce(h.flow_hi_buys, 0) AS BIGINT) AS flow_hi_buys,
           round(1.0 - CAST(abs(coalesce(l.flow_lo_buys, 0)
                               - coalesce(h.flow_hi_buys, 0)) AS DOUBLE)
                       / (coalesce(l.flow_lo_buys, 0)
                          + coalesce(h.flow_hi_buys, 0)), 4) AS symmetry
    FROM lo l FULL OUTER JOIN hi h
      ON l.nation_lo = h.nation_lo AND l.nation_hi = h.nation_hi
    """,
)
def trade_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade reciprocity: fold trade_matrix's directed nation-pair flows
    into unordered pairs and score symmetry 1 − |f_ab − f_ba|/(f_ab+f_ba)
    (1 = perfectly balanced two-way trade, 0 = one-way).  The directed
    flow aggregate is the same broadcast-dim star as trade_matrix (one
    fact shuffle, |nations|² combinable groupBy); pairing is then a
    |nations|²-row FULL OUTER self-join on the canonical (lo, hi) key —
    model-sized, broadcastable, zeros kept so one-way flows surface
    with symmetry 0 instead of vanishing."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).cast("long").alias("rev"),
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cnk"),
        F.col("n_name").alias("cust_nation"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("snk"),
        F.col("n_name").alias("supp_nation"),
    )
    flow = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.sum("rev").cast("long").alias("revenue"))
    )
    # pinned: the |nations|^2 flow matrix feeds both mirror halves of
    # the pair join — un-pinned each half re-ran the fact star
    # (plan-audit, SCALE.md §50).
    flow = pin(flow)
    lo = flow.filter(F.col("cust_nation") < F.col("supp_nation")).select(
        F.col("cust_nation").alias("nation_lo"),
        F.col("supp_nation").alias("nation_hi"),
        F.col("revenue").alias("flow_lo_buys"),
    )
    hi = flow.filter(F.col("cust_nation") > F.col("supp_nation")).select(
        F.col("supp_nation").alias("nation_lo"),
        F.col("cust_nation").alias("nation_hi"),
        F.col("revenue").alias("flow_hi_buys"),
    )
    j = lo.join(hi, ["nation_lo", "nation_hi"], "full_outer")
    flo = F.coalesce(F.col("flow_lo_buys"), F.lit(0))
    fhi = F.coalesce(F.col("flow_hi_buys"), F.lit(0))
    return j.select(
        "nation_lo",
        "nation_hi",
        flo.cast("long").alias("flow_lo_buys"),
        fhi.cast("long").alias("flow_hi_buys"),
        r4(
            1.0 - F.abs(flo - fhi).cast("double") / (flo + fhi)
        ).alias("symmetry"),
    )
