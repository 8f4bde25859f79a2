"""Round-7 additions, batch 13 — behavioral PMI, brand revenue
correlation (cannibalization screen), bigram LM scoring.

Reference semantics: SURVEY §2 extension policy (mount empty).  Log
terms follow the quantize-then-sum DECIMAL(38,12) discipline; moment
machines stay exact-integer until one shared IEEE division.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4

LN2 = repr(math.log(2))
DEC12 = "decimal(38,12)"


# ---------------------------------------------------------------------------
# events_type_pmi — which event types co-occur in the same users
# ---------------------------------------------------------------------------

@register(
    "events_type_pmi",
    oracle=f"""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), marg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
    ), u AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM ut
    ), pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.ta, p.tb, p.n_ab,
           CAST(floor(ln(CAST(p.n_ab AS DOUBLE) * u.nu / ma.n / mb.n)
                      / {LN2} * 1000000 + 0.5) AS BIGINT) AS pmi6
    FROM pairs p
    JOIN marg ma ON ma.event_type = p.ta
    JOIN marg mb ON mb.event_type = p.tb
    CROSS JOIN u
    """,
)
def events_type_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event-type pairs over users
    (text_pmi_bigrams' shape applied to behavior): PMI(a,b) =
    log2(P(a,b) / P(a)P(b)) with probabilities over the user base —
    positive means the two actions concentrate in the same users.  The
    distinct (user, type) aggregate is combinable; the pair join fans
    each user to at most C(|types|, 2) rows (type-count-bounded, never
    quadratic in users); marginals and the user count broadcast.  The
    PMI value is quantized half-up to an e6 integer from one shared
    IEEE log tree (text_pmi_bigrams' pmi6 convention), so the hash gate
    compares integers."""
    # pinned: the (user, type) distinct feeds marginals, the user count,
    # and both pair-join legs (plan-audit, SCALE.md §50).
    ut = pin(table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).distinct())
    marg = pin(ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ))
    u = ut.agg(F.countDistinct("user_id").cast("long").alias("nu"))
    a = ut.select("user_id", F.col("event_type").alias("ta"))
    b = ut.select("user_id", F.col("event_type").alias("tb"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ma = marg.select(
        F.col("event_type").alias("ta"), F.col("n").alias("na")
    )
    mb = marg.select(
        F.col("event_type").alias("tb"), F.col("n").alias("nb")
    )
    j = (
        pairs.join(F.broadcast(ma), "ta")
        .join(F.broadcast(mb), "tb")
        .crossJoin(F.broadcast(u))
    )
    pmi6 = F.floor(
        F.log(
            F.col("n_ab").cast("double")
            * F.col("nu")
            / F.col("na")
            / F.col("nb")
        )
        / float(LN2)
        * 1000000
        + 0.5
    ).cast("long")
    return j.select("ta", "tb", "n_ab", pmi6.alias("pmi6"))


# ---------------------------------------------------------------------------
# brand_revenue_corr — weekly revenue correlation between brand pairs
# ---------------------------------------------------------------------------

BRC_ANCHOR = "1995-01-01"


@register(
    "brand_revenue_corr",
    oracle=f"""
    WITH w AS (
      SELECT p.p_brand AS brand,
             CAST(floor(datediff('day', TIMESTAMP '{BRC_ANCHOR}',
                                 l.l_shipdate) / 7) AS BIGINT) AS wk,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount))
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), pr AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.rev) AS BIGINT) AS sx,
             CAST(sum(b.rev) AS BIGINT) AS sy,
             CAST(sum(a.rev * a.rev) AS BIGINT) AS sxx,
             CAST(sum(b.rev * b.rev) AS BIGINT) AS syy,
             CAST(sum(a.rev * b.rev) AS BIGINT) AS sxy
      FROM w a JOIN w b ON a.wk = b.wk AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n AS n_weeks,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 4) AS corr
    FROM pr
    """,
)
def brand_revenue_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue correlation for every brand pair over co-active
    weeks — the cannibalization screen (strongly anti-correlated pairs
    trade share; strongly correlated pairs ride the same demand).  The
    fact scan reduces to the model-sized (|brands| x |weeks|) weekly
    aggregate (whole-dollar integer revenue — exact and overflow-safe to
    ~1e3x this corpus; the moment sums widen to DECIMAL(38,0) past
    that); the pair join runs brand x brand per week on that aggregate
    (|brands|² x |weeks| rows, model-sized), and correlations come from
    five exact integer moments per pair in one combinable pass.  Weeks
    are integer buckets from a fixed anchor (no engine week-start
    dependence)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    w = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.floor(
                F.datediff(
                    F.col("l_shipdate"), F.lit(BRC_ANCHOR).cast("timestamp")
                )
                / 7
            ).cast("long").alias("wk"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("long")
            ).cast("long").alias("rev")
        )
    )
    a = w.select(
        F.col("brand").alias("brand_a"), "wk", F.col("rev").alias("x")
    )
    b = w.select(
        F.col("brand").alias("brand_b"), "wk", F.col("rev").alias("y")
    )
    pr = (
        a.join(b, "wk")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n.cast("double") * F.col("sxy") - sx.cast("double") * sy
    den = F.sqrt(
        (n.cast("double") * F.col("sxx") - sx.cast("double") * sx)
        * (n.cast("double") * F.col("syy") - sy.cast("double") * sy)
    )
    return pr.select(
        "brand_a",
        "brand_b",
        n.alias("n_weeks"),
        r4(num / den).alias("corr"),
    )


# ---------------------------------------------------------------------------
# text_bigram_logprob — add-one-smoothed bigram LM document scoring
# ---------------------------------------------------------------------------

@register(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(lower(text), ' ')) AS w,
             unnest(range(0, len(string_split(lower(text), ' ')))) AS i
      FROM documents
    ), bg AS (
      SELECT t1.doc_id, t1.w AS w1, t2.w AS w2
      FROM toks t1 JOIN toks t2
        ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
    ), bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
    ), uc AS (
      SELECT w AS w1, CAST(count(*) AS BIGINT) AS c1 FROM toks GROUP BY 1
    ), v AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab FROM toks
    ), scored AS (
      SELECT bg.doc_id,
             ln((CAST(bc.c12 AS DOUBLE) + 1) / (uc.c1 + v.vocab)) AS lp
      FROM bg
      JOIN bc ON bg.w1 = bc.w1 AND bg.w2 = bc.w2
      JOIN uc ON bg.w1 = uc.w1
      CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(CAST(lp AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 4) AS avg_lp,
           round(exp(-(CAST(sum(CAST(lp AS DECIMAL(38,12))) AS DOUBLE)
                       / count(*))), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram language-model score per document — the
    second-order upgrade of text_unigram_logprob's CCNet-style quality
    filter: P(w2|w1) = (c12 + 1) / (c1 + V), reported as mean log-prob
    and perplexity.  A doc whose bigrams are corpus-improbable (high
    ppl) is boilerplate-free gibberish; an ultra-low-ppl doc is
    template spam — both tails get dropped from a training mix.  One
    ordered tokenize (posexplode keeps adjacency; DuckDB zip-unnests the
    same split), corpus bigram/unigram counts as combinable aggregates
    re-joined on their own keys (vocabulary-sized shuffles), V as a
    one-row broadcast; every ln term quantizes to DECIMAL(38,12) before
    the per-doc exact sum, and ppl = exp(-avg) is one shared IEEE
    tree."""
    # toks feeds bigrams + unigram counts + vocab, bg feeds counts +
    # scoring: both pinned so tokenize and the adjacency window each run
    # ONCE (plan-audit, SCALE.md §50; un-pinned: 4 corpus scans).
    toks = pin(table(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("i", "w"),
    ))
    # adjacency via a lead() window per doc (one doc_id shuffle+sort)
    # instead of a position self-join — same rows, half the plan: the
    # 16x probe measured the join form 4.3x slower at scale.
    wadj = Window.partitionBy("doc_id").orderBy("i")
    bg = pin(
        toks.withColumn("w2", F.lead("w").over(wadj))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("w").alias("w1"), "w2")
    )
    bc = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    uc = toks.groupBy(F.col("w").alias("w1")).agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    )
    v = toks.agg(F.countDistinct("w").cast("long").alias("vocab"))
    scored = (
        bg.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.log(
                (F.col("c12").cast("double") + 1)
                / (F.col("c1") + F.col("vocab"))
            ).alias("lp"),
        )
    )
    n = F.count(F.lit(1))
    s = F.sum(F.col("lp").cast(DEC12)).cast("double")
    return scored.groupBy("doc_id").agg(
        n.cast("long").alias("n_bigrams"),
        r4(s / n).alias("avg_lp"),
        r4(F.exp(-(s / n))).alias("ppl"),
    )
