"""Round-7 additions, batch 20 — symmetric corpus drift, cross-source
duplication, customer segment migration, second-order behavior model.

Reference semantics: SURVEY §2 extension policy (mount empty).
source_js_divergence completes the drift family (source_cross_entropy
gave the asymmetric KL; JS is the bounded symmetric metric mixing
pipelines actually threshold on).  cross_source_dup_matrix extends
source_dup_rate (within-source) to the between-source overlap matrix a
dedup run needs to decide which source to keep.  The entropy terms
follow the quantize-then-sum DECIMAL(38,12) discipline from
warehouse_extras10.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4

LN2 = repr(math.log(2))  # shared literal, bit-identical both engines

DEC12 = "decimal(38,12)"


# ---------------------------------------------------------------------------
# source_js_divergence — pairwise Jensen-Shannon divergence between sources
# ---------------------------------------------------------------------------

@register(
    "source_js_divergence",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ), st AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE term <> '' GROUP BY 1, 2
    ), ns AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY 1
    ), pr AS (
      SELECT s.source, s.term, CAST(s.c AS DOUBLE) / ns.n AS p, s.c
      FROM st s JOIN ns ON s.source = ns.source
    ), ix AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.p AS p, b.p AS q, a.c AS ca, b.c AS cb
      FROM pr a JOIN pr b ON a.term = b.term AND a.source < b.source
    ), na2 AS (
      SELECT source_a, source_b,
             CAST(count(*) AS BIGINT) AS n_common_terms,
             CAST(sum(ca) AS BIGINT) AS ca_int,
             CAST(sum(cb) AS BIGINT) AS cb_int,
             CAST(sum(CAST(p * ln(p / ((p + q) / 2))
                           + q * ln(q / ((p + q) / 2))
                           AS DECIMAL(38,12))) AS DOUBLE) AS s_both
      FROM ix GROUP BY 1, 2
    )
    SELECT x.source_a, x.source_b, x.n_common_terms,
           round(0.5 * ((1 - CAST(x.ca_int AS DOUBLE) / na.n)
                        + (1 - CAST(x.cb_int AS DOUBLE) / nb.n)
                        + x.s_both / {LN2}), 4) AS js_bits
    FROM na2 x
    JOIN ns na ON x.source_a = na.source
    JOIN ns nb ON x.source_b = nb.source
    """,
)
def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between every pair of
    source unigram distributions — the bounded, symmetric drift metric
    (0 = identical, 1 = disjoint) that a mixing pipeline thresholds on
    where KL cannot be used (KL is infinite on disjoint support).  The
    union-vocabulary sum splits exactly: terms present in only one
    source contribute p·log2(2) = p bits, so their total is 1 − P(common)
    — an EXACT integer-count ratio — and only the common-term sum needs
    floats, each term one shared IEEE tree quantized to DECIMAL(38,12)
    before the order-free decimal sum.  Shuffles: tokenization groupBy
    (vocabulary-sized), one term-keyed self-equi-join whose per-term fan
    is bounded by |sources|² (never all docs), then a |sources|²-row
    aggregate.  At 100 TB only the token counting touches data."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    # st feeds totals + probabilities; pr feeds both pair sides: pinned
    # so tokenize runs once (plan-audit, SCALE.md §50).
    st = pin(toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ))
    ns = st.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    pr = pin(st.join(F.broadcast(ns), "source").select(
        "source", "term", (F.col("c").cast("double") / F.col("n")).alias("p"),
        "c",
    ))
    a = pr.select(
        F.col("source").alias("source_a"), "term",
        F.col("p").alias("p"), F.col("c").alias("ca"),
    )
    b = pr.select(
        F.col("source").alias("source_b"), "term",
        F.col("p").alias("q"), F.col("c").alias("cb"),
    )
    ix = a.join(b, "term").filter(F.col("source_a") < F.col("source_b"))
    m = (F.col("p") + F.col("q")) / 2
    contrib = (
        F.col("p") * F.log(F.col("p") / m)
        + F.col("q") * F.log(F.col("q") / m)
    )
    agg = ix.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common_terms"),
        F.sum("ca").cast("long").alias("ca_int"),
        F.sum("cb").cast("long").alias("cb_int"),
        F.sum(contrib.cast(DEC12)).cast("double").alias("s_both"),
    )
    na = ns.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    nb = ns.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    ln2 = float(LN2)
    return (
        agg.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a", "source_b", "n_common_terms",
            r4(
                0.5
                * (
                    (1 - F.col("ca_int").cast("double") / F.col("na"))
                    + (1 - F.col("cb_int").cast("double") / F.col("nb"))
                    + F.col("s_both") / ln2
                )
            ).alias("js_bits"),
        )
    )


# ---------------------------------------------------------------------------
# cross_source_dup_matrix — between-source exact-duplicate overlap
# ---------------------------------------------------------------------------

#: fingerprint length (words) — full-text hashing finds only byte-exact
#: re-crawls; the leading-40-word fingerprint catches the boilerplate
#: overlap the matrix exists to expose.
DUP_PREFIX_WORDS = 40


@register(
    "cross_source_dup_matrix",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT source,
             md5(array_to_string(
               list_slice(string_split(lower(text), ' '),
                          1, {DUP_PREFIX_WORDS}), ' ')) AS h
      FROM documents
    ), sz AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_hashes
      FROM d GROUP BY source
    ), ov AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS shared_hashes
      FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT o.source_a, o.source_b, o.shared_hashes,
           round(CAST(o.shared_hashes AS DOUBLE)
                 / (sa.n_hashes + sb.n_hashes - o.shared_hashes), 4)
             AS jaccard
    FROM ov o
    JOIN sz sa ON o.source_a = sa.source
    JOIN sz sb ON o.source_b = sb.source
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-source duplicate overlap matrix: for every source pair,
    how many distinct leading-{DUP_PREFIX_WORDS}-word fingerprints
    appear in BOTH — the report a dedup run reads to decide which
    source wins ties and whether two feeds are re-crawls of each other
    (source_dup_rate answers the within-source question; this is the
    between-source one).  The prefix fingerprint, not the full-text
    hash, is the operative key: byte-exact cross-source re-crawls are
    rare, shared boilerplate openings are not.  Distinct (source, md5)
    pairs reduce the corpus once; the self-equi-join keys on the hash,
    so per-hash fan is bounded by the number of sources carrying that
    content (≤ |sources|, never doc-count); the overlap matrix is
    |sources|²-row.  Jaccard denominators come from the per-source
    distinct-fingerprint counts via two broadcast joins."""
    d = (
        table(spark, sf_dir, "documents")
        .select(
            "source",
            F.md5(
                F.array_join(
                    F.slice(
                        F.split(F.lower(F.col("text")), " "),
                        1,
                        DUP_PREFIX_WORDS,
                    ),
                    " ",
                )
            ).alias("h"),
        )
        .distinct()
    )
    # pinned: the fingerprint set feeds sizes + both join sides
    # (plan-audit, SCALE.md §50).
    d = pin(d)
    sz = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_hashes"))
    a = d.select(F.col("source").alias("source_a"), "h")
    b = d.select(F.col("source").alias("source_b"), "h")
    ov = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_hashes"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n_hashes").alias("na"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n_hashes").alias("nb"))
    return (
        ov.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "shared_hashes",
            r4(
                F.col("shared_hashes").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared_hashes"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# customer_migration_matrix — year-over-year activity-segment transitions
# ---------------------------------------------------------------------------

@register(
    "customer_migration_matrix",
    oracle="""
    WITH cy AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    ), seg AS (
      SELECT o_custkey, yr,
             CASE WHEN n_orders = 1 THEN 'one'
                  WHEN n_orders <= 3 THEN 'casual'
                  ELSE 'loyal' END AS seg
      FROM cy
    ), yrs AS (
      SELECT CAST(max(yr) AS BIGINT) AS max_yr FROM seg
    ), tr AS (
      SELECT c.yr, c.seg AS from_seg,
             coalesce(n.seg, 'absent') AS to_seg
      FROM seg c
      LEFT JOIN seg n
        ON c.o_custkey = n.o_custkey AND n.yr = c.yr + 1
      WHERE c.yr < (SELECT max_yr FROM yrs)
    )
    SELECT yr, from_seg, to_seg,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM tr GROUP BY 1, 2, 3
    """,
)
def customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer activity-segment migration: segment each
    (customer, year) by order count — one / casual (≤3) / loyal — then
    count transitions into next year's segment, with disappearance as
    the explicit 'absent' state (the churn column every retention deck
    wants).  The per-customer-year aggregate reduces the fact table
    once on (custkey, year); the transition step is a customer-keyed
    self-left-join of that aggregate with an exact +1-year equi-key, so
    it co-partitions on custkey and never revisits raw orders; the
    final matrix is |years|·|segments|²-row.  The trailing year is
    excluded via a one-row max-year broadcast (its 'next year' is
    unobserved, not churn)."""
    cy = (
        table(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    seg = cy.select(
        "o_custkey", "yr",
        F.when(F.col("n_orders") == 1, "one")
        .when(F.col("n_orders") <= 3, "casual")
        .otherwise("loyal")
        .alias("seg"),
    )
    # pinned: seg feeds the horizon + both self-join sides (plan-audit,
    # SCALE.md §50).
    seg = pin(seg)
    max_yr = seg.agg(F.max("yr").cast("long").alias("max_yr"))
    cur = seg.select("o_custkey", "yr", F.col("seg").alias("from_seg"))
    nxt = seg.select(
        "o_custkey",
        (F.col("yr") - 1).alias("yr"),
        F.col("seg").alias("to_seg"),
    )
    tr = (
        cur.join(nxt, ["o_custkey", "yr"], "left")
        .crossJoin(F.broadcast(max_yr))
        .filter(F.col("yr") < F.col("max_yr"))
        .select(
            "yr", "from_seg",
            F.coalesce(F.col("to_seg"), F.lit("absent")).alias("to_seg"),
        )
    )
    return tr.groupBy("yr", "from_seg", "to_seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# event_trigram_transitions — second-order Markov: top next per context
# ---------------------------------------------------------------------------

@register(
    "event_trigram_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 2) OVER w AS p2,
             lag(event_type, 1) OVER w AS p1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), cnt AS (
      SELECT p2, p1, event_type AS nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
    ), ctx AS (
      SELECT p2, p1, nxt, n,
             CAST(sum(n) OVER (PARTITION BY p2, p1) AS BIGINT) AS n_ctx,
             row_number() OVER (PARTITION BY p2, p1
                                ORDER BY n DESC, nxt) AS rk
      FROM cnt
    )
    SELECT p2, p1, n_ctx AS n_transitions, nxt AS top_next,
           n AS top_n, round(CAST(n AS DOUBLE) / n_ctx, 4) AS top_share
    FROM ctx WHERE rk = 1
    """,
)
def event_trigram_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov behavior model: for every (prev2, prev1)
    event-type context, the most likely next type with its share — what
    a navigation predictor or prefetcher actually consults (the
    first-order matrix in event_transitions forgets one step too
    early).  One user-keyed window computes both lags in a single
    shuffle; the trigram count groupBy reduces to a ≤|types|³ model
    domain, and the per-context total + argmax windows run over that
    aggregate, never the stream.  Tie-break on the type name keeps the
    argmax deterministic cross-engine."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.withColumn("p2", F.lag("event_type", 2).over(w))
        .withColumn("p1", F.lag("event_type", 1).over(w))
        .filter(F.col("p2").isNotNull())
        .groupBy("p2", "p1", F.col("event_type").alias("nxt"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wc = Window.partitionBy("p2", "p1")
    wr = Window.partitionBy("p2", "p1").orderBy(F.desc("n"), "nxt")
    return (
        cnt.withColumn("n_ctx", F.sum("n").over(wc).cast("long"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "p2", "p1",
            F.col("n_ctx").alias("n_transitions"),
            F.col("nxt").alias("top_next"),
            F.col("n").alias("top_n"),
            r4(F.col("n").cast("double") / F.col("n_ctx")).alias("top_share"),
        )
    )
