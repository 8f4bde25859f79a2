"""Round-6 additions, batch 5 — SURVEY §2.S: ML feature-preparation and
governance staples for the training-data path: one-hot encoding, z-score
+ min-max feature scaling from one moment pass, deterministic hash-based
train/valid/test splitting, a k-anonymity audit, the APPLICATION of the
temperature mix as integer-rational per-source keep rates, 2-hop
neighborhood reach on the trade graph, and lagged cross-correlation
between event series.

Design rules as everywhere in this package: one declarative DataFrame
plan per op (Catalyst owns the physical strategy), broadcast what is
model-sized, shuffle only on the op's natural key, every float that
reaches the driver either integer-quantized or produced by an identical
single-IEEE-op expression tree in both engines (registry.py header lists
the six determinism conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4
from .pipeline_extras import _hash_bucket, _sql_hash_bucket

D0 = "decimal(38,0)"

# TPC-H dictionary values (stable across dbgen-style generations; the
# schema-drift suite would flag a regeneration that changes them).
SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


# ---------------------------------------------------------------------------
# feat_onehot — fixed-vocabulary one-hot encoding
# ---------------------------------------------------------------------------

@register(
    "feat_onehot",
    oracle=f"""
    SELECT c_custkey,
           {", ".join(
               f"CAST(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END AS INT)"
               f" AS seg_{s.lower()}"
               for s in SEGMENTS)},
           CAST(CASE WHEN c_mktsegment NOT IN
                ({", ".join(repr(s) for s in SEGMENTS)})
                THEN 1 ELSE 0 END AS INT) AS seg_other
    FROM customer
    """,
)
def feat_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding of a categorical column against a FIXED
    vocabulary (the production pattern: the encoder's columns are part
    of the model contract and must not depend on which categories happen
    to appear in a batch) — unknown categories fall into an explicit
    `seg_other` indicator rather than silently widening the schema.

    Scale: pure scan-fused projection — zero shuffles, zero state; the
    CASE chain compiles into one whole-stage-codegen stage.  A
    data-driven vocabulary (Spark ML's StringIndexer fit) is a separate
    model-fitting pass; encoding itself must be map-only, and is."""
    c = table(spark, sf_dir, "customer")
    cols = [
        F.when(F.col("c_mktsegment") == s, 1)
        .otherwise(0)
        .cast("int")
        .alias(f"seg_{s.lower()}")
        for s in SEGMENTS
    ]
    other = (
        F.when(~F.col("c_mktsegment").isin(*SEGMENTS), 1)
        .otherwise(0)
        .cast("int")
        .alias("seg_other")
    )
    return c.select("c_custkey", *cols, other)


# ---------------------------------------------------------------------------
# feat_scale — z-score + min-max scaling from one grouped moment pass
# ---------------------------------------------------------------------------

@register(
    "feat_scale",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment, count(*) AS n,
             sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS sx,
             sum(CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                      * CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                      AS DECIMAL(38,0))) AS sxx,
             min(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS mn,
             max(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS mx
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_custkey,
           round((CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                  - CAST(sx AS DOUBLE) / n)
                 / (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                              - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
                    / n), 4) AS z_bal,
           round(CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                      - mn AS DOUBLE) / (mx - mn), 4) AS mm_bal
    FROM customer JOIN m USING (c_mktsegment)
    """,
)
def feat_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score and min-max feature scaling — the fit+apply
    shape every tabular training pipeline runs.  Fit is ONE grouped
    moment pass (count / fixed-point sum / decimal sum-of-squares / min
    / max — all map-side combinable); apply is a broadcast join of the
    |segments|-row model back onto the scan.  Values quantize to cent
    bigints so the moments are exact; the closing z = (x − μ)/σ and
    mm = (x − min)/(max − min) are identical IEEE trees both engines
    (population σ via sqrt(n·Σx² − (Σx)²)/n — the scale-100 factors
    cancel in both outputs).

    Scale: fit shuffles the moment partials on the 5-value segment key;
    apply is map-side against the broadcast model — the second scan
    never shuffles.  At 100 TB the model stays 5 rows."""
    c = table(spark, sf_dir, "customer")
    # operand widens to DECIMAL BEFORE the square: the LONG product
    # wraps silently above |quantized| ~3.03e9 (r10 judge sweep)
    x = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
    m = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x.cast(D0) * x.cast(D0)).alias("sxx"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
    )
    joined = c.join(F.broadcast(m), "c_mktsegment")
    sd = (
        F.sqrt(
            (
                F.col("n").cast(D0) * F.col("sxx")
                - F.col("sx").cast(D0) * F.col("sx")
            ).cast("double")
        )
        / F.col("n")
    )
    z = (x - F.col("sx").cast("double") / F.col("n")) / sd
    mm = (x - F.col("mn")).cast("double") / (F.col("mx") - F.col("mn"))
    return joined.select(
        "c_custkey",
        r4(z).alias("z_bal"),
        r4(mm).alias("mm_bal"),
    )


# ---------------------------------------------------------------------------
# split_train_test — deterministic hash-based corpus splitting
# ---------------------------------------------------------------------------

SPLIT_BP = (8000, 1000, 1000)  # train / valid / test in basis points


@register(
    "split_train_test",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id,
             CASE WHEN {_sql_hash_bucket("'split:' || CAST(doc_id AS VARCHAR)", 10_000)}
                       < {SPLIT_BP[0]} THEN 'train'
                  WHEN {_sql_hash_bucket("'split:' || CAST(doc_id AS VARCHAR)", 10_000)}
                       < {SPLIT_BP[0] + SPLIT_BP[1]} THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(doc_id AS BIGINT)) AS BIGINT) AS id_checksum
    FROM tagged GROUP BY split
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by content-hash
    threshold on the document key — the production splitting discipline:
    membership is a pure function of the id (stable under retries,
    repartitioning, incremental corpus growth, and engine choice), never
    an engine RNG, so a document can NEVER migrate between train and
    test across pipeline runs — the leakage mode a `.randomSplit()`
    invites.  Output is the per-split count + id checksum (the audit
    record); the split COLUMN itself is the same one-line predicate any
    downstream op composes for free.

    Scale: the tag is map-side expression work inside the scan; the
    audit aggregate is one 3-key shuffle of combined partials."""
    d = table(spark, sf_dir, "documents")
    bucket = _hash_bucket(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string")), 10_000
    )
    tagged = d.select(
        "doc_id",
        F.when(bucket < SPLIT_BP[0], "train")
        .when(bucket < SPLIT_BP[0] + SPLIT_BP[1], "valid")
        .otherwise("test")
        .alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("doc_id").cast("long")).alias("id_checksum"),
    )


# ---------------------------------------------------------------------------
# audit_k_anonymity — quasi-identifier group-size audit
# ---------------------------------------------------------------------------

K_ANON = 5
BAL_BAND = 100_000  # acctbal cents band width (1000 currency units)


@register(
    "audit_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(floor(c_acctbal * 100 + 0.5) / {BAL_BAND}) AS BIGINT)
               AS bal_band,
             count(*) AS grp
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(grp) AS BIGINT) AS min_group_size,
           CAST(count_if(grp < {K_ANON}) AS BIGINT) AS n_small_groups,
           CAST(sum(CASE WHEN grp < {K_ANON} THEN grp ELSE 0 END) AS BIGINT)
             AS n_exposed_rows,
           round(CAST(sum(CASE WHEN grp < {K_ANON} THEN grp ELSE 0 END)
                      AS DOUBLE) / sum(grp), 4) AS exposed_share
    FROM g
    """,
)
def audit_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    segment, banded balance): how many equivalence classes fall below
    k = {K_ANON} members, and what share of rows they expose — the
    re-identification screen run before releasing or training on
    user-adjacent tabular data.  Bands are integer floors of cent
    values, group sizes are exact counts; the only double is the final
    share ratio (one division, rounded).

    Scale: one grouped count on the QI tuple (map-side combinable) plus
    a global 1-row rollup of the group-size table — the second aggregate
    input is |groups| rows, orders of magnitude below the fact count.
    Generalization search (coarsening bands until k holds) reruns just
    the first aggregate per candidate banding."""
    c = table(spark, sf_dir, "customer")
    band = F.floor(
        F.floor(F.col("c_acctbal") * 100 + 0.5) / BAL_BAND
    ).cast("long")
    g = c.groupBy(
        "c_nationkey", "c_mktsegment", band.alias("bal_band")
    ).agg(F.count(F.lit(1)).alias("grp"))
    small = F.when(F.col("grp") < K_ANON, F.col("grp")).otherwise(0)
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("grp").alias("min_group_size"),
        F.count_if(F.col("grp") < K_ANON).alias("n_small_groups"),
        F.sum(small).cast("long").alias("n_exposed_rows"),
        r4(
            F.sum(small).cast("double") / F.sum("grp")
        ).alias("exposed_share"),
    )


# ---------------------------------------------------------------------------
# mix_apply — the temperature mix as integer-rational keep rates
# ---------------------------------------------------------------------------

MIX_SCALE = 10**12


@register(
    "mix_apply",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ), q AS (
      SELECT source, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)
                             / CAST(sum(n) OVER () AS BIGINT))
                        * {MIX_SCALE} + 0.5) AS BIGINT) AS qw
      FROM s
    ), anchor AS (
      SELECT n AS n_a, qw AS qw_a FROM q
      ORDER BY CAST(n AS DOUBLE) / qw, source LIMIT 1
    ), rates AS (
      SELECT source,
             CAST(CAST(n_a AS DECIMAL(38,0)) * 10000 * qw
                  / (CAST(qw_a AS DECIMAL(38,0)) * n) AS BIGINT) AS rate_bp
      FROM q, anchor
    )
    SELECT d.source, r.rate_bp,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(CAST(d.doc_id AS BIGINT)) AS BIGINT) AS id_checksum
    FROM documents d
    JOIN rates r ON d.source = r.source
    WHERE {_sql_hash_bucket("'mix:' || CAST(d.doc_id AS VARCHAR)", 10_000)}
          < r.rate_bp
    GROUP BY d.source, r.rate_bp
    """,
)
def mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the T=1/2 temperature mix (`mix_temperature` computes the
    weights; this op materializes the mixed corpus): per-source keep
    rates are chosen so kept counts are proportional to the tempered
    weights with NO source upsampled — the anchor source (largest
    n/weight ratio, i.e. the most downsample-needing... precisely the
    one whose rate lands at 10000 bp) keeps everything, every other
    source keeps the integer-rational fraction
    rate_bp = ⌊n_anchor·10⁴·qw_s / (qw_anchor·n_s)⌋.  All rate
    arithmetic is exact decimal-integer (the only doubles are inside
    the already-quantized qw), membership is the md5 hash-threshold
    predicate — deterministic, resumable, engine-portable.

    Scale: rates derive from the |sources|-row aggregate (broadcast
    back); the keep predicate is map-side scan work; the audit rollup
    combines partials on the source key.  This is the full mixing
    story: weights → rates → one streaming filter pass."""
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy()
    total = F.sum("n").over(wall).cast("long")
    qw = F.floor(
        F.sqrt(F.col("n").cast("double") / total) * MIX_SCALE + 0.5
    ).cast("long")
    # pinned: q feeds the anchor pick + the rate projection (plan-audit,
    # SCALE.md §50).
    q = pin(s.select("source", "n", qw.alias("qw")))
    anchor = (
        q.orderBy(
            (F.col("n").cast("double") / F.col("qw")).asc(), F.col("source")
        )
        .limit(1)
        .select(F.col("n").alias("n_a"), F.col("qw").alias("qw_a"))
    )
    rates = q.crossJoin(F.broadcast(anchor)).select(
        "source",
        (
            F.col("n_a").cast(D0) * 10000 * F.col("qw")
            / (F.col("qw_a").cast(D0) * F.col("n"))
        )
        .cast("long")
        .alias("rate_bp"),
    )
    bucket = _hash_bucket(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string")), 10_000
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate_bp"))
        .groupBy("source", "rate_bp")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.col("doc_id").cast("long")).alias("id_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# graph_khop — 2-hop neighborhood reach on the trade graph
# ---------------------------------------------------------------------------

KHOP_TOPK = 20


@register(
    "graph_khop",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), seeds AS (
      SELECT c, count(*) AS deg FROM e GROUP BY c
      ORDER BY deg DESC, c LIMIT {KHOP_TOPK}
    )
    SELECT seeds.c AS custkey, CAST(seeds.deg AS BIGINT) AS n_suppliers_1hop,
           CAST(count(DISTINCT e2.c) AS BIGINT) AS n_customers_2hop
    FROM seeds
    JOIN e e1 ON e1.c = seeds.c
    JOIN e e2 ON e2.s = e1.s AND e2.c <> seeds.c
    GROUP BY seeds.c, seeds.deg
    """,
)
def graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhood reach on the customer↔supplier trade graph:
    for the {KHOP_TOPK} highest-degree customers, how many suppliers
    they touch (1 hop) and how many OTHER customers share a supplier
    with them (2 hops) — the neighborhood-expansion primitive behind
    collaborative filtering and influence scoring, expressed as two
    equi-joins over the deduplicated edge list plus a distinct count.

    Scale: the edge list is the distinct (custkey, suppkey) projection
    (one combine-heavy aggregate); hop joins partition on c then s —
    natural key changes, no avoiding two shuffles.  Seeding bounds the
    expansion frontier ({KHOP_TOPK} rows broadcast); an unbounded
    all-nodes 2-hop is the documented quadratic-risk variant (dense
    suppliers fan out), which is why production khop always seeds or
    samples.  Distinct-count state is per-seed, bounded by |customers|."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # pinned: the edge list feeds the seed ranking + both hop legs —
    # un-pinned each re-ran the fact join (plan-audit, SCALE.md §50).
    e = pin(
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    seeds = (
        e.groupBy("c")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("c"))
        .limit(KHOP_TOPK)
    )
    e1 = e.select(F.col("c").alias("seed_c"), F.col("s").alias("hop_s"))
    e2 = e.select(F.col("s").alias("hop_s"), F.col("c").alias("reach_c"))
    return (
        F.broadcast(seeds)
        .join(e1, seeds.c == e1.seed_c)
        .join(e2, "hop_s")
        .filter(F.col("reach_c") != F.col("c"))
        .groupBy(F.col("c").alias("custkey"), F.col("deg"))
        .agg(F.count_distinct("reach_c").alias("n_customers_2hop"))
        .select(
            "custkey",
            F.col("deg").cast("long").alias("n_suppliers_1hop"),
            "n_customers_2hop",
        )
    )


# ---------------------------------------------------------------------------
# ts_cross_corr — lagged cross-correlation between two event series
# ---------------------------------------------------------------------------

XCORR_LAGS = (0, 1, 2)
XCORR_A = "view"
XCORR_B = "click"


@register(
    "ts_cross_corr",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type IN ('{XCORR_A}', '{XCORR_B}')
      GROUP BY 1, 2
    ), a AS (SELECT day, c FROM daily WHERE event_type = '{XCORR_A}'),
    b AS (SELECT day, c FROM daily WHERE event_type = '{XCORR_B}'),
    lags AS (SELECT unnest(ARRAY{list(XCORR_LAGS)}) AS lag),
    pairs AS (
      SELECT l.lag, a.c AS x, b.c AS y
      FROM lags l
      JOIN a ON TRUE
      JOIN b ON b.day = a.day + to_days(CAST(l.lag AS INT))
    ), m AS (
      SELECT lag, count(*) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx,
             sum(CAST(y AS DECIMAL(38,0))) AS sy,
             sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             sum(CAST(y * y AS DECIMAL(38,0))) AS syy,
             sum(CAST(x * y AS DECIMAL(38,0))) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days,
           round(CAST(CAST(n AS DECIMAL(38,0)) * sxy
                      - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                 / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                             - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                        * CAST(CAST(n AS DECIMAL(38,0)) * syy
                               - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)),
                 4) AS xcorr
    FROM m
    """,
)
def ts_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the daily '{XCORR_A}' and
    '{XCORR_B}' series: does activity in series A at day t predict
    series B at day t+lag (lags {XCORR_LAGS}) — the lead-indicator
    screen behind "views drive purchases k days later" analyses.  Days
    align via an equi-join on the shifted calendar day; the Pearson
    closing is the five-decimal-moment tree over EXACT integer counts
    (shared with ts_autocorr).

    Scale: daily pre-aggregation first (the stream collapses to
    |days|·2 rows), so the lag join and moment pass run over
    model-sized series — the op scales with the scan.  More lags append
    rows to the tiny lag spine, not scans."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(XCORR_A, XCORR_B)
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.filter(F.col("event_type") == XCORR_A).select(
        F.col("day").alias("day_a"), F.col("c").alias("x")
    )
    b = daily.filter(F.col("event_type") == XCORR_B).select(
        F.col("day").alias("day_b"), F.col("c").alias("y")
    )
    lags = spark.range(len(XCORR_LAGS)).select(
        F.col("id").cast("int").alias("lag")
    )
    pairs = (
        F.broadcast(lags)
        .join(a)
        .join(
            b,
            F.col("day_b")
            == F.col("day_a") + F.make_dt_interval(F.col("lag")),
        )
    )
    m = pairs.groupBy("lag").agg(
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
        "lag",
        F.col("n").cast("long").alias("n_days"),
        r4(
            num.cast("double")
            / F.sqrt(da.cast("double") * db.cast("double"))
        ).alias("xcorr"),
    )
