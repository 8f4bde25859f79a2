"""Round-11 additions, batch 1 — SURVEY §2.BB: corpus TF-IDF heads,
BFS frontier expansion, OLS forecasting, nearest-value joins, token-source
mutual information, a JSONL source with corrupt-record audit, URL parsing,
largest-remainder token budgeting, and drawdown durations.

Fills 9 of the R12 certification slots (round-11 widening cap: <= 16 so
round 12 closes the whole backlog; this batch + xbrl_calc_check = 10).
House conventions throughout: integer/fixed-point sums wherever the data
allows (operands widened to DECIMAL before any product — the r10
overflow discipline), DEC18 quantized addends for float sums, he4 for
presented ratios, tie-safe orderings, ORDER-BY-complete top-k only, and
a scale note per op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import he4, pin, sql_he4

D0 = "decimal(38,0)"
DEC18 = "decimal(38,18)"

#: TF-IDF head size per source
TFIDF_K = 5
#: BFS seed count (smallest vertex ids) and hop budget
BFS_SEEDS = 3
BFS_HOPS = 3
#: token-source MI vocabulary restriction
MI_TOP_TERMS = 40
#: mix_token_budget global budget and temperature
MIX_BUDGET = 1_000_000
MIX_TEMP = 0.7


# ---------------------------------------------------------------------------
# corpus_tfidf_topk — top-k TF-IDF terms per source
# ---------------------------------------------------------------------------

@register(
    "corpus_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ), st AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY 1, 2
    ), ns AS (
      SELECT CAST(count(DISTINCT source) + 1 AS DOUBLE) AS ns FROM st
    ), idf AS (
      SELECT term,
             CAST(floor(ln(ns.ns / count(*)) * 1000000 + 0.5) AS BIGINT)
               AS idf_q
      FROM st, ns GROUP BY term, ns.ns
    ), sc AS (
      SELECT s.source, s.term, s.tf,
             CAST(s.tf * i.idf_q AS BIGINT) AS score_q
      FROM st s JOIN idf i USING (term) WHERE i.idf_q > 0
    ), rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY score_q DESC, term) AS rk
      FROM sc
    )
    SELECT source, CAST(rk AS INT) AS rk, term, tf, score_q
    FROM rk WHERE rk <= {TFIDF_K}
    """,
)
def corpus_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_K} TF-IDF terms per source — the domain-signature
    report a corpus curator reads before writing mixing weights (the
    head terms a source over-represents vs the rest of the corpus).
    idf = ln((n_sources + 1) / df) quantized e6 (shared IEEE ln on
    both engines; the +1 smoothing keeps corpus-wide terms at a small
    POSITIVE idf, so the head never degenerates to empty on a corpus
    whose whole vocabulary reaches every source); score = tf * idf_q
    is an exact integer product (operands DECIMAL-widened per the r10
    discipline); the per-source head is an ORDER-BY-complete top-k
    with term tiebreak.

    Scale: one tokenize scan; the (source, term) aggregate pins once
    and feeds both the document-frequency rollup and the scoring join —
    shuffles are vocabulary-bounded, never corpus-bounded."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    st = pin(
        toks.groupBy("source", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
    )
    ns = st.agg(
        (F.count_distinct("source") + 1).cast("double").alias("ns")
    )
    idf = (
        st.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(ns))
        .select(
            "term",
            F.floor(F.log(F.col("ns") / F.col("df")) * 1_000_000 + 0.5)
            .cast("long")
            .alias("idf_q"),
        )
    )
    sc = (
        st.join(idf, "term")
        .filter(F.col("idf_q") > 0)
        .select(
            "source",
            "term",
            "tf",
            (F.col("tf").cast(D0) * F.col("idf_q").cast(D0))
            .cast("long")
            .alias("score_q"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score_q"), "term")
    return (
        sc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_K)
        .select("source", F.col("rk").cast("int").alias("rk"), "term",
                "tf", "score_q")
    )


# ---------------------------------------------------------------------------
# graph_bfs_layers — multi-source BFS frontier sizes (pregel-style rounds)
# ---------------------------------------------------------------------------

def _bfs_oracle() -> str:
    hops = "".join(
        f""", f{h} AS (
      SELECT DISTINCT s.b AS v FROM f{h - 1} f JOIN sym s ON s.a = f.v
      WHERE s.b NOT IN (SELECT v FROM r{h - 1})
    ), r{h} AS (
      SELECT v FROM r{h - 1} UNION SELECT v FROM f{h}
    )"""
        for h in range(1, BFS_HOPS + 1)
    )
    selects = " UNION ALL ".join(
        f"""SELECT CAST({h} AS INT) AS hop,
        (SELECT CAST(count(*) AS BIGINT) FROM f{h}) AS frontier_size,
        (SELECT CAST(count(*) AS BIGINT) FROM r{h}) AS cum_reached"""
        for h in range(BFS_HOPS + 1)
    )
    from .warehouse_extras37 import SQL_COSUPPLY_EDGES

    return f"""
    WITH {SQL_COSUPPLY_EDGES}, sym AS (
      SELECT a, b FROM e UNION ALL SELECT b, a FROM e
    ), f0 AS (
      SELECT v FROM (SELECT DISTINCT a AS v FROM sym ORDER BY v
                     LIMIT {BFS_SEEDS})
    ), r0 AS (SELECT v FROM f0){hops}
    {selects}
    """


@register("graph_bfs_layers", oracle=_bfs_oracle())
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the supplier co-supply graph (edge = two
    suppliers sharing >= {COSUPPLY_MIN_ORDERS} distinct orders; the
    graph_triangle_count base): from the {BFS_SEEDS} smallest vertex
    ids, expand {BFS_HOPS} hops and report each frontier's size and the
    cumulative reached set — the frontier-expansion primitive behind
    reachability, influence radius, and connected-component growth
    curves.  Returns (hop, frontier_size, cum_reached), hop 0..{BFS_HOPS}.

    Scale: the pregel shape — each round is ONE join of the (pinned)
    frontier against the adjacency list plus an anti-join against the
    reached set; work per round is proportional to the frontier's edge
    boundary, never |V|^2, and the pinned frontier/reached frames keep
    Catalyst from re-expanding earlier rounds (the iterative-plan
    discipline of connected_components/pagerank).  Edge list from the
    shared memoized cosupply_edges kernel (r11 judge directive #2) —
    the 16x probe showed inline pair-gen at ~90% of BFS wall; the BFS
    rounds now run over the pre-pinned edges."""
    from .warehouse_extras37 import cosupply_edges

    e = cosupply_edges(spark, sf_dir).select("ea", "eb")
    sym = pin(
        e.select(F.col("ea").alias("av"), F.col("eb").alias("bv")).union(
            e.select(F.col("eb").alias("av"), F.col("ea").alias("bv"))
        )
    )
    frontier = pin(
        sym.select(F.col("av").alias("v"))
        .distinct()
        .orderBy("v")
        .limit(BFS_SEEDS)
    )
    reached = frontier
    layers = [
        frontier.agg(F.count(F.lit(1)).cast("long").alias("frontier_size"))
        .crossJoin(
            reached.agg(F.count(F.lit(1)).cast("long").alias("cum_reached"))
        )
        .select(F.lit(0).cast("int").alias("hop"), "frontier_size",
                "cum_reached")
    ]
    for hop in range(1, BFS_HOPS + 1):
        frontier = pin(
            frontier.join(sym, frontier["v"] == sym["av"])
            .select(F.col("bv").alias("v"))
            .distinct()
            .join(reached, "v", "anti")
        )
        reached = pin(reached.union(frontier))
        layers.append(
            frontier.agg(
                F.count(F.lit(1)).cast("long").alias("frontier_size")
            )
            .crossJoin(
                reached.agg(
                    F.count(F.lit(1)).cast("long").alias("cum_reached")
                )
            )
            .select(F.lit(hop).cast("int").alias("hop"), "frontier_size",
                    "cum_reached")
        )
    out = layers[0]
    for seg in layers[1:]:
        out = out.unionByName(seg)
    return out


# ---------------------------------------------------------------------------
# ts_ols_forecast — per-group linear-trend forecast with residual sigma
# ---------------------------------------------------------------------------

FORECAST_H = 7


@register(
    "ts_ols_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, datediff('day', min(d) OVER (PARTITION BY event_type), d) AS x, y
      FROM daily
    ), m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(y * y) AS HUGEINT) AS syy,
             CAST(max(x) AS BIGINT) AS xmax
      FROM idx GROUP BY 1
    ), fit AS (
      SELECT event_type, n, xmax,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
             CAST(sy AS DOUBLE) AS sy_d, CAST(sx AS DOUBLE) AS sx_d,
             CAST(sxy AS DOUBLE) AS sxy_d, CAST(syy AS DOUBLE) AS syy_d,
             CAST(n AS DOUBLE) AS n_d
      FROM m WHERE n * sxx - sx * sx > 0
    ), cl AS (
      SELECT event_type, n, xmax, slope,
             (sy_d - slope * sx_d) / n_d AS a,
             sy_d, sxy_d, syy_d, n_d
      FROM fit
    )
    SELECT event_type, n AS n_days,
           {sql_he4("slope")} AS slope,
           {sql_he4(f"a + slope * (xmax + {FORECAST_H})")} AS forecast,
           {sql_he4(
               "sqrt(greatest(0.0, (syy_d - a * sy_d - slope * sxy_d) / n_d))"
           )} AS resid_sd
    FROM cl
    """,
)
def ts_ols_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear-trend forecast of the daily event count,
    {FORECAST_H} days past the last observation, with the in-sample
    residual sigma — the capacity-planning one-liner ("where is this
    metric heading, and how noisy is the fit").  OLS from the five
    moment sums with DECIMAL-widened operands (the r10 overflow
    discipline end to end: LONG products wrap above ~3e9); slope /
    intercept / forecast / sigma close in one shared IEEE tree, he4.
    Returns (event_type, n_days, slope, forecast, resid_sd).

    Scale: the moments ride the calendar-bounded per-(type, day)
    aggregate — one combinable shuffle over the raw events, then
    model-sized algebra; no window over the raw stream."""
    ev = table(spark, sf_dir, "events")
    daily = pin(
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("d")
        ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        F.datediff("d", F.min("d").over(w)).cast("long").alias("x"),
        "y",
    )
    xd = F.col("x").cast(D0)
    yd = F.col("y").cast(D0)
    m = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(yd * yd).alias("syy"),
        F.max("x").cast("long").alias("xmax"),
    )
    nd = F.col("n").cast(D0)
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = m.filter(den > 0).select(
        "event_type",
        "n",
        "xmax",
        (num.cast("double") / den.cast("double")).alias("slope"),
        F.col("sy").cast("double").alias("sy_d"),
        F.col("sx").cast("double").alias("sx_d"),
        F.col("sxy").cast("double").alias("sxy_d"),
        F.col("syy").cast("double").alias("syy_d"),
        F.col("n").cast("double").alias("n_d"),
    )
    a = (F.col("sy_d") - F.col("slope") * F.col("sx_d")) / F.col("n_d")
    cl = fit.withColumn("a", a)
    sse = (
        F.col("syy_d")
        - F.col("a") * F.col("sy_d")
        - F.col("slope") * F.col("sxy_d")
    )
    return cl.select(
        "event_type",
        F.col("n").alias("n_days"),
        he4(F.col("slope")).alias("slope"),
        he4(
            F.col("a") + F.col("slope") * (F.col("xmax") + FORECAST_H)
        ).alias("forecast"),
        he4(F.sqrt(F.greatest(F.lit(0.0), sse / F.col("n_d")))).alias(
            "resid_sd"
        ),
    )


# ---------------------------------------------------------------------------
# join_nearest_value — nearest numeric-key join via one sorted pass
# ---------------------------------------------------------------------------

@register(
    "join_nearest_value",
    oracle="""
    WITH s AS (
      SELECT s_suppkey AS sk, s_nationkey AS nk,
             CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS v
      FROM supplier
    ), c AS (
      SELECT c_custkey AS ck, c_nationkey AS nk,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
      FROM customer
    ), p AS (
      SELECT s.sk, c.ck, s.v - c.v AS diff,
             row_number() OVER (PARTITION BY s.sk
                                ORDER BY abs(s.v - c.v), c.ck) AS rk
      FROM s JOIN c ON s.nk = c.nk
    )
    SELECT sk AS s_suppkey, ck AS nearest_custkey,
           CAST(diff AS BIGINT) AS diff_cents
    FROM p WHERE rk = 1
    """,
)
def join_nearest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-value join on a NUMERIC axis (join_nearest_ts off the
    time axis): each supplier matched to the same-nation customer whose
    account balance is closest in cents — the benchmark-matching /
    quote-pairing primitive.  Exact via the union-and-sweep trick: both
    sides interleave in ONE per-nation sort; a running `last` picks the
    floor candidate and a reversed running `last` the ceiling, so the
    true nearest (one of the two) is found WITHOUT an all-pairs join.
    Ties on |diff| break to the lower custkey (both candidate structs
    carry the minimum custkey of their value, so min() over the tied
    pair reproduces the oracle's (|diff|, ck) order).  Returns
    (s_suppkey, nearest_custkey, diff_cents signed).

    Scale: ONE exchange on the group key carries both window passes
    (same partitioning, two sort orders); the oracle's quadratic
    per-nation cross join is exactly what this formulation avoids."""
    sup = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"),
        F.floor(F.col("s_acctbal") * 100 + 0.5).cast("long").alias("v"),
        F.lit(1).alias("side"),
        F.col("s_suppkey").alias("key"),
    )
    cus = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("v"),
        F.lit(0).alias("side"),
        F.col("c_custkey").alias("key"),
    )
    u = cus.unionByName(sup)
    cand = F.when(
        F.col("side") == 0, F.struct(F.col("v").alias("cv"),
                                     F.col("key").alias("ck"))
    )
    # at equal v customers sort BEFORE the supplier (side asc) and the
    # smallest custkey sorts LAST (key desc), so `last` lands on it
    wf = (
        Window.partitionBy("nk")
        .orderBy(F.col("v").asc(), F.col("side").asc(), F.col("key").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wc = (
        Window.partitionBy("nk")
        .orderBy(F.col("v").desc(), F.col("side").asc(), F.col("key").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = u.select(
        "nk",
        "v",
        "side",
        "key",
        F.last(cand, ignorenulls=True).over(wf).alias("flo"),
        F.last(cand, ignorenulls=True).over(wc).alias("cei"),
    ).filter(F.col("side") == 1)
    dlo = F.col("v") - F.col("flo.cv")
    dhi = F.col("cei.cv") - F.col("v")
    pick = (
        F.when(F.col("flo").isNull(), F.col("cei"))
        .when(F.col("cei").isNull(), F.col("flo"))
        .when(dlo < dhi, F.col("flo"))
        .when(dhi < dlo, F.col("cei"))
        .otherwise(  # |diff| tie -> lower custkey
            F.when(
                F.col("flo.ck") <= F.col("cei.ck"), F.col("flo")
            ).otherwise(F.col("cei"))
        )
    )
    return (
        swept.withColumn("pick", pick)
        .filter(F.col("pick").isNotNull())
        .select(
            F.col("key").alias("s_suppkey"),
            F.col("pick.ck").alias("nearest_custkey"),
            (F.col("v") - F.col("pick.cv")).cast("long").alias("diff_cents"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_token_source_mi — token <-> source mutual information
# ---------------------------------------------------------------------------

@register(
    "corpus_token_source_mi",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ), cts AS (
      SELECT term, source, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE term <> '' GROUP BY 1, 2
    ), ctot AS (
      SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM cts GROUP BY 1
    ), top AS (
      SELECT term, ct FROM ctot ORDER BY ct DESC, term LIMIT {MI_TOP_TERMS}
    ), r AS (
      SELECT c.term, c.source, c.c, t.ct
      FROM cts c JOIN top t USING (term)
    ), cs AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM r GROUP BY 1
    ), tt AS (
      SELECT CAST(sum(c) AS BIGINT) AS t FROM r
    ), contrib AS (
      SELECT r.term, r.ct,
             CAST(
               (CAST(r.c AS DOUBLE) / CAST(tt.t AS DOUBLE))
               * ln((CAST(r.c AS DOUBLE) * CAST(tt.t AS DOUBLE))
                    / (CAST(r.ct AS DOUBLE) * CAST(cs.cs AS DOUBLE)))
               AS DECIMAL(38,18)) AS q
      FROM r JOIN cs USING (source), tt
    )
    SELECT term, ct,
           CAST(floor(CAST(sum(q) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             AS mi_micro
    FROM contrib GROUP BY term, ct
    """,
)
def corpus_token_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between token and source over the corpus-wide
    top-{MI_TOP_TERMS} terms — the feature-selection score that says
    which head terms are SOURCE SIGNATURES (high MI: the term's mass
    concentrates in few sources) vs corpus-wide glue (MI ~ 0).  The
    joint distribution is restricted to the head vocabulary; each
    (term, source) cell contributes p(t,s) * ln(p(t,s)/(p(t)p(s))),
    quantized DEC18 pre-sum so the per-term sum is shuffle-order free;
    presented as micro-nats.  Returns (term, ct, mi_micro), one row per
    head term.

    Scale: one tokenize scan into a pinned (term, source) aggregate;
    the head list is an ORDER-BY-complete top-k that broadcasts back,
    so every later frame is (head-vocab x sources)-bounded."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    cts = pin(
        toks.groupBy("term", "source").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    top = (
        cts.groupBy("term")
        .agg(F.sum("c").cast("long").alias("ct"))
        .orderBy(F.desc("ct"), "term")
        .limit(MI_TOP_TERMS)
    )
    r = pin(cts.join(F.broadcast(top), "term"))
    cs = r.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    tt = r.agg(F.sum("c").cast("long").alias("t"))
    cd = F.col("c").cast("double")
    td = F.col("t").cast("double")
    contrib = (
        r.join(cs, "source")
        .crossJoin(F.broadcast(tt))
        .select(
            "term",
            "ct",
            (
                (cd / td)
                * F.log(
                    (cd * td)
                    / (F.col("ct").cast("double") * F.col("cs").cast("double"))
                )
            )
            .cast(DEC18)
            .alias("q"),
        )
    )
    return contrib.groupBy("term", "ct").agg(
        F.floor(F.sum("q").cast("double") * 1_000_000 + 0.5)
        .cast("long")
        .alias("mi_micro")
    )


# ---------------------------------------------------------------------------
# src_jsonl — JSON-lines source with corrupt-record audit
# ---------------------------------------------------------------------------

JSONL_MOD = 97
JSONL_CORRUPT_LINES = ('{"event_id": 1, "user_id":', "not json at all")


@register(
    "src_jsonl",
    oracle=f"""
    SELECT CAST(count(*) + {len(JSONL_CORRUPT_LINES)} AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_good,
           CAST({len(JSONL_CORRUPT_LINES)} AS BIGINT) AS n_corrupt,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM events WHERE event_id % {JSONL_MOD} = 0
    """,
)
def src_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingestion with PERMISSIVE corrupt-record audit — the
    file format training-data pipelines actually arrive in.  A
    deterministic slice of events round-trips through to_json -> .text
    staging; {len(JSONL_CORRUPT_LINES)} malformed lines are injected;
    the read-back uses an explicit schema + columnNameOfCorruptRecord
    so bad lines surface as rows (NOT silent drops — FAILFAST is the
    other documented mode) and the audit reports line/good/corrupt
    counts plus a value checksum proving the double round-trip is
    exact.  Returns one row (n_lines, n_good, n_corrupt,
    sum_value_cents).

    Scale: schema-explicit JSON reads skip Spark's full inference scan;
    the corrupt-record column is the per-file quarantine hook (route
    non-null _corrupt_record rows to a dead-letter sink in production).
    """
    import atexit
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % JSONL_MOD == 0)
        .select("event_id", "user_id", "value")
    )
    stage = tempfile.mkdtemp(prefix=f"secdb_jsonl_{_uuid.uuid4().hex[:8]}_")
    atexit.register(shutil.rmtree, stage, ignore_errors=True)
    in_dir = os.path.join(stage, "in")
    # the corrupt lines go through Spark's OWN writer (unioned into the
    # same single write), so the staging works on any Hadoop-FS target,
    # not just a driver-local disk (r11 review).  r13: the former
    # two-row `mode("append")` second write cost ~5 s of commit/list
    # overhead per invocation — one committed write replaces two.
    corrupt = spark.createDataFrame(
        [(line,) for line in JSONL_CORRUPT_LINES], "j string"
    )
    ev.select(
        F.to_json(F.struct("event_id", "user_id", "value")).alias("j")
    ).unionAll(corrupt).write.mode("overwrite").text(in_dir)
    back = (
        spark.read.schema(
            "event_id long, user_id long, value double, "
            "_corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(in_dir)
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_good"),
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("sum_value_cents"),
    )


# ---------------------------------------------------------------------------
# fn_url — URL component extraction
# ---------------------------------------------------------------------------

@register(
    "fn_url",
    oracle="""
    SELECT s_suppkey,
           'sup' || s_suppkey || '.example.com' AS host,
           '/catalog/' || (s_suppkey % 10) AS path,
           CAST(s_nationkey AS INTEGER) AS q_nation,
           CAST(s_suppkey % 7 AS INTEGER) AS q_rank
    FROM supplier
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction with parse_url — host, path, and named
    query parameters (the provenance columns a web-scale corpus keys
    mixing and dedup on).  URLs are assembled deterministically from
    supplier attributes, then GENUINELY parsed back by Spark's
    parse_url; the oracle constructs the expected components directly,
    so the differential certifies the parser, not string assembly.
    Returns (s_suppkey, host, path, q_nation, q_rank).

    Scale: pure map-side expressions fused into the scan — parse_url is
    a codegen'd JVM builtin, no UDF."""
    s = table(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey").cast("string")
    url = F.concat(
        F.lit("https://sup"), sk, F.lit(".example.com/catalog/"),
        (F.col("s_suppkey") % 10).cast("string"),
        F.lit("?nation="), F.col("s_nationkey").cast("string"),
        F.lit("&rank="), (F.col("s_suppkey") % 7).cast("string"),
    )
    return s.select(
        "s_suppkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("nation"))
        .cast("int")
        .alias("q_nation"),
        F.parse_url(url, F.lit("QUERY"), F.lit("rank"))
        .cast("int")
        .alias("q_rank"),
    )


# ---------------------------------------------------------------------------
# mix_token_budget — largest-remainder token allocation across sources
# ---------------------------------------------------------------------------

@register(
    "mix_token_budget",
    oracle=f"""
    WITH ts AS (
      SELECT source,
             CAST(sum(length(list_filter(string_split(lower(text), ' '),
                                         x -> x <> ''))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY 1
    ), pq AS (
      SELECT source, n_tokens,
             CAST(floor(exp({MIX_TEMP} * ln(CAST(n_tokens AS DOUBLE)))
                        * 1000 + 0.5) AS BIGINT) AS pq
      FROM ts WHERE n_tokens > 0
    ), tot AS (SELECT CAST(sum(pq) AS BIGINT) AS s FROM pq),
    base AS (
      SELECT source, n_tokens, pq,
             ({MIX_BUDGET} * pq) // tot.s AS base,
             ({MIX_BUDGET} * pq) % tot.s AS rem
      FROM pq, tot
    ), fin AS (
      SELECT source, n_tokens, base, rem,
             sum(base) OVER () AS tot_base,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM base
    )
    SELECT source, n_tokens,
           CAST(base + CASE WHEN rk <= {MIX_BUDGET} - tot_base
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
    FROM fin
    """,
)
def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder allocation of a {MIX_BUDGET}-token training
    budget across sources under temperature {MIX_TEMP} sampling — the
    integer answer to "how many tokens do I take from each source",
    guaranteed to sum EXACTLY to the budget (floats round-trip to
    ceilings that don't).  Source mass is whitespace token count;
    weights are n_tokens^{MIX_TEMP} quantized e3 (shared IEEE exp/ln
    tree both engines), then pure integer arithmetic: base = budget *
    w // W, and the budget's remainder goes to the largest fractional
    parts (tie: source asc).  Returns (source, n_tokens, alloc_tokens);
    sum(alloc_tokens) == {MIX_BUDGET} structurally.

    Scale: one tokenize scan into a |sources|-row aggregate; the
    window runs over that model-sized frame only.  budget * pq stays
    inside int64 up to ~petatoken corpora (pq <= ~2.5e11 at e3)."""
    docs = table(spark, sf_dir, "documents")
    ts = (
        docs.select(
            "source",
            F.size(
                F.filter(
                    F.split(F.lower(F.col("text")), " "),
                    lambda x: x != F.lit(""),
                )
            ).alias("nt"),
        )
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    pq = pin(
        ts.select(
            "source",
            "n_tokens",
            F.floor(
                F.exp(
                    F.lit(MIX_TEMP) * F.log(F.col("n_tokens").cast("double"))
                )
                * 1000
                + 0.5
            )
            .cast("long")
            .alias("pq"),
        )
    )
    tot = pq.agg(F.sum("pq").cast("long").alias("s"))
    base = pq.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"({MIX_BUDGET} * pq) div s").alias("base"),
        F.expr(f"({MIX_BUDGET} * pq) % s").alias("rem"),
    )
    wall = Window.partitionBy()
    wrk = Window.partitionBy().orderBy(F.desc("rem"), "source")
    fin = base.select(
        "source",
        "n_tokens",
        "base",
        F.sum("base").over(wall).alias("tot_base"),
        F.row_number().over(wrk).alias("rk"),
    )
    return fin.select(
        "source",
        "n_tokens",
        (
            F.col("base")
            + F.when(
                F.col("rk") <= F.lit(MIX_BUDGET) - F.col("tot_base"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    )


# ---------------------------------------------------------------------------
# ts_drawdown_duration — max drawdown depth AND duration per series
# ---------------------------------------------------------------------------

@register(
    "ts_drawdown_duration",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS v
      FROM events GROUP BY 1, 2
    ), pk AS (
      SELECT event_type, d, v,
             max(v) OVER (PARTITION BY event_type ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS peak
      FROM daily
    ), grp AS (
      SELECT event_type, d, v, peak,
             CASE WHEN v = peak THEN 1 ELSE 0 END AS at_peak,
             sum(CASE WHEN v = peak THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY d
                     ROWS UNBOUNDED PRECEDING) AS g
      FROM pk
    ), runs AS (
      SELECT event_type, g,
             CAST(sum(1 - at_peak) AS BIGINT) AS dd_days,
             max(CASE WHEN peak > 0 THEN
                   CAST(peak - v AS DOUBLE) / CAST(peak AS DOUBLE)
                 END) AS depth
      FROM grp GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(sum(dd_days) + count(*) AS BIGINT) AS n_days,
           {sql_he4("max(depth)")} AS max_dd_depth,
           CAST(max(dd_days) AS BIGINT) AS max_dd_days
    FROM runs GROUP BY event_type
    """,
)
def ts_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown DEPTH and DURATION of each type's daily revenue
    series (win_drawdown reports how far below the running peak; this
    adds how LONG the series stayed under water — the recovery-time
    number a risk reader actually asks for).  Values are exact cents;
    a running max flags at-peak days, a running count of those days
    numbers the peak-to-peak runs, and each run's below-peak day count
    is its drawdown duration.  Returns (event_type, n_days,
    max_dd_depth he4, max_dd_days).

    Scale: both windows and the run rollup ride one (type)-keyed
    exchange over the calendar-bounded daily aggregate."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pk = daily.withColumn("peak", F.max("v").over(w))
    at_peak = F.when(F.col("v") == F.col("peak"), 1).otherwise(0)
    grp = pk.select(
        "event_type",
        "v",
        "peak",
        at_peak.alias("at_peak"),
        F.sum(at_peak).over(w).alias("g"),
    )
    # depth only defined against a POSITIVE peak (r11 review); the
    # fixture's revenue series is always positive, so certified output
    # is unchanged
    runs = grp.groupBy("event_type", "g").agg(
        F.sum(1 - F.col("at_peak")).cast("long").alias("dd_days"),
        F.max(
            F.when(
                F.col("peak") > 0,
                (F.col("peak") - F.col("v")).cast("double")
                / F.col("peak").cast("double"),
            )
        ).alias("depth"),
    )
    return runs.groupBy("event_type").agg(
        (F.sum("dd_days") + F.count(F.lit(1))).cast("long").alias("n_days"),
        he4(F.max("depth")).alias("max_dd_depth"),
        F.max("dd_days").cast("long").alias("max_dd_days"),
    )


# ---------------------------------------------------------------------------
# agg_weighted_percentile — weighted lower-bound percentiles, exact integers
# ---------------------------------------------------------------------------

WPCT = (25, 50, 75, 90)


@register(
    "agg_weighted_percentile",
    oracle=f"""
    WITH q AS (
      SELECT l_returnflag AS rf,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
             CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS wv
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT rf, v, wv,
             sum(wv) OVER (PARTITION BY rf ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum,
             sum(wv) OVER (PARTITION BY rf) AS tot
      FROM q
    )
    SELECT rf AS l_returnflag,
           {", ".join(
               f"CAST(min(CASE WHEN 100 * cum >= {p} * tot THEN v END)"
               f" AS BIGINT) AS p{p}_cents" for p in WPCT)}
    FROM c GROUP BY rf
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles of the price distribution per return flag,
    weighted by quantity (agg_weighted_median generalized to an
    arbitrary percentile vector): p-th percentile = the smallest value
    whose cumulative weight reaches p% of the group's total — the
    lower-bound convention, so everything is EXACT integer arithmetic
    (cents x centi-units, 100*cum >= p*tot compares), no interpolation,
    no floats anywhere.  Returns (l_returnflag, p25_cents, p50_cents,
    p75_cents, p90_cents).

    Scale: values pre-aggregate per (group, value) — the window runs
    over the value-domain-bounded weight table, not the raw rows; one
    exchange on the group key serves both window frames."""
    li = table(spark, sf_dir, "lineitem")
    q = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("v"),
    ).agg(
        F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("wv")
    )
    wc = (
        Window.partitionBy("rf")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("rf")
    c = q.select(
        "rf",
        "v",
        F.sum("wv").over(wc).alias("cum"),
        F.sum("wv").over(wt).alias("tot"),
    )
    # threshold compare widens to DECIMAL: 100*cum in LONG wraps above
    # ~9.2e16 cumulative weight while the DuckDB oracle's HUGEINT does
    # not (round-11 close-out review)
    cum_d = F.col("cum").cast(D0)
    tot_d = F.col("tot").cast(D0)
    return c.groupBy(F.col("rf").alias("l_returnflag")).agg(
        *[
            F.min(F.when(100 * cum_d >= p * tot_d, F.col("v")))
            .cast("long")
            .alias(f"p{p}_cents")
            for p in WPCT
        ]
    )


# ---------------------------------------------------------------------------
# sample_weighted_topk — Efraimidis-Spirakis weighted sampling, deterministic
# ---------------------------------------------------------------------------

WSAMPLE_K = 20
WSAMPLE_SALT = "ws:"
#: 13 hex digits = 52 bits — exactly representable in a double
_HEX13 = float(16**13)


@register(
    "sample_weighted_topk",
    oracle=f"""
    WITH k AS (
      SELECT o_orderkey, o_totalprice,
             -ln((('0x' || substr(md5('{WSAMPLE_SALT}'
                                      || CAST(o_orderkey AS VARCHAR)),
                                  1, 13))::BIGINT + 1) / {_HEX13!r})
               / o_totalprice AS key
      FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice > 0
    ), rk AS (
      SELECT *, row_number() OVER (ORDER BY key, o_orderkey) AS rk FROM k
    )
    SELECT CAST(rk AS INT) AS rk, o_orderkey,
           CAST(floor(key * 1000000000000 + 0.5) AS BIGINT) AS key_e12
    FROM rk WHERE rk <= {WSAMPLE_K}
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis priority sampling): each order draws
    u = md5-uniform(0, 1] and key = -ln(u) / weight; the k smallest
    keys are a weight-proportional sample — the standard one-pass
    distributed algorithm (equivalent to ranking by u^(1/w)), here made
    REPRODUCIBLE by deriving u from a salted md5 of the key column
    instead of an RNG, the deterministic-sample house convention.
    Weight = o_totalprice.  Returns (rk, o_orderkey, key_e12).

    Scale: keys are map-side expressions fused into the scan; the top-k
    is TakeOrderedAndProject (partial top-k per partition, never a
    global sort) — the same shape at any corpus size, and the sample is
    stable under repartitioning because u is a pure function of the
    row key."""
    o = table(spark, sf_dir, "orders")
    hn = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(WSAMPLE_SALT),
                           F.col("o_orderkey").cast("string"))),
            1, 13,
        ),
        16, 10,
    ).cast("long")
    key = -F.log((hn + 1) / F.lit(_HEX13)) / F.col("o_totalprice")
    # NULL keys hash to NULL priorities (sort first, hijack the top-k)
    # and non-positive weights have no ES meaning — excluded (r11
    # review); vacuous on this corpus, load-bearing on arbitrary ones
    k = o.filter(
        F.col("o_orderkey").isNotNull() & (F.col("o_totalprice") > 0)
    ).select("o_orderkey", key.alias("key"))
    w = Window.orderBy("key", "o_orderkey")
    return (
        k.orderBy("key", "o_orderkey")
        .limit(WSAMPLE_K)
        .withColumn("rk", F.row_number().over(w))
        .select(
            F.col("rk").cast("int").alias("rk"),
            "o_orderkey",
            F.floor(F.col("key") * 1_000_000_000_000 + 0.5)
            .cast("long")
            .alias("key_e12"),
        )
    )


# ---------------------------------------------------------------------------
# sessionize_native — Spark's NATIVE session_window vs gaps-and-islands
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


@register(
    "sessionize_native",
    oracle=f"""
    WITH l AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS p
      FROM events
    ), s AS (
      SELECT user_id, ts,
             CASE WHEN p IS NULL
                    OR ts - p > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS f,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM l
    ), g AS (
      SELECT user_id, ts,
             sum(f) OVER (PARTITION BY user_id ORDER BY rn
                          ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT user_id,
           min(ts) AS sess_start,
           max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS sess_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, sid
    """,
)
def sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's NATIVE session_window operator —
    the built-in whose merging-window state machine replaces the
    hand-rolled lag + running-sum composition (events_sessionize), here
    DIFFERENTIALLY CERTIFIED against the canonical gaps-and-islands SQL:
    session start = first event, end = last event + {SESSION_GAP_MIN}
    min (the operator's close-at-gap semantics), one row per (user,
    session).  Returns (user_id, sess_start, sess_end, n_events).

    Scale: session_window aggregates with ONE exchange on the user key
    and per-key sorted merging — the same shape the lag formulation
    pays, with the session assignment inside the aggregate instead of
    two window passes; this op pins that the built-in and the canonical
    SQL agree EXACTLY, so either formulation can serve the other as an
    oracle at any scale."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )
