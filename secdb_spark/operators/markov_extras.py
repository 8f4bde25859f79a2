"""Round-6 additions, batch 8 — SURVEY §2.V: the stationary distribution
of the user-behavior Markov chain (fixed power iteration, pagerank-style
decimal-exact contributions) and LIMIT/OFFSET pagination surface parity.

Design rules as everywhere in this package: one declarative DataFrame
plan per op, broadcast what is model-sized, every float reaching the
driver integer-quantized or produced by an identical IEEE expression
tree in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register

MARKOV_ITERS = 4
_DEC18 = "DECIMAL(38,18)"


def _markov_oracle() -> str:
    its = []
    prev = "pi0"
    for k in range(1, MARKOV_ITERS + 1):
        its.append(
            f"""pi{k} AS (
      SELECT p.dst AS state,
             CAST(sum(CAST(r.pi * p.prob AS {_DEC18})) AS DOUBLE) AS pi
      FROM p JOIN {prev} r ON p.src = r.state GROUP BY p.dst
    )"""
        )
        prev = f"pi{k}"
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), c AS (
      SELECT event_type AS src, nxt AS dst, count(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), tot AS (
      SELECT src, sum(n) AS tn FROM c GROUP BY src
    ), p AS (
      SELECT c.src, c.dst, CAST(c.n AS DOUBLE) / tot.tn AS prob
      FROM c JOIN tot ON c.src = tot.src
    ), states AS (SELECT DISTINCT src AS state FROM p),
    ns AS (SELECT count(*) AS n FROM states),
    pi0 AS (SELECT state, 1.0 / ns.n AS pi FROM states, ns),
    {", ".join(its)}
    SELECT state AS event_type,
           CAST(floor(pi * 1000000000 + 0.5) AS BIGINT) AS pi9
    FROM {prev}
    """


@register("markov_stationary", oracle=_markov_oracle())
def markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain: the
    long-run share of time the average session spends in each event
    state — the summary behind "where does engagement settle".  The
    transition matrix comes from consecutive event pairs per user
    (tie-safe lead window); {MARKOV_ITERS} unrolled power iterations
    from the uniform vector, with each iteration's contributions
    pi·P(src→dst) quantized to DECIMAL(38,18) pre-sum (the graph_pagerank
    discipline) so the shuffle-order-dependent float sum is exact and the
    result is DuckDB-certifiable bit for bit; the final vector is
    1e9-quantized.

    Scale: the chain state space is |event types| (model-sized), so
    after ONE shuffle of the event stream (the per-user lead window)
    everything operates on the k×k transition matrix — iterations cost
    joins over ≤k² rows regardless of corpus size.  Contrast with
    graph_pagerank where the state is |nodes|: same algebra, opposite
    size regime, both exact."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("src").agg(F.sum("n").alias("tn"))
    p = (
        c.join(tot, "src")
        .select(
            "src", "dst", (F.col("n").cast("double") / F.col("tn")).alias("prob")
        )
        .localCheckpoint()
    )
    n_states = p.select("src").distinct().count()
    pi = (
        p.select("src")
        .distinct()
        .select(F.col("src").alias("state"), (F.lit(1.0) / F.lit(n_states)).alias("pi"))
    )
    for _ in range(MARKOV_ITERS):
        contrib = p.join(pi, p.src == pi.state).select(
            F.col("dst"), (F.col("pi") * F.col("prob")).cast(_DEC18).alias("c")
        )
        pi = contrib.groupBy(F.col("dst").alias("state")).agg(
            F.sum("c").cast("double").alias("pi")
        )
    return pi.select(
        F.col("state").alias("event_type"),
        F.floor(F.col("pi") * 1_000_000_000 + 0.5).cast("long").alias("pi9"),
    )
