"""Round-7 additions, batch 16 — EWMA crossover signals, session error
impact, bag-of-words dedup, nation home bias.

Reference semantics: SURVEY §2 extension policy (mount empty).  The
EWMA pair rides win_ewma's certified bounded-K renormalized form with
repr-literal weights (bit-identical constants both engines); every
other op is combinable aggregates over scale-safe partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import r4

# ---------------------------------------------------------------------------
# ts_ewma_cross — fast/slow EWMA crossover detection on the daily close
# ---------------------------------------------------------------------------

FAST_A, FAST_K = 0.5, 6
SLOW_A, SLOW_K = 0.2, 10


def _ewma_sql(alpha: float, k: int, col: str) -> str:
    num = " + ".join(
        f"CASE WHEN lag({col}, {i}) OVER w IS NOT NULL "
        f"THEN {alpha * (1 - alpha) ** i!r} * lag({col}, {i}) OVER w "
        f"ELSE 0 END"
        for i in range(k)
    )
    den = " + ".join(
        f"CASE WHEN lag({col}, {i}) OVER w IS NOT NULL "
        f"THEN {alpha * (1 - alpha) ** i!r} ELSE 0 END"
        for i in range(k)
    )
    return f"(({num}) / ({den}))"


@register(
    "ts_ewma_cross",
    oracle=f"""
    WITH f AS (
      SELECT event_type, date_trunc('day', ts) AS day, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), daily AS (
      SELECT event_type, day, value AS close FROM f WHERE rn = 1
    ), e AS (
      SELECT event_type, day,
             round({_ewma_sql(FAST_A, FAST_K, 'close')}, 4) AS fast,
             round({_ewma_sql(SLOW_A, SLOW_K, 'close')}, 4) AS slow
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), sig AS (
      SELECT event_type, day, fast, slow,
             CASE WHEN fast > slow THEN 1
                  WHEN fast < slow THEN -1 ELSE 0 END AS signal
      FROM e
    ), flagged AS (
      SELECT event_type, day, fast, slow, signal,
             lag(signal) OVER (PARTITION BY event_type ORDER BY day)
               AS prev_signal
      FROM sig
    )
    SELECT event_type, day, fast, slow,
           CAST(prev_signal AS INT) AS prev_signal,
           CAST(signal AS INT) AS signal
    FROM flagged
    WHERE prev_signal IS NOT NULL AND signal <> prev_signal
    """,
)
def ts_ewma_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow EWMA crossover events on the per-type daily close (the
    golden-cross/death-cross screen): emit the days where the rounded
    fast ({FAST_A}, K={FAST_K}) and slow ({SLOW_A}, K={SLOW_K}) EWMAs
    change relative order.  Both EWMAs use win_ewma's certified
    bounded-K renormalized form — all lags share one window spec, so
    Catalyst plans ONE Window node per series — with repr-literal
    weights (bit-identical constants cross-engine).  Signals compare
    the ALREADY-ROUNDED averages, so the sign can never straddle
    engines; windows run over the calendar-bounded daily series."""
    ev = table(spark, sf_dir, "events")
    wf = Window.partitionBy(
        "event_type", F.date_trunc("day", F.col("ts"))
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    daily = (
        ev.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("value").alias("close"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")

    def ewma(alpha: float, k: int):
        num = sum(
            (
                F.when(
                    F.lag("close", i).over(w).isNotNull(),
                    F.lit(alpha * (1 - alpha) ** i)
                    * F.lag("close", i).over(w),
                ).otherwise(F.lit(0.0))
                for i in range(k)
            ),
            start=F.lit(0.0),
        )
        den = sum(
            (
                F.when(
                    F.lag("close", i).over(w).isNotNull(),
                    F.lit(alpha * (1 - alpha) ** i),
                ).otherwise(F.lit(0.0))
                for i in range(k)
            ),
            start=F.lit(0.0),
        )
        return F.round(num / den, 4)

    e = daily.select(
        "event_type",
        "day",
        ewma(FAST_A, FAST_K).alias("fast"),
        ewma(SLOW_A, SLOW_K).alias("slow"),
    )
    signal = (
        F.when(F.col("fast") > F.col("slow"), 1)
        .when(F.col("fast") < F.col("slow"), -1)
        .otherwise(0)
    )
    sig = e.withColumn("signal", signal)
    flagged = sig.withColumn("prev_signal", F.lag("signal").over(w))
    return flagged.filter(
        F.col("prev_signal").isNotNull()
        & (F.col("signal") != F.col("prev_signal"))
    ).select(
        "event_type",
        "day",
        "fast",
        "slow",
        F.col("prev_signal").cast("int").alias("prev_signal"),
        F.col("signal").cast("int").alias("signal"),
    )


# ---------------------------------------------------------------------------
# session_error_impact — conversion with vs without an error in session
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "session_error_impact",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      FROM events
    ), g AS (
      SELECT user_id, event_type, us, event_id,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id)
                       > {SESSION_GAP_US}
                   OR lag(us) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ), s AS (
      SELECT user_id, event_type,
             CAST(sum(new_s) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id)
                  AS BIGINT) AS sid
      FROM g
    ), per AS (
      SELECT user_id, sid,
             max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS has_error,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM s GROUP BY user_id, sid
    )
    SELECT CAST(has_error AS INT) AS has_error,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(CAST(sum(converted) AS DOUBLE) / count(*), 4)
             AS conv_rate
    FROM per GROUP BY has_error
    """,
)
def session_error_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does an error in the session kill the purchase?  30-minute
    gap-sessionization per user (the package's shared convention), one
    per-session combinable aggregate (any error / any purchase), then
    the 2-row conversion comparison — the reliability-vs-revenue
    argument in one query.  One user_id shuffle carries the lag, the
    session cumsum, and the session aggregate (same partitioning);
    conversion rates divide exact counts."""
    ev = table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    wl = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(wl)
    new_s = F.when(
        prev.isNull() | ((F.col("us") - prev) > SESSION_GAP_US), 1
    ).otherwise(0)
    g = ev.withColumn("new_s", new_s)
    sid = F.sum("new_s").over(
        wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = g.withColumn("sid", sid.cast("long"))
    per = s.groupBy("user_id", "sid").agg(
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("has_error"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return per.groupBy(
        F.col("has_error").cast("int").alias("has_error")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        r4(
            F.sum("converted").cast("double") / F.count(F.lit(1))
        ).alias("conv_rate"),
    )


# ---------------------------------------------------------------------------
# dedup_bag_exact — word-order-insensitive exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_bag_exact",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             md5(array_to_string(
                   list_sort(list_distinct(string_split(lower(text), ' '))),
                   ' ')) AS bag_sig
      FROM documents
    )
    SELECT bag_sig,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keeper
    FROM sig GROUP BY bag_sig HAVING count(*) >= 2
    """,
)
def dedup_bag_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-SET exact dedup: documents built from the identical
    vocabulary set (sorted distinct tokens, md5'd) are exactly the
    Jaccard = 1.0 pairs — the template/shuffle-spam detector between
    dedup_exact (raw bytes) and dedup_near (thresholded Jaccard):
    reordering or repeating words defeats the former and this catches
    it exactly where the MinHash path only estimates.  Same 100-TB
    shape as dedup_exact: the signature fuses into the scan
    (array_distinct + sort_array + md5 in whole-stage codegen),
    groupBy(sig) hash-partitions each cluster to one task, keeper =
    min(doc_id) is deterministic."""
    d = table(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.sort_array(
                    F.array_distinct(F.split(F.lower(F.col("text")), " "))
                ),
                " ",
            )
        ).alias("bag_sig"),
    )
    return (
        sig.groupBy("bag_sig")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# nation_home_bias — same-nation supplier revenue share per customer nation
# ---------------------------------------------------------------------------

@register(
    "nation_home_bias",
    oracle="""
    WITH f AS (
      SELECT c.c_nationkey AS nation,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount))
                  AS BIGINT) AS rev,
             CASE WHEN s.s_nationkey = c.c_nationkey THEN 1 ELSE 0 END
               AS home
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(rev) AS BIGINT) AS total_rev,
           CAST(sum(home * rev) AS BIGINT) AS home_rev,
           round(CAST(sum(home * rev) AS DOUBLE) / sum(rev), 4)
             AS home_share
    FROM f GROUP BY nation
    """,
)
def nation_home_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Home bias per customer nation: the share of purchased revenue
    sourced from SAME-nation suppliers — trade_balance's flow matrix
    reduced to the gravity-model diagnostic (a nation at 1/|nations|
    buys uniformly; near 1.0 it buys local).  One orderkey-co-partitioned
    fact join plus two broadcast dims, then a single combinable
    whole-dollar integer aggregate per nation; the share divides exact
    integers."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).cast("long").alias("rev"),
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nation")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("s_nation")
    )
    f = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            "nation",
            "rev",
            F.when(F.col("s_nation") == F.col("nation"), 1)
            .otherwise(0)
            .alias("home"),
        )
    )
    return f.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev").cast("long").alias("total_rev"),
        F.sum(F.col("home") * F.col("rev")).cast("long").alias("home_rev"),
        r4(
            F.sum(F.col("home") * F.col("rev")).cast("double")
            / F.sum("rev")
        ).alias("home_share"),
    )
