"""Round-7 additions, batch 31 — fiscal 4-4-5 calendar, trade matrix,
first-session conversion.

Reference semantics: SURVEY §2 extension policy (mount empty).
fiscal_445_rollup maps dates onto the retail 4-4-5 calendar with pure
anchored integer arithmetic (fn_business_days' discipline — no engine
calendar function agrees on fiscal periods, so none is used);
trade_matrix is the full customer-nation × supplier-nation revenue
grid behind nation_home_bias's diagonal; first_session_conversion
splits conversion by the session where it happened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4

DEC12 = "decimal(38,12)"

#: 4-4-5 anchor: fiscal years start on this Monday and repeat 52-week
#: cycles of quarters split 4+4+5 weeks (the retail NRF calendar shape,
#: leap weeks ignored for determinism).
FISCAL_ANCHOR = "1992-01-06"  # a Monday


# ---------------------------------------------------------------------------
# fiscal_445_rollup — revenue by 4-4-5 fiscal period
# ---------------------------------------------------------------------------

def _fiscal_sql() -> str:
    return f"""
      SELECT CAST(floor(CAST(datediff('day', TIMESTAMP '{FISCAL_ANCHOR}',
                                      o_orderdate) AS DOUBLE) / 7)
                  AS BIGINT) AS wk,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '{FISCAL_ANCHOR}'
    """


@register(
    "fiscal_445_rollup",
    oracle=f"""
    WITH w AS ({_fiscal_sql()}),
    f AS (
      SELECT wk // 52 AS fy, (wk % 52) // 13 AS fq,
             CASE WHEN (wk % 13) < 4 THEN 1
                  WHEN (wk % 13) < 8 THEN 2 ELSE 3 END AS fp,
             cents
      FROM w
    )
    SELECT CAST(fy AS BIGINT) AS fiscal_year,
           CAST(fq + 1 AS BIGINT) AS fiscal_quarter,
           CAST(fp AS BIGINT) AS fiscal_period,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM f GROUP BY 1, 2, 3
    """,
)
def fiscal_445_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by retail 4-4-5 fiscal period: weeks since the anchor
    Monday fold into 52-week fiscal years, 13-week quarters, and
    4/4/5-week periods — the calendar merchandising actually reports
    on, computed with PURE anchored integer arithmetic (week = day
    diff div 7; period = position of week-in-quarter against the 4/8
    boundaries), so both engines agree without any fiscal-calendar
    builtin (none exists, and ISO-week functions disagree
    cross-engine).  One scan projection + one combinable aggregate;
    leap weeks are deliberately ignored (documented determinism
    trade-off)."""
    anchor = F.lit(FISCAL_ANCHOR).cast("timestamp")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= anchor
    )
    wk = F.floor(
        F.datediff(F.col("o_orderdate"), anchor).cast("double") / 7
    ).cast("long")
    w = o.select(
        wk.alias("wk"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias(
            "cents"
        ),
    )
    wq = F.col("wk") % 13
    f = w.select(
        F.expr("wk div 52").alias("fy"),
        F.expr("(wk % 52) div 13").alias("fq"),
        F.when(wq < 4, 1).when(wq < 8, 2).otherwise(3).alias("fp"),
        "cents",
    )
    return f.groupBy("fy", "fq", "fp").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    ).select(
        F.col("fy").cast("long").alias("fiscal_year"),
        (F.col("fq") + 1).cast("long").alias("fiscal_quarter"),
        F.col("fp").cast("long").alias("fiscal_period"),
        "n_orders",
        "revenue_cents",
    )


# ---------------------------------------------------------------------------
# trade_matrix — customer-nation × supplier-nation revenue grid
# ---------------------------------------------------------------------------

@register(
    "trade_matrix",
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
      GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(revenue) AS BIGINT) AS grand FROM flow
    )
    SELECT f.cust_nation, f.supp_nation, f.revenue,
           round(CAST(f.revenue AS DOUBLE) / t.grand, 4) AS share,
           f.cust_nation = f.supp_nation AS domestic
    FROM flow f, tot t
    """,
)
def trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full customer-nation × supplier-nation revenue matrix —
    every flow, its share of world trade, and the domestic flag
    (nation_home_bias reads only this matrix's diagonal; trade_balance
    only its row/column sums).  The fact scan joins orders on the fact
    key and takes customer/supplier/nation as BROADCAST dims, so the
    matrix costs one data-sized shuffle (the |nations|²-row groupBy
    combines map-side); the grand total re-enters as a one-row
    broadcast.  Revenue is exact int64 fixed-point."""
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
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    flow = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.sum("rev").cast("long").alias("revenue"))
    )
    # pinned: the matrix feeds the grand total AND the final projection
    # — un-pinned the fact star ran twice (plan-audit, SCALE.md §50).
    flow = pin(flow)
    tot = flow.agg(F.sum("revenue").cast("long").alias("grand"))
    return flow.crossJoin(F.broadcast(tot)).select(
        "cust_nation", "supp_nation", "revenue",
        r4(F.col("revenue").cast("double") / F.col("grand")).alias("share"),
        (F.col("cust_nation") == F.col("supp_nation")).alias("domestic"),
    )


# ---------------------------------------------------------------------------
# first_session_conversion — does the first session convert?
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


@register(
    "first_session_conversion",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_MIN} * 60 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT user_id, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_no
      FROM marked
    ), per_user AS (
      SELECT user_id,
             CAST(max(session_no) AS BIGINT) AS n_sessions,
             CAST(max(CASE WHEN event_type = 'purchase' AND session_no = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv_first,
             CAST(max(CASE WHEN event_type = 'purchase' AND session_no > 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv_later
      FROM numbered GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(conv_first) AS DOUBLE) / count(*), 4)
             AS first_session_cr,
           round(CAST(sum(CASE WHEN n_sessions > 1 THEN conv_later
                          ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN n_sessions > 1 THEN 1 ELSE 0 END),
                          0), 4) AS later_session_cr,
           round(CAST(sum(CASE WHEN n_sessions > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS multi_session_share
    FROM per_user
    """,
)
def first_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the first visit convert?  Sessionize each user's stream
    ({SESSION_GAP_MIN}-minute gaps, events_sessionize's
    gaps-and-islands kernel), then compare the purchase rate inside
    session #1 against any later session (computed only over users who
    HAVE a later session — the honest denominator) — the
    activation-vs-nurture split every growth team starts from.  Both
    windows share one user_id shuffle; the per-user reduction and the
    final one-row aggregate are combinable."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    marked = ev.withColumn(
        "is_new",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = marked.withColumn("session_no", F.sum("is_new").over(run))
    pu = numbered.groupBy("user_id").agg(
        F.max("session_no").cast("long").alias("n_sessions"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("session_no") == 1),
                1,
            ).otherwise(0)
        ).cast("long").alias("conv_first"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("session_no") > 1),
                1,
            ).otherwise(0)
        ).cast("long").alias("conv_later"),
    )
    multi = F.when(F.col("n_sessions") > 1, 1).otherwise(0)
    return pu.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        r4(
            F.sum("conv_first").cast("double") / F.count(F.lit(1))
        ).alias("first_session_cr"),
        r4(
            F.sum(F.when(F.col("n_sessions") > 1, F.col("conv_later"))
                  .otherwise(0)).cast("double")
            / F.nullif(F.sum(multi), F.lit(0))
        ).alias("later_session_cr"),
        r4(
            F.sum(multi).cast("double") / F.count(F.lit(1))
        ).alias("multi_session_share"),
    )
