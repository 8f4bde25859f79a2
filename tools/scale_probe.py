"""Scale probe: measure how the headline plans scale with input size.

Synthesizes 4x the sf0.1 fact tables (key-offset unions -> distinct rows)
into /tmp using the engine's own partitioned multi-file layout, then times
the flagship query shapes at 1x and 4x. Near-linear growth (ratio ~4 for
scan-bound, ~4·log for sort-bound) is the evidence that the plans have no
super-linear term (the thing that kills you at 100 TB).

Run: python tools/scale_probe.py   (prints a markdown table)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F  # noqa: E402

from secdb_spark import layout  # noqa: E402
from secdb_spark.catalog import table  # noqa: E402
from secdb_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULT = 4


def synthesize(spark, out_dir: str) -> None:
    """4x lineitem/orders/events with shifted keys (distinct key spaces)."""
    li = table(spark, SF_DIR, "lineitem")
    o = table(spark, SF_DIR, "orders")
    ev = table(spark, SF_DIR, "events")
    KEY = 10_000_000
    li_n = None
    o_n = None
    ev_n = None
    for k in range(MULT):
        li_k = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * KEY))
        o_k = o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * KEY)).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(k * KEY)
        )
        ev_k = ev.withColumn("event_id", F.col("event_id") + F.lit(k * KEY)).withColumn(
            "user_id", F.col("user_id") + F.lit(k * 100_000)
        )
        li_n = li_k if li_n is None else li_n.unionByName(li_k)
        o_n = o_k if o_n is None else o_n.unionByName(o_k)
        ev_n = ev_k if ev_n is None else ev_n.unionByName(ev_k)
    layout.write_partitioned(li_n, f"{out_dir}/lineitem", "l_returnflag", 4 * 1024 * 1024)
    o_n.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/orders")
    ev_n.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/events")


def q_agg(li):
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")),
            F.sum(F.floor(disc * 10000 + 0.5).cast("bigint")),
            F.count(F.lit(1)),
        )
    )


def q_join(li, o):
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)), F.sum(F.floor(F.col("l_quantity")).cast("bigint")))
    )


def q_window(ev):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("event_id", F.lag("ts", 1).over(w).alias("prev"))


def q_sessionize(ev):
    """events_sessionize's algebra (one Exchange: lag + running sum + agg)."""
    ev = ev.withColumn("us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("us") - F.lag("us").over(w)
    flagged = ev.withColumn(
        "ns", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    )
    return (
        flagged.withColumn("sid", F.sum("ns").over(run))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s"))
    )


def q_funnel(ev):
    """funnel_events' algebra (stage-seen flags, one event shuffle)."""
    before = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    s1 = ev.withColumn("sv", F.max(is_view).over(before))
    s2 = s1.withColumn(
        "cav",
        F.when((F.col("event_type") == "click") & (F.col("sv") == 1), 1).otherwise(0),
    ).withColumn("sca", F.max("cav").over(before))
    return s2.groupBy("user_id").agg(
        F.max(is_view).alias("f1"),
        F.max("cav").alias("f2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("sca") == 1), 1
            ).otherwise(0)
        ).alias("f3"),
    )


def q_rollup(ev):
    """rollup_timeseries' algebra (hourly once, daily from partials)."""
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("b")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    daily = hourly.groupBy("event_type", F.date_trunc("day", "b").alias("b")).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    return hourly.select(F.lit("h").alias("r"), "event_type", "b", "n", "s").unionByName(
        daily.select(F.lit("d").alias("r"), "event_type", "b", "n", "s")
    )


def timed(df) -> float:
    df.write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(3):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.time() - t0)
    return sorted(ts)[1]


def main() -> None:
    spark = get_spark("scale-probe")
    out = tempfile.mkdtemp(prefix="secdb_scale_")
    print(f"synthesizing {MULT}x into {out} ...", file=sys.stderr)
    synthesize(spark, out)

    li1, o1, ev1 = (table(spark, SF_DIR, t) for t in ("lineitem", "orders", "events"))
    li4 = spark.read.parquet(f"{out}/lineitem")
    o4 = spark.read.parquet(f"{out}/orders")
    ev4 = spark.read.parquet(f"{out}/events").withColumn(
        "ts", F.col("ts")
    )

    rows = []
    for name, d1, d4 in [
        ("agg (Q1 shape)", q_agg(li1), q_agg(li4)),
        ("fact-fact join+agg", q_join(li1, o1), q_join(li4, o4)),
        ("window lag/user", q_window(ev1), q_window(ev4)),
        ("sessionize", q_sessionize(ev1), q_sessionize(ev4)),
        ("funnel (ordered stages)", q_funnel(ev1), q_funnel(ev4)),
        ("rollup hour->day", q_rollup(ev1), q_rollup(ev4)),
    ]:
        t1, t4 = timed(d1), timed(d4)
        rows.append((name, t1, t4, t4 / t1))

    print(f"| query shape | 1x (sf0.1) | {MULT}x | ratio (linear={MULT}.0) |")
    print("| --- | --- | --- | --- |")
    for name, t1, t4, r in rows:
        print(f"| {name} | {t1*1000:.0f} ms | {t4*1000:.0f} ms | {r:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
