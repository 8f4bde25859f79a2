"""Distributed global-order kernels (exact rank / prefix sum, no
single-partition window).

A global `Window.orderBy(...)` with no partition spec funnels the whole
input through ONE task — fine over a model-sized aggregate, a
driver-of-one-task bottleneck at 10^8+ rows (VERDICT r4 "What's wrong"
#3/#4).  The production form implemented here:

1. **Bucketize** on approx-quantile split points collected to the driver
   (n_buckets-1 doubles — model-sized) and broadcast back inside a
   literal array.  The bucket id is a *deterministic function of the
   row* (count of splits below the key), so — unlike `repartitionByRange`
   + `spark_partition_id()` — re-computing the subtree, AQE partition
   coalescing, or task retries can never disagree about which bucket a
   row is in.  Split accuracy affects only balance, never correctness:
   buckets are monotone under the key order by construction, and equal
   keys always share a bucket.
2. **Local window per bucket** (hash Exchange on `_bucket` — the only
   shuffle of the full data).
3. **Bucket offsets** from the per-bucket counts/totals via a tiny
   broadcast theta-self-join (`b._bucket < a._bucket`, n_buckets² pairs
   of an n_buckets-row aggregate) — a running sum over the bucket
   aggregate with NO single-partition Exchange anywhere in the plan
   (pinned in tests/test_plans.py).

global rank = bucket offset + local rank; global running sum = bucket
total offset + local running sum (exact: decimal addends, so any
accumulation order is bit-identical).

Cost: one extra driver-side approxQuantile action and one extra pass for
the bucket aggregate — the textbook two-pass distributed prefix sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._helpers import DEC, pin

#: Above this many input rows, operators with a global-order step switch
#: from the single-partition window (exact, cheapest at aggregate scale)
#: to the bucketed two-pass kernel.  Probed via parquet-footer row counts
#: (catalog.table_rows) — never a Spark job in the dispatch path.
GLOBAL_WINDOW_GATE = 2_000_000


def _bucketize(df: DataFrame, key: str, n_buckets: int, desc: bool) -> DataFrame:
    """Add `_bucket`: monotone-under-(key, desc) bucket id from
    approx-quantile splits.  `key` must be a numeric column."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    splits = sorted(set(df.stat.approxQuantile(key, probs, 0.001)))
    if not splits:
        return df.withColumn("_bucket", F.lit(0))
    arr = F.array(*[F.lit(float(s)) for s in splits])
    k = F.col(key).cast("double")
    if desc:
        step = lambda acc, s: acc + F.when(k < s, 1).otherwise(0)  # noqa: E731
    else:
        step = lambda acc, s: acc + F.when(k > s, 1).otherwise(0)  # noqa: E731
    return df.withColumn("_bucket", F.aggregate(arr, F.lit(0), step))


def _order(key: str, tie_cols: list[str], desc: bool) -> list[Column]:
    head = F.col(key).desc() if desc else F.col(key).asc()
    return [head] + [F.col(c) for c in tie_cols]


def _offsets(per_bucket: DataFrame, value: str, zero: Column) -> DataFrame:
    """Exclusive prefix over the tiny per-bucket aggregate, as a broadcast
    theta-self-join (no single-partition window).

    The aggregate is pinned first: the self-join consumes it TWICE and
    Catalyst has no cross-DAG CSE, so unpinned each side re-ran the
    whole upstream pipeline — the api-layer plan audit flagged
    global_rank / global_prefix_sum at 3 base-table scans per final
    plan.  Pinned (n_buckets rows, always model-sized), the input
    pipeline runs once and the final plan scans the base table once."""
    per_bucket = pin(per_bucket)
    a, b = per_bucket.alias("a"), per_bucket.alias("b")
    return (
        a.join(F.broadcast(b), F.col("b._bucket") < F.col("a._bucket"), "left")
        .groupBy(F.col("a._bucket").alias("_bucket"))
        .agg(F.coalesce(F.sum(f"b.{value}"), zero).alias("_off"))
    )


def bucketed_global_rank(
    df: DataFrame,
    key: str,
    tie_cols: list[str],
    n_buckets: int = 64,
    desc: bool = False,
    out: str = "_grank",
) -> DataFrame:
    """Exact global row_number under (key [desc], *tie_cols) without a
    single-partition window.  Returns df + `out` (long)."""
    t = _bucketize(df, key, n_buckets, desc)
    w = Window.partitionBy("_bucket").orderBy(*_order(key, tie_cols, desc))
    local = t.withColumn("_lrank", F.row_number().over(w))
    counts = t.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_cnt"))
    offs = _offsets(counts, "_cnt", F.lit(0).cast("long"))
    return (
        local.join(F.broadcast(offs), "_bucket")
        .withColumn(out, (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_bucket", "_lrank", "_off")
    )


def bucketed_prefix_sum(
    df: DataFrame,
    key: str,
    tie_cols: list[str],
    value_col: str,
    n_buckets: int = 64,
    desc: bool = False,
    out: str = "_cumsum",
) -> DataFrame:
    """Exact global running sum of `value_col` (accumulated in
    DECIMAL(38,6) — order-independent) under (key [desc], *tie_cols),
    without a single-partition window.  Returns df + `out` (decimal)."""
    t = _bucketize(df, key, n_buckets, desc)
    w = (
        Window.partitionBy("_bucket")
        .orderBy(*_order(key, tie_cols, desc))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("_lcum", F.sum(F.col(value_col).cast(DEC)).over(w))
    totals = t.groupBy("_bucket").agg(
        F.sum(F.col(value_col).cast(DEC)).alias("_tot")
    )
    offs = _offsets(totals, "_tot", F.lit(0).cast(DEC))
    return (
        local.join(F.broadcast(offs), "_bucket")
        .withColumn(out, F.col("_off") + F.col("_lcum"))
        .drop("_bucket", "_lcum", "_off")
    )


def grouped_range_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    value_col: str,
    n_buckets: int = 64,
    out: str = "_cum",
    small: bool = False,
) -> DataFrame:
    """Exact per-group RANGE-frame running sum (frame peers included) of
    `value_col` under ORDER BY `key`, for LOW-CARDINALITY group keys —
    the case where `Window.partitionBy(group)` funnels the whole input
    through |groups| tasks (the 16x probe showed the weighted-median
    RANGE shape going super-linear for exactly this reason: 3 return
    flags = 3 tasks).

    Shape: (1) pre-aggregate to distinct (group, key) — RANGE peers share
    a key, so summing them first IS the peers-included frame semantics,
    and it collapses the windowed volume from row count to distinct-key
    count with one map-side-combinable shuffle; (2) bucketize on `key`
    (splits from the aggregated frame — model-sized action); (3) local
    cumsum per (group, bucket) — key is unique per group after the
    aggregate, so ROWS == RANGE and the order is total; (4) per-(group,
    bucket) offsets via the broadcast theta-self-join (|groups| ×
    n_buckets rows — only valid while that product is model-sized, which
    is the definition of the low-cardinality case; high-cardinality
    groups don't need this kernel at all).

    Returns one row per (group, key): group_cols + key + `_v` (the
    DECIMAL(38,6) peer sum) + `out` (the inclusive running sum).

    Materialization (plan-audit, SCALE.md §50): the distinct-(group,key)
    aggregate has THREE internal consumers (the approxQuantile action,
    the local window, the bucket totals) and Catalyst recomputes the
    whole upstream pipeline per consumer — stat_levene executed 23 scans
    of its base table through this shape.  `agg` is pinned (eager
    localCheckpoint of the distinct-key-sized frame, always << input),
    so the input pipeline runs ONCE; the RESULT is pinned too because
    nearly every caller fans out over it (group totals + threshold
    probe), which would otherwise re-run the window+offset join per
    consumer.

    `small=True` (r13): the caller asserts — from a parquet-footer row
    count, never a Spark job — that the INPUT is below the global-window
    gate, so the distinct-key spine is trivially model-sized and the
    whole bucketize/offsets machinery (one approxQuantile action + two
    pins per call) costs more driver jobs than it saves.  The small path
    is the textbook per-group RANGE window over the aggregated spine:
    same decimal `_v` peer sums, same exact running sum (decimal adds
    are order-independent), ONE pinned job total.  Above the gate the
    caller must leave small=False — partitionBy(group) funnels the spine
    through |groups| tasks, which is the exact failure this kernel
    exists to avoid."""
    if small:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return pin(
            df.groupBy(*group_cols, key)
            .agg(F.sum(F.col(value_col).cast(DEC)).alias("_v"))
            .withColumn(out, F.sum("_v").over(w))
        )
    agg = pin(
        df.groupBy(*group_cols, key).agg(
            F.sum(F.col(value_col).cast(DEC)).alias("_v")
        )
    )
    t = _bucketize(agg, key, n_buckets, desc=False)
    w = (
        Window.partitionBy(*group_cols, "_bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("_lcum", F.sum("_v").over(w))
    # Pinned BEFORE the theta-self-join, matching the shared `_offsets`
    # helper's discipline: (1) the a/b sides otherwise re-derive the
    # bucketize pipeline twice (the _offsets multiscan class), and
    # (2) the unpinned self-join + groupBy subtree trips a Spark 4.1
    # binding bug when the caller's input carries a BARE alias of the
    # key column (df.select(col(v).alias(k)) — in-memory frames;
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND demanding the alias's exprId
    # from the offsets aggregate output, §54's class).  Reproduced and
    # pinned in tests/test_plans.py::test_grouped_range_prefix_sum
    # _result_pins (bare-alias variant).  The frame is |groups| ×
    # n_buckets rows — model-sized by this kernel's precondition.
    totals = pin(
        t.groupBy(*group_cols, "_bucket").agg(F.sum("_v").alias("_tot"))
    )
    a, b = totals.alias("a"), totals.alias("b")
    cond = F.col("b._bucket") < F.col("a._bucket")
    for g in group_cols:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    offs = (
        a.join(F.broadcast(b), cond, "left")
        .groupBy(
            *[F.col(f"a.{g}").alias(g) for g in group_cols],
            F.col("a._bucket").alias("_bucket"),
        )
        .agg(F.coalesce(F.sum("b._tot"), F.lit(0).cast(DEC)).alias("_off"))
    )
    # RESULT pin restored (round 9): checkpointing this join+window
    # plan used to trip a Spark 4.1 attribute-resolution bug
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on the offsets subtree,
    # SCALE.md §54 — api.mannwhitney_u's LocalRelation input reproduced
    # it).  The round-9 _offsets/totals pinning replaced the offending
    # duplicated-attribute subtree with a checkpoint scan and the repro
    # no longer fires (tests/test_plans.py::test_grouped_range_prefix
    # _sum_result_pins guards it); callers fanning out over the result
    # now reuse the distinct-key-sized frame instead of re-deriving the
    # window + broadcast join per consumer.
    return pin(
        local.join(F.broadcast(offs), [*group_cols, "_bucket"])
        .withColumn(out, F.col("_off") + F.col("_lcum"))
        .drop("_bucket", "_lcum", "_off")
    )


def grouped_bucketed_topk(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    tie_cols: list[str],
    k: int,
    n_buckets: int = 64,
    out: str = "_rank",
) -> DataFrame:
    """Exact top-k per LOW-CARDINALITY group under (key ASC, *tie_cols)
    without funneling each group through one task: bucketize on `key`
    (global approx-quantile splits — balance only), count rows per
    (group, bucket), compute each bucket's EXCLUSIVE prefix count within
    its group via the broadcast theta-self-join, and keep only rows in
    buckets whose offset < k — any later bucket starts at rank > k and
    cannot contain a winner.  The surviving rows (≈ k + one bucket width
    per group) then rank in a cheap per-group window.  Returns the top-k
    rows + `out` (1-based rank).  Correctness does not depend on split
    quality: bucket monotonicity guarantees the offset bound is exact."""
    t = _bucketize(df, key, n_buckets, desc=False)
    # pinned: the theta-self-join consumes the (|groups| x n_buckets)-row
    # aggregate twice — unpinned, each side re-scans the base table
    # (the _offsets multiscan class, caught by the api plan audit)
    counts = pin(
        t.groupBy(*group_cols, "_bucket").agg(
            F.count(F.lit(1)).alias("_cnt")
        )
    )
    a, b = counts.alias("a"), counts.alias("b")
    cond = F.col("b._bucket") < F.col("a._bucket")
    for g in group_cols:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    offs = (
        a.join(F.broadcast(b), cond, "left")
        .groupBy(
            *[F.col(f"a.{g}").alias(g) for g in group_cols],
            F.col("a._bucket").alias("_bucket"),
        )
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).cast("long").alias("_off"))
    )
    survivors = t.join(
        F.broadcast(offs.filter(F.col("_off") < k)), [*group_cols, "_bucket"]
    )
    w = Window.partitionBy(*group_cols).orderBy(*_order(key, tie_cols, False))
    return (
        survivors.withColumn(out, F.row_number().over(w))
        .filter(F.col(out) <= k)
        .drop("_bucket", "_off")
    )


def bucketed_prefix_min(
    df: DataFrame,
    key: str,
    tie_cols: list[str],
    value_col: str,
    n_buckets: int = 64,
    out: str = "_prevmin",
) -> DataFrame:
    """Exact EXCLUSIVE running min of `value_col` under the total order
    (key ASC, *tie_cols), without a single-partition window; `out` is
    NULL exactly for the globally-first row (matching
    `min(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING)`).  Same two-pass shape as the rank/sum kernels: local
    exclusive min per bucket, plus the min over all strictly-earlier
    buckets via the broadcast theta-self-join.  min is idempotent and
    associative, so bucket split placement can never change the result.
    Spark's `least` skips NULLs (returns NULL only when all inputs are),
    which is exactly the semantics the merge needs."""
    t = _bucketize(df, key, n_buckets, desc=False)
    w = (
        Window.partitionBy("_bucket")
        .orderBy(*_order(key, tie_cols, False))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn("_lmin", F.min(value_col).over(w))
    # pinned: same twice-consumed-aggregate shape as _offsets
    mins = pin(t.groupBy("_bucket").agg(F.min(value_col).alias("_bmin")))
    a, b = mins.alias("a"), mins.alias("b")
    offs = (
        a.join(F.broadcast(b), F.col("b._bucket") < F.col("a._bucket"), "left")
        .groupBy(F.col("a._bucket").alias("_bucket"))
        .agg(F.min("b._bmin").alias("_omin"))
    )
    return (
        local.join(F.broadcast(offs), "_bucket")
        .withColumn(out, F.least(F.col("_lmin"), F.col("_omin")))
        .drop("_bucket", "_lmin", "_omin")
    )


def ntile_from_rank(rank: Column, n: Column, buckets: int) -> Column:
    """SQL ntile(buckets) from an exact global rank and the total row
    count: the first (n mod buckets) tiles get ceil(n/buckets) rows, the
    rest floor(n/buckets) — integer arithmetic only, matching Spark and
    DuckDB ntile bit-for-bit."""
    q = F.floor(n / buckets)
    rem = n - q * buckets
    big = q + 1
    cut = big * rem
    in_big = F.floor((rank + big - 1) / big)
    in_small = rem + F.floor((rank - cut + q - 1) / F.greatest(q, F.lit(1)))
    return F.when(rank <= cut, in_big).otherwise(in_small).cast("int")
