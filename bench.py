"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set mirrors BASELINE.md's six query families so the driver's
BENCH_r{N}.json is directly comparable to the baseline numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline bench queries -> registry op-ids (BASELINE.md families).
HEADLINE = {
    "q_agg_pricing": "agg_group",
    "q_join_star": "join_inner",
    "q_window_topk": "win_topk_group",
    "q_lag_asof": "win_lag_lead",
    "q_session": "stream_session",
    "q_cosine_topk": "sim_cosine_topk",
    # differentiating layer (added r2): dedup + TPC-H heavy agg
    "q_dedup_exact": "dedup_exact",
    "q_dedup_near": "dedup_near",
    "q_tpch_q18": "sql_tpch_q18",
    # time-series analytics (added r3): batch sessionize, ordered funnel,
    # continuous-aggregate rollup
    "q_sessionize": "events_sessionize",
    "q_funnel": "funnel_events",
    "q_rollup": "rollup_timeseries",
}


def _settle_host() -> dict:
    """Bounded wait-for-idle before measuring (BASELINE.md 'Bench record
    protocol').

    Rounds 8-9 showed the official bench being captured while the host was
    still draining the per-round operator dryrun: the two cheapest scan+agg
    families inflated up to ~1.6x (r9 q_agg_pricing 2.03x baseline under
    load ~5.6, 1.19x idle on identical code — adjudicated as contamination
    by the r9 judge).  The protocol's fix is a cool-down; this enforces it
    in-process so any caller of bench.py gets the documented steady-state
    regime: poll /proc/loadavg until the 1-min average drops below
    SPARK_GRAFT_BENCH_MAX_LOAD (default 3.0 on this 32-vCPU host, above
    the ~2.4 idle floor and well below the ~5.6 contamination reading) or
    SPARK_GRAFT_BENCH_SETTLE_S (default 300) elapses.  The settle context
    is reported in the output JSON so a reading taken under residual load
    is visibly stamped rather than silently inflated.
    """
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "3.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE_S", "300"))
    t0 = time.time()
    load = None
    while True:
        try:
            with open("/proc/loadavg") as fh:
                load = float(fh.read().split()[0])
        except (OSError, ValueError):
            break  # non-Linux / unreadable: measure immediately
        if load <= max_load or time.time() - t0 >= max_wait:
            break
        time.sleep(5)
    return {
        "loadavg_1m_at_start": load,
        "settle_wait_sec": round(time.time() - t0, 1),
        "settle_threshold": max_load,
    }


def main() -> None:
    from secdb_spark.registry import all_queries
    from secdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    settle = _settle_host()
    spark = get_spark("bench")
    queries = all_queries()

    # Global JVM warm-up: the first ~2s of jobs after session start run at
    # interpreter/C1 speed (JIT ramp), which taxed whichever family ran
    # FIRST — q_agg_pricing read 0.84s in round 3's driver run vs 0.42s
    # steady-state on the same data.  Burn the ramp on an untimed
    # scan+agg+shuffle mix so per-family medians measure the query, not
    # JIT state.  BASELINE.md's methodology already excludes session
    # startup; this extends that exclusion to code-gen/JIT ramp equally
    # for every family.
    first = next(iter(HEADLINE.values()))
    if first in queries:
        for _ in range(3):
            queries[first](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

    results: dict[str, float] = {}
    for label, op in HEADLINE.items():
        if op not in queries:
            continue
        fn = queries[op]

        def run() -> None:
            # noop sink: full computation + materialization of every output
            # column, no driver collect and no skipped projections (count()
            # would let Catalyst prune the outputs)
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

        t0 = time.time()
        run()  # warm-up (JVM, code-gen, file listing)
        warm = time.time() - t0
        # heavy queries (q_dedup_near emits ~1M verified pairs at sf0.1):
        # median of 3 keeps total bench wall-clock bounded
        n_runs = 3 if warm > 5.0 else 5
        times = []
        for _ in range(n_runs):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        results[label] = round(sorted(times)[n_runs // 2], 4)

    total = round(sum(results.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_median",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "settle": settle,
                # Scaling-contract evidence (r13 judge directive #2): the
                # driver re-runs this bench at a lower $SPARK_GRAFT_CPUS to
                # measure scaling, and an ~1 ratio on overhead-bound sf0.1
                # queries is indistinguishable from "env var ignored" unless
                # the EFFECTIVE parallelism is printed.  defaultParallelism
                # reflects the live master (local[N]); sf_dir is the resolved
                # input directory.  Additive keys only — the one-line JSON
                # contract and every existing key are unchanged.
                "cpus": spark.sparkContext.defaultParallelism,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
