"""Standalone per-op A/B timer: build (plan construction + eager pins)
and exec (noop sink) split, N warm repetitions after one discarded
warm-up, one op per line.  The round-14 measurement harness — sweep
rankings lie under contention (r13 memory note), so every optimization
decision this round is made from THIS tool's numbers on an idle host.

Usage: python tools/op_ab.py [--sf DIR] [--n N] op [op ...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("ops", nargs="+")
    args = ap.parse_args()

    from secdb_spark.registry import all_queries
    from secdb_spark.session import get_spark

    spark = get_spark("op-ab")
    queries = all_queries()
    # JVM/codegen warm-up outside any measurement (bench.py's policy)
    queries["agg_group"](spark, args.sf).write.mode("overwrite").format(
        "noop"
    ).save()

    for op in args.ops:
        fn = queries[op]
        spark.sparkContext.setJobDescription(f"op_ab: {op}")
        best = None
        for i in range(args.n + 1):
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            if i == 0:
                continue  # discard cold run (file listing, codegen)
            cur = (t1 - t0, t2 - t1)
            if best is None or sum(cur) < sum(best):
                best = cur
        print(
            f"{op:36s} build {best[0]:7.2f}  exec {best[1]:7.2f}  "
            f"total {sum(best):7.2f}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
