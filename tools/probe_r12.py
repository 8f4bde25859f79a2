"""Round-12 scale probes (SCALE.md §79):

1. r11 judge directive #5 — mix_token_budget and corpus_token_source_mi
   at 16x (vocabulary AND source count both grow 16x: disjoint suffixed
   vocab, suffixed sources).
2. r11 judge directive #2 "done" evidence — graph_bfs_layers 16x
   re-probe over the shared cosupply_edges kernel: the edge build is
   timed separately (cold) and the BFS re-timed over the memoized edges
   (warm) so the pair-gen vs BFS-rounds split is explicit.
3. 4x/16x probes for every round-12 kernel (§2.BC).

Honest axes as in §77: disjoint vocab + suffixed sources for text
kernels, shifted supplier/order keys for the graph (disjoint co-supply
components), type-suffixed events for the series kernels, shifted
custkeys for the warehouse pair.  One warm-up run per kernel before
timing.

Run: python tools/probe_r12.py [--mult 4 16]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from secdb_spark.catalog import table  # noqa: E402
from secdb_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
KEY = 10_000_000


def synth(spark, out_dir: str, mult: int, tables: set[str]) -> None:
    if "documents" in tables:
        d = table(spark, SF_DIR, "documents")
        parts = []
        for k in range(mult):
            suffixed = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(f"x{k}")),
                ),
                " ",
            )
            parts.append(
                d.withColumn("doc_id", F.col("doc_id") + F.lit(k * KEY))
                .withColumn("source", F.concat_ws("_", "source", F.lit(str(k))))
                .withColumn("text", suffixed)
                .withColumn("n_chars", F.length(suffixed).cast("long"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(8).write.mode("overwrite").parquet(
            f"{out_dir}/documents.parquet"
        )
    if "lineitem" in tables:
        li = table(spark, SF_DIR, "lineitem")
        parts = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * KEY))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * 100_000))
            for k in range(mult)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(16).write.mode("overwrite").parquet(
            f"{out_dir}/lineitem.parquet"
        )
    if "events" in tables:
        # catalog reads ts as INT64 with a footer-probed unit — Spark's
        # default INT96 timestamp output would be unreadable there
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        ev = table(spark, SF_DIR, "events")
        parts = [
            ev.withColumn("event_id", F.col("event_id") + F.lit(k * KEY))
            .withColumn("user_id", F.col("user_id") + F.lit(k * 100_000))
            .withColumn(
                "event_type", F.concat_ws("_", "event_type", F.lit(str(k)))
            )
            for k in range(mult)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(8).write.mode("overwrite").parquet(
            f"{out_dir}/events.parquet"
        )
    if "customer" in tables:
        c = table(spark, SF_DIR, "customer")
        o = table(spark, SF_DIR, "orders")
        cparts = [
            c.withColumn("c_custkey", F.col("c_custkey") + F.lit(k * KEY))
            for k in range(mult)
        ]
        oparts = [
            o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * KEY))
            .withColumn("o_custkey", F.col("o_custkey") + F.lit(k * KEY))
            for k in range(mult)
        ]
        cn, on = cparts[0], oparts[0]
        for p in cparts[1:]:
            cn = cn.unionByName(p)
        for p in oparts[1:]:
            on = on.unionByName(p)
        cn.repartition(4).write.mode("overwrite").parquet(
            f"{out_dir}/customer.parquet"
        )
        on.repartition(8).write.mode("overwrite").parquet(
            f"{out_dir}/orders.parquet"
        )


def run_timed(q, spark, sf_dir, warm: bool = True) -> tuple[float, int]:
    if warm:
        q(spark, sf_dir).count()
    t0 = time.time()
    n = q(spark, sf_dir).count()
    return time.time() - t0, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, nargs="*", default=[4, 16])
    args = ap.parse_args()

    spark = get_spark("probe_r12", shuffle_partitions=32)
    from secdb_spark.registry import all_queries

    q = all_queries()

    text_ops = ["mix_token_budget", "corpus_token_source_mi",
                "doc_script_mix", "mix_kl_reweight",
                "corpus_dup_ngram_share", "text_chunk_sliding"]
    graph_ops = ["graph_cosupply_edges", "graph_bfs_layers",
                 "graph_connected_components", "graph_triangle_count",
                 "graph_closeness_seeds"]
    event_ops = ["stat_jarque_bera", "ts_adf_stat", "stat_bartlett"]
    wh_ops = ["scd2_apply_changes", "dedup_url_canonical"]

    base: dict[str, tuple[float, int]] = {}
    for name in text_ops + event_ops + wh_ops + graph_ops:
        base[name] = run_timed(q[name], spark, SF_DIR)
        print(f"1x   {name:28s} {base[name][0]:6.2f} s  "
              f"{base[name][1]} rows", flush=True)

    for mult in args.mult:
        out = tempfile.mkdtemp(prefix=f"probe_r12_{mult}x_")
        need = {"documents", "events", "customer"}
        if mult >= 16:
            need.add("lineitem")
        synth(spark, out, mult, need)
        # missing tables fall back to 1x copies via symlink-free read of
        # the base dir: probe ops only read the synthesized tables.
        import shutil

        for t in ("lineitem", "orders", "customer", "events", "documents",
                  "supplier", "part", "nation", "region", "embeddings"):
            import os

            if not os.path.exists(f"{out}/{t}.parquet"):
                src = f"{SF_DIR}/{t}.parquet"
                os.symlink(src, f"{out}/{t}.parquet")

        ops = list(text_ops + event_ops + wh_ops)
        if mult >= 16:
            ops += graph_ops
        for name in ops:
            if name == "graph_bfs_layers":
                # split the kernel: cold edge build vs memo-warm BFS
                from secdb_spark.operators.warehouse_extras37 import (
                    _COSUPPLY_MEMO,
                )

                _COSUPPLY_MEMO.clear()
                t0 = time.time()
                q["graph_cosupply_edges"](spark, out).count()
                t_edges = time.time() - t0
                t0 = time.time()
                n = q[name](spark, out).count()
                t_bfs = time.time() - t0
                print(f"{mult}x  {name:28s} edges={t_edges:6.2f} s  "
                      f"bfs-rounds={t_bfs:6.2f} s  {n} rows", flush=True)
                continue
            t, n = run_timed(q[name], spark, out)
            r = t / base[name][0] if base[name][0] else float("nan")
            print(f"{mult}x  {name:28s} {t:6.2f} s  ({r:4.1f}x wall)  "
                  f"{n} rows", flush=True)
        shutil.rmtree(out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
