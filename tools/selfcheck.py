"""Dev self-check harness (SURVEY §5.2.3) — runs every registered
(query, oracle) pair and diffs results the same way the driver does:
row count + column names + order-insensitive canonical value comparison.

Usage:
    python tools/selfcheck.py [--sf /root/testdata/sf0.001] [op ...]

Exit code 0 iff every checked pair matches.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")


def canon_cell(v) -> str:
    """Canonical string for a cell value, tolerant of container types."""
    import numpy as np

    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if isinstance(v, (np.floating,)):
        return canon_cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    # pandas NaT / NA
    try:
        import pandas as pd

        if v is pd.NaT or v is pd.NA:
            return "<null>"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
    except Exception:
        pass
    return str(v)


def canon_rows(pdf) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def run_one(name, spark, con, sf_dir, queries, oracles, verbose=False):
    t0 = time.time()
    sdf = queries[name](spark, sf_dir)
    spdf = sdf.toPandas()
    t_spark = time.time() - t0
    if name not in oracles:
        return ("ROWS_ONLY", len(spdf), t_spark, f"{len(spdf)} rows (no oracle)")
    t0 = time.time()
    opdf = con.execute(oracles[name]).fetchdf()
    t_duck = time.time() - t0
    if sorted(spdf.columns) != sorted(opdf.columns):
        return (
            "FAIL",
            len(spdf),
            t_spark,
            f"columns differ: spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}",
        )
    if len(spdf) != len(opdf):
        return ("FAIL", len(spdf), t_spark, f"rowcount spark={len(spdf)} oracle={len(opdf)}")
    srows, orows = canon_rows(spdf), canon_rows(opdf)
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        return ("FAIL", len(spdf), t_spark, f"values differ; first diffs: {diffs}")
    return ("OK", len(spdf), t_spark, f"{len(spdf)} rows  spark={t_spark:.2f}s duck={t_duck:.2f}s")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("ops", nargs="*")
    args = ap.parse_args()

    import duckdb

    from secdb_spark.registry import all_oracles, all_queries
    from secdb_spark.session import get_spark

    queries, oracles = all_queries(), all_oracles()
    names = args.ops or sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown ops: {unknown}")
        return 2

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    n_fail = 0
    for name in names:
        try:
            status, nrows, t_s, msg = run_one(name, spark, con, args.sf, queries, oracles)
        except Exception as e:  # noqa: BLE001
            status, msg = "ERROR", f"{type(e).__name__}: {str(e)[:400]}"
            n_fail += 1
        if status == "FAIL":
            n_fail += 1
        print(f"{status:>9}  {name:<24} {msg}")
    print(f"\n{len(names) - n_fail}/{len(names)} ok")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
