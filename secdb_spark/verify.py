"""Differential verification as a first-class API (SURVEY §5.2.3).

The repo's correctness doctrine is evaluate-don't-trust: every exact-class
operator ships with a DuckDB-runnable reference SQL, and the driver gates
on an order-insensitive value comparison between the two engines.  This
module is the ONE implementation of that comparison — `tools/selfcheck.py`
(the dev harness), `Engine.verify()` (the user gesture) and tests all
share it, so the check a user runs is bit-for-bit the check the repo was
certified against.

Canonicalization rules (must match the driver's):
- floats by `repr` (shortest round-trip — both engines hand back IEEE
  doubles, which the operators already make bit-identical via the
  dsum/he4 discipline), NaN and NULL as distinct sentinels;
- Decimals normalized; dates/timestamps ISO-formatted; bytes hex;
- containers recursively, dict keys sorted;
- rows sorted after column-name sort — result ORDER is never part of an
  operator's contract (the driver sorts too).

Scale note: verification materializes both results with toPandas(), so it
is a CORRECTNESS gate for model-sized outputs (every registered operator
returns an aggregate, not a fact table) — not a data-movement path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal


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
    """Order-insensitive canonical form of a pandas frame."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


@dataclass(frozen=True)
class VerifyResult:
    """Outcome of one operator-vs-oracle differential."""

    name: str
    status: str  # "OK" | "FAIL" | "ROWS_ONLY"
    spark_rows: int
    oracle_rows: int | None
    detail: str

    @property
    def ok(self) -> bool:
        return self.status in ("OK", "ROWS_ONLY")


def compare_frames(name: str, spdf, opdf) -> VerifyResult:
    """Diff two pandas frames the way the driver does: column names,
    row count, then order-insensitive canonical values."""
    if sorted(spdf.columns) != sorted(opdf.columns):
        return VerifyResult(
            name, "FAIL", len(spdf), len(opdf),
            f"columns differ: spark={sorted(spdf.columns)} "
            f"oracle={sorted(opdf.columns)}",
        )
    if len(spdf) != len(opdf):
        return VerifyResult(
            name, "FAIL", len(spdf), len(opdf),
            f"rowcount spark={len(spdf)} oracle={len(opdf)}",
        )
    srows, orows = canon_rows(spdf), canon_rows(opdf)
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        return VerifyResult(
            name, "FAIL", len(spdf), len(opdf),
            f"values differ; first diffs: {diffs}",
        )
    return VerifyResult(name, "OK", len(spdf), len(opdf), f"{len(spdf)} rows")


def duckdb_connect(sf_dir: str):
    """DuckDB connection with the catalog tables as views (the driver's
    oracle-side setup)."""
    import duckdb

    from .catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def verify_op(name: str, spark, sf_dir: str, con=None) -> VerifyResult:
    """Run one registered operator AND its reference SQL, diff results.

    R/D-class operators (no oracle) report ROWS_ONLY with the row count —
    the same weaker signal the driver records for them."""
    from .registry import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    if name not in queries:
        raise KeyError(f"unknown operator {name!r}")
    spdf = queries[name](spark, sf_dir).toPandas()
    if name not in oracles:
        return VerifyResult(
            name, "ROWS_ONLY", len(spdf), None,
            f"{len(spdf)} rows (no oracle — R/D class)",
        )
    own_con = con is None
    if own_con:
        con = duckdb_connect(sf_dir)
    try:
        opdf = con.execute(oracles[name]).fetchdf()
    finally:
        if own_con:
            con.close()
    return compare_frames(name, spdf, opdf)
