"""Table catalog: explicit-schema loaders for the 10 testdata tables.

Design principles (SURVEY §1):
- Fixed, explicit schemas — the reference's model is SQLite DDL (declared
  types), so nothing here relies on schema inference.
- `events.ts` is INT64 timestamp in the parquet footer whose unit has
  varied across driver data generations (NANOS in rounds 1-2, MICROS from
  round 3).  The unit is probed from the footer once per sf_dir
  (`events_ts_unit`) and the exact integer conversion to µs follows it;
  DuckDB's native read truncates to µs identically.
- Loaders take `sf_dir` so every query is scale-invariant: the same code
  runs sf0.001 locally, sf0.01 in verify, sf0.1 in bench, and a 100 TB
  partitioned layout in production (directory of many files instead of one).

Scale note: at 100 TB these reads become partitioned-directory scans; the
explicit schema also skips footer-sampling job startup cost across 10^5+
files. Column pruning + predicate pushdown happen in each query, not here —
loaders return the full-width DataFrame lazily and Catalyst prunes at plan
time (verified: .explain shows ReadSchema with only referenced columns).
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Ground-truth schemas read from the parquet files (FIXTURES.md).
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    # events.ts declared long (raw nanos) — converted in load().
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=None)
def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata — a driver-side footer
    read, NOT a Spark job.  Used by size-gated kernel dispatch (broadcast
    vs bucketed ANN kernels): a dispatch gate needs the table's cardinality
    before the plan is built, and running `df.count()` there puts a full
    Spark job on the hot path of every invocation (the round-2 bench
    regression).  Works for a single file or a directory of part files; at
    warehouse scale this is the same information the catalog's table
    statistics serve.  Both kernels behind every gate are exact, so a
    stale count could only ever change speed, never answers."""
    import pyarrow.parquet as pq

    p = Path(sf_dir) / f"{name}.parquet"
    if p.is_dir():
        return sum(
            pq.ParquetFile(f).metadata.num_rows for f in sorted(p.rglob("*.parquet"))
        )
    return pq.ParquetFile(p).metadata.num_rows


@lru_cache(maxsize=None)
def table_split_units(sf_dir: str, name: str) -> int:
    """Total parquet row groups across the table's files — the hard upper
    bound on scan-stage parallelism (a row group is read by exactly one
    task, so a single-row-group file caps the whole map side at ONE core
    no matter how it is split).  Driver-side footer read, cached like
    table_rows; used by the scan-spread gates (r13): when this is far
    below the session's core count AND the table is small, compute-heavy
    per-row pipelines insert one cheap repartition so tokenize/hash work
    parallelizes — at warehouse scale the table has many row groups and
    the gate never fires."""
    import pyarrow.parquet as pq

    p = Path(sf_dir) / f"{name}.parquet"
    if p.is_dir():
        return sum(
            pq.ParquetFile(f).metadata.num_row_groups
            for f in sorted(p.rglob("*.parquet"))
        )
    return pq.ParquetFile(p).metadata.num_row_groups


@lru_cache(maxsize=None)
def events_ts_unit(sf_dir: str) -> str:
    """Time unit of events.ts as written in the parquet footer: 'ns', 'us'
    or 'ms'.  Probed ONCE per sf_dir from footer metadata (driver-side file
    read, not a Spark job) because the driver's data generator has emitted
    both TIMESTAMP(NANOS) (rounds 1-2) and TIMESTAMP(MICROS) (round 3+)
    footers for the same logical column — a hard-coded unit silently shifts
    every event timestamp 1000x (the round-3 stream_* / win_lag_lead
    mismatches).  Plain INT64 with no timestamp logical type falls back to
    'ns' (the survey-time encoding)."""
    import pyarrow.parquet as pq

    p = Path(sf_dir) / "events.parquet"
    f = sorted(p.rglob("*.parquet"))[0] if p.is_dir() else p
    schema = pq.ParquetFile(f).schema
    lt = str(schema.column(schema.names.index("ts")).logical_type)
    for token, unit in (
        ("timeUnit=nanoseconds", "ns"),
        ("timeUnit=microseconds", "us"),
        ("timeUnit=milliseconds", "ms"),
    ):
        if token in lt:
            return unit
    return "ns"


def events_ts_to_us(sf_dir: str, col: str = "ts"):
    """Column expr converting the raw int64 ts of `sf_dir` to a µs
    timestamp.  Exact integer arithmetic (`div` / `*`) — double division
    would lose ulps at 1.7e18 ns magnitudes.  DuckDB's native parquet read
    truncates ns->us identically, so both engines see the same µs value."""
    unit = events_ts_unit(sf_dir)
    if unit == "ns":
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    if unit == "ms":
        return F.timestamp_micros(F.expr(f"{col} * 1000"))
    return F.timestamp_micros(F.col(col))


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with its declared schema; normalizes events.ts to µs."""
    apply_runtime_confs(spark)
    df = spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", events_ts_to_us(sf_dir))
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All 10 tables as a dict of DataFrames."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql queries."""
    for name, df in load(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
