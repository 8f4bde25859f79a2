"""Operator registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as:
    name -> spark_fn(spark, sf_dir) -> DataFrame      (the implementation)
    name -> oracle SQL string (DuckDB-runnable)       (the correctness oracle)

Ops without an exact SQL oracle (R/D classes: randomized, approximate,
streaming) register with oracle=None and get the driver's rows-only check.

Cross-engine determinism conventions (SURVEY §4.4) every registered pair
must follow:
  1. every double aggregate/derived value wrapped in round(x, 4) BOTH sides
  2. events.ts is µs-truncated both sides (catalog.py / DuckDB native read)
  3. window ORDER BY is tie-safe (append a unique key)
  4. no bare LIMIT — only ORDER-BY-complete top-k
  5. collect_list/set wrapped in sort_array; oracle uses list(x ORDER BY x)
  6. integer SUMs cast to BIGINT both sides (DuckDB sum(int) is HUGEINT)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (query, oracle) pair under an op-id."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _QUERIES:
            raise ValueError(f"duplicate op-id: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    _load_operators()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_operators()
    return dict(_ORACLES)


_loaded = False


def _load_operators() -> None:
    global _loaded
    if _loaded:
        return
    # Import for side effect: each module registers its operators.
    from .operators import (  # noqa: F401
        aggregations,
        functions_scalar,
        joins,
        llm_pipeline,
        pipeline_extras,
        projections,
        sets_sorts,
        sources_sinks,
        sql_surface,
        streaming,
        text_analysis,
        udfs,
        windows,
    )

    _loaded = True
