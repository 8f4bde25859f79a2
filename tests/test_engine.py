"""Engine facade + CLI — the user surface a reference (SQL-over-SQLite)
user switches to: ad-hoc SQL, table access, operator invocation."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest

from conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def eng(spark):
    from secdb_spark.engine import Engine

    return Engine(SF_DIR, spark=spark)


def test_sql_over_views(eng):
    rows = eng.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1"
    ).collect()
    assert {r.l_returnflag for r in rows} == {"A", "N", "R"}


def test_sql_sees_normalized_events_ts(eng):
    """The registered events view must carry the footer-probed µs
    conversion — a raw-long ts here would silently break every ad-hoc
    time query a user writes."""
    row = eng.sql("SELECT min(ts) AS lo, max(ts) AS hi FROM events").collect()[0]
    assert 2000 <= row.lo.year <= 2100


def test_table_and_ops(eng):
    assert eng.table("nation").count() == 25
    assert "agg_group" in eng.ops() and len(eng.ops()) >= 200
    assert eng.op("agg_group").count() == 6
    assert "SELECT" in (eng.oracle("agg_group") or "")
    # round 6 gave the streaming trio batch-equivalent oracles; ann_ivf
    # stays legitimately R-class (seeded centroids, approximate recall)
    assert "SELECT" in (eng.oracle("stream_watermark") or "")
    assert eng.oracle("ann_ivf") is None
    with pytest.raises(KeyError):
        eng.op("no_such_op")


def test_explain_both_shapes(eng):
    assert "HashAggregate" in eng.explain("agg_group")
    assert "Scan" in eng.explain("SELECT count(*) FROM orders")


def test_cli_sql_and_list(eng, capsys):
    """__main__ path with the module-scoped session already live (the CLI
    builds-or-fetches via getOrCreate, so it reuses this one)."""
    from secdb_spark.__main__ import main

    assert main(["--sf", SF_DIR, "--list"]) == 0
    out = capsys.readouterr().out
    assert "agg_group" in out and "dedup_near" in out

    assert main(["--sf", SF_DIR, "SELECT count(*) AS n FROM region"]) == 0
    assert "5" in capsys.readouterr().out

    assert main(["--sf", SF_DIR, "--op", "yoy_growth", "--json", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert out.count("{") >= 1 and "revenue" in out
