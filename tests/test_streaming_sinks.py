"""Streaming batch-equivalence (SURVEY §5.2.5) and sink read-back checks."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from conftest import SF_DIR  # noqa: E402

from secdb_spark.registry import all_queries  # noqa: E402

QUERIES = all_queries()


def test_watermark_equals_tumbling_modulo_open_windows(spark):
    """availableNow + append emits only watermark-closed windows: the
    result must be a PREFIX of the batch tumbling result — equal except
    for windows still open at termination."""
    wm = QUERIES["stream_watermark"](spark, SF_DIR).toPandas()
    tb = QUERIES["stream_tumbling"](spark, SF_DIR).toPandas()
    wm_set = {(r.window_start, r.event_type, r.n) for r in wm.itertuples()}
    tb_set = {(r.window_start, r.event_type, r.n) for r in tb.itertuples()}
    assert wm_set <= tb_set, "watermarked output must agree with batch on closed windows"
    open_windows = tb_set - wm_set
    assert len(open_windows) <= 6, f"too many unclosed windows: {len(open_windows)}"
    if open_windows:
        max_closed = max(w for w, _, _ in wm_set)
        assert all(w >= max_closed for w, _, _ in open_windows), (
            "only the trailing (open) windows may be withheld"
        )


def test_stream_dedup_matches_batch_distinct(spark):
    """event_id is unique in the corpus -> in-stream dedup keeps all rows;
    injectable duplicates are covered by the bounded-state semantics."""
    dd = QUERIES["stream_dedup"](spark, SF_DIR).toPandas()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert len(dd) == n_events
    assert dd["event_id"].is_unique


def test_stream_stateful_totals(spark):
    """Final per-user state must equal the batch per-user aggregate."""
    st = QUERIES["stream_stateful"](spark, SF_DIR).toPandas().set_index("user_id")
    from secdb_spark.catalog import table as load_table
    from pyspark.sql import functions as F

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
        .set_index("user_id")
    )
    # update-mode memory sink may hold one row per micro-batch update;
    # keep the last (max) count per user before comparing
    st_final = st.groupby(level=0)["n_events"].max()
    assert (st_final.sort_index() == batch["n_events"].sort_index()).all()


def test_snk_sqlite_roundtrip(spark):
    """SQLite shard sink: read-back must equal the source exactly."""
    import pandas as pd

    out = QUERIES["snk_sqlite"](spark, SF_DIR).toPandas().sort_values("s_suppkey")
    src = (
        spark.read.parquet(f"{SF_DIR}/supplier.parquet")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .toPandas()
        .sort_values("s_suppkey")
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True),
        src.reset_index(drop=True),
        check_dtype=False,
    )


def test_xbrl_etl_parses_fixture_facts(spark):
    """Fixture filings must parse to the expected typed facts."""
    facts = QUERIES["src_xbrl_etl"](spark, SF_DIR).toPandas()
    assert len(facts) == 9  # 3+2+3+1 facts across 4 filings
    assert facts["cik"].nunique() == 4
    rev = facts[
        (facts.accession == "0000002-24-000007")
        & (facts.concept == "us-gaap:Revenues")
    ]
    assert len(rev) == 1
    assert float(rev.iloc[0]["value"]) == 61858000000.0
    assert rev.iloc[0]["period_start"] == "2024-01-01"
    assert rev.iloc[0]["dim_region"] == "EMEA"
    # exact decimal money type preserved (SURVEY §1 requirement)
    import decimal

    assert isinstance(facts.iloc[0]["value"], decimal.Decimal)


def test_xbrl_metrics_standardization(spark):
    """Per-filing standardized metrics: pivot correctness + derived margin."""
    m = QUERIES["xbrl_metrics"](spark, SF_DIR).toPandas().set_index("accession")
    assert len(m) == 4
    row = m.loc["0000002-24-000007"]
    assert row["revenue"] == 61858000000.0
    assert row["net_income"] == 21939000000.0
    assert abs(row["net_margin"] - round(21939 / 61858, 6)) < 1e-9
    # filing with only assets: other metrics null
    assert m.loc["0000004-24-000020"][["revenue", "net_income"]].isna().all()


def test_sqlite_sink_capability_dispatch(spark, monkeypatch):
    """No sqlite-jdbc jar ships in this container -> the sharded branch is
    selected; with the jar present (simulated) the jdbc branch is."""
    from secdb_spark.operators import sources_sinks as ss

    assert ss.sqlite_jdbc_available(spark) is False  # environment fact
    assert ss.choose_sqlite_sink(spark) == "sharded"
    monkeypatch.setattr(ss, "sqlite_jdbc_available", lambda s: True)
    assert ss.choose_sqlite_sink(spark) == "jdbc"


def test_snk_sqlite_jdbc_branch_when_jar_present(spark, monkeypatch):
    """When the capability check reports a jar, snk_sqlite must route
    through write_sqlite_jdbc (stubbed here: writing via the real jdbc
    data source needs the jar this container lacks)."""
    import sqlite3

    from secdb_spark.operators import sources_sinks as ss

    called = {}

    def fake_jdbc(df, db_path, table_name):
        called["db_path"] = db_path
        con = sqlite3.connect(db_path)
        df.toPandas().to_sql(table_name, con, index=False)
        con.close()

    monkeypatch.setattr(ss, "sqlite_jdbc_available", lambda s: True)
    monkeypatch.setattr(ss, "write_sqlite_jdbc", fake_jdbc)
    out = ss.snk_sqlite(spark, SF_DIR)
    assert "db_path" in called, "jdbc branch not taken despite jar present"
    assert out.count() == spark.read.parquet(f"{SF_DIR}/supplier.parquet").count()
