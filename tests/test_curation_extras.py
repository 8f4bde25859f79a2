"""Brute-force parity for round-7 batch-1 (curation_extras.py +
warehouse_extras7 round-7 tail + ann_ivf_assign): every op recomputed in
pure Python/NumPy over the same inputs — an oracle path independent of
both Spark and DuckDB."""

from __future__ import annotations

import hashlib
import json
import sys
from collections import Counter

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from conftest import SF_DIR  # noqa: E402

from secdb_spark.catalog import table  # noqa: E402
from secdb_spark.operators.curation_extras import (  # noqa: E402
    CHUNK_DEDUP_W,
    MRL_HALF_D,
    PQ_K,
    PQ_M,
    PQ_SUB_D,
    QG_MAX_TOKS,
    QG_MIN_TOKS,
)
from secdb_spark.operators.llm_pipeline import N_CENTROIDS  # noqa: E402
from secdb_spark.registry import all_queries  # noqa: E402

QUERIES = all_queries()


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return QUERIES[name](spark, SF_DIR).toPandas()

    return run


@pytest.fixture(scope="module")
def docs(spark):
    return (
        table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "lang", "source")
        .toPandas()
    )


@pytest.fixture(scope="module")
def emb(spark):
    pdf = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").toPandas()
    return pdf.vec_id.to_numpy(), np.stack(
        [np.asarray(e, dtype="float64") for e in pdf.embedding]
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_doc_quality_gate_vs_bruteforce(q, docs):
    got = q("doc_quality_gate").set_index("source")
    per = Counter()
    kept = Counter()
    fails = {r: Counter() for r in ("short", "long", "wlen", "ttr")}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        n, chars = len(toks), len(r.text)
        dist = len(set(r.text.lower().split(" ")))
        f = {
            "short": n < QG_MIN_TOKS,
            "long": n > QG_MAX_TOKS,
            "wlen": (chars - n + 1) < 3 * n or (chars - n + 1) > 10 * n,
            "ttr": 10 * dist < 3 * n,
        }
        per[r.source] += 1
        for k, v in f.items():
            fails[k][r.source] += int(v)
        kept[r.source] += int(not any(f.values()))
    for src in per:
        row = got.loc[src]
        assert row.n_docs == per[src]
        assert row.n_fail_short == fails["short"][src]
        assert row.n_fail_ttr == fails["ttr"][src]
        assert row.n_kept == kept[src]
        assert abs(row.kept_ratio - round(kept[src] / per[src], 4)) < 1e-9


def test_chunk_dedup_share_vs_bruteforce(q, docs):
    got = q("chunk_dedup_share").set_index("doc_id")
    chunks = {}
    freq = Counter()
    for r in docs.itertuples():
        toks = r.text.split(" ")
        cs = [
            " ".join(toks[i : i + CHUNK_DEDUP_W])
            for i in range(0, len(toks), CHUNK_DEDUP_W)
        ]
        chunks[r.doc_id] = cs
        freq.update(cs)
    for doc_id, cs in chunks.items():
        row = got.loc[doc_id]
        dup = sum(1 for c in cs if freq[c] >= 2)
        assert row.n_chunks == len(cs)
        assert row.n_dup == dup


def test_dedup_keep_best_vs_bruteforce(q, docs):
    got = q("dedup_keep_best")
    clusters = {}
    for r in docs.itertuples():
        k = _md5(" ".join(sorted(set(r.text.lower().split(" ")))))
        clusters.setdefault(k, []).append((r.doc_id, len(r.text)))
    expected = {}
    for k, members in clusters.items():
        if len(members) < 2:
            continue
        keeper = min(members, key=lambda m: (-m[1], m[0]))[0]
        for doc_id, _n in members:
            expected[doc_id] = (keeper, len(members))
    assert len(got) == len(expected)
    for r in got.itertuples():
        kp, sz = expected[r.doc_id]
        assert (r.keeper_doc_id, r.cluster_size) == (kp, sz)
    # every keeper maps to itself
    gm = got.set_index("doc_id").keeper_doc_id
    for kp in set(gm.values):
        assert gm[kp] == kp


def test_text_hapax_ratio_vs_bruteforce(q, docs):
    got = q("text_hapax_ratio").set_index("source")
    per = {}
    for r in docs.itertuples():
        per.setdefault(r.source, Counter()).update(r.text.lower().split(" "))
    for src, tc in per.items():
        row = got.loc[src]
        hap = sum(1 for c in tc.values() if c == 1)
        assert row.n_tokens == sum(tc.values())
        assert row.vocab == len(tc)
        assert row.hapax == hap


def test_source_lang_matrix_shares_sum_to_one(q):
    got = q("source_lang_matrix")
    for _src, g in got.groupby("source"):
        assert abs(g.doc_share.sum() - 1.0) < 5e-4  # round(·,4) residue


def test_embed_pq_codes_vs_numpy(q, emb):
    ids, M = emb
    got = q("embed_pq_codes").set_index("vec_id").sort_index()
    order = sorted(range(len(ids)), key=lambda i: (_md5(f"pqseed:{ids[i]}"), ids[i]))
    C = M[order[:PQ_K]]
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB_D, (m + 1) * PQ_SUB_D
        d2 = ((M[:, None, lo:hi] - C[None, :, lo:hi]) ** 2).sum(axis=2)
        codes = d2.argmin(axis=1)  # numpy argmin = first min = min c_idx
        mismatch = (got[f"code{m}"].to_numpy()[np.argsort(ids)] != codes[np.argsort(ids)]).sum()
        # numpy pairwise vs strict-fold can differ only on exact FP ties
        assert mismatch == 0, f"subspace {m}: {mismatch} label mismatches"


def test_matryoshka_energy_bounds(q, emb):
    ids, M = emb
    got = q("embed_matryoshka_truncate")
    assert ((got.energy_ratio >= 0) & (got.energy_ratio <= 1)).all()
    assert (got.norm_half <= got.norm_full + 1e-9).all()
    row = got.set_index("vec_id").loc[ids[0]]
    v = M[0]
    assert abs(row.norm_full - np.sqrt((v * v).sum())) < 1e-4
    assert abs(row.norm_half - np.sqrt((v[:MRL_HALF_D] ** 2).sum())) < 1e-4


def test_ann_ivf_assign_vs_numpy(q, emb):
    ids, M = emb
    got = q("ann_ivf_assign").set_index("vec_id")
    order = sorted(range(len(ids)), key=lambda i: (_md5(f"ivfseed:{ids[i]}"), ids[i]))
    C = M[order[:N_CENTROIDS]]
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Cn.T
    buckets = S.argmax(axis=1)
    agree = sum(
        got.loc[ids[i]].bucket == buckets[i] for i in range(len(ids))
    )
    # strict-fold cosine vs numpy matmul may flip only exact near-ties
    assert agree >= len(ids) - 2
    assert ((got.sim <= 1.000001) & (got.sim >= -1.000001)).all()


def test_users_cumulative_vs_bruteforce(q, spark):
    ev = table(spark, SF_DIR, "events").select("ts", "user_id").toPandas()
    ev["day"] = ev.ts.dt.floor("D")
    got = q("users_cumulative").sort_values("day").reset_index(drop=True)
    first = ev.groupby("user_id").day.min()
    newu = first.value_counts().sort_index()
    dau = ev.groupby("day").user_id.nunique().sort_index()
    cum = 0
    for r in got.itertuples():
        day = r.day
        assert r.dau == dau[day]
        n = int(newu.get(day, 0))
        assert r.new_users == n
        cum += n
        assert r.cum_users == cum
    assert got.cum_users.iloc[-1] == ev.user_id.nunique()


def test_graph_degree_dist_vs_bruteforce(q, spark):
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").toPandas()
    edges = set()
    for _ok, g in li.groupby("l_orderkey"):
        ps = sorted(set(g.l_partkey))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    buckets = Counter(int(d).bit_length() - 1 for d in deg.values())
    got = q("graph_degree_dist").set_index("log2_bucket")
    assert dict(buckets) == {int(i): int(r.n_parts) for i, r in got.iterrows()}


def test_events_props_stats_vs_bruteforce(q, spark):
    ev = table(spark, SF_DIR, "events").select("event_type", "props").toPandas()
    ev["k"] = ev.props.map(lambda s: json.loads(s)["k"])
    got = q("events_props_stats").set_index("event_type")
    for et, g in ev.groupby("event_type"):
        row = got.loc[et]
        assert row.n == len(g)
        assert row.sum_k == g.k.sum()
        assert row.min_k == g.k.min() and row.max_k == g.k.max()


def test_orders_seasonality_index_averages_to_one(q):
    got = q("orders_seasonality_index")
    assert len(got) == 12
    # index is rev * n / total, so the revenue-weighted identity: sum of
    # rev_m * 1 = total -> mean of index weighted by 1/n... simplest
    # invariant: sum(revenue * index-free) — check index recomputation
    total = got.revenue.sum()
    n = len(got)
    for r in got.itertuples():
        assert abs(r.seasonality_index - round(r.revenue * n / total, 4)) < 5e-3


# --- round-7 batch 3 ------------------------------------------------------

def test_dedup_prefix_groups_vs_bruteforce(q, docs):
    from secdb_spark.operators.curation_extras import PREFIX_K

    groups = {}
    for r in docs.itertuples():
        k = " ".join(r.text.split(" ")[:PREFIX_K])
        groups.setdefault(k, []).append(r.doc_id)
    expected = {
        _md5(k): sorted(v) for k, v in groups.items() if len(v) >= 2
    }
    got = q("dedup_prefix_groups")
    assert len(got) == len(expected)
    for r in got.itertuples():
        mem = expected[r.prefix_key]
        assert r.n_docs == len(mem)
        assert r.first_doc == mem[0]


def test_embed_coreset_vs_numpy(q, emb):
    from secdb_spark.operators.curation_extras import CORESET_K

    ids, M = emb
    order = sorted(range(len(ids)), key=lambda i: (_md5(f"kmseed:{ids[i]}"), ids[i]))
    C = M[order[:8]]
    d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)
    got = q("embed_coreset")
    assert (got.groupby("cluster").vec_id.count() <= CORESET_K).all()
    for r in got.itertuples():
        i = int(np.where(ids == r.vec_id)[0][0])
        assert cl[i] == r.cluster
        # its distance must be within the cluster's k smallest
        members = np.sort(d2[cl == r.cluster, r.cluster])
        kth = members[min(CORESET_K, len(members)) - 1]
        assert d2[i, r.cluster] <= kth + 1e-9


def test_mix_epoch_upsample_invariants(q):
    from secdb_spark.operators.curation_extras import MAX_EPOCHS

    got = q("mix_epoch_upsample")
    assert ((got.repeat_factor >= 1) & (got.repeat_factor <= MAX_EPOCHS)).all()
    assert (got.effective_docs == got.n_docs * got.repeat_factor).all()
    # the largest source never upsamples
    assert got.loc[got.n_docs.idxmax()].repeat_factor == 1
    assert abs(got.effective_share.sum() - 1.0) < 5e-3


def test_token_fertility_vs_bruteforce(q, docs):
    import re

    pat = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
    got = q("token_fertility_by_lang").set_index("lang")
    agg = {}
    for r in docs.itertuples():
        a = agg.setdefault(r.lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(pat.findall(r.text))
        a[2] += len(r.text.split(" "))
        a[3] += len(r.text)
    for lang, (n, bpe, ws, chars) in agg.items():
        row = got.loc[lang]
        assert row.n_docs == n and row.bpe_tokens == bpe and row.ws_tokens == ws
        assert abs(row.fertility - round(bpe / ws, 4)) < 1e-9


def test_ann_pq_adc_topk_vs_numpy(q, emb):
    from secdb_spark.operators.curation_extras import (
        ADC_K,
        PQ_K,
        PQ_M,
        PQ_SUB_D,
    )

    ids, M = emb
    order = sorted(range(len(ids)), key=lambda i: (_md5(f"pqseed:{ids[i]}"), ids[i]))
    C = M[order[:PQ_K]]
    codes = np.zeros((len(ids), PQ_M), dtype=int)
    dts = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB_D, (m + 1) * PQ_SUB_D
        d2 = ((M[:, None, lo:hi] - C[None, :, lo:hi]) ** 2).sum(axis=2)
        codes[:, m] = d2.argmin(axis=1)
        dts.append(d2)  # dt[m][query, j]
    idx_of = {v: i for i, v in enumerate(ids)}
    got = q("ann_pq_adc_topk")
    assert (got.groupby("query_id")["rank"].max() <= ADC_K).all()
    for qid, g in got.groupby("query_id"):
        qi = idx_of[qid]
        adc = np.zeros(len(ids))
        for ci in range(len(ids)):
            adc[ci] = sum(dts[m][qi, codes[ci, m]] for m in range(PQ_M))
        cand = [(adc[ci], ids[ci]) for ci in range(len(ids)) if ids[ci] != qid]
        expected = [v for _d, v in sorted(cand)[:ADC_K]]
        assert list(g.sort_values("rank").neighbor_id) == expected
