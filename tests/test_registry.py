"""Registry / driver-contract invariants (no Spark needed).

The driver certifies only the FIRST 50 registry entries per round, so the
ordering logic in secdb_spark/registry.py is itself load-bearing: a drifted
certified-set or a displaced slate entry silently starves an operator of its
CORRECTNESS row.  These tests pin the contract.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from secdb_spark import registry  # noqa: E402

ROOT = Path("/root/repo")


def _driver_recorded_green() -> set[str]:
    names: set[str] = set()
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                names.add(name)
            elif row.get("err") == "no_oracle" or (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                names.add(name)
    return names


def test_certified_set_derives_from_correctness_files():
    """_DRIVER_CERTIFIED must equal the GREEN rows of CORRECTNESS_r*.json —
    a hand-maintained copy drifted in round 2 and starved 41 ops; counting
    red rows as certified (round 3's ts-unit mismatches) would starve the
    re-check after the fix."""
    assert registry._DRIVER_CERTIFIED == frozenset(_driver_recorded_green())


def test_exact_certified_is_hash_match_subset():
    """_DRIVER_EXACT_CERTIFIED holds only hash-match rows (never
    rows-only greens) — it gates whether an upgraded op re-queues."""
    exact = registry._DRIVER_EXACT_CERTIFIED
    assert exact <= registry._DRIVER_CERTIFIED
    rows_only_names = set()
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if isinstance(row, dict) and row.get("err") == "no_oracle":
                rows_only_names.add(name)
    # an op may appear in both (rows-only once, exact later); but an op
    # ONLY ever recorded rows-only must not be in the exact set
    never_exact = rows_only_names - registry._DRIVER_EXACT_CERTIFIED
    for n in never_exact:
        assert n not in registry._DRIVER_EXACT_CERTIFIED


def test_upgraded_ops_requeue_for_certification():
    """An op holding only a rows-only green that NOW registers an oracle
    is unsettled — it must re-enter the first-50 window (round-6's
    dedup_simhash / sample_* / embed_kmeans upgrades depend on this)."""
    order = list(registry.all_queries())
    for name in ("dedup_simhash", "sample_fraction", "sample_stratified",
                 "embed_kmeans"):
        if name in registry._ORACLES and name not in registry._DRIVER_EXACT_CERTIFIED:
            assert not registry.certified_at_current_class(name)
            assert order.index(name) < 50, f"{name} outside the driver window"


def test_first_50_are_all_unsettled():
    """No settled op may occupy one of the driver's 50 certification
    slots while any registered op is still unsettled at its class."""
    order = list(registry.all_queries())
    pending = [n for n in order if not registry.certified_at_current_class(n)]
    n_slots = min(50, len(pending))
    assert all(
        not registry.certified_at_current_class(n) for n in order[:n_slots]
    )


def test_slate_ops_hold_their_slots():
    """Unsettled slate ops must occupy the earliest slots, in slate
    order, so later-registered extras can never displace a SURVEY §2 op
    out of the first-50 window."""
    order = list(registry.all_queries())
    slate_pending = [
        n for n in registry._CERT_SLATE
        if not registry.certified_at_current_class(n)
        and not registry._recert_pending(n)  # recert bucket, not slate (r14)
    ]
    assert order[: len(slate_pending)] == slate_pending


def test_no_complex_typed_columns_in_any_registered_output(spark):
    """Surface-shape invariant: NO registered query may return array/map/
    struct columns — the driver's pandas canonicalizer hashes rows-only
    outputs too, and cannot hash them.  This failure class cost a driver
    slot in round 3 (map-typed `dims`), round 4 (array-typed `postings`),
    and round 5 (embed_pca/mm_features array cells — rows-only ops, which
    the exact-oracle-scoped predecessor of this test did not cover);
    lists must surface as sort_array+array_join strings (agg_collect
    convention), vectors/maps/structs as JSON strings."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql.types import ArrayType, MapType, StructType

    from conftest import SF_DIR

    # Thread-pool the 564 plan constructions (guide §2.6): each op's
    # build is independent and dominated by waiting on its pin/probe
    # jobs, not CPU — sequential this test was the single slowest in the
    # suite (195 s of a 34-min wall; driver-timeout risk, r13 judge
    # directive #3).  16 in-flight builds overlap those waits (measured
    # 208 s sequential -> 78 s at 8 workers -> 58 s at 16, idle host); the
    # assertion set is identical.
    def check(item):
        name, fn = item
        return [
            f"{name}.{field.name}: {field.dataType.simpleString()}"
            for field in fn(spark, SF_DIR).schema.fields
            if isinstance(field.dataType, (ArrayType, MapType, StructType))
        ]

    with ThreadPoolExecutor(max_workers=16) as ex:
        results = list(ex.map(check, registry.all_queries().items()))
    bad = [b for bs in results for b in bs]
    assert not bad, f"complex-typed driver-facing columns: {bad}"


def test_every_query_key_is_registered_and_oracles_subset():
    qs = registry.all_queries()
    ors = registry.all_oracles()
    assert set(ors) <= set(qs)
    # identical iteration order for the shared keys (driver zips by name,
    # but ordering drift would change which ops land in the first 50)
    shared = [n for n in qs if n in ors]
    assert shared == list(ors)


def test_oracle_changed_ops_requeue_behind_fresh_coverage():
    """An op in _ORACLE_CHANGED whose only green records predate the
    change is unsettled (the old record certified the OLD oracle), but
    it must queue BEHIND every never-certified op: recert housekeeping
    may not displace first-time coverage from the 50-slot window."""
    order = list(registry.all_queries())
    fresh_pending = [
        n for n in order
        if not registry.certified_at_current_class(n)
        and not registry._recert_pending(n)
    ]
    slated = set(registry._CERT_SLATE + registry._CERT_SLATE_R6 + registry._CERT_SLATE_R7)
    for name in registry._ORACLE_CHANGED:
        if not registry._recert_pending(name):
            continue  # post-change green record landed; entry is stale
        assert not registry.certified_at_current_class(name)
        if name in slated:
            # a slate pin supersedes the behind-everything rule: the
            # recert holds a GUARANTEED slot (last in its slate) and
            # post-pin registrations queue for the following round
            continue
        idx = order.index(name)
        assert all(order.index(f) < idx for f in fresh_pending), (
            f"{name} (recert) queued ahead of never-certified ops"
        )


def test_oracle_changed_entries_expire_on_post_change_green():
    """_recert_pending consults only CORRECTNESS files from the round of
    the change onward — a pre-change green must NOT settle the op, and a
    post-change green must."""
    for name, rnd in registry._ORACLE_CHANGED.items():
        import json
        from pathlib import Path

        root = Path(registry.__file__).resolve().parent.parent
        post = False
        for f in sorted(root.glob("CORRECTNESS_r*.json")):
            file_rnd = int(f.stem.split("_r")[1])
            rows = json.loads(f.read_text())
            row = rows.get(name) if isinstance(rows, dict) else None
            green = isinstance(row, dict) and bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if green and file_rnd >= rnd:
                post = True
        assert registry._recert_pending(name) == (not post)


def test_round7_slate_holds_its_window():
    """The round-7 slate (50 ops incl. the join_inner recert, pinned
    LAST) must occupy queue positions immediately after any unsettled
    round-6 slate entries — ops registered after the freeze queue for
    round 8 and can never displace the recert out of round 7's
    window."""
    order = list(registry.all_queries())
    # recert-pending ops re-enter via the recert bucket, never their
    # historical slate slot (r14) — exclude them from the expectation
    r6_pending = [
        n for n in registry._CERT_SLATE_R6
        if not registry.certified_at_current_class(n)
        and not registry._recert_pending(n)
    ]
    r7_pending = [
        n for n in registry._CERT_SLATE_R7
        if not registry.certified_at_current_class(n)
        and not registry._recert_pending(n)
    ]
    start = len(r6_pending)
    assert order[start : start + len(r7_pending)] == r7_pending
    if r7_pending:
        assert r7_pending[-1] == "join_inner" or "join_inner" not in r7_pending


def test_round8_slate_holds_its_window():
    """The round-8 slate (49 ops: the §2.AD stragglers, the round-7
    batches, and the rows-only→exact upgrades) must occupy queue
    positions immediately after any unsettled round-6/7 slate entries —
    ops registered after the round-7 freeze queue for round 9 and can
    never displace these."""
    order = list(registry.all_queries())
    earlier_pending = [
        n for n in (
            registry._CERT_SLATE
            + registry._CERT_SLATE_R6
            + registry._CERT_SLATE_R7
        )
        if not registry.certified_at_current_class(n)
        and not registry._recert_pending(n)
    ]
    r8_pending = [
        n for n in registry._CERT_SLATE_R8
        if not registry.certified_at_current_class(n)
        and not registry._recert_pending(n)  # recert bucket, not slate (r14)
    ]
    start = len(earlier_pending)
    assert order[start : start + len(r8_pending)] == r8_pending
    # the slate leaves headroom inside a 50-slot driver window
    assert len(registry._CERT_SLATE_R8) <= 50


def test_every_pending_op_is_slate_addressed():
    """Round-8 invariant: the whole certification backlog holds numbered
    slots (R8/R9/R10/R11 slates) — a newly registered op that is not
    appended to the current round's slate fails here, so the backlog can
    only drain (round-8 judge directive #4)."""
    slated = set(
        registry._CERT_SLATE
        + registry._CERT_SLATE_R6
        + registry._CERT_SLATE_R7
        + registry._CERT_SLATE_R8
        + registry._CERT_SLATE_R9
        + registry._CERT_SLATE_R10
        + registry._CERT_SLATE_R11
        + registry._CERT_SLATE_R12
        + registry._CERT_SLATE_R12B
    )
    unslated = [
        n for n in registry.all_queries()
        if not registry.certified_at_current_class(n)
        and n not in slated
        # recert candidates (_ORACLE_CHANGED / _IMPL_CHANGED) are
        # queue-addressed by their changed-round bookkeeping, not by
        # slates: they already HOLD a green record and re-enter the
        # window via the recert bucket, whose fit is pinned by
        # test_impl_changed_ops_requeue_until_post_change_green.
        and not registry._recert_pending(n)
    ]
    assert not unslated, (
        f"pending ops without a slate slot (append to the CURRENT round's "
        f"widening slate — _CERT_SLATE_R12B as of round 12): {unslated}"
    )


def _survey_s2_op_ids() -> set[str]:
    """Parse SURVEY §2's op-id inventory: every backticked token in the
    first column of a §2 table row, expanding the two grouped-row forms —
    multiple backticks per cell (`join_left` / `join_right` / `join_full`)
    and slash-compressed ids inside one backtick (sql_tpch_q6/q10/q14/q19,
    where later parts re-take the first id's prefix)."""
    import re

    text = (ROOT / "SURVEY.md").read_text()
    s2 = text.split("## §2.")[1].split("## §3.")[0]
    ids: set[str] = set()
    for m in re.finditer(r"^\|([^|\n]*`[^|\n]+)\|", s2, re.M):
        for tok in re.findall(r"`([^`]+)`", m.group(1)):
            if "/" in tok:
                parts = tok.split("/")
                prefix = parts[0].rsplit("_", 1)[0] + "_"
                ids.add(parts[0])
                ids.update(prefix + p for p in parts[1:])
            else:
                ids.add(tok)
    return ids


def test_survey_s2_equals_registry():
    """Round-9 invariant (round-8 judge directive #5): SURVEY §2 IS the
    product spec, so its op-id inventory and the registry must be the
    same set — an op registered without a §2 row (or a §2 row never
    implemented) fails here, keeping directive-5 sync from rotting.
    Regenerate COVERAGE.md in the same commit that adds any op."""
    survey = _survey_s2_op_ids()
    reg = set(registry.all_queries())
    assert survey - reg == set(), (
        f"SURVEY §2 op-ids with no registry entry: {sorted(survey - reg)}"
    )
    assert reg - survey == set(), (
        f"registered ops missing a SURVEY §2 row: {sorted(reg - survey)}"
    )


def test_r11_slate_within_driver_window():
    assert len(registry._CERT_SLATE_R11) <= 50


def test_r12_slate_within_driver_window():
    assert len(registry._CERT_SLATE_R12) <= 50
    # round-12 widening cap: backlog (36) + widening must pend <= 50
    assert len(registry._CERT_SLATE_R12B) <= 14


def test_never_certified_ops_precede_every_recert_candidate():
    """Round-12 invariant (round-11 judge directive #4): the driver
    samples the FIRST 50 of the queue as computed at ITS run time, which
    may drift from the builder's slate prediction (r11 recorded 12 keys
    outside _CERT_SLATE_R11).  What must therefore hold STRUCTURALLY —
    not by slate bookkeeping — is that every op with NO green driver
    record of any kind sorts ahead of every unsettled op that is merely
    awaiting a recert (oracle-changed or rows-only→exact upgrade), so a
    drifting window can never strand first-time coverage behind
    housekeeping."""
    order = list(registry.all_queries())
    never = [
        n for n in order
        if n not in registry._DRIVER_CERTIFIED
        and not registry.certified_at_current_class(n)
    ]
    recert_candidates = [
        n for n in order
        if n in registry._DRIVER_CERTIFIED
        and not registry.certified_at_current_class(n)
    ]
    if never and recert_candidates:
        last_never = max(order.index(n) for n in never)
        first_recert = min(order.index(n) for n in recert_candidates)
        assert last_never < first_recert, (
            "a never-certified op sorts behind a recert candidate: the "
            "driver window could certify housekeeping before first-time "
            "coverage"
        )


def test_round12_backlog_fits_one_driver_window():
    """Round-12 close condition (judge directive #1): the ENTIRE
    unsettled set — never-certified backlog plus any round-12 widening —
    must fit inside one 50-slot driver window, so CORRECTNESS_r12 drains
    the certification backlog to zero regardless of sampling drift."""
    order = list(registry.all_queries())
    pending = [
        n for n in order if not registry.certified_at_current_class(n)
    ]
    assert len(pending) <= 50, (
        f"{len(pending)} unsettled ops exceed the 50-slot driver window; "
        "round-12 widening must stop"
    )


def test_no_uninterpolated_placeholders_in_oracles():
    """Class-closer for the forgotten-f-prefix bug (round 8, hhi_trend):
    an oracle written as a plain triple-quoted string next to siblings
    that use f-strings ships literal `{sql_he4(...)}` text to DuckDB and
    only fails at verify time with an opaque parser error.  `{letter`
    never appears in legitimate SQL here (struct literals use parens,
    quoted JSON braces are followed by a quote), so its presence means a
    missing f prefix."""
    import re

    offenders = {
        n: sql[:80]
        for n, sql in registry.all_oracles().items()
        if re.search(r"\{[A-Za-z_]", sql)
    }
    assert not offenders, (
        "oracle strings with uninterpolated placeholders (missing f "
        f"prefix?): {offenders}"
    )


def test_impl_changed_ops_requeue_until_post_change_green():
    """Round-14 invariant (r13 judge directive #1): an op whose SPARK
    implementation was restructured after its last green driver record
    (_IMPL_CHANGED) is unsettled until a CORRECTNESS record from the
    change round or later is green — the exact triple for oracle-backed
    ops, err == "no_oracle" (a clean rows-only run) for R/D-class ops.
    While the registry has no never-certified backlog, every pending
    recert must land inside the driver's 50-slot window."""
    import json
    from pathlib import Path

    registry.all_queries()  # ensure operators (and _ORACLES) are loaded
    root = Path(registry.__file__).resolve().parent.parent
    records = []
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        records.append((int(f.stem.split("_r")[1]), json.loads(f.read_text())))
    for name, rnd in registry._IMPL_CHANGED.items():
        assert name in registry._QUERIES, f"_IMPL_CHANGED entry {name} not registered"
        post = False
        for file_rnd, rows in records:
            row = rows.get(name) if isinstance(rows, dict) else None
            green = isinstance(row, dict) and bool(
                (row.get("rows_match") and row.get("schema_match") and row.get("hash_match"))
                or row.get("err") == "no_oracle"
            )
            if green and file_rnd >= rnd:
                post = True
        assert registry._recert_pending(name) == (not post), name
        assert registry.certified_at_current_class(name) == post, name

    order = list(registry.all_queries())
    never = [
        n for n in order
        if n not in registry._DRIVER_CERTIFIED
        and not registry.certified_at_current_class(n)
    ]
    if not never:
        pending = [n for n in order if registry._recert_pending(n)]
        outside = [n for n in pending if n not in order[:50]]
        assert not outside, (
            f"pending recerts outside the driver's 50-slot window: {outside}"
        )
