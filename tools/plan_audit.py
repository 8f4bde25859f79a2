"""Registry-wide physical-plan audit — the SCALE.md §48 class, automated.

§48's defect: a DataFrame referenced by several consumers gets RECOMPUTED
by Catalyst, so one logical table is scanned N times per run (audience
overlap scanned raw events 4x before the single-scan rewrite).  Harmless
at sf0.1; N× the scan bill at 100 TB.  This tool renders
`.explain("formatted")` for every registered operator and reports, per op:

- scans-per-table: how many `Scan parquet` (or csv/json/text) nodes read
  the SAME file path.  2 is normal (self-joins, as-of shapes); >= FLAG_AT
  is the recompute smell — either a missing single-scan rewrite or a
  deliberate multi-pass documented in the docstring.
- exchanges: total Exchange nodes (shuffle count) — informational, for
  eyeballing shuffle-heavy plans.

Pure plan analysis: nothing executes, so the sweep is cheap (~analysis
cost only) and safe to run over all 500+ ops.

Run:  python tools/plan_audit.py [--sf /root/testdata/sf0.001]
                                 [--flag-at 3] [op ...]
Exit code 0 iff no op (outside the documented allowlist) reaches
--flag-at scans of one table.
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

# Ops allowed to scan one table >= FLAG_AT times, each with the reason the
# multi-pass is the DESIGN rather than a Catalyst recompute accident.
# Keep entries justified — this list is the audit's contract.
ALLOWED_MULTISCAN: dict[str, str] = {
    # SQL-surface contract ops run the CANONICAL TPC-H query text via
    # spark.sql(); the repeated lineitem scans are the declared subquery
    # semantics of the reference SQL (DuckDB plans the same text the
    # same way), and rewriting the text would un-certify the surface.
    "sql_tpch_q18": "canonical TPC-H text: IN-subquery re-scans lineitem",
    "sql_tpch_q21": "canonical TPC-H text: EXISTS/NOT EXISTS re-scan l2/l3",
}

SCAN_RE = re.compile(r"Scan (?:parquet|csv|json|text)[^\n]*?\[[^\]]*\]\s")
# file path appears in the plan detail section as Location: ...[path]
LOC_RE = re.compile(r"Location: \S+ \[([^\]]*)\]")


def audit_df(df, execute=False):
    """Scan/exchange census of ONE DataFrame's physical plan — the unit
    both sweeps share (registry ops here; api.* functions in
    api_plan_audit.py)."""
    if execute:
        # Materialize through the noop sink, then read the FINAL adaptive
        # plan: under AQE, exchange/stage reuse only shows after
        # execution, so the static count overstates ops whose duplicate
        # subtrees DO collapse at runtime.  Post-exec scans are the real
        # scan bill.
        df.write.mode("overwrite").format("noop").save()
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    # formatted mode prints one "(N) Scan parquet <table>" line per scan
    # node in the tree plus a detail block holding its Location.
    scans = re.findall(r"\(\d+\) Scan (parquet|csv|json|text) ?(\S*)", plan)
    locs = LOC_RE.findall(plan)
    per_path = Counter(locs) if len(locs) == len(scans) else Counter(
        t[1] or f"anon_{i}" for i, t in enumerate(scans)
    )
    exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    return per_path, exchanges


def audit_one(name, fn, spark, sf_dir, execute=False):
    return audit_df(fn(spark, sf_dir), execute=execute)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--flag-at", type=int, default=3)
    ap.add_argument("--exec", dest="execute", action="store_true",
                    help="run each op (noop sink) and audit the FINAL "
                         "adaptive plan instead of the static one")
    ap.add_argument("ops", nargs="*")
    args = ap.parse_args()

    from secdb_spark.registry import all_queries
    from secdb_spark.session import get_spark

    spark = get_spark("plan-audit")
    queries = all_queries()
    names = args.ops or sorted(queries)

    flagged = []
    errors = []
    for name in names:
        try:
            per_path, exchanges = audit_one(
                name, queries[name], spark, args.sf, execute=args.execute
            )
        except Exception as e:  # streaming ops etc. may not build a batch plan
            errors.append((name, str(e).splitlines()[0][:100]))
            continue
        worst = max(per_path.values(), default=0)
        mark = ""
        if worst >= args.flag_at and name not in ALLOWED_MULTISCAN:
            flagged.append((name, worst, dict(per_path)))
            mark = "  << MULTISCAN"
        print(
            f"{name:32s} scans={sum(per_path.values()):2d} "
            f"max_per_table={worst:2d} exchanges={exchanges:2d}{mark}"
        )

    print(f"\n{len(names) - len(errors)} audited, {len(errors)} skipped "
          f"(no batch plan), {len(flagged)} flagged")
    for name, worst, paths in flagged:
        print(f"  MULTISCAN {name}: {worst}x one table  {paths}")
    for name, err in errors:
        print(f"  skipped {name}: {err}")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
