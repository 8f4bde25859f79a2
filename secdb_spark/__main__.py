"""One-shot CLI — the `sqlite3 db.sqlite "SELECT ..."` gesture on Spark.

    python -m secdb_spark "SELECT count(*) FROM lineitem"
    python -m secdb_spark --sf /root/testdata/sf0.01 --op yoy_growth
    python -m secdb_spark --list
    python -m secdb_spark --explain agg_group

Output is a text table (20-row cap by default, --limit to change);
--json emits one JSON object per row instead (machine-readable, like
`sqlite3 -json`).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m secdb_spark")
    ap.add_argument("query", nargs="?", help="SQL to run over the table views")
    ap.add_argument("--sf", default=None, help="data dir (default $SPARK_GRAFT_SF_DIR)")
    ap.add_argument("--op", help="run a registered operator id instead of SQL")
    ap.add_argument("--list", action="store_true", help="list operator ids")
    ap.add_argument("--explain", metavar="OP_OR_SQL", help="print the physical plan")
    ap.add_argument(
        "--verify",
        metavar="OP",
        help="diff an operator against its DuckDB reference SQL "
        "(exit 0 iff it matches)",
    )
    ap.add_argument("--limit", type=int, default=20, help="max rows to print")
    ap.add_argument("--json", action="store_true", help="JSON lines output")
    args = ap.parse_args(argv)

    from .catalog import DEFAULT_SF_DIR
    from .engine import Engine

    eng = Engine(args.sf or DEFAULT_SF_DIR)
    if args.list:
        print("\n".join(eng.ops()))
        return 0
    if args.explain:
        print(eng.explain(args.explain))
        return 0
    if args.verify:
        res = eng.verify(args.verify)
        print(f"{res.status}  {res.name}  {res.detail}")
        return 0 if res.ok else 1
    if args.op:
        df = eng.op(args.op)
    elif args.query:
        df = eng.sql(args.query)
    else:
        ap.print_help()
        return 2
    if args.json:
        for line in df.limit(args.limit).toJSON().collect():
            print(line)
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
