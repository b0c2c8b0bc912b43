"""Engine CLI: list, run, or explain any registered query.

    python -m trail_condition_etl_spark list
    python -m trail_condition_etl_spark run trail_classifier [--sf-dir DIR] [-n 20]
    python -m trail_condition_etl_spark explain pricing_summary [--sf-dir DIR]

`run` prints the result (truncated to -n rows); `explain` prints the
formatted physical plan — the same artifact tests/test_plans.py asserts
on, so a user can eyeball what will execute before pointing the query at
a cluster-sized table.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="trail_condition_etl_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for cmd in ("run", "explain"):
        p = sub.add_parser(cmd)
        p.add_argument("query")
        p.add_argument(
            "--sf-dir",
            default="/root/testdata/sf0.01",
            help="testdata directory (default sf0.01)",
        )
        if cmd == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")
    args = parser.parse_args(argv)

    from . import registry

    queries = registry.queries()
    if args.cmd == "list":
        oracles = registry.oracle_sql()
        for name in sorted(queries):
            mark = "oracle" if name in oracles else "rows-only"
            print(f"{name:24s} {mark}")
        return 0

    if args.query not in queries:
        print(f"unknown query {args.query!r}; `list` shows all", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    df = queries[args.query](spark, args.sf_dir)
    if args.cmd == "run":
        df.show(args.n, truncate=False)
    else:
        from .plans import formatted_plan

        print(formatted_plan(df))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
