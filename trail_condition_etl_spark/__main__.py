"""Engine CLI: list, run, or explain any registered query, plus the
manifest-table operator console.

    python -m trail_condition_etl_spark list
    python -m trail_condition_etl_spark run trail_classifier [--sf-dir DIR] [-n 20]
    python -m trail_condition_etl_spark explain pricing_summary [--sf-dir DIR]
    python -m trail_condition_etl_spark table history PATH
    python -m trail_condition_etl_spark table count PATH
    python -m trail_condition_etl_spark table optimize PATH \\
        [--cluster-by col1,col2] [--files-per-bucket N]
    python -m trail_condition_etl_spark table vacuum PATH [--keep-last N] [--force]
    python -m trail_condition_etl_spark table delete PATH --where "SQL expr"
    python -m trail_condition_etl_spark table update PATH --where "SQL expr" \\
        --set "col = expr" [--set "col2 = expr2"]
    python -m trail_condition_etl_spark table restore PATH --version N
    python -m trail_condition_etl_spark table maintain PATH \\
        [--max-files-per-bucket N] [--max-delete-files N]
    python -m trail_condition_etl_spark table clone SRC DST [--version N]
    python -m trail_condition_etl_spark table release-clone SRC DST

`run` prints the result (truncated to -n rows); `explain` prints the
formatted physical plan — the same artifact tests/test_plans.py asserts
on, so a user can eyeball what will execute before pointing the query at
a cluster-sized table. `table history`/`count` are metadata-only (no
data files opened); `optimize --cluster-by` is the ZORDER rewrite."""

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
    pt = sub.add_parser("table", help="manifest-table operator console")
    tsub = pt.add_subparsers(dest="tcmd", required=True)
    for tcmd in (
        "history", "count", "optimize", "vacuum", "delete", "update",
        "restore", "maintain", "clone", "release-clone",
        "rename-column", "drop-column", "add-bloom", "drop-bloom",
        "add-generated", "drop-generated", "compact",
    ):
        tp = tsub.add_parser(tcmd)
        tp.add_argument("path")
        if tcmd == "rename-column":
            tp.add_argument("old")
            tp.add_argument("new")
        if tcmd in (
            "drop-column", "add-bloom", "drop-bloom",
            "add-generated", "drop-generated",
        ):
            tp.add_argument("column")
        if tcmd == "add-generated":
            tp.add_argument("expr", help="SQL expression, e.g. 'a + 1'")
        if tcmd == "add-bloom":
            tp.add_argument("--m", type=int, default=None,
                            help="bitmap bits per bucket (multiple of 8)")
            tp.add_argument("--k", type=int, default=None,
                            help="seeded hash count")
        if tcmd in ("clone", "release-clone"):
            tp.add_argument("dst", help="clone table path")
        if tcmd == "clone":
            tp.add_argument("--version", type=int, default=None,
                            help="source version to clone (default latest)")
        if tcmd == "optimize":
            tp.add_argument("--cluster-by", default=None,
                            help="comma-separated ZORDER columns")
            tp.add_argument("--files-per-bucket", type=int, default=4)
            tp.add_argument("--n-buckets", type=int, default=None,
                            help="rescale the bucket layout")
        if tcmd == "vacuum":
            tp.add_argument("--keep-last", type=int, default=1)
            tp.add_argument(
                "--force", action="store_true",
                help="sweep even past versions pinned by registered "
                "change-feed cursors (breaks those streams loudly)",
            )
        if tcmd == "delete":
            tp.add_argument("--where", required=True,
                            help="SQL predicate (merge-on-read delete)")
        if tcmd == "update":
            tp.add_argument("--where", required=True, help="SQL predicate")
            tp.add_argument("--set", required=True, action="append",
                            help='"col = expr", repeatable')
        if tcmd == "restore":
            tp.add_argument("--version", type=int, required=True)
        if tcmd == "maintain":
            tp.add_argument("--max-files-per-bucket", type=int, default=8)
            tp.add_argument("--max-delete-files", type=int, default=16)
        if tcmd == "compact":
            tp.add_argument("--buckets", default=None,
                            help="comma-separated bucket ids "
                            "(default: every bucket over threshold)")
            tp.add_argument("--max-files-per-bucket", type=int, default=1)
    args = parser.parse_args(argv)

    if args.cmd == "table":
        return _table_cmd(args)

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


def _table_cmd(args) -> int:
    from .sinks import manifest as mf

    if args.tcmd == "count":  # metadata-only: no SparkSession needed
        n = mf.manifest_row_count(args.path)
        print(n if n is not None else "unknown (a commit skipped stats: scan required)")
        return 0
    from .session import get_spark

    spark = get_spark(f"cli-table-{args.tcmd}")
    if args.tcmd == "history":
        mf.describe_history(spark, args.path).orderBy("version").show(
            100, truncate=False
        )
    elif args.tcmd == "optimize":
        cluster = (
            [c.strip() for c in args.cluster_by.split(",") if c.strip()]
            if args.cluster_by
            else None
        )
        v = mf.optimize_table(
            spark, args.path,
            cluster_by=cluster, files_per_bucket=args.files_per_bucket,
            n_buckets=args.n_buckets,
        )
        print(f"optimized -> version {v}"
              + (f" (clustered by {cluster})" if cluster else "")
              + (f" (rescaled to {args.n_buckets} buckets)"
                 if args.n_buckets else ""))
    elif args.tcmd == "vacuum":
        removed = mf.vacuum(
            args.path, keep_last=args.keep_last, force=args.force
        )
        print(f"swept {removed} orphan/expired segment dirs")
    elif args.tcmd == "delete":
        before = (mf.read_manifest(args.path) or {}).get("version")
        v = mf.delete_where(spark, args.path, args.where)
        if v == before:
            print(f"no rows matched; table unchanged at version {v}")
        else:
            met = (mf.read_manifest(args.path, v) or {}).get("op_metrics", {})
            print(
                f"deleted {met.get('rows_deleted')} rows (merge-on-read) "
                f"-> version {v}"
            )
    elif args.tcmd == "update":
        assignments = {}
        for s in args.set:
            col, _, expr = s.partition("=")
            if not _ or not col.strip() or not expr.strip():
                print(f'bad --set {s!r}; expected "col = expr"',
                      file=sys.stderr)
                return 2
            assignments[col.strip()] = expr.strip()
        before = (mf.read_manifest(args.path) or {}).get("version")
        v = mf.update_where(spark, args.path, args.where, assignments)
        if v == before:
            print(f"no rows matched; table unchanged at version {v}")
        else:
            print(f"updated -> version {v}")
    elif args.tcmd == "restore":
        v = mf.restore_table(spark, args.path, version=args.version)
        print(f"restored to version {args.version} -> version {v}")
    elif args.tcmd == "clone":
        mf.clone_table(spark, args.path, args.dst, version=args.version)
        src_v = args.version or (mf.read_manifest(args.path) or {}).get(
            "version"
        )
        print(
            f"shallow-cloned {args.path}@v{src_v} -> {args.dst} "
            "(metadata only; source vacuum now retention-guards the "
            "referenced segments)"
        )
    elif args.tcmd == "release-clone":
        had = mf.release_clone(args.path, args.dst)
        print("pin released" if had else "no pin registered for that clone")
    elif args.tcmd == "rename-column":
        v = mf.rename_column(spark, args.path, args.old, args.new)
        print(f"renamed {args.old} -> {args.new} (metadata only) "
              f"-> version {v}")
    elif args.tcmd == "drop-column":
        v = mf.drop_column(spark, args.path, args.column)
        print(f"dropped {args.column} (metadata only; bytes purge at the "
              f"next optimize) -> version {v}")
    elif args.tcmd == "add-bloom":
        from .sinks import bloom as bl

        v = mf.add_bloom_index(
            spark, args.path, args.column,
            m=args.m if args.m is not None else bl.DEFAULT_M,
            k=args.k if args.k is not None else bl.DEFAULT_K,
        )
        print(f"bloom index on {args.column} backfilled -> version {v}")
    elif args.tcmd == "drop-bloom":
        v = mf.drop_bloom_index(spark, args.path, args.column)
        print(f"bloom index on {args.column} dropped -> version {v}")
    elif args.tcmd == "add-generated":
        v = mf.add_generated_column(spark, args.path, args.column, args.expr)
        print(f"generated rule {args.column} = ({args.expr}) -> version {v}")
    elif args.tcmd == "drop-generated":
        v = mf.drop_generated_column(spark, args.path, args.column)
        print(f"generated rule on {args.column} dropped -> version {v}")
    elif args.tcmd == "compact":
        ids = (
            [int(b) for b in args.buckets.split(",") if b.strip()]
            if args.buckets
            else None
        )
        v = mf.compact_buckets(
            spark, args.path, bucket_ids=ids,
            max_files_per_bucket=args.max_files_per_bucket,
        )
        print(
            f"compacted -> version {v}" if v is not None
            else "within thresholds; nothing to do"
        )
    elif args.tcmd == "maintain":
        v = mf.maintain_table(
            spark, args.path,
            max_files_per_bucket=args.max_files_per_bucket,
            max_delete_files=args.max_delete_files,
        )
        print(
            f"compacted -> version {v}" if v is not None
            else "within thresholds; nothing to do"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
