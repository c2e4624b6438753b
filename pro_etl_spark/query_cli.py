"""Operational front door for the query library: list, explain, and
run any registered operator from the command line.

    python -m pro_etl_spark.query_cli list [--rows-only]
    python -m pro_etl_spark.query_cli explain <key> [--sf-dir D] [--mode M]
    python -m pro_etl_spark.query_cli run <key> [--sf-dir D]
        [--output PATH --format parquet|csv|json] [--show N]

The reference exposes exactly one hard-wired job (`python migrate.py`,
/root/reference/migrate.py:308); this CLI generalizes that entry point
over the whole operator library, in the plan-first shape Spark work
should be reviewed in: `explain` prints the formatted physical plan
(what a reviewer checks for pushdown/broadcast/shuffle posture) without
executing anything, and `run` either writes distributed output
(df.write, no driver materialization) or shows a bounded preview.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _get_spark() -> SparkSession:
    from pro_etl_spark.session import get_spark

    return get_spark("pro_etl_spark-query")


def cmd_list(args, out=None) -> int:
    out = out or sys.stdout
    import pro_etl_spark

    from pro_etl_spark.registry import BASELINE_TWINS

    queries = pro_etl_spark.get_queries()
    oracles = pro_etl_spark.get_oracles()
    for name in sorted(queries):
        if args.rows_only and name in oracles:
            continue
        tag = "rows-only" if name not in oracles else "oracle"
        line = f"{name}\t{tag}"
        if name in BASELINE_TWINS:
            line += (
                f"\tEXACTNESS BASELINE — not a production path; "
                f"use {BASELINE_TWINS[name]}"
            )
        print(line, file=out)
    return 0


def cmd_explain(args, spark=None, out=None) -> int:
    out = out or sys.stdout
    import pro_etl_spark

    queries = pro_etl_spark.get_queries()
    if args.key not in queries:
        print(f"unknown query {args.key!r} (see `list`)", file=sys.stderr)
        return 2
    spark = spark or _get_spark()
    df = queries[args.key](spark, args.sf_dir)
    jvm = spark.sparkContext._jvm
    print(
        jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), args.mode),
        file=out,
    )
    return 0


def cmd_run(args, spark=None, out=None) -> int:
    out = out or sys.stdout
    import pro_etl_spark

    queries = pro_etl_spark.get_queries()
    if args.key not in queries:
        print(f"unknown query {args.key!r} (see `list`)", file=sys.stderr)
        return 2
    spark = spark or _get_spark()
    df = queries[args.key](spark, args.sf_dir)
    if args.output:
        writer = df.write.mode("overwrite")
        if args.format == "csv":
            writer = writer.option("header", True)
        getattr(writer, args.format)(args.output)
        print(f"wrote {args.output} ({args.format})", file=out)
    else:
        # bounded preview only — never collect the full result
        for row in df.limit(args.show).collect():
            print(row.asDict(), file=out)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pro_etl_spark.query_cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("list", help="list registered queries")
    pl.add_argument(
        "--rows-only",
        action="store_true",
        help="show only queries without a value oracle",
    )
    pl.set_defaults(fn=cmd_list)

    pe = sub.add_parser("explain", help="print a query's physical plan")
    pe.add_argument("key")
    pe.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    pe.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )
    pe.set_defaults(fn=cmd_explain)

    pr = sub.add_parser("run", help="run a query (write or preview)")
    pr.add_argument("key")
    pr.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    pr.add_argument("--output", help="write result here instead of previewing")
    pr.add_argument(
        "--format", default="parquet", choices=["parquet", "csv", "json"]
    )
    pr.add_argument("--show", type=int, default=20, help="preview row cap")
    pr.set_defaults(fn=cmd_run)
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    if args.fn is cmd_list:
        return cmd_list(args)
    return args.fn(args, spark=spark)


if __name__ == "__main__":
    sys.exit(main())
