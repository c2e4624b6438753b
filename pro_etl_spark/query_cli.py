"""Operational front door for the query library: list, explain, and
run any registered operator from the command line.

    python -m pro_etl_spark.query_cli list [--rows-only]
    python -m pro_etl_spark.query_cli explain <key> [--sf-dir D] [--mode M]
    python -m pro_etl_spark.query_cli run <key> [--sf-dir D]
        [--output PATH --format parquet|csv|json] [--show N]
    python -m pro_etl_spark.query_cli verify <key> [--sf-dir D]

The reference exposes exactly one hard-wired job (`python migrate.py`,
/root/reference/migrate.py:308); this CLI generalizes that entry point
over the whole operator library, in the plan-first shape Spark work
should be reviewed in: `explain` prints the formatted physical plan
(what a reviewer checks for pushdown/broadcast/shuffle posture) without
executing anything, and `run` either writes distributed output
(df.write, no driver materialization) or shows a bounded preview.
`verify` replays the driver's correctness gate for one key on demand:
it runs the Spark query AND its DuckDB oracle side by side and
compares row count, schema, and the order-insensitive value hash —
the self-serve proof a user reaches for before trusting an operator
on their own data.
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


def _canon(v) -> str:
    """Canonicalize one value exactly like the round driver's hash
    recipe (NULL/bool/float %.6g/isoformat/sorted structs)."""
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if isinstance(v, bool):
        return "true" if v else "false"
    try:
        if v != v:  # pandas NaN/NaT == SQL NULL
            return "NULL"
    except Exception:
        pass
    if isinstance(v, float):
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        if len(s) >= 19 and s[10:19] == "T00:00:00":
            return s[:10]
        return s[:19]
    if hasattr(v, "asDict"):
        return "{" + ",".join(
            f"{k}:{_canon(x)}" for k, x in sorted(v.asDict().items())
        ) + "}"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{_canon(x)}" for k, x in sorted(v.items())
        ) + "}"
    return str(v)


def _hash_rows(cols, rows) -> str:
    import hashlib

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in idx) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def cmd_verify(args, spark=None, out=None) -> int:
    out = out or sys.stdout
    import pro_etl_spark

    queries = pro_etl_spark.get_queries()
    oracles = pro_etl_spark.get_oracles()
    if args.key not in queries:
        print(f"unknown query {args.key!r} (see `list`)", file=sys.stderr)
        return 2
    if args.key not in oracles:
        print(f"{args.key}: rows-only query (no value oracle registered)",
              file=out)
        spark = spark or _get_spark()
        n = queries[args.key](spark, args.sf_dir).count()
        print(f"{args.key}: ran, {n} rows", file=out)
        return 0
    import duckdb

    spark = spark or _get_spark()
    sdf = queries[args.key](spark, args.sf_dir)
    scols = [f.name.lower() for f in sdf.schema.fields]
    srows = sdf.collect()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    # pandas .df() path — the driver's oracle materialization
    odf = con.execute(oracles[args.key]).df()
    ocols = [c.lower() for c in odf.columns]
    orows = list(odf.itertuples(index=False, name=None))
    rows_ok = len(srows) == len(orows)
    schema_ok = sorted(scols) == sorted(ocols)
    hash_ok = _hash_rows(scols, srows) == _hash_rows(ocols, orows)
    print(
        f"{args.key}: rows {len(srows)} vs {len(orows)} "
        f"({'ok' if rows_ok else 'MISMATCH'}), "
        f"schema {'ok' if schema_ok else 'MISMATCH ' + str(sorted(ocols))}, "
        f"value-hash {'ok' if hash_ok else 'MISMATCH'}",
        file=out,
    )
    return 0 if (rows_ok and schema_ok and hash_ok) else 1


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

    pv = sub.add_parser(
        "verify", help="run a query against its DuckDB oracle and compare"
    )
    pv.add_argument("key")
    pv.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    pv.set_defaults(fn=cmd_verify)
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    if args.fn is cmd_list:
        return cmd_list(args)
    return args.fn(args, spark=spark)


if __name__ == "__main__":
    sys.exit(main())
