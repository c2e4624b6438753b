"""Capture `.explain("formatted")` for named registered queries into
plans/<tag>/<key>_<suffix>.txt — the before/after plan artifacts the
optimization rounds commit next to OPTIMIZATION_r*.md.

Usage:
    python scripts/capture_plans.py SUFFIX KEY [KEY ...]
    python scripts/capture_plans.py SUFFIX --all

SUFFIX is typically "before" or "after"; the output dir is
plans/r12/ (override with PLANS_DIR). Plans are built at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) so scan-node
statistics (PushedFilters / ReadSchema) match the bench scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    out_dir = os.environ.get("PLANS_DIR", "plans/r12")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from pro_etl_spark.session import get_spark
    import pro_etl_spark

    spark = get_spark("plan-capture")
    qs = pro_etl_spark.get_queries()
    if keys == ["--all"]:
        keys = sorted(qs)
    import contextlib
    import io

    for k in keys:
        df = qs[k](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_exch = txt.count("Exchange")
        n_py = sum(txt.count(t) for t in ("BatchEvalPython", "ArrowEvalPython"))
        print(f"{k}: {len(txt)} B, Exchange x{n_exch}, PyEval x{n_py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
