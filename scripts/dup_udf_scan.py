"""Duplicated Python-UDF sweep: construct every registered query and
flag plans carrying MORE THAN ONE Python-evaluation node of the same
family (ArrowEvalPython / BatchEvalPython / MapInPandas /
FlatMapGroupsInPandas).

Why this is its own gate: a Python UDF that appears twice in one plan
usually means one of two silent 2× hazards the round-10 session
measured —
- ExtractPythonUDFs can leave a DEAD duplicate node below a Generate
  when the UDF output is staged as a named column before an explode
  (text_winnow: the dead ArrowEvalPython still evaluated per batch);
- two consumers that prune different columns from the same expensive
  frame defeat ReusedExchange and recompute the UDF upstream
  (mm_phash_near_dup's census vs member-collect: 29 s vs 10 s at 10×).

A flagged (query, count) pair is a failure unless listed in ALLOWED
with a justification (e.g. the UDF legitimately sits inside a cached
InMemoryRelation whose plan text repeats when the cache is read
twice — the cache executes once).

Usage: python scripts/dup_udf_scan.py [SF_DIR]
Exit 1 on unallowed findings.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: name -> (per-node-family max allowed count, justification). The
#: allowance pins the EXPECTED counts, not just the name: if an
#: allowed query later regresses past its justified count (a genuine
#: recompute — the exact hazard this gate exists for), it fails the
#: sweep again instead of hiding behind its old entry.
ALLOWED = {
    "mm_phash_near_dup": (
        {"ArrowEvalPython": 2},
        "the capped bucket table is a bounded .cache() read by the "
        "census and candidate consumers; the pHash UDF prints inside "
        "each InMemoryRelation's cached-plan text but executes once "
        "(cache fill) — measured 10.5 s warm at 10×, vs 29 s when the "
        "subtrees really did recompute",
    ),
}

NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import pro_etl_spark
    from pro_etl_spark.session import get_spark

    spark = get_spark("dup-udf-scan")
    qs = pro_etl_spark.get_queries()
    findings = {}
    for name in sorted(qs):
        try:
            p = (
                qs[name](spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            findings[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
            continue
        counts = {n: p.count(n) for n in NODES if p.count(n) > 1}
        allowance = ALLOWED.get(name, (None,))[0] or {}
        excess = {
            n: c for n, c in counts.items() if c > allowance.get(n, 1)
        }
        if excess:
            findings[name] = excess
        print(json.dumps({name: counts or "clean"}), flush=True)
    print(
        f"\n{len(qs) - len(findings)}/{len(qs)} clean, "
        f"{len(findings)} flagged ({len(ALLOWED)} allowed)",
        file=sys.stderr,
    )
    for k, v in findings.items():
        print(f"  {k}: {v}", file=sys.stderr)
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
