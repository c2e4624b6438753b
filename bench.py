"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is executed to completion with a cheap terminal action
(count via write-nothing foreach-free plan: df.count() after the full
plan — aggregates/limits keep results tiny, so count() forces all
work without driver materialization of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "agg_multi_measure",
    "join_sortmerge",
    "join_broadcast_inner",
    "window_running_sum",
    "join_asof",
    "migration_reconciliation",
    "stream_tumbling",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk",
    "text_quality",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pro_etl_spark.session import get_spark
    import pro_etl_spark

    spark = get_spark("pro_etl_spark-bench")
    queries = pro_etl_spark.get_queries()

    # warm the JVM + parquet footers once (not timed)
    queries["agg_count"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
