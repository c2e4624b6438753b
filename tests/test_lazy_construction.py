"""Plan construction is declarative: constructing a registered query
fires ZERO Spark jobs (VERDICT r8 #5). scripts/lazy_audit.py audits
the full registry per round against its justified ALLOWED list; this
test pins the contract on a cross-family sample — fast enough for the
default suite — plus the specific constructions fixed in round 9
(driver-side count in events_markov_stationary, cursor collect in
scan_pagination_keyset, footer-inference jobs on every io.load).

Protocol mirrors the audit: first construction warms per-session
state (schema memos, trained model state), the SECOND construction
must submit no jobs (counted via a per-query job group)."""

import pytest

SF = "/root/testdata/sf0.001"

#: one or more keys per operator family, all required to construct
#: with zero jobs once session state is warm
SAMPLE = [
    # relational core
    "filter_eq",
    "join_broadcast_inner",
    "join_asof",
    "agg_rollup",
    "window_rank",
    "topk_orderby_limit",
    "set_union",
    # scalars / nested
    "fn_json",
    "arr_transform",
    # UDF surface (construction only — execution is the Python path)
    "udf_grouped_map",
    "udf_scalar",
    # text / dedup / similarity (incl. trained-model consumers whose
    # training collect is memoized per session)
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_cosine_topk",
    "ann_ivf_kmeans_topk",
    "dedup_embedding_srp",
    # SQL API (the _views re-registration path)
    "sql_pricing_summary",
    "sql_shipping_priority",
    # round-9 laziness fixes
    "events_markov_stationary",
    "scan_pagination_keyset",
    # cdc / analytics
    "merge_scd1",
    "events_ohlc",
    # multimodal (the let-bound in-row DCT pipelines)
    "mm_phash",
    "mm_dhash",
]


@pytest.fixture(scope="module")
def queries():
    import pro_etl_spark

    return pro_etl_spark.get_queries()


def _jobs_during_second_construction(spark, fn, name):
    sc = spark.sparkContext
    fn(spark, SF)  # warm: schema memos, model state, fixtures
    group = f"lazy-test::{name}"
    sc.setJobGroup(group, name)
    try:
        fn(spark, SF)
    finally:
        sc.setJobGroup("lazy-test::idle", "")
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_sample_constructions_fire_zero_jobs(spark, queries):
    failures = {}
    for name in SAMPLE:
        n = _jobs_during_second_construction(spark, queries[name], name)
        if n:
            failures[name] = n
    assert not failures, (
        f"constructions submitted Spark jobs: {failures} — an eager "
        "action leaked into plan construction (see scripts/"
        "lazy_audit.py for the registry-wide audit + allowlist)"
    )


def test_memoized_load_skips_schema_inference(spark):
    """Second io.load of the same table reads the memoized schema —
    no footer-inference job."""
    from pro_etl_spark.io import load

    sc = spark.sparkContext
    for t in ("orders", "events"):
        load(spark, SF, t)
    sc.setJobGroup("lazy-load", "")
    try:
        load(spark, SF, "orders")
        load(spark, SF, "events")
    finally:
        sc.setJobGroup("lazy-test::idle", "")
    assert len(sc.statusTracker().getJobIdsForGroup("lazy-load")) == 0


def test_lazy_audit_allowlist_keys_are_registered():
    """Every ALLOWED entry in the audit names a real registry key
    (catches drift when operators are renamed)."""
    import pro_etl_spark
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "lazy_audit",
        Path(__file__).resolve().parents[1] / "scripts" / "lazy_audit.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = pro_etl_spark.get_queries()
    unknown = sorted(set(mod.ALLOWED) - set(qs))
    assert not unknown, f"ALLOWED names unknown queries: {unknown}"
