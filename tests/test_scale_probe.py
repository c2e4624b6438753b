"""Opt-in scale-growth gate (`pytest -m scaleprobe`): measure each
probe family at 1× (sf0.1) and 10× (the amplified
/tmp/testdata_sf1 layout from scripts/make_scale_probe.py) and FAIL
when the growth factor exceeds the family's ceiling — so the next
quadratic blocking regression fails a test instead of needing a judge
to read SCALEPROBE.json.

Why growth factors, not absolute times: the probe machine is shared
and absolute seconds drift ±25%; the RATIO between the 1× and 10×
runs of the same key in the same session is what separates O(N·logN)
from Θ(N²). Ceilings are deliberately loose (a 10× input may honestly
cost ~20-30× when a log factor, densified LSH buckets, or extra
k-means cells kick in); the round-7 quadratics they exist to catch
measured 70-130× growth.

Not in the default run: the 10× layout takes minutes and lives in
/tmp. Build it first:

    python scripts/make_scale_probe.py   # sf0.1 -> /tmp/testdata_sf1
    python -m pytest tests/test_scale_probe.py -m scaleprobe -v
"""

from __future__ import annotations

import os
import time

import pytest

import pro_etl_spark

SF1X = "/root/testdata/sf0.1"
SF10X = os.environ.get("PRO_ETL_PROBE_DIR", "/tmp/testdata_sf1")

#: (key, max growth factor at 10× input). The embedding-blocking trio
#: was the round-7 finding (measured 70-130× with K_CELLS pinned and
#: 4-bit SRP bands; fixed in round 8 to corpus-scaled nlist and 8-bit
#: capped bands). Floor of 2 s on the 1× time keeps sub-second noise
#: from fabricating ratios.
FAMILIES = [
    ("dedup_exact", 30.0),
    ("dedup_minhash_lsh", 30.0),
    ("dedup_minhash_shingle_lsh", 30.0),
    ("dedup_simhash_lsh", 30.0),
    ("dedup_embedding_kmeans", 30.0),
    ("dedup_semantic_keep", 30.0),
    ("dedup_embedding_srp", 30.0),
    ("decontaminate_substring", 30.0),
    ("graph_pagerank", 30.0),
    ("graph_kcore", 30.0),
    ("pipeline_data_funnel", 30.0),
    ("text_cooccurrence", 30.0),
    # round 9: the amplified layout now carries the TPC-H star +
    # events (make_scale_probe.py re-keys names so prefix-blocked
    # joins see realistic block sizes), so the join/window/SQL
    # families get gates too; mm_phash pins the Arrow-UDF DCT form.
    ("join_fuzzy", 30.0),
    ("join_sortmerge", 30.0),
    ("join_range_binned", 30.0),
    ("window_running_sum", 30.0),
    ("sql_pricing_summary", 30.0),
    ("sql_product_profit", 30.0),
    ("sessionize", 30.0),
    ("retention_cohorts", 30.0),
    ("agg_corr_matrix", 30.0),
    ("mm_phash", 30.0),
    ("mm_phash_near_dup", 30.0),
    ("events_ohlc", 30.0),
    ("text_dedup_intra_span", 30.0),
    # round 10: the grid-blocked embedding family moved to a
    # corpus-adaptive pitch (occupied cells ≈ √N) — SCALEPROBE_r9's
    # worst key (257 s at 10×, Θ(N²/C) with the old fixed pitch)
    # measured 22 s after the fix; gate it so the pitch never goes
    # constant again.
    ("dedup_embedding_cosine_ivf", 30.0),
    ("ann_ivf_topk", 30.0),
    # round 10: the recall-certification keys' exact truth baselines
    # sample above CERT_SAMPLE_N rows (dedup._cert_sample) — gate
    # them so the certification itself keeps scaling.
    ("dedup_ngram_jaccard", 30.0),
    ("dedup_lsh_eval", 30.0),
    ("dedup_shingle_lsh_eval", 30.0),
    ("dedup_srp_eval", 30.0),
    ("dedup_embedding_cosine", 30.0),
    # round 11: pin the SCALEPROBE_r10 top-of-table keys' claimed
    # linearity (they replaced the fixed quadratics at the top of the
    # probe): the enveloped XML sink (executor-side render + driver
    # envelope concat, both linear), power-iteration PCA (driver loop
    # of narrow matrix-fold rounds), and the contamination report
    # (broadcast eval shingles past the corpus).
    ("sink_xml", 30.0),
    ("pca_power_top2", 30.0),
    ("corpus_contamination_report", 30.0),
    # round 11 second batch: the rest of the SCALEPROBE_r11 top —
    # power iteration's other key, the two per-group Python API
    # surfaces (linear in group count by construction; the gate pins
    # that no pre-join blowup or per-row path sneaks in), the VAD
    # island windows over the audio frames, and the composed dedup
    # cascade census.
    ("pca_power_top1", 30.0),
    ("udf_grouped_map", 30.0),
    ("udf_cogrouped_map", 30.0),
    ("mm_audio_vad_segments", 30.0),
    ("dedup_cascade_census", 30.0),
]

pytestmark = pytest.mark.scaleprobe


@pytest.fixture(scope="module")
def probe_ready():
    if not (
        os.path.exists(f"{SF10X}/documents.parquet")
        and os.path.exists(f"{SF10X}/embeddings.parquet")
    ):
        pytest.skip(
            f"{SF10X} missing — run scripts/make_scale_probe.py first"
        )


def _run(spark, name: str, d: str) -> float:
    fn = pro_etl_spark.get_queries()[name]
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


@pytest.mark.parametrize("name,ceiling", FAMILIES)
def test_growth_factor(spark, probe_ready, name, ceiling):
    t1 = _run(spark, name, SF1X)
    t10 = _run(spark, name, SF10X)
    base = max(t1, 2.0)  # noise floor: don't ratio against <2 s
    growth = t10 / base
    assert growth <= ceiling, (
        f"{name}: {t1:.1f}s at 1× -> {t10:.1f}s at 10× "
        f"(growth {growth:.1f}× > ceiling {ceiling}×) — check the "
        f"blocking/bucketing config for quadratic candidate generation"
    )


def test_sampled_certification_still_certifies_at_10x(spark, probe_ready):
    """The round-10 sampled-certification regime must still produce a
    MEANINGFUL certificate above CERT_SAMPLE_N rows: at the 10× layout
    the truth sample is non-empty (the estimator has support), recall
    stays a valid probability, and the LSH side still reports its
    cross-block extras — i.e. sampling made the certification cheap,
    not vacuous."""
    import pro_etl_spark

    qs = pro_etl_spark.get_queries()
    for key in ("dedup_lsh_eval", "dedup_shingle_lsh_eval", "dedup_srp_eval"):
        row = qs[key](spark, SF10X).collect()[0]
        assert row.n_truth > 0, (key, "empty sampled truth set")
        assert 0.0 <= row.recall <= 1.0, (key, row.recall)
        assert row.n_hit <= row.n_truth, (key, row.n_hit, row.n_truth)
