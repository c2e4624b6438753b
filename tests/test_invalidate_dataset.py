"""io.invalidate_dataset: the documented eviction point for per-
dataset model-state memos (ADVICE r8: the `_k_cells` count memo had
no invalidation — rewriting a dataset dir mid-session left Spark
training against the old corpus while the SQL oracle recomputed from
the new one)."""

import shutil

import pytest


@pytest.fixture()
def tmp_dataset(tmp_path):
    """A writable copy of the sf0.001 embeddings table (testdata is
    read-only; invalidation is only observable after a rewrite)."""
    d = tmp_path / "ds"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet",
                d / "embeddings.parquet")
    return str(d)


def test_k_cells_rewrite_needs_invalidate(spark, tmp_dataset):
    from pro_etl_spark import io as pio
    from pro_etl_spark.ops import similarity as sim

    k1 = sim._k_cells(spark, tmp_dataset)
    n1 = pio.load(spark, tmp_dataset, "embeddings").count()

    # rewrite the dir with half the rows — the memo must go stale
    # (documented), and invalidate_dataset must bring it current
    half = pio.load(spark, tmp_dataset, "embeddings").limit(max(n1 // 2, 1))
    pdf = half.toPandas()
    shutil.rmtree(tmp_dataset)
    import os

    os.makedirs(tmp_dataset)
    pdf.to_parquet(f"{tmp_dataset}/embeddings.parquet")

    assert sim._k_cells(spark, tmp_dataset) == k1, (
        "memo is per-(app, dataset) by design — stale until invalidated"
    )
    pio.invalidate_dataset(spark, tmp_dataset)
    k2 = sim._k_cells(spark, tmp_dataset)
    import math

    n2 = pio.load(spark, tmp_dataset, "embeddings").count()
    assert n2 == max(n1 // 2, 1)
    assert k2 == max(sim.K_CELLS, math.ceil(math.sqrt(n2)))


def test_invalidate_evicts_all_registered_memos(spark, tmp_dataset):
    """Every registered memo keyed on the dataset is evicted, and keys
    for OTHER datasets survive."""
    from pro_etl_spark import io as pio

    sentinel_other = ("appX", "/some/other/ds")
    for memo in pio.DATASET_MEMOS:
        memo[("appX", tmp_dataset)] = "stale"
        memo[("appX", tmp_dataset, "variant")] = "stale"
        memo[sentinel_other] = "keep"
    pio.invalidate_dataset(spark, tmp_dataset)
    for memo in pio.DATASET_MEMOS:
        assert ("appX", tmp_dataset) not in memo
        assert ("appX", tmp_dataset, "variant") not in memo
        assert memo.pop(sentinel_other) == "keep"


def test_memo_registry_covers_model_state_dicts():
    """The similarity model-state memos (the ADVICE r8 subjects) are
    registered for eviction."""
    from pro_etl_spark import io as pio
    from pro_etl_spark.ops import similarity as sim

    for memo in (sim._N_VEC_MEMO, sim._KM_CB_MEMO, sim._PQ_CB_MEMO,
                 sim._PCA_MODEL_MEMO):
        assert any(memo is m for m in pio.DATASET_MEMOS)


def test_view_memo_is_session_scoped(spark):
    """Temp views are SparkSession-scoped, so the register_views memo
    must track each session independently (ADVICE r10: an
    applicationId-keyed memo tracked only the LAST (app, sf_dir) pair,
    so invalidate could re-register views into the wrong session or
    skip a session whose views were stale)."""
    from pro_etl_spark import io as pio

    sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    s2 = spark.newSession()
    pio.register_views(spark, sf_a)
    pio.register_views(s2, sf_b)
    # both sessions tracked, each with its own dataset (the app-keyed
    # memo kept only s2's later registration)
    assert pio._REGISTERED_VIEWS[spark] == sf_a
    assert pio._REGISTERED_VIEWS[s2] == sf_b
    # each session's views resolve against ITS dataset
    n_a = spark.sql("SELECT count(*) AS n FROM events").collect()[0].n
    n_b = s2.sql("SELECT count(*) AS n FROM events").collect()[0].n
    assert (n_a, n_b) == (1000, 10000)
    # invalidating session 1's dataset re-registers session 1's views
    # (skipped under the app-keyed memo, which said sf_b) and leaves
    # session 2's registration untouched
    pio.invalidate_dataset(spark, sf_a)
    assert pio._REGISTERED_VIEWS[spark] == sf_a
    assert pio._REGISTERED_VIEWS[s2] == sf_b
    assert spark.sql("SELECT count(*) AS n FROM events").collect()[0].n == 1000


def test_substr_probe_memo_registered_for_eviction():
    """The decontaminate_substring probe memo (round 11) is dataset
    state like the similarity models: a rewritten dataset dir must not
    keep serving stale probes after invalidate_dataset."""
    import pro_etl_spark

    # load the full registry BEFORE touching ops.corpus: its composed
    # oracles read other modules' ORACLES entries at import time, so a
    # bare corpus import in a fresh process KeyErrors
    pro_etl_spark.get_queries()
    from pro_etl_spark import io as pio
    from pro_etl_spark.ops import corpus

    assert any(corpus._SUBSTR_PROBES_MEMO is m for m in pio.DATASET_MEMOS)
