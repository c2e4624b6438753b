"""Accuracy bounds for the approximate-sketch operators (rows-only in
the driver contract — their values are estimates, so the check lives
here: sketch vs exact within the sketch's configured error)."""

from __future__ import annotations

import pro_etl_spark

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_rsd(spark):
    """High-cardinality HLL regime (o_custkey — the registered query
    runs the sketch in its exact low-cardinality regime so it can be
    oracle-paired): estimate within 3× the configured 2% rsd."""
    import pyspark.sql.functions as F

    o = spark.read.parquet(f"{SF}/orders.parquet")
    rows = (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
            F.countDistinct("o_custkey").alias("exact_custs"),
        )
        .collect()
    )
    for r in rows:
        assert r.exact_custs > 0
        rel_err = abs(r.approx_custs - r.exact_custs) / r.exact_custs
        assert rel_err <= 0.06, (r.o_orderstatus, rel_err)  # 3× the 2% rsd


def test_approx_distinct_exact_regime_matches(spark):
    """The registered query's exact-regime claim: the sketch value
    must EQUAL the exact count at test scale (sparse linear counting,
    cardinality far below the ~3k sparse threshold)."""
    q = pro_etl_spark.get_queries()["agg_approx_distinct"]
    rows = q(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.approx_priorities == r.exact_priorities, r


def test_approx_percentile_close_to_exact(spark):
    """Estimation regime (bounded accuracy=1000 — the registered query
    runs the sketch in its exact accuracy≥n regime so it can be
    oracle-paired): estimate within 5% of exact."""
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("a50"),
            F.expr("approx_percentile(l_extendedprice, 0.95, 1000)").alias("a95"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("e95"),
        )
        .collect()
    )
    for r in rows:
        for approx, exact in ((r.a50, r.e50), (r.a95, r.e95)):
            assert abs(approx - exact) / max(abs(exact), 1e-9) <= 0.05, (
                r.l_returnflag,
                approx,
                exact,
            )


def test_approx_percentile_exact_regime_matches(spark):
    """The registered query's exact-regime claim: with accuracy ≥ the
    group row count, the GK sketch answer must EQUAL the discrete
    percentile."""
    q = pro_etl_spark.get_queries()["agg_approx_percentile"]
    rows = q(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.approx_p50 == r.exact_p50, r
        assert r.approx_p95 == r.exact_p95, r


def test_approx_percentile_accuracy_covers_sf(spark):
    """Loud scale-pin for agg_approx_percentile's oracle pairing: the
    GK sketch is only value-exact while accuracy=1,000,000 >= every
    group's row count. If the graded scale factor ever grows past that
    (~sf3 for the largest l_returnflag group), this test fails loudly
    instead of the driver red-rowing a silent estimation-mode drift."""
    import os

    import pyspark.sql.functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    max_group = (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert max_group < 1_000_000, (
        "agg_approx_percentile's accuracy=1000000 no longer covers the "
        f"largest l_returnflag group ({max_group} rows) — raise the "
        "accuracy or re-derive the oracle before grading at this scale"
    )


def test_clusters_invariants(spark):
    """Property checks on dedup_clusters beyond the oracle: labels are
    component minima, survivors are unique per cluster, and every
    clustered doc appears in some near-dup pair."""
    qs = pro_etl_spark.get_queries()
    clusters = qs["dedup_clusters"](spark, SF).collect()
    pairs = qs["dedup_minhash_lsh"](spark, SF).collect()
    in_pairs = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    by_cluster: dict[int, list] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r)
        assert r.doc_id in in_pairs
    for cid, members in by_cluster.items():
        ids = {m.doc_id for m in members}
        assert cid == min(ids), "cluster id is the component minimum"
        assert sum(m.is_survivor for m in members) == 1


def test_ivf_multiprobe_recall_monotone(spark):
    """Recall vs brute force is monotone in the probed candidate set:
    multi-probe (query cell + 8 neighbors) can only recover MORE of the
    true top-k than single-probe, never less — each true neighbor found
    in the probed set ranks within the probed top-k."""
    qs = pro_etl_spark.get_queries()
    brute = {(r.query_id, r.neighbor_id) for r in qs["ann_cosine_topk"](spark, SF).collect()}
    single = {(r.query_id, r.neighbor_id) for r in qs["ann_ivf_topk"](spark, SF).collect()}
    multi = {(r.query_id, r.neighbor_id) for r in qs["ann_ivf_multiprobe"](spark, SF).collect()}
    assert single & brute <= multi & brute
    assert len(multi & brute) >= len(single & brute)


def test_kmeans_cells_partition_and_improve(spark):
    """The one-Lloyd-iteration quantizer is a true partition (every
    vector in exactly one of ≤K cells) and every kmeans-blocked
    near-dup pair really is a same-cell pair above the τ used."""
    from pro_etl_spark.ops.similarity import (
        IVF_COSINE_THRESHOLD,
        _k_cells,
    )

    qs = pro_etl_spark.get_queries()
    assign = qs["ivf_kmeans_assign"](spark, SF).collect()
    cells = {r.vec_id: r.cell for r in assign}
    assert len(cells) == len(assign), "each vector assigned exactly once"
    # nlist scales with the corpus (max(8, ceil(sqrt(N))) — the
    # round-8 scale fix), so bound by the trained cell count
    assert len(set(cells.values())) <= _k_cells(spark, SF)
    assert all(r.dist >= 0 for r in assign)
    pairs = qs["dedup_embedding_kmeans"](spark, SF).collect()
    for r in pairs:
        assert cells[r.vec_a] == cells[r.vec_b]
        assert r.cosine >= IVF_COSINE_THRESHOLD - 1e-6
    topk = qs["ann_ivf_kmeans_topk"](spark, SF).collect()
    assert topk, "kmeans cells are populated enough to return neighbors"
    for r in topk:
        assert cells[r.query_id] == cells[r.neighbor_id]
    # multi-probe recall is monotone vs single-probe, same as the grid
    brute = {(r.query_id, r.neighbor_id) for r in qs["ann_cosine_topk"](spark, SF).collect()}
    single = {(r.query_id, r.neighbor_id) for r in topk}
    multi = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_ivf_kmeans_multiprobe"](spark, SF).collect()
    }
    assert len(multi & brute) >= len(single & brute)


def test_simhash_lsh_covers_blocked_pairs(spark):
    """Pigeonhole completeness of Hamming-LSH: Hamming <= 3 over 4
    chunks means at least one chunk matches exactly, so (absent bucket
    caps, which this corpus does not trip) the unblocked LSH pair set
    must contain every source-blocked exact pair."""
    qs = pro_etl_spark.get_queries()
    lsh = {(r.doc_a, r.doc_b) for r in qs["dedup_simhash_lsh"](spark, SF).collect()}
    blocked = {(r.doc_a, r.doc_b) for r in qs["dedup_simhash_pairs"](spark, SF).collect()}
    assert blocked <= lsh


def test_pagerank_mass_and_positivity(spark):
    """Rank mass is conserved (no dangling nodes in an undirected
    graph, so total rank stays 1 after every damped round) and every
    participating document gets positive rank."""
    rows = pro_etl_spark.get_queries()["graph_pagerank"](spark, SF).collect()
    assert rows
    assert abs(sum(r.pagerank for r in rows) - 1.0) < 1e-3
    assert all(r.pagerank > 0 for r in rows)


def test_hll_merge_equals_direct_and_bounds_error(spark):
    """DataSketches HLL: union of per-day sketches must equal the
    single-pass sketch bit-for-bit (same lgK, deterministic registers),
    and — the exact-regime guard the value oracle rests on — the
    estimate must EQUAL the exact count at test SFs (HLL_LGK, pinned
    at 16 in relational_ext.py precisely because lgK=14 starts
    deviating near ~2.4k distinct, keeps the sketch in its exact
    sparse regime at these cardinalities; if a data change ever exits
    the regime, this fails loudly and the oracle must be revisited)."""
    from pro_etl_spark.ops.relational_ext import HLL_LGK

    assert HLL_LGK == 16  # the regime this guard documents
    rows = pro_etl_spark.get_queries()["agg_hll_merge"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["est_merged"] == r["est_direct"]
        assert r["est_merged"] == r["exact_users"]


def test_ppjoin_contains_every_blocked_baseline_pair(spark):
    """Prefix filtering's zero-false-negative guarantee: every pair
    the blocked-quadratic exact baseline finds (same-source blocks)
    must appear in dedup_ppjoin_prefix's GLOBAL exact join, with the
    identical Jaccard value."""
    from pro_etl_spark.ops.dedup import PPJOIN_MOD, PPJOIN_TAU

    qs = pro_etl_spark.get_queries()
    base = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in qs["dedup_ngram_jaccard"](spark, SF).collect()
        if r.jaccard >= PPJOIN_TAU
        and r.doc_a % PPJOIN_MOD == 0
        and r.doc_b % PPJOIN_MOD == 0
    }
    pp = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in qs["dedup_ppjoin_prefix"](spark, SF).collect()
    }
    missing = set(base) - set(pp)
    assert not missing, f"false negatives: {sorted(missing)[:5]}"
    for k, v in base.items():
        assert pp[k] == v, (k, v, pp[k])


def test_leakage_safe_split_never_straddles_a_dup_pair(spark):
    """split_leakage_safe's structural invariant: both endpoints of
    every verified LSH near-dup pair land in the SAME split."""
    import pyspark.sql.functions as F

    qs = pro_etl_spark.get_queries()  # load_all first: fixed import order
    from pro_etl_spark.ops.dedup import dedup_clusters
    from pro_etl_spark.ops.hashing import hash60
    pairs = qs["dedup_minhash_lsh"](spark, SF).select("doc_a", "doc_b")
    labels = dedup_clusters(spark, SF).select("doc_id", "cluster_id")

    def split_of(col):
        unit = F.coalesce(F.col("cluster_id"), F.col(col))
        return F.when(
            hash60(F.concat(unit.cast("string"), F.lit(":leak"))) % 100
            < 90,
            "train",
        ).otherwise("test")

    a = pairs.join(
        labels, pairs.doc_a == labels.doc_id, "left"
    ).select("doc_a", "doc_b", split_of("doc_a").alias("sa"))
    b = a.join(
        labels.withColumnRenamed("doc_id", "doc_b2"),
        a.doc_b == F.col("doc_b2"),
        "left",
    ).select("doc_a", "doc_b", "sa", split_of("doc_b").alias("sb"))
    straddles = b.where(F.col("sa") != F.col("sb")).count()
    assert straddles == 0


def test_srp_lsh_recall_vs_brute_force(spark):
    """dedup_embedding_srp recall against the exact all-pairs cosine
    ground truth at test scale: the banded hyperplane math predicts
    ~45% recall at the threshold boundary and higher above it — pin a
    conservative floor so a hyperplane/banding regression (e.g. a
    broken sign fold) fails loudly, and require perfect precision
    (every emitted pair must be a true pair — the exact verify
    guarantees it)."""
    import duckdb

    from pro_etl_spark.ops.similarity import IVF_COSINE_THRESHOLD

    qs = pro_etl_spark.get_queries()
    got = {
        (r.vec_a, r.vec_b)
        for r in qs["dedup_embedding_srp"](spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    dot = """list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(range(1, 65),
          i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
        (acc, v) -> acc + v)"""
    truth = {
        (r[0], r[1])
        for r in con.execute(f"""
        WITH e AS (
          SELECT vec_id, embedding,
                 sqrt({dot.format(a='embedding', b='embedding')}) AS nrm
          FROM embeddings
        )
        SELECT a.vec_id, b.vec_id
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {dot.format(a='a.embedding', b='b.embedding')}
              / (a.nrm * b.nrm) >= {IVF_COSINE_THRESHOLD}
        """).fetchall()
    }
    assert got <= truth, f"false positives: {sorted(got - truth)[:5]}"
    if truth:
        recall = len(got & truth) / len(truth)
        assert recall >= 0.25, (recall, len(truth))


def test_cert_sample_exhaustive_below_threshold_and_deterministic(spark):
    """The certification-sample gate (round 10) must be a NO-OP at and
    below CERT_SAMPLE_N rows — the grading (sf0.01) and bench (sf0.1)
    scales certify exhaustively, so every official green row for the
    eval keys keeps its meaning — and the sampled set must be a pure
    function of the ids (salted-hash, never rand()): two constructions
    agree row-for-row."""
    from pro_etl_spark.io import load
    from pro_etl_spark.ops.dedup import CERT_SAMPLE_N, _cert_sample

    docs = load(spark, SF, "documents").select("doc_id")
    n = docs.count()
    assert n <= CERT_SAMPLE_N, "fixture outgrew the exhaustive window"
    s1 = {r.doc_id for r in _cert_sample(spark, SF, docs, "doc_id", "documents").collect()}
    s2 = {r.doc_id for r in _cert_sample(spark, SF, docs, "doc_id", "documents").collect()}
    assert s1 == {r.doc_id for r in docs.collect()}
    assert s1 == s2


def test_profile_columns_approx_variant_matches_exact_and_drops_expand(spark):
    """The 100 TB profile variant (``profile_columns(..., approx=True)``,
    VERDICT r10 #7): DataSketches-HLL distinct counts must EQUAL the
    exact profile at THIS suite's SF (sf0.001, every column ≤ 1500
    distinct — the coupon estimator starts deviating ~2k, measured at
    sf0.01: 2399 → 2385), and the plan must lose the Expand node the
    5-way exact COUNT(DISTINCT) needs — the whole point of the trade."""
    from pro_etl_spark.ops.analytics import profile_columns

    exact_df = profile_columns(spark, SF)
    approx_df = profile_columns(spark, SF, approx=True)
    exact = {r.col: r.asDict() for r in exact_df.collect()}
    approx = {r.col: r.asDict() for r in approx_df.collect()}
    assert exact == approx
    exact_plan = exact_df._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
