"""The operational CLI (list / explain / run) over the query registry."""

from __future__ import annotations

import io
import os

from pro_etl_spark import query_cli


def run_cli(argv, spark=None):
    out = io.StringIO()
    import contextlib

    with contextlib.redirect_stdout(out):
        rc = query_cli.main(argv, spark=spark)
    return rc, out.getvalue()


def test_list_names_every_registered_query():
    rc, out = run_cli(["list"])
    assert rc == 0
    rows = [l.split("\t") for l in out.strip().splitlines()]
    lines = {r[0]: r[1] for r in rows}
    assert lines["migration_reconciliation"] == "oracle"
    assert lines["fn_uuid"] == "rows-only"
    assert len(lines) >= 180
    # the quadratic exactness baselines must be marked so nobody picks
    # them over their scale-safe twins by accident
    marked = {r[0]: r[2] for r in rows if len(r) > 2}
    for k, twin in {
        "dedup_ngram_jaccard": "dedup_minhash_lsh",
        "dedup_simhash_pairs": "dedup_simhash_lsh",
        "dedup_embedding_cosine": "dedup_embedding_cosine_ivf",
    }.items():
        assert "not a production path" in marked[k]
        assert twin in marked[k]


def test_explain_shows_pushdown(spark):
    rc, out = run_cli(["explain", "filter_eq"], spark=spark)
    assert rc == 0
    assert "PushedFilters" in out


def test_explain_unknown_key_errors(spark):
    rc, _ = run_cli(["explain", "no_such_query"], spark=spark)
    assert rc == 2


def test_run_preview_and_write(spark, tmp_path):
    rc, out = run_cli(["run", "agg_groupby_count", "--show", "3"], spark=spark)
    assert rc == 0
    assert out.count("\n") <= 3

    dest = os.path.join(tmp_path, "out_parquet")
    rc, out = run_cli(["run", "agg_groupby_count", "--output", dest], spark=spark)
    assert rc == 0
    back = spark.read.parquet(dest)
    assert back.count() > 0


def test_verify_matches_oracle(spark):
    rc, out = run_cli(["verify", "agg_groupby_count"], spark=spark)
    assert rc == 0
    assert "value-hash ok" in out


def test_verify_rows_only_key(spark):
    rc, out = run_cli(["verify", "fn_uuid"], spark=spark)
    assert rc == 0
    assert "rows-only" in out
