"""Guard against grading-dtype artifacts in oracle SQL.

The driver materializes each oracle through DuckDB's pandas ``.df()``
path, where HUGEINT (DuckDB's SUM(BIGINT) result type) and nullable
integer columns downcast to float64; its canonicalizer then formats
floats as ``%.6g``, so an exact integer like 2480770000 renders as
``2.48077e+09`` while Spark's int64 prints full digits — a hash
mismatch with value-identical results. This bit ``stream_running_totals``
for two official rounds (red rows in CORRECTNESS_r03/r04) because the
in-repo mimic fetched via ``fetchall()`` (exact Python ints) and never
saw it.

These tests render every oracle through BOTH fetch paths with the
driver's canonicalization recipe and assert the renderings agree, so
any oracle whose pandas materialization changes a value's rendered form
fails locally before the driver ever sees it.
"""

from __future__ import annotations

import pytest

import pro_etl_spark
from tests.conftest import SF_ORACLE, tier

ORACLES = pro_etl_spark.get_oracles()


def _canon(v):
    """The driver's value-rendering recipe (mirrors
    .claude/skills/verify/drive_driver_contract.py:canon)."""
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if isinstance(v, bool):
        return "true" if v else "false"
    try:
        if v != v:  # NaN/NaT == SQL NULL
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
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _render_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", [tier(n) for n in sorted(ORACLES)])
def test_pandas_path_rendering_stable(name, duck):
    """fetchall() (exact) and .df() (pandas, the driver's path) must
    render identically under the driver's recipe — i.e. no oracle may
    emit a column whose pandas dtype changes its hashed form."""
    rel = duck.execute(ORACLES[name])
    exact_rows = rel.fetchall()
    cols = [d[0] for d in rel.description]
    pdf = duck.execute(ORACLES[name]).df()
    pandas_rows = list(pdf.itertuples(index=False, name=None))
    assert _render_multiset(cols, exact_rows) == _render_multiset(
        [c for c in pdf.columns], pandas_rows
    ), f"{name}: pandas materialization changes rendered values"


#: Spark integral types whose oracle twin must NOT materialize as
#: float64 through the driver's pandas path (int-vs-float renders
#: differently in the official driver — proven by `sessionize` failing
#: officially at identical values while passing the %.6g-based mimic)
_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


@pytest.mark.parametrize("name", [tier(n) for n in sorted(ORACLES)])
def test_oracle_pandas_dtype_matches_spark_family(name, spark, duck):
    """Dtype-strict guard: for every oracle-paired query, the pandas
    dtype of each oracle column must be in the same int/float family as
    the Spark output schema column. The rendering-based test above is
    provably blind to small integer-valued floats (83.0 vs 83 both
    canonicalize to '83' under %.6g), yet the official driver
    hash-mismatches them — so the guard must be dtype-based. Fix
    recipe: NULL-free integral column → outer CAST(... AS BIGINT) in
    the oracle; nullable integral column → cast BOTH sides to DOUBLE
    (pandas forces float64 on nullable ints, no SQL cast can prevent
    it)."""
    from pro_etl_spark import QUERIES as _Q

    pdf = duck.execute(ORACLES[name]).df()
    stypes = {
        f.name.lower(): f.dataType.simpleString()
        for f in _Q[name](spark, SF_ORACLE).schema.fields
    }
    bombs = []
    for col in pdf.columns:
        pd_t = str(pdf.dtypes[col])
        s_t = stypes.get(col.lower())
        if pd_t.startswith("float") and s_t in _INTEGRAL:
            bombs.append((col, pd_t, s_t))
        if pd_t.startswith("int") and s_t in ("float", "double"):
            bombs.append((col, pd_t, s_t))
    assert not bombs, (
        f"{name}: oracle pandas dtype vs Spark schema family split "
        f"(col, pandas, spark): {bombs}"
    )


def test_running_totals_oracle_stays_integer(duck):
    """Regression for the r3/r4 red row: the stream_running_totals
    oracle must come back from the pandas path as int64 (the outer
    CAST ... AS BIGINT defeats DuckDB's HUGEINT sum type), and its
    large magnitudes must print full digits, matching Spark's int64."""
    pdf = duck.execute(ORACLES["stream_running_totals"]).df()
    assert str(pdf.dtypes["total_micros"]) == "int64", pdf.dtypes
    assert str(pdf.dtypes["n_events"]) == "int64", pdf.dtypes
    big = pdf["total_micros"].abs().max()
    if big > 10**6:  # magnitudes large enough that %.6g would mangle
        v = pdf.loc[pdf["total_micros"].abs().idxmax(), "total_micros"]
        assert _canon(v) == str(int(v))


def test_grading_window_order_is_pinned():
    """The driver grades the FIRST 50 keys of queries(). The rotation
    is self-advancing (pro_etl_spark._rotated) and FAILED-FIRST: keys
    whose latest official record is red lead the window (a fix is
    re-graded next round), then never-sampled backlog keys, then the
    already-green keys. Pin those invariants plus the hand-reviewed
    round-7 queue keeping priority among the fresh keys."""
    from pro_etl_spark import (
        _R07_QUEUE,
        _official_records,
        _officially_failed,
        _officially_sampled,
    )

    keys = list(pro_etl_spark.get_queries())
    records = _official_records()
    seen = _officially_sampled(records)
    failed = [k for k in _officially_failed(records) if k in keys]
    if records:  # repo has official records
        # failed keys lead the window, in record order
        assert keys[: len(failed)] == failed, (
            "officially-failed keys must front the grading window"
        )
        # already-green keys may enter the official 50 only once the
        # never-sampled backlog is exhausted (r13: 493 of 518 keys are
        # officially green, 25 remain — the window necessarily carries
        # greens in its tail now); greens must still never DISPLACE a
        # failed or never-sampled key
        fresh_total = [k for k in keys if k not in seen]
        lead = min(50, len(fresh_total))  # failed keys are not `seen`
        assert not [k for k in keys[:lead] if k in seen], (
            "already-green keys leaked ahead of backlog keys in the "
            "official window"
        )
        # the reviewed r7 queue heads the backlog right after the
        # failed block, in order (minus keys already fronted)
        fresh_queue = [
            k for k in _R07_QUEUE if k not in seen and k not in failed
        ]
        tail = keys[len(failed) : len(failed) + len(fresh_queue)]
        assert tail == fresh_queue
    # every queue key must still exist (loud-failure rename guard)
    missing = [k for k in _R07_QUEUE if k not in keys]
    assert not missing


def test_rotation_fronts_failed_keys_synthetic(tmp_path):
    """Unit-pin the failed-first rule against a synthetic official
    record: a red hash row must front the rotation even though the
    key was sampled, a fully green row must drop to the back, and a
    rows-only row (no hash_match) must count as green."""
    import json

    from pro_etl_spark import _official_records, _rotated

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "b_green": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
        "c_red": {"rows_match": True, "schema_match": True,
                  "hash_match": True, "err": None},
        "d_rowsonly": {"rows_match": True, "schema_match": True,
                       "err": None},
    }))
    # a later round flips c_red to red — the LATEST record wins
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "c_red": {"rows_match": True, "schema_match": True,
                  "hash_match": False, "err": None},
    }))
    records = _official_records(root=str(tmp_path))
    mapping = {"a_fresh": 1, "b_green": 2, "c_red": 3, "d_rowsonly": 4}
    out = list(_rotated(mapping, records=records))
    assert out[0] == "c_red", out
    # fresh (never-sampled) keys come after failed, greens at the back
    assert out.index("a_fresh") < out.index("b_green")
    assert out.index("a_fresh") < out.index("d_rowsonly")
    # an errored record also counts as failed
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "b_green": {"rows_match": None, "schema_match": None,
                    "hash_match": None, "err": "boom"},
    }))
    records = _official_records(root=str(tmp_path))
    out = list(_rotated(mapping, records=records))
    assert set(out[:2]) == {"b_green", "c_red"}, out
