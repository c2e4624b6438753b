"""Local replica of the driver's correctness gate: run every
registered query on Spark AND its DuckDB oracle, compare row count +
column names + order-insensitive exact values.

Strict: no float tolerance. Operators are designed so Spark and DuckDB
produce bit-identical doubles (DECIMAL-accumulated sums, sequential
folds, explicit rounding); this test enforces that design.
"""

from __future__ import annotations

import datetime
import math

import pytest

import pro_etl_spark
from tests.conftest import SF_ORACLE

QUERIES = pro_etl_spark.get_queries()
ORACLES = pro_etl_spark.get_oracles()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


from tests.conftest import tier


@pytest.mark.parametrize("name", [tier(n) for n in sorted(ORACLES.keys())])
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    srows = sdf.collect()
    scols = sorted(sdf.columns)

    res = duck.execute(ORACLES[name])
    dcols = sorted(c[0] for c in res.description)
    drows = res.fetchall()

    assert scols == dcols, f"{name}: column mismatch spark={scols} duck={dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    s = _rows_to_multiset([tuple(r) for r in srows], sdf.columns)
    d = _rows_to_multiset(drows, [c[0] for c in res.description])
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(name, spark):
    sdf = QUERIES[name](spark, SF_ORACLE)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"current_id", "new_id", "status", "reason"}
    statuses = {r["status"] for r in rows}
    assert statuses <= {"OK", "Not OK"}
    assert "OK" in statuses and "Not OK" in statuses
