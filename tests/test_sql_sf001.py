"""Regression gate for the sql_* family at sf0.01.

The round-7 official red row (`sql_product_profit`, CORRECTNESS_r07)
was caused by a single sf0.01 lineitem row whose per-row profit term
renders as the half-way tie 3518.9405625 — Spark's double->DECIMAL
cast rounds the shortest repr HALF_UP while DuckDB rounds the binary
value half-even. That tie row does NOT exist at sf0.001, which is how
it slipped past the bit-exact sf0.001 oracle suite. This file re-runs
the entire sql family (plus any future key touching the derived
partsupp CTE) at sf0.01 with FULL-precision repr comparison so the
next rounding-mode divergence fails a test instead of an official
grade.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import pro_etl_spark

SF001 = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

QUERIES = pro_etl_spark.get_queries()
ORACLES = pro_etl_spark.get_oracles()
SQL_KEYS = sorted(k for k in ORACLES if k.startswith("sql_"))


@pytest.fixture(scope="module")
def duck001():
    if not os.path.isdir(SF001):
        pytest.skip(f"{SF001} not present")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF001}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — %.6g would hide the tie
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


@pytest.mark.parametrize("name", SQL_KEYS)
def test_sql_family_sf001(name, spark, duck001):
    sdf = QUERIES[name](spark, SF001)
    srows = sdf.collect()
    res = duck001.execute(ORACLES[name])
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), name
    assert len(srows) == len(drows), (
        f"{name}: rows spark={len(srows)} duck={len(drows)}"
    )
    s = _multiset([tuple(r) for r in srows], sdf.columns)
    d = _multiset(drows, dcols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {mismatches[:3]}"
