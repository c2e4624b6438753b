"""Triangulate the round-11 REPLAY oracles against third
implementations on adversarial synthetic inputs.

The driver gate proves Spark == DuckDB on the real testdata; these
tests prove the DuckDB replay itself is right where the real data is
benign — an oracle that mirrors the operator's own bug would pass the
gate while both are wrong, so the third implementation (plain Python,
no Spark, no SQL) breaks the tie on shapes the testdata never hits:
every-doc-identical sizes, capacity-exact docs, oversize clamping,
single-doc sources, and (for the rolling-hash decontaminator, tested
in test_decontaminate_synthetic.py with Spark) non-ASCII text.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import pro_etl_spark

pro_etl_spark.get_queries()  # load the full registry before ops.corpus
# (its composed oracles read other modules' ORACLES at import time)

from pro_etl_spark.ops.corpus import PACK_CAPACITY  # noqa: E402
from pro_etl_spark.registry import ORACLES  # noqa: E402


def _python_ffd(rows):
    """Reference first-fit-decreasing, independent of both the pandas
    kernel and the recursive CTE: rows = [(source, doc_id, n_tokens)]
    with n_tokens ALREADY clamped to capacity."""
    out = {}
    by_source: dict = {}
    for s, d, n in rows:
        by_source.setdefault(s, []).append((d, n))
    for s, docs in by_source.items():
        fills: list = []
        bin_of = {}
        for d, n in sorted(docs, key=lambda t: (-t[1], t[0])):
            for b, f in enumerate(fills):
                if f + n <= PACK_CAPACITY:
                    fills[b] = f + n
                    bin_of[d] = b
                    break
            else:
                bin_of[d] = len(fills)
                fills.append(n)
        for d, n in docs:
            b = bin_of[d]
            out[(s, d)] = (n, b, fills[b])
    return out


def _duck_ffd(rows):
    """Run the REGISTERED pack_bestfit oracle on a synthetic documents
    view whose texts tokenize to the requested sizes."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(source VARCHAR, doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(s, d, " ".join(["w"] * n)) for s, d, n in rows],
    )
    got = con.execute(ORACLES["pack_bestfit"]).fetchall()
    return {
        (r[0], r[1]): (r[2], r[3], r[4]) for r in got
    }


@st.composite
def corpora(draw):
    n_sources = draw(st.integers(1, 3))
    rows = []
    doc_id = 0
    for s in range(n_sources):
        n_docs = draw(st.integers(1, 12))
        for _ in range(n_docs):
            # token counts spanning the adversarial shapes: tiny docs,
            # capacity-exact docs, and oversize docs (which both sides
            # clamp to capacity and isolate into their own bins)
            n = draw(
                st.one_of(
                    st.integers(1, PACK_CAPACITY),
                    st.just(PACK_CAPACITY),
                    st.integers(PACK_CAPACITY + 1, PACK_CAPACITY * 2),
                )
            )
            rows.append((f"s{s}", doc_id, n))
            doc_id += 1
    return rows


@settings(max_examples=30, deadline=None)
@given(corpora())
def test_pack_bestfit_oracle_replays_ffd_exactly(rows):
    clamped = [
        (s, d, min(n, PACK_CAPACITY)) for s, d, n in rows
    ]
    assert _duck_ffd(rows) == _python_ffd(clamped)


def test_pack_bestfit_oracle_all_identical_sizes():
    """Every doc the same size — placement must fill bins in doc_id
    order, exactly floor(capacity/n) docs per bin."""
    n = 20
    rows = [("s", d, n) for d in range(10)]
    got = _duck_ffd(rows)
    per_bin = PACK_CAPACITY // n
    for d in range(10):
        toks, b, fill = got[("s", d)]
        assert b == d // per_bin
        assert toks == n


def test_pack_bestfit_oracle_oversize_docs_isolate():
    """Docs longer than capacity clamp to capacity and occupy a bin
    alone (nothing else fits beside a full bin)."""
    rows = [("s", 0, PACK_CAPACITY * 2), ("s", 1, PACK_CAPACITY + 1), ("s", 2, 1)]
    got = _duck_ffd(rows)
    assert got[("s", 0)] == (PACK_CAPACITY, 0, PACK_CAPACITY)
    assert got[("s", 1)] == (PACK_CAPACITY, 1, PACK_CAPACITY)
    # the 1-token doc opens a third bin
    assert got[("s", 2)][1] == 2


@pytest.mark.parametrize("sizes", [[1], [PACK_CAPACITY], [PACK_CAPACITY, 1, 1]])
def test_pack_bestfit_oracle_small_sources(sizes):
    rows = [("only", d, n) for d, n in enumerate(sizes)]
    assert _duck_ffd(rows) == _python_ffd(rows)
