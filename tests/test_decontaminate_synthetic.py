"""Adversarial synthetic-corpus tests for the round-11 rolling-hash
decontaminator: the real testdata is ASCII and benign, so these plant
probes into constructed documents — multibyte text (CJK, emoji beyond
the BMP: the utf-32 code-point path must agree with Spark's
code-point substring semantics), probes at document edges, repeated
probes, and documents just at/below the length cutoffs — and compare
against a brute-force str-containment reference.
"""

from __future__ import annotations

import pytest

import pro_etl_spark
from pro_etl_spark.ops.corpus import (
    DECON_EVAL_MOD,
    SUBSTR_PROBE_LEN,
    SUBSTR_PROBE_START,
)

SF = "/root/testdata/sf0.001"


def _stage(spark, tmp_path, texts):
    """Write a synthetic documents table; doc_ids are consecutive so
    doc_id % DECON_EVAL_MOD == 0 rows are the eval docs."""
    import pandas as pd

    d = str(tmp_path / "syn")
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "source": ["syn"] * len(texts),
            "text": texts,
            "n_chars": [len(t) for t in texts],
        }
    )
    import os

    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(f"{d}/documents.parquet")
    return d


def _brute(texts):
    """Reference: per training doc, count distinct eval probes it
    contains verbatim (plain Python str containment)."""
    min_len = SUBSTR_PROBE_START + SUBSTR_PROBE_LEN - 1
    probes = {
        t[SUBSTR_PROBE_START - 1 : SUBSTR_PROBE_START - 1 + SUBSTR_PROBE_LEN]
        for i, t in enumerate(texts)
        if i % DECON_EVAL_MOD == 0 and len(t) >= min_len
    }
    out = {}
    for i, t in enumerate(texts):
        if i % DECON_EVAL_MOD == 0 or len(t) < SUBSTR_PROBE_LEN:
            continue
        n = sum(1 for p in probes if p in t)
        if n:
            out[i] = n
    return out


def _run(spark, d):
    q = pro_etl_spark.get_queries()["decontaminate_substring"]
    return {r.doc_id: r.n_probe_hits for r in q(spark, d).collect()}


def test_planted_multibyte_probes(spark, tmp_path):
    """CJK + astral-plane emoji in both probe and carriers: Python
    str slicing and Spark substring both count CODE POINTS, and the
    utf-32 rolling hash must agree with both."""
    pad = "億" * (SUBSTR_PROBE_START - 1)
    probe = ("句読点🌍漢字テスト" * 8)[:SUBSTR_PROBE_LEN]
    assert len(probe) == SUBSTR_PROBE_LEN
    eval_doc = pad + probe + "🌍億end"
    texts = [eval_doc]  # doc 0: eval
    # carriers at different offsets, incl. exactly at the start/end
    texts += [
        probe + "後" * 40,                    # probe at offset 0
        "前" * 7 + probe,                     # probe at the very end
        "x" * 100 + probe + "y" * 3 + probe,  # repeated probe: 1 distinct
        "no hit here " * 30,                  # clean
        probe[:-1] + "!",                     # off-by-one: NOT a hit
    ]
    d = _stage(spark, tmp_path, texts)
    assert _run(spark, d) == _brute(texts)


def test_length_cutoff_edges(spark, tmp_path):
    """Docs exactly at / below the probe length and eval docs exactly
    at / below the probe-window cutoff behave per the documented
    predicate on both sides."""
    min_len = SUBSTR_PROBE_START + SUBSTR_PROBE_LEN - 1
    probe_src = "p" * min_len                  # eval doc, exactly long enough
    probe = probe_src[
        SUBSTR_PROBE_START - 1 : SUBSTR_PROBE_START - 1 + SUBSTR_PROBE_LEN
    ]
    texts = [probe_src]
    texts += [
        probe,                                  # training doc of EXACT probe length: a hit
        probe[:-1],                             # one short: never scanned
        "z" + probe,                            # hit at offset 1
    ]
    d = _stage(spark, tmp_path, texts)
    got = _run(spark, d)
    assert got == _brute(texts)
    assert 1 in got and 3 in got and 2 not in got


def test_short_eval_docs_contribute_no_probe(spark, tmp_path):
    """An eval doc shorter than probe_start+len-1 contributes no probe
    — a corpus whose only eval doc is short must flag nothing."""
    texts = ["short eval doc"]
    texts += ["anything at all " * 20 for _ in range(3)]
    d = _stage(spark, tmp_path, texts)
    assert _run(spark, d) == {}


@pytest.mark.parametrize("n_chunks", [1, 3])
def test_long_documents_cross_chunk_boundaries(spark, tmp_path, n_chunks):
    """Probes planted straddling the strided-hash chunk boundary must
    still match (the chunk overlap is L-1 by construction)."""
    from pro_etl_spark.ops import corpus as C

    pad = "a" * (SUBSTR_PROBE_START - 1)
    probe = ("boundary-probe-" * 5)[:SUBSTR_PROBE_LEN]
    eval_doc = pad + probe + "tail"
    # plant the probe to start exactly (L-1) before each chunk edge
    chunk = C._SUBSTR_CHUNK
    body = []
    pos = 0
    carrier = []
    for k in range(1, n_chunks + 1):
        edge = k * chunk
        gap = edge - (SUBSTR_PROBE_LEN - 1) - pos
        carrier.append("f" * gap)
        carrier.append(probe)
        pos = edge + 1
    carrier.append("f" * 100)
    texts = [eval_doc, "".join(carrier)]
    d = _stage(spark, tmp_path, texts)
    got = _run(spark, d)
    assert got == {1: 1}, got
