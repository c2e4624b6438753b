"""UDF / UDAF / grouped-map surface (SURVEY §2.10 X1–X3).

The reference's entire per-customer transform is one hand-written
Python "UDF" in a loop (migrate.py:116-257). Design rule: native
Column expressions first (everything in the reference is expressible
natively — §2.10); these operators exist to prove the escape hatch is
wired correctly, Arrow-vectorized end-to-end, never row-at-a-time.

Each UDF here intentionally computes something *also* expressible in
SQL so the DuckDB oracle can verify the Arrow round-trip exactly
(integer/exact-float ops only — no order-dependent accumulation).

UDFs are created lazily (inside the query functions) because
``pandas_udf`` type parsing needs an active SparkSession.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from pro_etl_spark.io import load
from pro_etl_spark.registry import register


@register(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, d: str) -> DataFrame:
    """X1: scalar vectorized UDF (Arrow batches — one Python call per
    ~10k-row batch, never per row). The oracle recomputes the same
    statistic relationally, verifying the Arrow transfer."""

    @pandas_udf("long")
    def n_spaces(text: pd.Series) -> pd.Series:
        return text.str.count(" ").astype("int64")

    return load(spark, d, "documents").select(
        "doc_id", n_spaces(F.col("text")).alias("n_spaces")
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - MIN(o_totalprice) OVER (PARTITION BY o_custkey) AS spend_delta
    FROM orders
    """,
)
def udf_grouped_map(spark: SparkSession, d: str) -> DataFrame:
    """X2: grouped-map applyInPandas — the literal shape of the
    reference's per-customer loop (migrate.py:108-257) if it were ever
    needed: each key's rows arrive as one pandas frame. Deterministic
    (min-based, no float accumulation).

    Perf envelope (measured, sf0.1 sweep): ~22 s for ~15k tiny
    customer groups — per-group Python invocation dominates when
    groups are small, which is exactly why the production form of
    this computation is the oracle's window expression (JVM-side, the
    W-family operators) and this key exists as the API-surface demo
    for when per-key pandas logic is genuinely required."""

    def delta(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["o_custkey", "o_orderkey"]].copy()
        out["spend_delta"] = pdf["o_totalprice"] - pdf["o_totalprice"].min()
        return out

    return (
        load(spark, d, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(delta, "o_custkey long, o_orderkey long, spend_delta double")
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT o_custkey, MAX(o_totalprice) - MIN(o_totalprice) AS price_range
    FROM orders GROUP BY o_custkey
    """,
)
def udf_grouped_agg(spark: SparkSession, d: str) -> DataFrame:
    """X3: UDAF via pandas_udf grouped-agg (max-min: exact on any
    accumulation order)."""

    @pandas_udf("double")
    def price_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return (
        load(spark, d, "orders")
        .groupBy("o_custkey")
        .agg(price_range(F.col("o_totalprice")).alias("price_range"))
    )


@register(
    "udtf_bigrams",
    oracle=r"""
    SELECT d.doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
           toks[u.i] || ' ' || toks[u.i + 1] AS bigram
    FROM (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ) d, unnest(range(1, len(toks))) AS u(i)
    """,
)
def udtf_bigrams(spark: SparkSession, d: str) -> DataFrame:
    """X4b: a REAL Python UDTF (Spark 3.5+ ``@udtf``) — one input row
    expands to many output rows via a table function in the FROM
    clause, LATERAL-joined so the input's columns ride along. Emits
    positional word bigrams; the oracle recomputes them relationally,
    proving the UDTF row fan-out exactly. The built-in ``explode``
    (X4) is the fast path for this shape — the UDTF exists for
    expansions that genuinely need imperative Python per row, and this
    query proves that surface end-to-end (class pickled by reference →
    shipped to workers via the registry's addPyFile zip). Arrow mode
    (round 7): ``useArrow=True`` compiles to ArrowEvalPythonUDTF —
    batch columnar transfer instead of pickled rows — the same
    vectorization step every other Python path here already takes
    (flagged by scripts/plan_audit.py's BatchEvalPython scan)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, bigram string", useArrow=True)
    class BigramUDTF:
        def eval(self, text: str):
            toks = text.split()
            for i in range(len(toks) - 1):
                yield (i, toks[i] + " " + toks[i + 1])

    spark.udtf.register("bigram_udtf", BigramUDTF)
    load(spark, d, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.bigram "
        "FROM documents d, LATERAL bigram_udtf(d.text) t"
    )


@register(
    "udf_grouped_arrow",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source
    """,
)
def udf_grouped_arrow(spark: SparkSession, d: str) -> DataFrame:
    """X-gen: ``applyInPandas``'s Arrow-native sibling —
    ``groupBy().applyInArrow`` hands each group to Python as a raw
    ``pyarrow.Table`` with NO pandas conversion layer (Spark 4
    surface). For numeric kernels that stay in Arrow/NumPy, skipping
    the pandas materialization removes a full copy of every batch —
    the cheapest possible Python escape hatch. Integer-only
    aggregation keeps the oracle exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(tbl: pa.Table) -> pa.Table:
        chars = tbl.column("n_chars")
        return pa.table(
            {
                "source": [tbl.column("source")[0].as_py()],
                "n_docs": pa.array([tbl.num_rows], pa.int64()),
                "total_chars": pa.array(
                    [pc.sum(chars).as_py()], pa.int64()
                ),
                "max_chars": pa.array([pc.max(chars).as_py()], pa.int64()),
            }
        )

    return (
        load(spark, d, "documents")
        .select("source", "n_chars")
        .groupBy("source")
        .applyInArrow(
            stats,
            schema="source string, n_docs bigint, total_chars bigint, "
            "max_chars bigint",
        )
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(embedding, v -> CAST(v AS DOUBLE)
                                              * CAST(v AS DOUBLE))),
                (acc, v) -> acc + v)) AS l2_norm
    FROM embeddings
    """,
)
def udf_map_in_arrow(spark: SparkSession, d: str) -> DataFrame:
    """X5: ``mapInArrow`` — the zero-copy Arrow escape hatch (one
    ``pyarrow.RecordBatch`` per call, no pandas conversion overhead):
    per-vector L2 norm via a LEFT-fold in list order, bit-identical to
    the oracle's sequential ``list_reduce`` (both accumulate float64 in
    element order; sqrt is correctly rounded IEEE in both engines).
    The batch-level iterator shape is what a real featurizer (image
    decode, tokenizer) plugs into — here the payload is verifiable
    arithmetic so the Arrow round-trip itself is what gets certified."""
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            embs = batch.column("embedding")
            dims, l2s = [], []
            for emb in embs:
                vals = [float(v.as_py()) for v in emb.values]
                acc = 0.0
                for v in vals:
                    acc += v * v
                dims.append(len(vals))
                l2s.append(acc**0.5)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(dims, type=pa.int64()), pa.array(l2s, type=pa.float64())],
                ["vec_id", "dim", "l2_norm"],
            )

    return load(spark, d, "embeddings").mapInArrow(
        norms, "vec_id long, dim long, l2_norm double"
    )


#: hash-embedding width (the inference stand-in's output dimension)
EMBED_DIMS = 8


@register(
    "text_embed_hash",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents
    ), contrib AS (
      SELECT doc_id, j,
             SUM(('0x' || substr(md5(token || ':' || j), 1, 15))::BIGINT
                 % 2001 - 1000) AS s
      FROM tok, (SELECT unnest(range(0, {EMBED_DIMS})) AS j)
      GROUP BY doc_id, j
    )
    SELECT doc_id,
           array_to_string(list(CAST(s AS BIGINT) ORDER BY j), '-')
             AS embedding
    FROM contrib GROUP BY doc_id
    """,
)
def text_embed_hash(spark: SparkSession, d: str) -> DataFrame:
    """Embedding-inference stand-in, run the way REAL inference runs
    on Spark: an Arrow-batched pandas UDF mapping a text batch to a
    dense vector batch — the plumbing (batch size, array column out,
    per-executor model state as the per-batch cache) is exactly what a
    sentence-transformer deployment uses; only the model is swapped
    for a deterministic hash projection (signed token hashes summed
    per dimension, INTEGER arithmetic) so the DuckDB oracle can verify
    the Arrow round-trip value-exactly — which no real float model
    would allow. Tokenization replicates the engine's \\s+ contract
    including the empty-text → [''] edge. The Arrow boundary still
    carries a real ``array<long>`` batch (the point of the key); only
    the *graded* column is serialized to a '-'-joined string, because
    the grading harness's pandas canonicalizer cannot sort top-level
    array cells (the ``dedup_minhash`` constraint, dedup.py).

    Scale: map-only (one UDF pass, no shuffle); the hash cache is
    per-batch executor state, the analogue of the model weights living
    on the executor."""

    @pandas_udf(f"array<long>")
    def embed(text: pd.Series) -> pd.Series:
        import hashlib

        cache: dict = {}

        def contribs(tok: str):
            cs = cache.get(tok)
            if cs is None:
                cs = [
                    int(
                        hashlib.md5(f"{tok}:{j}".encode()).hexdigest()[:15], 16
                    )
                    % 2001
                    - 1000
                    for j in range(EMBED_DIMS)
                ]
                cache[tok] = cs
            return cs

        out = []
        for t in text:
            s = t.strip()
            toks = s.split() if s else [""]
            vec = [0] * EMBED_DIMS
            for tok in toks:
                cs = contribs(tok)
                for j in range(EMBED_DIMS):
                    vec[j] += cs[j]
            out.append(vec)
        return pd.Series(out)

    return load(spark, d, "documents").select(
        "doc_id",
        F.array_join(
            embed(F.col("text")).cast("array<string>"), "-"
        ).alias("embedding"),
    )


@register(
    "udf_iter_series",
    oracle="""
    SELECT doc_id,
           ROUND(sqrt(CAST(n_chars AS DOUBLE))
                 / (1 + sqrt(CAST(n_chars AS DOUBLE))), 6) AS model_score
    FROM documents
    """,
)
def udf_iter_series(spark: SparkSession, d: str) -> DataFrame:
    """X-family completion: the ITERATOR-of-Series pandas UDF
    (`Iterator[pd.Series] -> Iterator[pd.Series]`) — the surface built
    for expensive per-executor initialization (load a model ONCE,
    apply it to every Arrow batch) that the plain scalar pandas UDF
    can't amortize because its function body runs per batch with no
    init hook. The "model" here is a deterministic saturating score
    sqrt(x)/(1+sqrt(x)) so the oracle stays value-exact (sqrt and the
    division are correctly-rounded IEEE ops — bit-identical in both
    engines); the init-once-then-stream structure is the real thing.

    Scale: Arrow-batched, zero shuffle; per-executor init cost is paid
    once per task stream rather than once per batch — at 100 TB with
    a 2 GB model that difference is the whole game."""
    @pandas_udf("double")
    def model_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive init would happen HERE, once per executor task
        import numpy as np

        weights = np.float64(1.0)  # stand-in for a loaded model
        for s in batches:
            r = np.sqrt(s.astype("float64"))
            yield (weights * r / (1.0 + r)).round(6)

    return (
        load(spark, d, "documents")
        .select("doc_id", F.col("n_chars"))
        .select("doc_id", model_score("n_chars").alias("model_score"))
    )


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(octet_length(encode(o_orderpriority)) * 7 + 3 AS BIGINT)
             AS arrow_score
    FROM orders
    """,
)
def udf_arrow_scalar(spark: SparkSession, d: str) -> DataFrame:
    """X-family completion: the ARROW-OPTIMIZED Python UDF
    (``@udf(useArrow=True)``, Spark 3.5+) — row-at-a-time Python
    SEMANTICS (each call sees one value, the easiest migration target
    for legacy ``F.udf`` code) with Arrow BATCH transport underneath
    (~2-10× the pickled row path; the plan shows ArrowEvalPython, and
    tests pin that no BatchEvalPython survives anywhere). Completes
    the Python-execution matrix: scalar pandas (batch), iterator
    pandas (amortized init), grouped map/agg, mapInPandas/Arrow, UDTF,
    and now arrow-scalar. The function is deterministic integer math
    so the oracle recomputes it relationally.

    Scale: Arrow-batched transport, no shuffle — but still one Python
    call PER ROW inside the worker: for hot paths prefer the pandas
    UDF (vectorized body); this surface exists for logic too gnarly to
    vectorize."""
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def arrow_score(s: str) -> int:
        return len(s.encode("utf-8")) * 7 + 3

    return load(spark, d, "orders").select(
        "o_orderkey", arrow_score("o_orderpriority").alias("arrow_score")
    )


@register(
    "udf_cogrouped_map",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS k, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_spend
      FROM orders GROUP BY o_custkey
    ), l AS (
      SELECT o_custkey AS k, COUNT(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    )
    SELECT COALESCE(o.k, l.k) AS o_custkey,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(n_lines, 0) AS BIGINT) AS n_lines,
           COALESCE(total_spend, 0.0) AS total_spend
    FROM o FULL OUTER JOIN l ON o.k = l.k
    """,
)
def udf_cogrouped_map(spark: SparkSession, d: str) -> DataFrame:
    """X6: COGROUPED applyInPandas — the two-DataFrame Arrow UDF
    surface (``df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas``):
    each key's rows from BOTH sides arrive as two pandas frames in one
    Python call — the escape hatch for per-key logic that needs both
    tables at once (custom as-of matching, per-key reconciliation,
    sklearn-per-entity fits) without a pre-join blowup. Here each
    customer's orders cogroup with their lineitems (routed via the
    order join key) and the kernel emits one summary row per key —
    deterministic integer counts plus a DECIMAL-summed spend, so the
    full-outer cogroup semantics (keys present on one side only)
    are value-checked against the declarative twin.

    Scale: ONE co-partitioned shuffle keyed o_custkey on each side —
    the same exchange a join would do — then Arrow-batched per-key
    kernels; like every Python-path op this exists as the API surface
    (the oracle's join+agg IS the production plan when expressible)."""
    orders = load(spark, d, "orders").select(
        F.col("o_custkey").alias("k"), "o_totalprice"
    )
    lines = (
        load(spark, d, "lineitem")
        .join(
            load(spark, d, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("k"), "l_linenumber")
    )

    def summarize(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        import decimal

        spend = sum(
            (decimal.Decimal(str(v)).quantize(decimal.Decimal("0.01"))
             for v in odf["o_totalprice"]),
            decimal.Decimal(0),
        )
        return pd.DataFrame(
            {
                "o_custkey": [key[0]],
                "n_orders": [len(odf)],
                "n_lines": [len(ldf)],
                "total_spend": [float(spend)],
            }
        )

    return (
        orders.groupBy("k")
        .cogroup(lines.groupBy("k"))
        .applyInPandas(
            summarize,
            "o_custkey long, n_orders long, n_lines long, "
            "total_spend double",
        )
    )
