"""Full-text retrieval over the documents corpus: BM25 keyword
scoring and sparse-vector (inverted-index) cosine top-k.

These complete the similarity-search family: ``similarity.py`` covers
the DENSE embedding paths (brute force, IVF, IVF-PQ); this module
covers the SPARSE lexical paths a training-data pipeline uses for
query-based corpus curation (pull the top documents for a probe query)
and doc-to-doc lexical nearest neighbours (near-dup candidates that
share vocabulary without being MinHash-close).

Scale posture (100 TB): both operators are inverted-index joins — the
corpus is touched once to build (doc, token, tf) postings, the probe
side (query terms / query docs) is tiny and broadcast, and the only
shuffle is keyed by token (the vocabulary, which is many orders of
magnitude smaller than the corpus). No all-pairs anything; per-doc
state is one BIGINT norm / length.

Cross-engine exactness: scores avoid libm transcendentals entirely —
BM25's idf is kept in rational form (the log argument, not the log:
``(N - df + 0.5) / (df + 0.5)``, a strictly monotone transform that
preserves per-term ranking), and cosine runs on INTEGER tf vectors so
the dot product and squared norms are exact BIGINTs; the only float
ops are exactly-rounded IEEE divides/multiplies and one sqrt (also
exactly rounded), evaluated with the identical expression tree in
Spark and the DuckDB oracle. This is the same log-free discipline as
``text_tfidf`` (ops/text.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pro_etl_spark.io import load
from pro_etl_spark.ops.text import TOKENS
from pro_etl_spark.registry import register

#: BM25 free parameters (the standard Robertson defaults)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
#: probe terms for the keyword-search query: mid-frequency corpus
#: vocabulary, so tf saturation and length normalization both engage
BM25_TERMS = ("spark", "merge", "stream", "window")

_TOK_CTE = r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2)
"""


@register(
    "text_bm25",
    oracle=_TOK_CTE
    + f"""
    , dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    df AS (
      SELECT token, COUNT(*) AS df FROM tf
      WHERE token IN {tuple(BM25_TERMS)!r} GROUP BY 1
    ),
    scored AS (
      SELECT tf.token AS term, tf.doc_id,
             CAST(tf.tf AS BIGINT) AS tf, CAST(dl.dl AS BIGINT) AS dl,
             ((stats.n_docs - df.df + CAST(0.5 AS DOUBLE))
              / (df.df + CAST(0.5 AS DOUBLE)))
             * (tf.tf * CAST({BM25_K1 + 1.0!r} AS DOUBLE)
                / (tf.tf + CAST({BM25_K1!r} AS DOUBLE)
                   * (CAST({1.0 - BM25_B!r} AS DOUBLE)
                      + CAST({BM25_B!r} AS DOUBLE) * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN df ON df.token = tf.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    )
    SELECT term, doc_id, tf, dl, score FROM (
      SELECT *, row_number() OVER (PARTITION BY term
                                   ORDER BY score DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= {BM25_TOPK}
    """,
)
def text_bm25(spark: SparkSession, d: str) -> DataFrame:
    """BM25 keyword search: top-10 documents per probe term.

    Plan shape (the production retrieval shape): one corpus pass
    builds (doc, token, tf) postings and per-doc lengths; the probe
    terms prune the postings BEFORE any join (filter pushed to the tf
    aggregate output, so only matching postings shuffle); df and the
    global (N, avgdl) stats are tiny and broadcast; top-k is a
    per-term window. The corpus is never scanned twice and never
    shuffled on doc — only the pruned postings move.

    Scoring is BM25 with the idf kept in rational (pre-log) form —
    ``(N - df + 0.5)/(df + 0.5)`` — a strictly monotone transform of
    Robertson idf, so per-term ranking is IDENTICAL to textbook BM25
    while every arithmetic step stays an exactly-rounded IEEE op that
    DuckDB reproduces bit-for-bit (ln() is libm-dependent and would
    make the oracle ulp-fragile; same discipline as text_tfidf)."""
    tok = load(spark, d, "documents").select(
        "doc_id", F.explode(TOKENS()).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    hits = tf.where(F.col("token").isin(*BM25_TERMS))
    df_t = hits.groupBy("token").agg(F.count("*").alias("df"))
    k1 = F.lit(BM25_K1)
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    sat = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + k1 * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        hits.join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("token").alias("term"),
            "doc_id",
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            (idf * sat).alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= BM25_TOPK)
        .drop("rn")
    )


#: probe documents for doc-to-doc lexical search
SPARSE_QUERY_DOCS = (3, 47, 101, 250, 444)
SPARSE_TOPK = 10


@register(
    "ann_sparse_topk",
    oracle=_TOK_CTE
    + f"""
    , norm AS (
      SELECT doc_id, SUM(tf * tf) AS norm2 FROM tf GROUP BY 1
    ),
    q AS (
      SELECT doc_id AS q_id, token, tf AS qtf FROM tf
      WHERE doc_id IN {SPARSE_QUERY_DOCS!r}
    ),
    dots AS (
      SELECT q.q_id, tf.doc_id, SUM(q.qtf * tf.tf) AS dot
      FROM q JOIN tf ON tf.token = q.token
      WHERE tf.doc_id <> q.q_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.q_id, d.doc_id, CAST(d.dot AS BIGINT) AS dot,
             CAST(d.dot AS DOUBLE)
               / sqrt(CAST(nq.norm2 * nd.norm2 AS DOUBLE)) AS cosine
      FROM dots d
      JOIN norm nq ON nq.doc_id = d.q_id
      JOIN norm nd ON nd.doc_id = d.doc_id
    )
    SELECT q_id, doc_id, dot, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= {SPARSE_TOPK}
    """,
)
def ann_sparse_topk(spark: SparkSession, d: str) -> DataFrame:
    """Sparse-vector cosine top-k via an inverted-index join: for each
    probe document, the 10 lexically-closest other documents under
    cosine over raw term-frequency vectors.

    The sparse counterpart of ``ann_cosine_topk`` (dense embeddings,
    ops/similarity.py): instead of a dense dot product per (query,
    doc) pair, candidates are generated ONLY where a posting matches —
    the classic inverted-index retrieval shape. The query side is a
    handful of docs (broadcast); the corpus postings shuffle once on
    token; the per-pair partial products are map-side combined into
    BIGINT dots. Documents sharing no vocabulary with a probe are
    never touched — at 100 TB that candidate pruning, not the scoring,
    is the win.

    Exactness: tf vectors are INTEGER, so dots and squared norms are
    exact BIGINTs in any summation order; cosine is then one exact
    int→double cast, one multiply, one exactly-rounded sqrt and
    divide — bit-identical across engines (the same reason
    ``graph_pagerank`` rides DECIMAL: no order-dependent float sums)."""
    tok = load(spark, d, "documents").select(
        "doc_id", F.explode(TOKENS()).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    norm = tf.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("norm2"))
    q = tf.where(F.col("doc_id").isin(*SPARSE_QUERY_DOCS)).select(
        F.col("doc_id").alias("q_id"), "token", F.col("tf").alias("qtf")
    )
    dots = (
        F.broadcast(q)
        .join(tf, "token")
        .where(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("qtf") * F.col("tf")).alias("dot"))
    )
    nq = norm.select(F.col("doc_id").alias("q_id"), F.col("norm2").alias("qn"))
    scored = (
        dots.join(F.broadcast(nq), "q_id")
        .join(norm, "doc_id")
        .select(
            "q_id",
            "doc_id",
            F.col("dot").cast("long").alias("dot"),
            (
                F.col("dot").cast("double")
                / F.sqrt((F.col("qn") * F.col("norm2")).cast("double"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SPARSE_TOPK)
        .drop("rn")
    )
