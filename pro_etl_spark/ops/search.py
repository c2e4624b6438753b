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
from pro_etl_spark.ops.dedup import DUCK_DOT, dot
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


def _bm25_scored(spark: SparkSession, d: str) -> DataFrame:
    """Shared per-(term, doc) BM25 scoring stage: postings build, term
    pruning, broadcast df/global stats, rational idf × tf saturation —
    the everything-before-top-k of ``text_bm25``, reused by the hybrid
    RRF fusion below (which needs per-DOC totals, not per-term
    top-k)."""
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
    return (
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
    scored = _bm25_scored(spark, d)
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


#: hybrid fusion parameters: RRF smoothing constant (the standard 60
#: from the Cormack/Clarke RRF paper), per-modality candidate depth,
#: and the fused result size
RRF_K = 60
RRF_CAND_K = 50
RRF_TOPK = 20
#: the dense probe: embeddings with vec_id < RRF_N_QUERY model the
#: "query topic"; their per-dimension DECIMAL sum is the (unnormalized)
#: query vector — cosine is scale-invariant, so skipping the /n and the
#: query-norm division changes no ranking while keeping every arithmetic
#: step exactly reproducible cross-engine
RRF_N_QUERY = 5


@register(
    "ann_hybrid_rrf",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
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
      SELECT tf.doc_id,
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
    ),
    lex AS (
      SELECT doc_id,
             CAST(SUM(CAST(score AS DECIMAL(27,12))) AS DOUBLE) AS lex_score
      FROM scored GROUP BY doc_id
    ),
    lextop AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY lex_score DESC, doc_id) AS lex_rank
      FROM lex
      QUALIFY lex_rank <= {RRF_CAND_K}
    ),
    flat AS (
      SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings WHERE vec_id < {RRF_N_QUERY}
    ),
    qsum AS (
      SELECT dim, CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE) AS val
      FROM flat GROUP BY dim
    ),
    qv AS (SELECT list(val ORDER BY dim) AS q FROM qsum),
    ds AS (
      SELECT c.vec_id AS doc_id,
             {DUCK_DOT.format(a="qv.q", b="c.embedding")}
               / sqrt({DUCK_DOT.format(a="c.embedding", b="c.embedding")})
               AS dense_score
      FROM embeddings c, qv
    ),
    densetop AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY dense_score DESC, doc_id) AS dense_rank
      FROM ds
      QUALIFY dense_rank <= {RRF_CAND_K}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, de.doc_id) AS doc_id,
             CAST(l.lex_rank AS DOUBLE) AS lex_rank,
             CAST(de.dense_rank AS DOUBLE) AS dense_rank,
             COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0)
               + COALESCE(1.0 / ({RRF_K} + de.dense_rank), 0) AS rrf_score
      FROM lextop l FULL JOIN densetop de ON l.doc_id = de.doc_id
    )
    SELECT doc_id, lex_rank, dense_rank, rrf_score
    FROM fused
    QUALIFY row_number() OVER (ORDER BY rrf_score DESC, doc_id) <= {RRF_TOPK}
    """,
)
def ann_hybrid_rrf(spark: SparkSession, d: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: a lexical BM25
    ranking (probe terms over the documents corpus) and a dense cosine
    ranking (probe embedding over the embeddings corpus, vec_id ==
    doc_id) fused as Σ 1/(RRF_K + rank) — the standard way production
    search combines keyword and vector retrieval without score
    calibration, because RRF consumes only RANKS (integers), making
    the fused score exactly reproducible cross-engine by construction.

    Scale shape: each modality reduces to its top-RRF_CAND_K *before*
    fusion via orderBy+limit (TakeOrderedAndProject — a per-partition
    top-k then one tiny merge, never a global sort), so the full-outer
    fusion join touches ≤ 2×RRF_CAND_K rows regardless of corpus size.
    The dense probe vector is the per-dimension DECIMAL-summed query
    centroid (unnormalized — cosine ranking is scale-invariant), built
    with one 64×|queries| aggregate."""
    # lexical: per-doc BM25 total over the probe terms
    lex = (
        _bm25_scored(spark, d)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("score").cast("decimal(27,12)"))
            .cast("double")
            .alias("lex_score")
        )
    )
    lextop = (
        lex.orderBy(F.desc("lex_score"), "doc_id")
        .limit(RRF_CAND_K)
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.orderBy(F.desc("lex_score"), "doc_id")
            ),
        )
        .select("doc_id", "lex_rank")
    )
    # dense: unnormalized query centroid -> proportional cosine
    emb = load(spark, d, "embeddings")
    qv = (
        emb.where(F.col("vec_id") < RRF_N_QUERY)
        .select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum(F.col("val").cast("decimal(27,12)")).cast("double").alias("val"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda s: s.val,
            ).alias("q")
        )
    )
    ds = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        (
            dot(F.col("q"), F.col("embedding"))
            / F.sqrt(dot(F.col("embedding"), F.col("embedding")))
        ).alias("dense_score"),
    )
    densetop = (
        ds.orderBy(F.desc("dense_score"), "doc_id")
        .limit(RRF_CAND_K)
        .withColumn(
            "dense_rank",
            F.row_number().over(
                Window.orderBy(F.desc("dense_score"), "doc_id")
            ),
        )
        .select(F.col("doc_id").alias("d_doc_id"), "dense_rank")
    )
    fused = (
        lextop.join(
            densetop, F.col("doc_id") == F.col("d_doc_id"), "full_outer"
        )
        .select(
            F.coalesce("doc_id", "d_doc_id").alias("doc_id"),
            # double on BOTH sides: these ranks are NULL for docs found
            # by only one modality, and a nullable integer oracle column
            # materializes as float64 through the driver's pandas path —
            # int-vs-float renders differently and hash-mismatches at
            # identical values, so the reproducible dtype is double
            F.col("lex_rank").cast("double").alias("lex_rank"),
            F.col("dense_rank").cast("double").alias("dense_rank"),
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
                )
            ).alias("rrf_score"),
        )
    )
    return (
        fused.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("rrf_score"), "doc_id")),
        )
        .where(F.col("rk") <= RRF_TOPK)
        .drop("rk")
    )
