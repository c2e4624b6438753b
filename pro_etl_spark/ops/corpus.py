"""Corpus-construction operators for LLM training-data pipelines
(BASELINE.json north-star): segment-level dedup (C4-style), benchmark
decontamination, incremental dedup of an arriving batch against an
existing corpus, and the deterministic global training shuffle.

These compose the dedup machinery in ``ops.dedup`` (token tables, LSH
pair generation) into the remaining pipeline stages a 100 TB corpus
build needs between "raw crawl" and "tokenizer input". The reference
(``/root/reference/migrate.py``) has none of this — it is the
capability-generalization layer mandated by the build brief, value-
verified against DuckDB like every other operator.

Scale design (100 TB):
- segment dedup shuffles segment *hashes* + doc keys, never all-pairs
- decontamination broadcasts the benchmark shingle set (benchmarks are
  tiny — MBs — against a 100 TB corpus; the broadcast is the point)
- incremental dedup consumes the verified LSH pair table (one bounded
  bucket shuffle, see ops.dedup) instead of re-running any all-pairs
- the training shuffle never builds a global row_number: position is
  per-shard (shard = output file), exactly how a distributed writer
  lays out epochs
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession, Window
from pyspark.sql import DataFrame

from pro_etl_spark.io import load
from pro_etl_spark.ops.dedup import (
    _CLUSTERS_CTE,
    _LSH_PAIRS_CTE,
    dedup_clusters,
    dedup_minhash_lsh,
)
from pro_etl_spark.ops.hashing import DUCK_HASH60, hash60
from pro_etl_spark.ops.text import pipeline_gopher_filter  # noqa: F401
# ^ imported for its registration side effect: _funnel_oracle() below
#   reads ORACLES["pipeline_gopher_filter"] at module-import time, so a
#   bare `import pro_etl_spark.ops.corpus` in a fresh process must pull
#   text.py in first (bit two tests in r11 before this line existed)
from pro_etl_spark.registry import register

#: tokens per pseudo-paragraph segment. The synthetic corpus has no
#: newline structure (TESTDATA.md word-salad), so fixed-width token
#: windows stand in for C4's "lines"; on real text, split on '\n'
#: first and fall back to fixed windows only for wall-of-text docs.
SEG_TOKENS = 20

#: shingle width for decontamination overlap. 8-13 tokens on real text
#: (GPT-3/PaLM used 8-13-gram overlap); 4 here because the word-salad
#: corpus shares longer exact sequences only between true near-dups,
#: and the operator must exercise non-trivial overlap at test scale.
DECON_NGRAM = 4

#: doc_id % DECON_EVAL_MOD == 0 plays the held-out benchmark set
DECON_EVAL_MOD = 50

#: doc_id % INCR_NEW_MOD == 0 plays "today's batch" arriving against
#: the already-ingested corpus (the other 80%)
INCR_NEW_MOD = 5

#: shard count for the training shuffle (= output file count; at
#: 100 TB this is thousands — one task and one file per shard)
SHUFFLE_SHARDS = 16
SHUFFLE_SEED = 42


def _toks() -> Column:
    """Whitespace token array of ``text`` (ordered, duplicates kept —
    unlike dedup.tokset these are positional tokens, not a set)."""
    return F.split(F.trim(F.col("text")), r"\s+")


_DUCK_TOKS = r"regexp_split_to_array(trim(text), '\s+')"


@register(
    "dedup_paragraph",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), seg AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(
               list_slice(toks, i * {SEG_TOKENS} + 1, (i + 1) * {SEG_TOKENS}),
               ' ') AS seg
      FROM t, UNNEST(range(0,
             CAST(ceil(len(toks) / {SEG_TOKENS}.0) AS BIGINT))) AS u(i)
    ), r AS (
      SELECT *, row_number()
               OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
      FROM seg
    )
    SELECT doc_id,
           count(*) AS n_segs,
           count(*) FILTER (WHERE rn > 1) AS n_removed,
           coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                      FILTER (WHERE rn = 1), '') AS clean_text
    FROM r GROUP BY doc_id
    """,
)
def dedup_paragraph(spark: SparkSession, d: str) -> DataFrame:
    """C4-style segment-level dedup: split every document into
    SEG_TOKENS-token segments, keep only the globally FIRST occurrence
    of each repeated segment (order: doc_id, then position), and
    reassemble each document from its surviving segments. This is the
    within-document-granularity dedup that document-level dedup misses
    (boilerplate headers/footers repeated across distinct pages).

    Scale: two shuffles, both on keys — (1) segment text to rank
    occurrences (at 100 TB shuffle md5(segment) + (doc_id, seg_idx)
    instead of the raw text; partitioning is identical), (2) doc_id to
    reassemble. No self-join, no all-pairs; the window per segment key
    is the distributed analogue of C4's 'seen-hash' set.
    """
    SEG = SEG_TOKENS
    docs = load(spark, d, "documents").select("doc_id", _toks().alias("toks"))
    nseg = F.ceil(F.size("toks") / SEG).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.array_join(F.slice("toks", i * SEG + 1, SEG), " "),
            )
        ).alias("seg_idx", "seg"),
    )
    rn = F.row_number().over(
        Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    )
    ranked = segs.withColumn("rn", rn)
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("seg_idx"), F.col("seg"))
    )
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_removed"),
        F.array_join(
            # collect_list drops the when()'s nulls; sort by (seg_idx,
            # seg) restores document order after the shuffle
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s.getField("seg"),
            ),
            " ",
        ).alias("clean_text"),
    )


_DUCK_SHINGLES = f"""
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(toks, i, i + {DECON_NGRAM - 1}), ' ')
               AS s
      FROM t, UNNEST(range(1, len(toks) - {DECON_NGRAM - 2})) AS u(i)
"""


@register(
    "decontaminate_ngrams",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), sh AS (
      {_DUCK_SHINGLES}
    ), ev AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % {DECON_EVAL_MOD} = 0
    )
    SELECT sh.doc_id, count(*) AS n_hits
    FROM sh JOIN ev USING (s)
    WHERE sh.doc_id % {DECON_EVAL_MOD} != 0
    GROUP BY sh.doc_id
    """,
)
def decontaminate_ngrams(spark: SparkSession, d: str) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares at least one DECON_NGRAM-token shingle with the held-out
    evaluation set (docs with doc_id % DECON_EVAL_MOD == 0 stand in
    for the benchmark suite). Output is (doc_id, n_hits = number of
    distinct shared shingles); consumers anti-join it to drop or audit
    contaminated documents — the GPT-3/PaLM-style n-gram overlap
    decontamination pass.

    Scale: the benchmark shingle set is tiny (benchmarks are MBs) and
    is BROADCAST — the 100 TB corpus streams past it with no shuffle
    until the final per-doc count (shuffle on doc_id). Shingling is a
    narrow projection; shingles are deduped per doc before the join so
    a repeated phrase can't multiply matches.
    """
    n = DECON_NGRAM
    docs = load(spark, d, "documents").select("doc_id", _toks().alias("toks"))
    # guard: F.sequence descends when stop < start, so clamp doc with
    # fewer than n tokens to an empty shingle list
    idx = F.when(
        F.size("toks") >= n, F.sequence(F.lit(1), F.size("toks") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingles = docs.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(
                F.transform(
                    idx, lambda i: F.array_join(F.slice("toks", i, n), " ")
                )
            )
        ).alias("s"),
    ).where(F.col("s").isNotNull())
    ev = (
        shingles.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select("s")
        .distinct()
    )
    return (
        shingles.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


@register(
    "dedup_incremental",
    oracle=_LSH_PAIRS_CTE
    + f"""
    SELECT doc_id, source FROM documents
    WHERE doc_id % {INCR_NEW_MOD} = 0
      AND doc_id NOT IN (
        SELECT doc_b FROM pairs WHERE doc_b % {INCR_NEW_MOD} = 0
        UNION
        SELECT doc_a FROM pairs
        WHERE doc_a % {INCR_NEW_MOD} = 0 AND doc_b % {INCR_NEW_MOD} != 0
      )
    """,
)
def dedup_incremental(spark: SparkSession, d: str) -> DataFrame:
    """Incremental (continuous-ingest) dedup: docs with
    doc_id % INCR_NEW_MOD == 0 play "today's batch"; a new doc is
    DROPPED if it near-duplicates (verified LSH pair, Jaccard ≥ τ) any
    already-ingested doc or an earlier doc in the same batch; survivors
    are emitted for ingestion. Drop policy: new-vs-existing always
    prefers the existing corpus (the already-ingested doc wins even
    when the new doc has the smaller doc_id); within the same batch,
    ties are first-wins by doc_id — the within-batch analogue of the
    reference's first-row-wins dedup policy
    (/root/reference/migrate.py:119-124) lifted to corpus scale.

    Scale: consumes the cached verified pair table from
    ``dedup_minhash_lsh`` (bounded bucket shuffle, no all-pairs). In a
    production incremental pipeline the band-bucket table of the
    existing corpus is PERSISTED and only the new batch is hashed and
    probed against it — the plan shape here is that probe with the
    bucket index rebuilt per run (the testdata has no persisted state
    between driver runs); the drop-set derivation and anti-join are
    identical either way.
    """
    is_new = lambda c: F.col(c) % INCR_NEW_MOD == 0  # noqa: E731
    pairs = dedup_minhash_lsh(spark, d)
    drops = (
        pairs.where(is_new("doc_b"))
        .select(F.col("doc_b").alias("doc_id"))
        .unionByName(
            pairs.where(is_new("doc_a") & ~is_new("doc_b")).select(
                F.col("doc_a").alias("doc_id")
            )
        )
        .distinct()
    )
    new_docs = (
        load(spark, d, "documents")
        .where(is_new("doc_id"))
        .select("doc_id", "source")
    )
    # drop set is structurally tiny (≤ pair count); broadcast anti-join
    return new_docs.join(F.broadcast(drops), "doc_id", "left_anti")


_SHUF_KEY = f"md5(doc_id || ':' || {SHUFFLE_SEED})"


@register(
    "shuffle_shards",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, {_SHUF_KEY} AS key,
             {DUCK_HASH60.format(x=f"doc_id || ':' || {SHUFFLE_SEED}")}
               % {SHUFFLE_SHARDS} AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
             AS pos
    FROM k
    """,
)
def shuffle_shards(spark: SparkSession, d: str) -> DataFrame:
    """Deterministic global training shuffle: every doc gets a salted
    hash key (md5 of doc_id + seed — NEVER rand(), so reruns and
    failure retries produce the identical epoch order), a shard
    (hash % SHUFFLE_SHARDS = which output file), and a position within
    its shard. Changing SHUFFLE_SEED reshuffles the entire corpus;
    same seed is bit-stable across runs and engines.

    Scale: there is NO global row_number (a single-partition window is
    the classic driver-melt). Position is per-shard — exactly the
    layout a distributed writer produces with
    ``repartition(shard).sortWithinPartitions(key)``, where reading
    shard files in order IS the shuffled epoch. One shuffle on the
    shard key; the window runs within each shard partition.
    """
    key_col = F.md5(F.concat_ws(":", F.col("doc_id"), F.lit(SHUFFLE_SEED)))
    k = load(spark, d, "documents").select(
        "doc_id",
        key_col.alias("key"),
        (
            hash60(F.concat_ws(":", F.col("doc_id"), F.lit(SHUFFLE_SEED)))
            % SHUFFLE_SHARDS
        ).alias("shard"),
    )
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("key", "doc_id")
    )
    return k.select("doc_id", "shard", pos.alias("pos"))


#: passage window width / stride (tokens). Stride < width gives the
#: overlap retrieval chunking uses so no answer span straddles a cut.
PASSAGE_TOKENS = 32
PASSAGE_STRIDE = 24


@register(
    "chunk_passages",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), n AS (
      SELECT doc_id, toks, len(toks) AS n_tok,
             1 + CASE WHEN len(toks) > {PASSAGE_TOKENS}
                 THEN CAST(ceil((len(toks) - {PASSAGE_TOKENS})
                                / {PASSAGE_STRIDE}.0) AS BIGINT)
                 ELSE 0 END AS n_passages
      FROM t
    )
    SELECT doc_id, i AS passage_idx,
           array_to_string(
             list_slice(toks, i * {PASSAGE_STRIDE} + 1,
                        i * {PASSAGE_STRIDE} + {PASSAGE_TOKENS}), ' ')
             AS passage,
           least({PASSAGE_TOKENS},
                 n_tok - i * {PASSAGE_STRIDE}) AS n_tokens
    FROM n, UNNEST(range(0, n_passages)) AS u(i)
    """,
)
def chunk_passages(spark: SparkSession, d: str) -> DataFrame:
    """Retrieval-ingest chunking: split every document into
    PASSAGE_TOKENS-token windows advancing by PASSAGE_STRIDE (8-token
    overlap) so no span is cut without also appearing whole in a
    neighbor — the standard passage layout for embedding indexes and
    RAG stores. Output is (doc_id, passage_idx, passage, n_tokens);
    the embedding stage maps over it (see ops.similarity /
    ops.udfs for the vectorized patterns).

    Scale: pure narrow fan-out — tokenize, compute the window count
    in-row, posexplode the windows. No shuffle at all; at 100 TB this
    is a map-only stage that writes passage files partitioned however
    the index wants them.
    """
    W, S = PASSAGE_TOKENS, PASSAGE_STRIDE
    docs = load(spark, d, "documents").select("doc_id", _toks().alias("toks"))
    n_passages = F.lit(1) + F.when(
        F.size("toks") > W,
        F.ceil((F.size("toks") - W) / F.lit(float(S))).cast("long"),
    ).otherwise(F.lit(0))
    exploded = docs.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_passages - 1),
                lambda i: F.array_join(F.slice("toks", i * S + 1, W), " "),
            )
        ).alias("passage_idx", "passage"),
    )
    return exploded.select(
        "doc_id",
        "passage_idx",
        "passage",
        F.least(
            F.lit(W), F.col("n_tok") - F.col("passage_idx") * S
        ).alias("n_tokens"),
    )


@register(
    "dedup_canonical_by_quality",
    oracle=_CLUSTERS_CTE
    + r"""
    , q AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), ranked AS (
      SELECT lp.cluster_id, lp.node AS doc_id, q.n_tokens,
             ROW_NUMBER() OVER (PARTITION BY lp.cluster_id
                                ORDER BY q.n_tokens DESC, lp.node) AS rn,
             COUNT(*) OVER (PARTITION BY lp.cluster_id) AS n_members
      FROM lp JOIN q ON lp.node = q.doc_id
    )
    SELECT cluster_id, doc_id AS canonical_doc_id,
           n_tokens AS canonical_tokens, n_members
    FROM ranked WHERE rn = 1
    """,
)
def dedup_canonical_by_quality(spark: SparkSession, d: str) -> DataFrame:
    """Canonical-document selection: within each near-dup cluster keep
    the HIGHEST-QUALITY copy (most tokens, doc_id tiebreak) instead of
    the arbitrary min-id survivor — the policy real corpus builds use
    (the longest crawl of a page usually has the least boilerplate
    stripping damage). Consumes the memoized cluster labeling
    (``dedup_clusters``) joined to per-doc token counts; one
    cluster-keyed aggregate picks the canonical member and counts the
    cluster in the same pass.

    Scale: the cluster table is |near-dup docs| (≪ corpus), so the
    join and the per-cluster window are small; the corpus-sized work
    already happened inside the LSH pair generation.
    """
    from pro_etl_spark.ops.dedup import dedup_clusters

    clusters = dedup_clusters(spark, d).select("doc_id", "cluster_id")
    q = (
        load(spark, d, "documents")
        .select(
            "doc_id",
            F.size(_toks()).cast("long").alias("n_tokens"),
        )
    )
    j = clusters.join(q, "doc_id")
    # canonical pick (former row_number window) and member count
    # (former COUNT(*) window) fused into ONE hash aggregate:
    # MIN(STRUCT(-n_tokens, doc_id, …)) is the identical
    # (n_tokens DESC, doc_id ASC) total order (doc_id unique), and the
    # census rides the same cluster-keyed exchange — one exchange, no
    # per-cluster sorts, map-side partials (guide §2.3).
    return (
        j.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_tokens")).alias("nt"),
                    F.col("doc_id").alias("doc_id"),
                    F.col("n_tokens").alias("n_tokens"),
                )
            ).alias("m"),
            F.count("*").alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("m.doc_id").alias("canonical_doc_id"),
            F.col("m.n_tokens").alias("canonical_tokens"),
            "n_members",
        )
    )


# --- cross-document duplicated-span profiling ------------------------

#: span width for duplication profiling (ExactSubstr-style evidence;
#: real deployments use 50-token spans over a suffix array — the
#: n-gram approximation keeps the same signal distributable)
SPAN_TOKENS = 6

#: spans present in more than this many docs are boilerplate, not
#: duplication evidence between a specific pair of docs
SPAN_MAX_DF = 64


@register(
    "dup_span_profile",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), sp AS (
      SELECT DISTINCT doc_id,
             {DUCK_HASH60.format(
                 x=f"array_to_string(list_slice(toks, i, i + {SPAN_TOKENS - 1}), ' ')"
             )} AS h
      FROM t, UNNEST(range(1, greatest(len(toks) - {SPAN_TOKENS - 2}, 2)))
             AS u(i)
    ), df AS (
      SELECT h, count(*) AS n_docs FROM sp GROUP BY h
    )
    SELECT sp.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(count(*) FILTER (WHERE df.n_docs > 1
                                 AND df.n_docs <= {SPAN_MAX_DF})
                AS BIGINT) AS n_dup_spans,
           ROUND(CAST(count(*) FILTER (WHERE df.n_docs > 1
                                       AND df.n_docs <= {SPAN_MAX_DF})
                      AS DOUBLE) / count(*), 6) AS dup_frac
    FROM sp JOIN df USING (h) GROUP BY sp.doc_id
    """,
)
def dup_span_profile(spark: SparkSession, d: str) -> DataFrame:
    """Per-document duplicated-span profiling: the fraction of a doc's
    SPAN_TOKENS-token spans that also occur in at least one OTHER
    document (distinct spans per doc; spans above SPAN_MAX_DF document
    frequency are boilerplate and excluded from the dup signal). This
    is the audit signal behind train-set contamination / memorization
    studies — which docs carry heavily duplicated passages — computed
    as a distributable approximation of suffix-array ExactSubstr dedup.
    Docs shorter than SPAN_TOKENS contribute their whole text as their
    single span, so every document gets a profile row.

    Scale: shuffles span *hashes* (60-bit, never the text) to count
    document frequency, then one key shuffle back to the doc — no
    self-join, no pair expansion, so common boilerplate cannot blow up
    a bucket (it is counted once and filtered by SPAN_MAX_DF)."""
    docs = load(spark, d, "documents").select("doc_id", _toks().alias("toks"))
    n_spans = F.greatest(F.size("toks") - (SPAN_TOKENS - 1), F.lit(1))
    spans = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_spans),
                    lambda i: hash60(
                        F.array_join(F.slice("toks", i, SPAN_TOKENS), " ")
                    ),
                )
            )
        ).alias("h"),
    )
    df_ = spans.groupBy("h").agg(F.count("*").alias("n_docs"))
    per_doc = spans.join(df_, "h").groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(
            ((F.col("n_docs") > 1) & (F.col("n_docs") <= SPAN_MAX_DF)).cast(
                "long"
            )
        ).alias("n_dup_spans"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
        F.round(F.col("n_dup_spans").cast("double") / F.col("n_spans"), 6)
        .alias("dup_frac"),
    )


# --- training-mix allocation -----------------------------------------

#: mixing temperature α: source weight ∝ tokens^α. α < 1 upsamples
#: small/rare sources relative to their raw token share — the standard
#: multi-source LLM-pretraining rebalancing knob.
MIX_ALPHA = 0.5


@register(
    "corpus_mix_weights",
    oracle=r"""
    WITH s AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), w AS (
      SELECT *, CAST(ROUND(sqrt(n_tokens), 6) AS DECIMAL(38,6)) AS w
      FROM s
    ), t AS (
      SELECT CAST(SUM(w) AS DOUBLE) AS tw,
             CAST(SUM(n_tokens) AS BIGINT) AS tt
      FROM w
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           n_tokens,
           ROUND(CAST(w AS DOUBLE) / tw, 6) AS mix_share,
           ROUND(LEAST(1.0,
               ROUND(CAST(w AS DOUBLE) / tw, 6) * tt / n_tokens), 6)
             AS sample_rate
    FROM w, t
    """,
)
def corpus_mix_weights(spark: SparkSession, d: str) -> DataFrame:
    """Training-mix allocation: per-source token census → temperature-
    scaled mixing weights (share ∝ tokens^MIX_ALPHA, the T5/PaLM
    rebalancing rule that keeps big crawls from drowning small
    high-quality sources) → the per-source sampling rate that realizes
    the mix within the corpus's own token budget (capped at 1 — a
    source cannot be sampled above its size without repetition).

    Determinism: token counts are exact BIGINTs; the only float steps
    (sqrt, one division, one multiply) are IEEE-identical cross-engine,
    and the weight SUM is routed through DECIMAL so partial-aggregation
    order cannot perturb it.

    Scale: one map-side-combinable aggregation over the corpus (the
    token count), then arithmetic over a source-cardinality table with
    a broadcast single-row total. The 100 TB input is touched once."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    s = (
        load(spark, d, "documents")
        .select("source", F.size(toks).cast("long").alias("n_toks"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    w = s.withColumn(
        "w", F.round(F.sqrt("n_tokens"), 6).cast("decimal(38,6)")
    )
    t = w.agg(
        F.sum("w").cast("double").alias("tw"),
        F.sum("n_tokens").cast("long").alias("tt"),
    )
    share = F.round(F.col("w").cast("double") / F.col("tw"), 6)
    return (
        w.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            share.alias("mix_share"),
            F.round(
                F.least(F.lit(1.0), share * F.col("tt") / F.col("n_tokens")),
                6,
            ).alias("sample_rate"),
        )
    )


#: context capacity (tokens) for best-fit packing
PACK_CAPACITY = 64


@register(
    "pack_bestfit",
    oracle=rf"""
    WITH RECURSIVE docs AS (
      SELECT source, doc_id,
             LEAST(len(regexp_split_to_array(trim(text), '\s+')),
                   {PACK_CAPACITY}) AS n_tokens
      FROM documents
    ), ordered AS (
      SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_tokens DESC, doc_id) AS rn
      FROM docs
    ), counts AS (
      SELECT source, COUNT(*) AS n FROM ordered GROUP BY source
    ),
    -- sequential FFD replay: one recursion step places doc rn = i+1
    -- (every source advances in lockstep; fills = per-bin loads in
    -- creation order, bins = placement per rn). This is the greedy
    -- loop itself, not an approximation of it.
    step AS (
      SELECT source, CAST(0 AS BIGINT) AS i,
             CAST([] AS BIGINT[]) AS fills,
             CAST([] AS BIGINT[]) AS bins
      FROM counts
      UNION ALL
      SELECT s.source, s.i + 1,
             CASE WHEN list_filter(range(1, len(s.fills)+1),
                        j -> s.fills[j] + o.n_tokens <= {PACK_CAPACITY}
                        )[1] IS NULL
                  THEN list_append(s.fills, o.n_tokens)
                  ELSE list_transform(range(1, len(s.fills)+1),
                         j -> CASE WHEN j = list_filter(
                                     range(1, len(s.fills)+1),
                                     k -> s.fills[k] + o.n_tokens
                                          <= {PACK_CAPACITY})[1]
                                   THEN s.fills[j] + o.n_tokens
                                   ELSE s.fills[j] END)
             END,
             list_append(s.bins,
               COALESCE(list_filter(range(1, len(s.fills)+1),
                          j -> s.fills[j] + o.n_tokens
                               <= {PACK_CAPACITY})[1],
                        len(s.fills) + 1) - 1)
      FROM step s
      JOIN counts c USING (source)
      JOIN ordered o ON o.source = s.source AND o.rn = s.i + 1
      WHERE s.i < c.n
    ), final AS (
      SELECT s.source, s.fills, s.bins
      FROM step s JOIN counts c USING (source)
      WHERE s.i = c.n
    ), assign AS (
      SELECT source,
             generate_subscripts(bins, 1) AS rn,
             unnest(bins) AS bin_id,
             fills
      FROM final
    )
    SELECT o.source, o.doc_id, o.n_tokens,
           CAST(a.bin_id AS BIGINT) AS bin_id,
           CAST(a.fills[CAST(a.bin_id AS INT) + 1] AS BIGINT) AS bin_fill
    FROM assign a JOIN ordered o USING (source, rn)
    """,
)
def pack_bestfit(spark: SparkSession, d: str) -> DataFrame:
    """Context-window packing by first-fit-decreasing — the padding-
    minimizing alternative to ``seq_pack``'s concat-then-chunk: whole
    documents are placed into {PACK_CAPACITY}-token bins (no document
    is ever split), largest first, each into the first bin with room.
    FFD is the classic 11/9·OPT+1 bin-packing approximation, and it is
    inherently SEQUENTIAL within a shard — exactly the semantics
    DataFrame algebra can't express and ``applyInPandas`` exists for:
    each source shard arrives as one Arrow batch, the greedy loop runs
    vectorized-adjacent in pandas, and shards pack in parallel across
    executors (the packing unit at 100 TB is the output file, so
    per-shard sequentiality is the natural grain, same as seq_pack).

    Determinism: placement order is (n_tokens DESC, doc_id) and bins
    are scanned in creation order, so re-runs produce identical bins.
    Value-verified since round 11: the oracle REPLAYS the greedy loop
    itself as a DuckDB recursive CTE (one recursion step per placement,
    fills carried as a list, first-fitting bin via list_filter), so the
    pandas loop is checked placement-by-placement against an
    independent sequential-fold implementation — plus the standing
    invariant tests (every doc once, no bin over capacity, fill ratio
    beats naive sequential packing) in tests/test_properties.py."""
    import pandas as pd

    docs = load(spark, d, "documents").select(
        "source",
        "doc_id",
        F.least(
            F.size(_toks()), F.lit(PACK_CAPACITY)
        ).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list = []  # current fill per bin, index = bin id
        bin_of: list = []
        for n in pdf["n_tokens"]:
            for b, fill in enumerate(fills):
                if fill + n <= PACK_CAPACITY:
                    fills[b] = fill + n
                    bin_of.append(b)
                    break
            else:
                bin_of.append(len(fills))
                fills.append(int(n))
        out = pdf[["source", "doc_id", "n_tokens"]].copy()
        out["bin_id"] = pd.array(bin_of, dtype="int64")
        out["bin_fill"] = out["bin_id"].map(lambda b: fills[b]).astype("int64")
        return out

    return docs.groupBy("source").applyInPandas(
        pack,
        schema="source string, doc_id long, n_tokens long, "
        "bin_id long, bin_fill long",
    )


@register(
    "corpus_source_drift",
    oracle=rf"""
    WITH tok AS (
      SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents
    ), per_src AS (
      SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), src_tot AS (
      SELECT source, SUM(c) AS n FROM per_src GROUP BY source
    ), gcnt AS (
      SELECT token, SUM(c) AS g FROM per_src GROUP BY token
    ), glob_tot AS (SELECT SUM(g) AS ng FROM gcnt),
    terms AS (
      SELECT s.source,
             CAST(FLOOR(abs(CAST(p.c AS DOUBLE) / s.n
                            - CAST(g.g AS DOUBLE) / gt.ng)
                        * 1000000000000 + 0.5) AS BIGINT) AS t
      FROM per_src p
      JOIN src_tot s USING (source)
      JOIN gcnt g USING (token)
      CROSS JOIN glob_tot gt
    )
    SELECT source,
           CAST(SUM(t) AS BIGINT) AS tv_picos_x2,
           CAST(SUM(t) AS DOUBLE) / 2000000000000.0 AS tv_distance
    FROM terms GROUP BY source
    """,
)
def corpus_source_drift(spark: SparkSession, d: str) -> DataFrame:
    """Distribution-drift audit: total-variation distance between each
    source's unigram distribution and the corpus-wide one — the
    drift/skew detector a data-quality gate runs when a new source (or
    a new crawl of an old one) lands; TV = ½ Σ|p − q| needs no log, so
    unlike KL it stays exactly computable. Per-term |p − q| values
    floor-quantize to a 10⁻¹² grid and sum as INTEGERS (the
    order-independence discipline), with one closing division for the
    human-readable distance. Note: terms a source has zero count for
    contribute only through the source's own vocabulary here (the
    audit's purpose is over-representation; absent-term mass is the
    complement, bounded by the reported value).

    Scale: one tokenize pass, one (source, token) count, vocab-sized
    joins (global counts broadcast); the corpus shuffles once."""
    tok = load(spark, d, "documents").select(
        "source", F.explode(_toks()).alias("token")
    )
    per_src = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    src_tot = per_src.groupBy("source").agg(F.sum("c").alias("n"))
    glob = per_src.groupBy("token").agg(F.sum("c").alias("g"))
    glob_tot = glob.agg(F.sum("g").alias("ng"))
    terms = (
        per_src.join(F.broadcast(src_tot), "source")
        .join(glob, "token")
        .crossJoin(F.broadcast(glob_tot))
        .select(
            "source",
            F.floor(
                F.abs(
                    F.col("c").cast("double") / F.col("n")
                    - F.col("g").cast("double") / F.col("ng")
                )
                * F.lit(1_000_000_000_000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t"),
        )
    )
    return terms.groupBy("source").agg(
        F.sum("t").cast("long").alias("tv_picos_x2"),
        (F.sum("t").cast("double") / F.lit(2_000_000_000_000.0)).alias(
            "tv_distance"
        ),
    )


# --- end-to-end corpus funnel ----------------------------------------

#: the one composed pipeline key: the stage-by-stage survivor census a
#: corpus build reports (how many docs/tokens survive each gate)
_FUNNEL_STAGES = ("raw", "gopher", "exact_dedup", "near_dedup")


def _funnel_oracle() -> str:
    from pro_etl_spark.registry import ORACLES

    from pro_etl_spark.ops.dedup import _SHINGLE_LSH_CTE

    return (
        _SHINGLE_LSH_CTE
        + f"""
    , g AS ({ORACLES["pipeline_gopher_filter"]})
    , t AS (
      SELECT doc_id, text,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_toks
      FROM documents
    ), s1 AS (
      SELECT t.* FROM t JOIN g ON g.doc_id = t.doc_id AND g.keep
    ), s2 AS (
      SELECT s1.* FROM s1
      JOIN (SELECT MIN(doc_id) AS keep_id FROM s1 GROUP BY md5(text)) m
        ON m.keep_id = s1.doc_id
    ), s3 AS (
      SELECT * FROM s2
      WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS stage_ord, 'raw' AS stage,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens FROM t
      UNION ALL
      SELECT 1, 'gopher', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s1
      UNION ALL
      SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'near_dedup', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s3
    ) ORDER BY stage_ord
    """
    )


@register("pipeline_data_funnel", oracle=_funnel_oracle())
def pipeline_data_funnel(spark: SparkSession, d: str) -> DataFrame:
    """The composed pre-train data funnel — the survivor census a
    corpus build publishes after every run: docs and tokens remaining
    after (1) Gopher quality gates, (2) exact content dedup
    (first-occurrence-wins within the filtered corpus), (3) near-dup
    removal (drop the higher-id member of every LSH-verified pair).
    This is the end-to-end composition the individual operators exist
    for; the funnel numbers are what a data lead actually reviews
    before a tokenizer run.

    The near-dup stage consumes the SHINGLE-LSH pair table
    (``dedup_minhash_shingle_lsh``) — the production configuration for
    real text: unigram token sets saturate on natural language (any
    two documents over the same vocabulary look alike to set-Jaccard),
    so an unigram-keyed funnel over-merges on an actual crawl.

    Scale: each gate reuses the already-scaling machinery — the
    quality pass is narrow, exact dedup is one md5-keyed shuffle of
    hashes-and-flags (never text), and the near-dup drop set is the
    cached shingle-LSH pair output (bounded bucket shuffle, see
    ops.dedup) applied as a broadcast-able id join. All four stage
    summaries fold out of ONE conditional aggregate over the
    flag-annotated corpus — a single documents scan in the census
    spine (r12; the former layout unioned four independent aggregates
    and re-derived every stage's inputs per branch)."""
    # ONE-PASS census (r12, guide §1.2 step 1 — don't compute things
    # you throw away): the former four independent stage aggregates
    # UNIONed at the end scanned `documents` 4×, computed the Gopher
    # gate 3× and the md5 exact-dedup shuffle 2× (56 Exchanges).
    # Instead, annotate each document ONCE with its stage-survival
    # flags, fold all four censuses out of one conditional aggregate,
    # and explode to the 4 output rows. Only (doc_id, h, n_toks, g)
    # bytes cross the md5-keyed exchange — `text` is dropped before
    # the shuffle (guide §2.3 "project before the exchange").
    # The gopher flag is computed IN the census scan via the shared
    # gate expressions (gopher_keep_expr == the registered gate's
    # `keep`, see ops.text) — no second documents scan and no join.
    # The token array is bound in a stacked projection so the HOF
    # lambdas never re-run the tokenizer per element, and no FILTER
    # ever sits above the gate expressions (predicate pushdown would
    # inline the signal stack over raw text — measured 24 s vs 6 s at
    # sf0.1 when the gopher stage was a filtered left-semi join).
    from pro_etl_spark.ops.text import TOKENS, gopher_keep_expr

    ann = (
        load(spark, d, "documents")
        .select("doc_id", F.md5("text").alias("h"), TOKENS().alias("toks"))
        .select(
            "doc_id",
            "h",
            F.size("toks").alias("n_toks"),
            gopher_keep_expr(F.col("toks")).alias("g"),
        )
    )
    from pro_etl_spark.ops.dedup import dedup_minhash_shingle_lsh

    drop = (
        dedup_minhash_shingle_lsh(spark, d)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .select("doc_id", F.lit(True).alias("nd"))
    )
    # exact-dedup winner among gopher survivors = MIN(doc_id) over the
    # md5 group restricted to survivors — the same h-keyed exchange the
    # former groupBy paid, computed as a window so the flag lands on
    # every row without a join back
    wh = Window.partitionBy("h")
    ann = ann.withColumn(
        "keep_id", F.min(F.when(F.col("g"), F.col("doc_id"))).over(wh)
    ).withColumn("s2", F.col("g") & (F.col("doc_id") == F.col("keep_id")))
    ann = ann.join(drop, "doc_id", "left").withColumn(
        "s3", F.col("s2") & F.col("nd").isNull()
    )

    def cnt(flag, col=None):
        if col is None:
            return F.coalesce(F.sum(flag.cast("long")), F.lit(0)).cast("long")
        return F.coalesce(F.sum(F.when(flag, F.col(col))), F.lit(0)).cast("long")

    census = ann.agg(
        F.count("*").alias("d0"),
        F.coalesce(F.sum("n_toks"), F.lit(0)).cast("long").alias("t0"),
        cnt(F.col("g")).alias("d1"),
        cnt(F.col("g"), "n_toks").alias("t1"),
        cnt(F.col("s2")).alias("d2"),
        cnt(F.col("s2"), "n_toks").alias("t2"),
        cnt(F.col("s3")).alias("d3"),
        cnt(F.col("s3"), "n_toks").alias("t3"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage_ord"),
                F.lit(name).alias("stage"),
                F.col(f"d{i}").alias("n_docs"),
                F.col(f"t{i}").alias("n_tokens"),
            )
            for i, name in enumerate(_FUNNEL_STAGES)
        ]
    )
    return (
        census.select(F.explode(stages).alias("s"))
        .select("s.stage_ord", "s.stage", "s.n_docs", "s.n_tokens")
        .orderBy("stage_ord")
    )


@register(
    "corpus_lang_entropy",
    oracle="""
    WITH c AS (
      SELECT source, lang, COUNT(*) AS cnt
      FROM documents GROUP BY source, lang
    ), t AS (
      SELECT source, SUM(cnt) AS n, COUNT(*) AS n_langs
      FROM c GROUP BY source
    )
    SELECT c.source, CAST(t.n AS BIGINT) AS n_docs,
           CAST(t.n_langs AS BIGINT) AS n_langs,
           CAST(SUM(CAST(FLOOR(
             c.cnt * LOG2(CAST(t.n AS DOUBLE) / c.cnt) / t.n * 1000000.0
           ) AS BIGINT)) AS BIGINT) AS entropy_micros
    FROM c JOIN t USING (source)
    GROUP BY c.source, t.n, t.n_langs
    """,
)
def corpus_lang_entropy(spark: SparkSession, d: str) -> DataFrame:
    """Shannon entropy of each source's language distribution — the
    information-theoretic companion to ``corpus_source_drift``'s
    total-variation audit: a monolingual crawl scores 0 bits, a
    uniform 4-language mix scores 2, and a sudden entropy drop on a
    refreshed source is the classic symptom of a scraper losing its
    non-English sections. Each -p*log2(p) term is floor-quantized to
    integer micros BEFORE summing (the repo's established
    order-independence recipe from ``events_chi_square``: float sums
    depend on partial-merge order, integer sums don't), with the
    expression shapes mirrored token-for-token across engines.

    Scale: one grouped pass collapses documents to (source, lang)
    cells — O(|sources| x |langs|), tiny at any corpus size; the
    per-source totals are an aggregate OF the cell table and the
    entropy terms never touch the raw corpus again."""
    c = (
        load(spark, d, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("cnt"))
    )
    t = c.groupBy("source").agg(
        F.sum("cnt").alias("n"), F.count("*").alias("n_langs")
    )
    term = F.floor(
        F.col("cnt")
        * F.log2(F.col("n").cast("double") / F.col("cnt"))
        / F.col("n")
        * F.lit(1000000.0)
    ).cast("long")
    return (
        c.join(F.broadcast(t), "source")
        .groupBy("source", "n", "n_langs")
        .agg(F.sum(term).cast("long").alias("entropy_micros"))
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.col("n_langs").cast("long").alias("n_langs"),
            "entropy_micros",
        )
    )


@register(
    "corpus_js_divergence",
    oracle=rf"""
    WITH tok AS (
      SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents
    ), per_src AS (
      SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), src_tot AS (
      SELECT source, SUM(c) AS n FROM per_src GROUP BY source
    ), gcnt AS (
      SELECT token, SUM(c) AS g FROM per_src GROUP BY token
    ), glob_tot AS (SELECT SUM(g) AS ng FROM gcnt),
    terms AS (
      SELECT s.source, s.n,
             CAST(FLOOR(
               0.5 * (CAST(p.c AS DOUBLE) / s.n
                      * LOG2((CAST(p.c AS DOUBLE) / s.n)
                             / ((CAST(p.c AS DOUBLE) / s.n
                                 + CAST(g.g AS DOUBLE) / gt.ng) / 2))
                      + CAST(g.g AS DOUBLE) / gt.ng
                      * LOG2((CAST(g.g AS DOUBLE) / gt.ng)
                             / ((CAST(p.c AS DOUBLE) / s.n
                                 + CAST(g.g AS DOUBLE) / gt.ng) / 2))
                      - CAST(g.g AS DOUBLE) / gt.ng)
               * 1000000.0) AS BIGINT) AS t
      FROM per_src p
      JOIN src_tot s USING (source)
      JOIN gcnt g USING (token)
      CROSS JOIN glob_tot gt
    )
    SELECT source, CAST(MIN(n) AS BIGINT) AS n_tokens,
           CAST(SUM(t) + 500000 AS BIGINT) AS js_micros,
           CAST(SUM(t) + 500000 AS DOUBLE) / 1000000.0 AS js_divergence
    FROM terms GROUP BY source
    """,
)
def corpus_js_divergence(spark: SparkSession, d: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's unigram
    distribution and the corpus-wide one — the bounded, symmetric
    drift measure (0..1 bit) domain-weighting schemes key on, closing
    the info-theoretic family next to the TV audit
    (``corpus_source_drift``) and the entropy gauge
    (``corpus_lang_entropy``). KL's infinities on absent terms are
    what JS fixes, and the absent-term mass here is EXACT via closed
    form: a token the source lacks contributes q·log2(q/(q/2)) = q to
    the corpus half, so Σ_absent = 1 − Σ_present q and only OBSERVED
    (source, token) pairs ever materialize — the 0.5·(1 − Σ q·…)
    constant folds into +500000 micros after per-term floor
    quantization (order-independent integer sum, negative terms
    floored identically on both engines).

    Scale: identical shape to the TV audit — one tokenize pass, one
    (source, token) count, vocab-sized joins with broadcast totals."""
    tok = load(spark, d, "documents").select(
        "source", F.explode(_toks()).alias("token")
    )
    per_src = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    src_tot = per_src.groupBy("source").agg(F.sum("c").alias("n"))
    glob = per_src.groupBy("token").agg(F.sum("c").alias("g"))
    glob_tot = glob.agg(F.sum("g").alias("ng"))
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("g").cast("double") / F.col("ng")
    m = (p + q) / F.lit(2)
    term = F.lit(0.5) * (p * F.log2(p / m) + q * F.log2(q / m) - q)
    terms = (
        per_src.join(F.broadcast(src_tot), "source")
        .join(glob, "token")
        .crossJoin(F.broadcast(glob_tot))
        .select(
            "source",
            "n",
            F.floor(term * F.lit(1_000_000.0)).cast("long").alias("t"),
        )
    )
    return terms.groupBy("source").agg(
        F.min("n").cast("long").alias("n_tokens"),
        (F.sum("t") + F.lit(500000)).cast("long").alias("js_micros"),
        ((F.sum("t") + F.lit(500000)).cast("double") / F.lit(1_000_000.0)).alias(
            "js_divergence"
        ),
    )


N_RENDEZVOUS_SHARDS = 8


@register(
    "shard_rendezvous",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, s.shard,
             {DUCK_HASH60.format(x="doc_id::VARCHAR || ':shard:' || s.shard::VARCHAR")}
               AS h
      FROM documents
      CROSS JOIN (SELECT unnest(range(0, {N_RENDEZVOUS_SHARDS})) AS shard) s
    )
    SELECT doc_id, CAST(shard AS INT) AS shard
    FROM (
      SELECT doc_id, shard,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY h DESC, shard) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def shard_rendezvous(spark: SparkSession, d: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the
    consistent-sharding primitive for incremental corpus rebuilds:
    each document goes to the shard with the highest hash(doc, shard)
    score, so adding or removing ONE shard moves only ~1/N of the
    documents (mod-N sharding reshuffles almost everything — the
    difference between an incremental re-index and a full one). The
    argmax runs IN-ROW (transform over the shard list + array_max on
    (score, shard) structs — no fan-out, no shuffle, no window); the
    oracle expands the same scores relationally and ranks, proving
    the in-row argmax equals the join-based one.

    Scale: narrow per-row expression over the scan; N_SHARDS is a
    literal. At a reshard from N to N+1 the only movers are docs whose
    new shard wins the rendezvous — certified minimal by
    test_rendezvous_minimal_movement."""
    shards = F.sequence(
        F.lit(0), F.lit(N_RENDEZVOUS_SHARDS - 1)
    )
    scored = F.transform(
        shards,
        lambda s: F.struct(
            hash60(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":shard:"),
                    s.cast("string"),
                )
            ).alias("h"),
            s.cast("int").alias("shard"),
        ),
    )
    # array_max on (h, shard) structs = rendezvous argmax with the
    # same (h DESC, shard ASC) tiebreak as the oracle: equal h would
    # pick the LARGER shard under struct ordering, so invert the
    # shard sign in the struct and flip it back (h ties are a 2^-60
    # event, but the tiebreak must still be well-defined)
    neg = F.transform(
        scored,
        lambda t: F.struct(
            t.getField("h").alias("h"),
            (-t.getField("shard")).alias("nshard"),
        ),
    )
    win = F.array_max(neg)
    return load(spark, d, "documents").select(
        "doc_id",
        (-win.getField("nshard")).cast("int").alias("shard"),
    )


@register(
    "corpus_shard_balance",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_toks,
             CAST({DUCK_HASH60.format(x="doc_id::VARCHAR || ':balshard'")}
                  % {{n_shards}} AS BIGINT) AS shard
      FROM documents
    ), per AS (
      SELECT shard, COUNT(*) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      FROM assigned GROUP BY shard
    ), tot AS (
      SELECT SUM(n_docs) AS td, SUM(n_tokens) AS tt, COUNT(*) AS k
      FROM per
    )
    SELECT shard, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE)
                 / (CAST(tt AS DOUBLE) / k), 6) AS token_balance
    FROM per, tot
    """.replace("{n_shards}", "8"),
)
def corpus_shard_balance(spark: SparkSession, d: str) -> DataFrame:
    """Shard-balance audit: per training shard, doc and TOKEN counts
    plus the token load relative to a perfectly uniform split — the
    pre-flight check before a distributed training read (a shard at
    1.3× the mean is the straggler that sets epoch wall-clock; doc
    counts balance by construction under hash sharding, token counts
    need auditing because document LENGTH is skewed). Assignment uses
    the salted-hash mod-N recipe of ``shuffle_shards``; the audit is
    one grouped pass plus an O(#shards) broadcast total.

    Scale: one corpus scan, one 8-key aggregate — the audit costs
    nothing next to the epoch it protects."""
    n_shards = 8
    docs = load(spark, d, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    assigned = docs.select(
        F.size(toks).cast("long").alias("n_toks"),
        (
            hash60(
                F.concat(F.col("doc_id").cast("string"), F.lit(":balshard"))
            )
            % n_shards
        ).alias("shard"),
    )
    per = assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("tt"),
        F.count("*").alias("k"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / (F.col("tt") / F.col("k")), 6
        ).alias("token_balance"),
    )


def _cross_dedup_oracle() -> str:
    from pro_etl_spark.ops.dedup import _LSH_PAIRS_CTE

    return _LSH_PAIRS_CTE + """
    , src AS (SELECT doc_id, source FROM documents),
    counts AS (SELECT source, COUNT(*) AS n_docs FROM src GROUP BY 1),
    m AS (
      SELECT LEAST(sa.source, sb.source) AS source_a,
             GREATEST(sa.source, sb.source) AS source_b,
             COUNT(*) AS n_dup_pairs
      FROM pairs p
      JOIN src sa ON sa.doc_id = p.doc_a
      JOIN src sb ON sb.doc_id = p.doc_b
      GROUP BY 1, 2
    )
    SELECT m.source_a, m.source_b, CAST(m.n_dup_pairs AS BIGINT)
             AS n_dup_pairs,
           ROUND(1000000.0 * m.n_dup_pairs
                 / (CAST(ca.n_docs AS DOUBLE) * cb.n_docs), 6)
             AS dup_ppm
    FROM m
    JOIN counts ca ON ca.source = m.source_a
    JOIN counts cb ON cb.source = m.source_b
    """


@register("corpus_cross_dedup_matrix", oracle=_cross_dedup_oracle())
def corpus_cross_dedup_matrix(spark: SparkSession, d: str) -> DataFrame:
    """Cross-source duplication matrix: for each (source, source)
    cell, how many VERIFIED near-dup pairs straddle it, normalized by
    the cell's doc-count product (parts-per-million) — the provenance
    census that tells a crawl team WHO is mirroring WHOM (a hot
    off-diagonal cell = one source republishing another; a hot
    diagonal = internal boilerplate). Pure composition over the
    cached LSH pair table + a broadcast source census; the pair's
    sources are canonically ordered (least/greatest) so each
    unordered cell appears once.

    Scale: pair-table-sized joins against a broadcast (doc_id →
    source) projection... at 100 TB that projection is itself big, so
    the two lookups are key shuffles of the PAIR table (dup pairs ≪
    corpus), never of the corpus."""
    pairs = dedup_minhash_lsh(spark, d)
    src = load(spark, d, "documents").select("doc_id", "source")
    counts = src.groupBy("source").agg(F.count("*").alias("n_docs"))
    sa = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
    )
    sb = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
    )
    m = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("n_dup_pairs"))
    )
    ca = counts.select(
        F.col("source").alias("source_a"), F.col("n_docs").alias("na")
    )
    cb = counts.select(
        F.col("source").alias("source_b"), F.col("n_docs").alias("nb")
    )
    return (
        m.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_dup_pairs",
            F.round(
                1000000.0
                * F.col("n_dup_pairs")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("dup_ppm"),
        )
    )


def _dup_inflation_oracle() -> str:
    from pro_etl_spark.ops.dedup import _LSH_PAIRS_CTE

    return _LSH_PAIRS_CTE + r"""
    , nodes AS (
      SELECT doc_a AS doc_id FROM pairs
      UNION SELECT doc_b FROM pairs
    ), toks AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_toks
      FROM documents
    ), tot AS (
      SELECT SUM(n_toks) AS tt, COUNT(*) AS td FROM toks
    ), dup AS (
      SELECT COALESCE(SUM(t.n_toks), 0) AS dt, COUNT(*) AS dd
      FROM nodes n JOIN toks t USING (doc_id)
    )
    SELECT CAST(tot.td AS BIGINT) AS n_docs,
           CAST(tot.tt AS BIGINT) AS n_tokens,
           CAST(dup.dd AS BIGINT) AS n_dup_docs,
           CAST(dup.dt AS BIGINT) AS n_dup_tokens,
           ROUND(CAST(dup.dt AS DOUBLE) / tot.tt, 6) AS dup_token_share
    FROM tot, dup
    """


@register("corpus_dup_inflation", oracle=_dup_inflation_oracle())
def corpus_dup_inflation(spark: SparkSession, d: str) -> DataFrame:
    """Duplication inflation — the TOKEN-weighted cost of near-dups:
    what share of the corpus's token mass sits inside verified
    near-dup families (every one of those tokens buys repeated
    gradient steps on repeated content — the compute-waste number a
    dedup rollout quotes to justify itself, which doc-count dup rates
    understate because duplicated documents skew long). Membership
    comes from the cached LSH pair table's node set; token counts from
    one narrow census; both totals are exact BIGINTs.

    Scale: the pair-node set is dup-sized (≪ corpus); the token census
    is one map pass + map-side-combined sums; the membership join
    shuffles the NODE set against the census keys, never the corpus
    against itself."""
    from pro_etl_spark.ops.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, d)
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    toks = load(spark, d, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_toks"
        ),
    )
    tot = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    dup = nodes.join(toks, "doc_id").agg(
        F.count("*").cast("long").alias("n_dup_docs"),
        F.coalesce(F.sum("n_toks"), F.lit(0)).cast("long").alias(
            "n_dup_tokens"
        ),
    )
    return tot.crossJoin(F.broadcast(dup)).select(
        "n_docs",
        "n_tokens",
        "n_dup_docs",
        "n_dup_tokens",
        F.round(
            F.col("n_dup_tokens").cast("double") / F.col("n_tokens"), 6
        ).alias("dup_token_share"),
    )


TEMPLATE_PREFIX_TOKENS = 8

_PREFIX_SQL = (
    "array_to_string(regexp_split_to_array(trim(text), '\\s+')"
    f"[1:{TEMPLATE_PREFIX_TOKENS}], ' ')"
)


@register(
    "corpus_template_prefix",
    oracle=rf"""
    WITH pfx AS (
      SELECT doc_id,
             {DUCK_HASH60.format(x=_PREFIX_SQL)} AS ph
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\s+'))
            >= {TEMPLATE_PREFIX_TOKENS}
    )
    SELECT ph AS prefix_hash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS exemplar_doc
    FROM pfx GROUP BY ph HAVING COUNT(*) > 1
    """,
)
def corpus_template_prefix(spark: SparkSession, d: str) -> DataFrame:
    """Template-family detection by identical opening: documents
    sharing the exact same first TEMPLATE_PREFIX_TOKENS tokens are
    almost always instantiations of one template (auto-generated
    product pages, boilerplate legal intros) — the cheap screen that
    catches what full-document MinHash dilutes (a template with long
    varying bodies has LOW overall Jaccard but an identical head).
    One prefix hash per doc, one grouped census of families with >1
    member plus a deterministic exemplar.

    Scale: narrow slice+hash per doc, one map-side-combinable shuffle
    on the prefix hash — the same cost as exact dedup, run over an
    8-token key instead of the whole text."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    pfx = hash60(
        F.array_join(F.slice(toks, 1, TEMPLATE_PREFIX_TOKENS), " ")
    )
    return (
        load(spark, d, "documents")
        .where(F.size(toks) >= TEMPLATE_PREFIX_TOKENS)
        .select("doc_id", pfx.alias("prefix_hash"))
        .groupBy("prefix_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("exemplar_doc"),
        )
        .where(F.col("n_docs") > 1)
    )


#: exact-substring decontamination probe: a SUBSTR_PROBE_LEN-char
#: snippet lifted from each eval doc at this (1-based) offset
SUBSTR_PROBE_START = 41
SUBSTR_PROBE_LEN = 60
#: loud bound on the driver-collected probe list (ADVICE_r11): a real
#: benchmark probe set is KBs, but the synthetic eval set is 1/50 of
#: the corpus, so the list grows O(corpus) here — 1M probes x ~60 chars
#: is the ~comfortably-broadcastable ceiling before the design must
#: change (probe table join instead of closure shipping).
SUBSTR_PROBE_CAP = 1_000_000

#: windows processed per strided-hash chunk. The W·P product
#: materializes _SUBSTR_CHUNK × SUBSTR_PROBE_LEN uint64s, so peak
#: extra memory per task is ~chunk × 60 × 8 B ≈ 48 MB — bounded
#: regardless of document length, and safe × 32 concurrent tasks
_SUBSTR_CHUNK = 100_000

#: collected probe list per (app, dataset) — bounded (eval-set-sized)
#: driver model state, memoized so repeat constructions stay lazy
_SUBSTR_PROBES_MEMO: dict = {}

from pro_etl_spark.io import DATASET_MEMOS as _DATASET_MEMOS  # noqa: E402

_DATASET_MEMOS.append(_SUBSTR_PROBES_MEMO)


@register(
    "decontaminate_substring",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT substr(text, {SUBSTR_PROBE_START},
                             {SUBSTR_PROBE_LEN}) AS probe
      FROM documents
      WHERE doc_id % {DECON_EVAL_MOD} = 0
        AND length(text) >= {SUBSTR_PROBE_START + SUBSTR_PROBE_LEN - 1}
    ), wins AS (
      SELECT DISTINCT doc_id,
             substr(text, CAST(i AS INTEGER), {SUBSTR_PROBE_LEN}) AS w
      FROM documents,
           UNNEST(range(1, length(text) - {SUBSTR_PROBE_LEN - 2})) AS u(i)
      WHERE doc_id % {DECON_EVAL_MOD} != 0
        AND length(text) >= {SUBSTR_PROBE_LEN}
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_probe_hits
    FROM wins JOIN ev ON w = probe
    GROUP BY doc_id
    """,
)
def decontaminate_substring(spark: SparkSession, d: str) -> DataFrame:
    """Exact-substring benchmark decontamination — the verbatim-leak
    twin of ``decontaminate_ngrams``: each held-out eval document
    contributes one fixed-offset {SUBSTR_PROBE_LEN}-character probe,
    and any training document containing a probe VERBATIM is flagged
    with its distinct-probe hit count. This is the high-precision
    pass real decontamination stacks run alongside n-gram overlap
    (n-grams catch paraphrases/whitespace drift; exact substrings
    catch wholesale copy-paste of answer keys — GPT-3 and Llama both
    report the pair).

    SCALE REWRITE history (this is the probe's most-iterated key):
    - round 7: the first cut broadcast the probes and streamed the
      corpus past contains() — a BroadcastNestedLoopJoin, O(docs ×
      probes), 118 s at the 10× layout.
    - rounds 7-10: declarative Rabin-Karp — explode each training doc
      to its {SUBSTR_PROBE_LEN}-char windows in-row and equi-join the
      (broadcast) probe set: 40-46 s at 10×. Profiling (round 11)
      showed the time is NOT byte volume but per-window HOF lambda
      overhead: hashing the windows (60→8 bytes) inside the transform
      only moved 10× from 41→34 s, and a bare 8-char variant 27 s.
    - round 11 (current): vectorized Rabin-Karp in ``mapInPandas`` —
      one Arrow pass over the corpus; per doc, numpy computes all
      window hashes as a strided uint64 dot product, prefilters
      against the (bounded, eval-set-sized) probe-hash array, and
      VERIFIES each candidate by exact string membership in the probe
      set before it counts, so hash collisions cannot change the
      answer in either direction (containment ⇒ its own window hash
      matches ⇒ never missed; spurious matches die at the string
      check). 10.4 s at 10× (4× over the declarative form), value
      parity exact at sf0.1 and 10×.

    Scale: one narrow corpus pass (Arrow-batched, numpy-vectorized —
    no per-row Python), window memory bounded by _SUBSTR_CHUNK
    regardless of document length, probe state O(eval set) shipped in
    the closure (same bounded-broadcast contract as
    ``decontaminate_ngrams``' eval shingles; a benchmark-suite probe
    set is KBs). HONESTY NOTE (ADVICE_r11): under THIS synthetic data
    model the "eval set" is doc_id % DECON_EVAL_MOD — 1/50 of the
    whole corpus — so the collected probe list grows O(corpus), not
    O(benchmark); real decontamination runs carry a fixed benchmark
    suite and stay KB-sized. SUBSTR_PROBE_CAP makes the boundary loud
    instead of silent: past the cap the collect raises rather than
    quietly shipping an unbounded closure. Probes are collected once
    per (app, dataset) — the memo keeps repeat constructions lazy."""
    import numpy as np

    docs = load(spark, d, "documents")
    min_len = SUBSTR_PROBE_START + SUBSTR_PROBE_LEN - 1
    L = SUBSTR_PROBE_LEN
    key = (spark.sparkContext.applicationId, d)
    probes = _SUBSTR_PROBES_MEMO.get(key)
    if probes is None:
        probes = sorted(
            r.probe
            for r in docs.where(
                (F.col("doc_id") % DECON_EVAL_MOD == 0)
                & (F.length("text") >= min_len)
            )
            .select(
                F.substring(
                    "text", SUBSTR_PROBE_START, SUBSTR_PROBE_LEN
                ).alias("probe")
            )
            .distinct()
            .limit(SUBSTR_PROBE_CAP + 1)
            .collect()
        )
        if len(probes) > SUBSTR_PROBE_CAP:
            raise ValueError(
                f"decontaminate_substring: eval probe set exceeds "
                f"SUBSTR_PROBE_CAP={SUBSTR_PROBE_CAP}; the bounded-"
                "closure contract (probes ship to every task) no "
                "longer holds at this corpus/eval ratio — shrink the "
                "probe set or raise the cap deliberately"
            )
        _SUBSTR_PROBES_MEMO[key] = probes

    # polynomial window hash over code points (utf-32 decode matches
    # Spark's code-point substring semantics on every plane); uint64
    # arithmetic wraps modularly in numpy, both sides use the same path
    P = np.ones(L, dtype=np.uint64)
    with np.errstate(over="ignore"):  # modular wraparound is the point
        for i in range(L - 2, -1, -1):
            P[i] = P[i + 1] * np.uint64(1099511628211)

    def _codes(s: str) -> "np.ndarray":
        return np.frombuffer(
            s.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.uint64)

    probe_set = set(probes)
    probe_hashes = np.array(
        sorted({int((_codes(p) * P).sum(dtype=np.uint64)) for p in probes}),
        dtype=np.uint64,
    )

    def scan(batches):
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            out_ids, out_hits = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                if n < L or probe_hashes.size == 0:
                    continue
                c = _codes(text)
                hits: set = set()
                # chunked strided windows: peak extra memory is
                # O(_SUBSTR_CHUNK * L), not O(len(text) * L)
                for start in range(0, n - L + 1, _SUBSTR_CHUNK):
                    seg = c[start : start + _SUBSTR_CHUNK + L - 1]
                    W = sliding_window_view(seg, L)
                    with np.errstate(over="ignore"):
                        h = (W * P).sum(axis=1, dtype=np.uint64)
                    for j in np.nonzero(np.isin(h, probe_hashes))[0]:
                        w = text[start + j : start + j + L]
                        if w in probe_set:  # exact verify — no FP/FN
                            hits.add(w)
                if hits:
                    out_ids.append(doc_id)
                    out_hits.append(len(hits))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out_ids, dtype="int64"),
                    "n_probe_hits": pd.array(out_hits, dtype="int64"),
                }
            )

    train = docs.where(
        (F.col("doc_id") % DECON_EVAL_MOD != 0)
        & (F.length("text") >= SUBSTR_PROBE_LEN)
    ).select("doc_id", "text")
    return train.mapInPandas(scan, schema="doc_id long, n_probe_hits long")



#: Neyman allocation: total sampling budget to split across strata
NEYMAN_BUDGET = 10_000


@register(
    "sample_neyman_alloc",
    oracle=f"""
    WITH m AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(n_chars) AS DOUBLE) AS sx,
             CAST(SUM(n_chars * n_chars) AS DOUBLE) AS sxx
      FROM documents GROUP BY source
    ), s AS (
      SELECT source, n,
             sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)))
               AS sd
      FROM m WHERE n > 1
    ), t AS (
      SELECT source, n, sd,
             CAST(ROUND(n * sd, 6) AS DECIMAL(28,6)) AS term
      FROM s
    ), tot AS (
      SELECT SUM(term) AS total FROM t
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           ROUND(sd, 6) AS std_chars,
           ROUND(CAST(term AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS alloc_share,
           CAST(ROUND({NEYMAN_BUDGET} * CAST(term AS DOUBLE)
                      / CAST(total AS DOUBLE), 0) AS BIGINT) AS n_alloc
    FROM t CROSS JOIN tot
    """,
)
def sample_neyman_alloc(spark: SparkSession, d: str) -> DataFrame:
    """NEYMAN (optimal) stratified-sampling allocation — how a
    {NEYMAN_BUDGET}-doc eval/annotation budget should split across
    sources to minimize the estimator variance of a target metric
    (here n_chars): n_h proportional to N_h*S_h, so big AND
    internally-diverse strata get more samples than big-but-uniform
    ones — the upgrade over ``sample_stratified``'s proportional
    rule. Per-stratum std comes from exact integer moments (n_chars
    is BIGINT: Sigmax, Sigmax^2 are exact); each N_h*S_h term is rounded to
    6 dp and summed as DECIMAL so the normalizing total is
    order-independent — never a raw double sum across strata.

    Scale: one grouped pass to |sources| moment rows; everything
    after runs on that model-state table (the 1-row total broadcast
    back). The allocation feeds ``sample_per_group`` as its per-key
    quota."""
    m = (
        load(spark, d, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("double").alias("sx"),
            F.sum(F.col("n_chars") * F.col("n_chars"))
            .cast("double")
            .alias("sxx"),
        )
        .where(F.col("n") > 1)
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    s = m.select(
        "source",
        "n",
        F.sqrt((n * sxx - sx * sx) / (n.cast("double") * (n - 1))).alias(
            "sd"
        ),
    )
    t = s.select(
        "source",
        "n",
        "sd",
        F.round(n * F.col("sd"), 6).cast("decimal(28,6)").alias("term"),
    )
    tot = t.agg(F.sum("term").alias("total"))
    share = F.col("term").cast("double") / F.col("total").cast("double")
    return t.crossJoin(F.broadcast(tot)).select(
        "source",
        n.cast("long").alias("n_docs"),
        F.round(F.col("sd"), 6).alias("std_chars"),
        F.round(share, 6).alias("alloc_share"),
        F.round(F.lit(NEYMAN_BUDGET) * share, 0)
        .cast("long")
        .alias("n_alloc"),
    )


@register(
    "corpus_contamination_report",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), sh AS (
      {_DUCK_SHINGLES}
    ), ev AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % {DECON_EVAL_MOD} = 0
    ), ng AS (
      SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (s)
      WHERE sh.doc_id % {DECON_EVAL_MOD} != 0
    ), probes AS (
      SELECT DISTINCT substr(text, {SUBSTR_PROBE_START},
                             {SUBSTR_PROBE_LEN}) AS probe
      FROM documents
      WHERE doc_id % {DECON_EVAL_MOD} = 0
        AND length(text) >= {SUBSTR_PROBE_START + SUBSTR_PROBE_LEN - 1}
    ), sub AS (
      SELECT DISTINCT doc_id FROM documents JOIN probes
        ON strpos(text, probe) > 0
      WHERE doc_id % {DECON_EVAL_MOD} != 0
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_train_docs,
           CAST(COUNT(ng.doc_id) AS BIGINT) AS n_ngram_hits,
           CAST(COUNT(sub.doc_id) AS BIGINT) AS n_substring_hits,
           CAST(COUNT(CASE WHEN ng.doc_id IS NOT NULL
                            AND sub.doc_id IS NOT NULL THEN 1 END)
                AS BIGINT) AS n_both,
           ROUND(CAST(COUNT(CASE WHEN ng.doc_id IS NOT NULL
                                   OR sub.doc_id IS NOT NULL THEN 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS contaminated_share
    FROM documents d
    LEFT JOIN ng ON ng.doc_id = d.doc_id
    LEFT JOIN sub ON sub.doc_id = d.doc_id
    WHERE d.doc_id % {DECON_EVAL_MOD} != 0
    GROUP BY d.source
    """,
)
def corpus_contamination_report(spark: SparkSession, d: str) -> DataFrame:
    """CONTAMINATION REPORT — the per-source audit both
    decontamination passes feed: n-gram overlap
    (``decontaminate_ngrams``, catches paraphrase/whitespace drift)
    and exact-substring probes (``decontaminate_substring``, catches
    verbatim answer-key paste) attributed per training source, with
    the overlap between methods — the table a data lead reads before
    deciding which sources need quarantine vs spot-review. Method
    attribution matters: a source hot on substring but cold on n-gram
    is wholesale copying; the reverse is template soup.

    Scale: composes the two flag tables (each already
    broadcast-probe-shaped); the report join is two LEFT semi-shaped
    joins on doc_id against flag sets orders of magnitude smaller
    than the corpus, then a |sources|-row rollup."""
    docs = load(spark, d, "documents")
    ng = (
        decontaminate_ngrams(spark, d)
        .select("doc_id")
        .withColumn("ng_hit", F.lit(1))
    )
    sub = (
        decontaminate_substring(spark, d)
        .select("doc_id")
        .withColumn("sub_hit", F.lit(1))
    )
    train = docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0).select(
        "doc_id", "source"
    )
    j = train.join(ng, "doc_id", "left").join(sub, "doc_id", "left")
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_train_docs"),
        F.count("ng_hit").cast("long").alias("n_ngram_hits"),
        F.count("sub_hit").cast("long").alias("n_substring_hits"),
        F.count_if(
            F.col("ng_hit").isNotNull() & F.col("sub_hit").isNotNull()
        )
        .cast("long")
        .alias("n_both"),
        F.round(
            F.count_if(
                F.col("ng_hit").isNotNull() | F.col("sub_hit").isNotNull()
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("contaminated_share"),
    )


@register(
    "split_leakage_safe",
    oracle=_CLUSTERS_CTE
    + f"""
    , cl AS (
      SELECT node AS doc_id, cluster_id FROM lp
    ), assigned AS (
      SELECT d.doc_id,
             COALESCE(cl.cluster_id, d.doc_id) AS unit,
             CASE WHEN {DUCK_HASH60.format(
                 x="(CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)"
                   " || ':leak')")} % 100 < 90
                  THEN 'train' ELSE 'test' END AS split
      FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT unit) AS BIGINT) AS n_units
    FROM assigned GROUP BY split
    """,
)
def split_leakage_safe(spark: SparkSession, d: str) -> DataFrame:
    """LEAKAGE-SAFE train/test split — assign by NEAR-DUP CLUSTER,
    not by document: a plain row-hash split (``split_train_test``)
    puts two 0.9-Jaccard copies of the same page on opposite sides of
    the fence, and the eval set silently becomes a memorization test.
    Here every document inherits its ``dedup_clusters`` component id
    (singletons stay themselves), and the salted split hash is taken
    over the CLUSTER id — so an entire duplicate family lands in one
    split by construction, the same group-aware discipline sklearn's
    GroupShuffleSplit encodes, applied to the dedup graph. Output is
    the per-split census (docs + distinct units); the no-straddle
    invariant is structural (one hash per unit decides everyone) and
    pinned by test.

    Scale: one left join of the corpus against the cluster labeling
    (itself the bounded-round CC output), a hash, and a 2-row
    census."""
    labels = dedup_clusters(spark, d).select(
        F.col("doc_id").alias("l_doc"), "cluster_id"
    )
    docs = load(spark, d, "documents").select("doc_id")
    unit = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    assigned = (
        docs.join(labels, F.col("doc_id") == F.col("l_doc"), "left")
        .select(
            "doc_id",
            unit.alias("unit"),
            F.when(
                hash60(F.concat(unit.cast("string"), F.lit(":leak"))) % 100
                < 90,
                "train",
            )
            .otherwise("test")
            .alias("split"),
        )
    )
    return assigned.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("unit").cast("long").alias("n_units"),
    )


@register(
    "sample_neyman_apply",
    oracle=f"""
    WITH m AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(n_chars) AS DOUBLE) AS sx,
             CAST(SUM(n_chars * n_chars) AS DOUBLE) AS sxx
      FROM documents GROUP BY source
    ), s AS (
      SELECT source, n,
             sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)))
               AS sd
      FROM m WHERE n > 1
    ), t AS (
      SELECT source, n,
             CAST(ROUND(n * sd, 6) AS DECIMAL(28,6)) AS term
      FROM s
    ), tot AS (
      SELECT SUM(term) AS total FROM t
    ), quota AS (
      SELECT source,
             least(CAST(n AS BIGINT),
                   CAST(ROUND({NEYMAN_BUDGET} * CAST(term AS DOUBLE)
                              / CAST(total AS DOUBLE) / 20, 0) AS BIGINT))
               AS k
      FROM t CROSS JOIN tot
    ), ranked AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':neyman'),
                        d.doc_id) AS rn
      FROM documents d
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quota q ON q.source = r.source
    WHERE r.rn <= q.k
    """,
)
def sample_neyman_apply(spark: SparkSession, d: str) -> DataFrame:
    """Neyman allocation APPLIED — the end-to-end stratified sampler:
    ``sample_neyman_alloc``'s optimal per-source quotas (scaled to a
    tractable demo budget, capped at stratum size) drive a
    deterministic salted-hash rank-<=k draw per source — the
    ``sample_per_group`` mechanism under data-driven quotas instead
    of a constant K. This is the composition a real eval-set build
    runs: allocate by N_h*S_h, then draw reproducibly (same hash ->
    same sample across reruns, engines, and partitionings; adding
    documents later never evicts earlier draws below the quota
    boundary).

    Scale: the quota table is |sources| rows broadcast; the draw is
    one rank window per source partition with WindowGroupLimit
    pruning to k before any sort spill."""
    m = (
        load(spark, d, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("double").alias("sx"),
            F.sum(F.col("n_chars") * F.col("n_chars"))
            .cast("double")
            .alias("sxx"),
        )
        .where(F.col("n") > 1)
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    t = m.select(
        "source",
        "n",
        F.round(
            n * F.sqrt((n * sxx - sx * sx) / (n.cast("double") * (n - 1))),
            6,
        )
        .cast("decimal(28,6)")
        .alias("term"),
    )
    tot = t.agg(F.sum("term").alias("total"))
    quota = t.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            n.cast("long"),
            F.round(
                F.lit(NEYMAN_BUDGET)
                * F.col("term").cast("double")
                / F.col("total").cast("double")
                / 20,
                0,
            ).cast("long"),
        ).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":neyman"))),
        "doc_id",
    )
    ranked = (
        load(spark, d, "documents")
        .select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .where(F.col("rn") <= F.col("k"))
        .select("doc_id", "source")
    )


@register(
    "corpus_quality_dup_crosstab",
    oracle=_LSH_PAIRS_CTE
    + """
    , dup_ids AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs
      )
    ), q AS (
      SELECT doc_id,
             NTILE(3) OVER (ORDER BY n_chars DESC, doc_id) AS tert
      FROM documents
    )
    SELECT CASE tert WHEN 1 THEN 'long' WHEN 2 THEN 'mid'
                     ELSE 'short' END AS length_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(dup_ids.doc_id) AS BIGINT) AS n_dup_docs,
           ROUND(CAST(COUNT(dup_ids.doc_id) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate
    FROM q LEFT JOIN dup_ids USING (doc_id)
    GROUP BY tert
    """,
)
def corpus_quality_dup_crosstab(spark: SparkSession, d: str) -> DataFrame:
    """DUPLICATION x QUALITY crosstab — does near-duplication
    concentrate in a quality stratum? Docs are split into
    length terciles (deterministic NTILE over n_chars, the cheapest
    quality proxy; swap in ``corpus_ccnet_buckets``' LM terciles for
    the production cut) and each stratum reports its verified-LSH
    dup-membership rate. The decision this feeds: if dups concentrate
    in the short/boilerplate tercile, a length gate BEFORE the LSH
    stage removes most of the pair volume at token-filter cost —
    pipeline ordering driven by measurement instead of folklore.

    Scale: dup membership is the pair table's distinct endpoints
    (pair-table-sized); the tercile window is a global rank on the
    doc-grain — at corpus scale it re-keys through the distributed
    NTILE helper like ``rfm_segmentation``; the census is 3 rows."""
    pairs = dedup_minhash_lsh(spark, d).select("doc_a", "doc_b")
    dup_ids = (
        pairs.selectExpr("doc_a AS doc_id")
        .unionAll(pairs.selectExpr("doc_b AS doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    q = (
        load(spark, d, "documents")
        .select("doc_id", "n_chars")
        .withColumn("tert", F.ntile(3).over(w))
    )
    bucket = (
        F.when(F.col("tert") == 1, "long")
        .when(F.col("tert") == 2, "mid")
        .otherwise("short")
    )
    return (
        q.join(dup_ids, "doc_id", "left")
        .groupBy(bucket.alias("length_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("is_dup").cast("long").alias("n_dup_docs"),
            F.round(
                F.count("is_dup").cast("double") / F.count("*"), 6
            ).alias("dup_rate"),
        )
    )


@register(
    "corpus_vocab_overlap",
    oracle=rf"""
    WITH tok AS (
      SELECT DISTINCT source, unnest({_DUCK_TOKS}) AS t
      FROM documents
    ), sizes AS (
      SELECT source, COUNT(*) AS v FROM tok GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS both_v
      FROM tok a JOIN tok b ON a.t = b.t AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b,
           CAST(sa.v AS BIGINT) AS vocab_a,
           CAST(sb.v AS BIGINT) AS vocab_b,
           CAST(both_v AS BIGINT) AS vocab_shared,
           ROUND(CAST(both_v AS DOUBLE)
                 / (sa.v + sb.v - both_v), 6) AS vocab_jaccard
    FROM inter
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)
def corpus_vocab_overlap(spark: SparkSession, d: str) -> DataFrame:
    """Pairwise VOCABULARY OVERLAP between sources — type-level
    Jaccard of each source pair's distinct-token sets: the
    domain-similarity read that complements
    ``corpus_js_divergence``'s frequency-weighted drift (two sources
    can share every TYPE yet differ wildly in MASS, and vice versa —
    tokenizer coverage cares about types, mixing weights about mass).
    Low vocab overlap between a new source and everything else =
    out-of-domain data that will stress the tokenizer
    (``corpus_oov_rate`` quantifies how much).

    Scale: the (source, token) grain is vocab-sized per source
    (bounded by the global vocab, not the corpus); the pair join is
    keyed by token with |sources|^2 output — trivially small; no
    corpus-sized shuffle anywhere past the initial distinct."""
    tok = (
        load(spark, d, "documents")
        .select("source", F.explode(_toks()).alias("t"))
        .distinct()
    )
    sizes = tok.groupBy("source").agg(F.count("*").alias("v"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("both_v"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("v").alias("vocab_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("v").alias("vocab_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("both_v").cast("long").alias("vocab_shared"),
            F.round(
                F.col("both_v").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("both_v")),
                6,
            ).alias("vocab_jaccard"),
        )
    )


#: drift drill-down: top-K tokens by absolute share shift
DRIFT_TOP_K = 15
#: the two sources compared (fixed pair so the key is deterministic)
DRIFT_SRC_A = "src0"
DRIFT_SRC_B = "src1"


@register(
    "corpus_drift_top_tokens",
    oracle=rf"""
    WITH tok AS (
      SELECT source, unnest({_DUCK_TOKS}) AS t
      FROM documents
      WHERE source IN ('{DRIFT_SRC_A}', '{DRIFT_SRC_B}')
    ), c AS (
      SELECT source, t, COUNT(*) AS n FROM tok GROUP BY source, t
    ), tot AS (
      SELECT source, SUM(n) AS total FROM c GROUP BY source
    ), shares AS (
      SELECT t,
             CAST(COALESCE(MAX(CASE WHEN c.source = '{DRIFT_SRC_A}'
                    THEN CAST(n AS DOUBLE) / total END), 0) AS DOUBLE)
               AS share_a,
             CAST(COALESCE(MAX(CASE WHEN c.source = '{DRIFT_SRC_B}'
                    THEN CAST(n AS DOUBLE) / total END), 0) AS DOUBLE)
               AS share_b
      FROM c JOIN tot ON tot.source = c.source
      GROUP BY t
    )
    SELECT t AS token,
           ROUND(share_a, 6) AS share_a,
           ROUND(share_b, 6) AS share_b,
           ROUND(share_b - share_a, 6) AS share_shift
    FROM shares
    ORDER BY abs(share_b - share_a) DESC, t
    LIMIT {DRIFT_TOP_K}
    """,
)
def corpus_drift_top_tokens(spark: SparkSession, d: str) -> DataFrame:
    """DRIFT DRILL-DOWN — the top-{DRIFT_TOP_K} tokens driving the
    distribution shift between two sources: per-token occurrence
    share in each, ranked by absolute shift. The aggregate drift
    numbers (``corpus_js_divergence``, ``corpus_source_drift``) say
    THAT two sources differ; this says WHICH terms carry the
    difference — the evidence a data lead needs before deciding
    whether drift is topical (fine) or contamination/markup (not).
    Shares are per-source token-mass fractions — identical integer
    operands divided once in both engines; the top-K selection is a
    total order (|shift| desc, token).

    Scale: token census per source (vocab-sized after the groupBy),
    a broadcast totals join, TakeOrderedAndProject for the top-K."""
    tok = (
        load(spark, d, "documents")
        .where(F.col("source").isin(DRIFT_SRC_A, DRIFT_SRC_B))
        .select("source", F.explode(_toks()).alias("t"))
    )
    c = tok.groupBy("source", "t").agg(F.count("*").alias("n"))
    tot = c.groupBy(F.col("source").alias("ts")).agg(
        F.sum("n").alias("total")
    )
    j = c.join(F.broadcast(tot), F.col("source") == F.col("ts"))
    shares = j.groupBy("t").agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("source") == DRIFT_SRC_A,
                    F.col("n").cast("double") / F.col("total"),
                )
            ),
            F.lit(0.0),
        ).alias("share_a"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("source") == DRIFT_SRC_B,
                    F.col("n").cast("double") / F.col("total"),
                )
            ),
            F.lit(0.0),
        ).alias("share_b"),
    )
    shift = F.col("share_b") - F.col("share_a")
    return (
        shares.select(
            F.col("t").alias("token"),
            F.round("share_a", 6).alias("share_a"),
            F.round("share_b", 6).alias("share_b"),
            F.round(shift, 6).alias("share_shift"),
        )
        .orderBy(F.abs(F.col("share_shift")).desc(), F.asc("token"))
        .limit(DRIFT_TOP_K)
    )


# --- population stability index --------------------------------------

PSI_BUCKETS = 16      # equi-width n_chars buckets of PSI_WIDTH chars
PSI_WIDTH = 256       # bucket = min(n_chars // 256, 15) — pure integers


@register(
    "corpus_psi",
    oracle=f"""
    WITH b AS (
      SELECT source, LEAST(n_chars // {PSI_WIDTH}, {PSI_BUCKETS - 1}) AS bkt
      FROM documents
    ), per AS (
      SELECT source, bkt, COUNT(*) AS c FROM b GROUP BY 1, 2
    ), scaffold AS (
      SELECT s.source, r.range AS bkt
      FROM (SELECT DISTINCT source FROM documents) s
      CROSS JOIN range({PSI_BUCKETS}) r
    ), filled AS (
      SELECT sc.source, sc.bkt, COALESCE(p.c, 0) AS c
      FROM scaffold sc LEFT JOIN per p
        ON p.source = sc.source AND p.bkt = sc.bkt
    ), tot AS (
      SELECT source, SUM(c) AS n FROM filled GROUP BY source
    ), gl AS (
      SELECT bkt, SUM(c) AS g FROM filled GROUP BY bkt
    ), gt AS (SELECT SUM(c) AS ng FROM filled),
    terms AS (
      SELECT f.source,
             CAST(FLOOR(
               ((CAST(f.c AS DOUBLE) + 0.5)
                  / (t.n + {PSI_BUCKETS * 0.5})
                - (CAST(g.g - f.c AS DOUBLE) + 0.5)
                  / (gt.ng - t.n + {PSI_BUCKETS * 0.5}))
               * LN(((CAST(f.c AS DOUBLE) + 0.5)
                       / (t.n + {PSI_BUCKETS * 0.5}))
                    / ((CAST(g.g - f.c AS DOUBLE) + 0.5)
                       / (gt.ng - t.n + {PSI_BUCKETS * 0.5})))
               * 1000000000.0 + 0.5) AS BIGINT) AS t_nanos
      FROM filled f
      JOIN tot t USING (source)
      JOIN gl g USING (bkt)
      CROSS JOIN gt
    )
    SELECT source,
           CAST(SUM(t_nanos) AS BIGINT) AS psi_nanos,
           CAST(SUM(t_nanos) AS DOUBLE) / 1000000000.0 AS psi
    FROM terms GROUP BY source
    """,
)
def corpus_psi(spark: SparkSession, d: str) -> DataFrame:
    """POPULATION STABILITY INDEX of each source's document-length
    distribution against the REST of the corpus — the standard
    model-monitoring drift score (PSI < 0.1 stable, 0.1–0.25 moderate,
    > 0.25 action), here answering "did this source's shape change
    relative to everything else" before its documents enter a training
    mix. Complements ``corpus_source_drift`` (TV on unigrams): PSI is
    log-weighted, so tail-bucket mass shifts that TV averages away
    light up.

    Determinism: buckets are pure integer arithmetic (min(n_chars//256,
    15) — no log2-of-boundary float hazard); every (source, bucket)
    cell exists via an explicit scaffold so Laplace smoothing (+0.5 per
    cell) applies to EMPTY buckets identically in both engines; each
    (p−q)·ln(p/q) term is floor-quantized to integer nanos before an
    exact integer sum (the corpus_lang_entropy recipe — float adds
    never reorder).

    Scale: one narrow pass for buckets, a (sources × 16)-row scaffold,
    broadcast totals; the corpus shuffles once on (source, bucket)."""
    docs = load(spark, d, "documents").select(
        "source",
        F.least(
            F.floor(F.col("n_chars") / PSI_WIDTH),
            F.lit(PSI_BUCKETS - 1),
        ).alias("bkt"),
    )
    per = docs.groupBy("source", "bkt").agg(F.count("*").alias("c"))
    scaffold = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(PSI_BUCKETS - 1))).alias(
                "bkt"
            ),
        )
        .select("source", F.col("bkt").cast("long").alias("bkt"))
    )
    filled = scaffold.join(per, ["source", "bkt"], "left").select(
        "source", "bkt", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    tot = filled.groupBy("source").agg(F.sum("c").alias("n"))
    gl = filled.groupBy("bkt").agg(F.sum("c").alias("g"))
    gt = filled.agg(F.sum("c").alias("ng"))
    half_b = PSI_BUCKETS * 0.5
    p = (F.col("c").cast("double") + 0.5) / (F.col("n") + F.lit(half_b))
    q = ((F.col("g") - F.col("c")).cast("double") + 0.5) / (
        F.col("ng") - F.col("n") + F.lit(half_b)
    )
    term = F.floor((p - q) * F.log(p / q) * 1_000_000_000.0 + 0.5).cast(
        "long"
    )
    terms = (
        filled.join(F.broadcast(tot), "source")
        .join(F.broadcast(gl), "bkt")
        .crossJoin(F.broadcast(gt))
        .select("source", term.alias("t_nanos"))
    )
    return terms.groupBy("source").agg(
        F.sum("t_nanos").cast("long").alias("psi_nanos"),
        (F.sum("t_nanos").cast("double") / 1_000_000_000.0).alias("psi"),
    )
