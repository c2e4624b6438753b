"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
JSON to stdout. The FINAL line is a complete, compact record
{"metric": ..., "value": N, "unit": "sec", "n_queries": K,
"queries": {top slowest...}, "sf": ...} sized to survive the round
driver's bounded stdout-tail capture; the line before it carries the
full per-query dict (metric suffix ``_full``).

Each query is executed to completion with a ``noop``-format write
(`df.write.format("noop")`): every output column of every output row
is fully computed and handed to the sink, but nothing is materialized
on the driver or on disk. A bare ``.count()`` is NOT sufficient —
Catalyst prunes projection-only plans down to
``Aggregate[count(1)] <- Project[] <- scan``, so e.g. a fingerprint
expression would never execute and the timing would measure a parquet
row-count (this was round 1's phantom-timing bug).
"""

from __future__ import annotations

import json
import os
import sys
import time

#: Round-5 flagged window_running_sum / text_quality / text_fingerprint
#: as ~2× their round-1 sub-second timings. All three operators are
#: code-identical to round 1 (verified by git diff against the v1
#: commit); the deltas are run-order/JVM-state noise in the sub-second
#: regime — the timed pass shares one JVM and the headline list has
#: tripled since r1, shifting GC and code-cache state around these
#: entries. Not added work; tracked here so the comparison stays honest.
#:
#: Round-8 isolation rerun of the round-6 50-query set
#: (SPARK_GRAFT_HEADLINE, same warm-up/session shape): 64.8 s vs
#: r6's 62.1 s — the round-7 in-suite "9% regression" collapses to
#: ~4%, and the residual decomposes into DELIBERATE changes, not plan
#: regressions:
#: - pipeline_data_funnel 3.4→5.4 s: round 7 switched its near-dup
#:   stage from unigram-LSH to the production SHINGLE-LSH pair table
#:   (unigram set-Jaccard over-merges on natural language) — the
#:   extra cost IS the upgraded semantics.
#: - ann_ivf_kmeans_topk 1.2→2.4 s, ann_ivfpq_topk 1.7→2.7 s: round 8
#:   scales the coarse quantizer with the corpus (nlist=⌈√N⌉ → 45
#:   cells at sf0.1 vs the old pinned 8), trading ~2 s at 1× for
#:   O(N·√N) instead of Θ(N²/8) at scale (SCALEPROBE_r8:
#:   dedup_embedding_kmeans 268.8→66.8 s at 10×).
#: - stream_tumbling / sql_large_volume_customers (the r7 in-suite
#:   1.9×/1.6× flags) recovered to r6 levels in isolation —
#:   suite-growth noise, as suspected.
HEADLINE = [
    "agg_multi_measure",
    "join_sortmerge",
    "join_broadcast_inner",
    "window_running_sum",
    "join_asof",
    "migration_reconciliation",
    "stream_tumbling",
    "dedup_minhash_lsh",
    # runs after dedup_minhash_lsh on purpose: it consumes the cached
    # verified pair table, like the production incremental pipeline
    "dedup_incremental",
    "dedup_exact",
    "dedup_paragraph",
    "decontaminate_ngrams",
    "shuffle_shards",
    "sql_returned_items",
    # SQL-API + stateful-history coverage (round-5 ask): a 7-table
    # TPC-H-ish join pipeline and an SCD2 interval reconstruction
    "sql_large_volume_customers",
    "scd2_intervals",
    "ann_cosine_topk",
    "ann_ivf_kmeans_topk",
    # round-5 additions: full IVF-PQ pipeline + bigram-LM scoring,
    # lexical retrieval + point-in-time temporal join coverage
    "ann_ivfpq_topk",
    "text_lm_score",
    "text_bm25",
    "join_temporal",
    "stream_join_static",
    "text_quality",
    "text_fingerprint",
    "text_tfidf",
    "cdc_snapshot_diff",
    # round-5 batch 2: widest TPC-H join, skew-salted join, corpus
    # trigram census, in-engine PCA training
    "sql_product_profit",
    "join_salted",
    "corpus_ngrams",
    "pca_power_top1",
    # round-5 batch 3: time-series resample, GloVe co-occurrence,
    # hybrid lexical+dense retrieval
    "events_ohlc",
    "text_cooccurrence",
    "ann_hybrid_rrf",
    # round-5 batch 4: exact-rewrite sequential analytics + sweep-line
    "anomaly_cusum",
    "interval_concurrency",
    # round-6: the biggest never-benched families — iterative graph
    # (Pregel-style pagerank, k-core peeling), CDC merge/apply,
    # cohort retention, the rewritten distributed-NTILE RFM, batch
    # sessionization, the Gopher quality-filter pipeline, sequence
    # packing, RAKE keyphrases, and multimodal frame energy
    "graph_pagerank",
    "graph_kcore",
    "merge_cdc_apply",
    "retention_cohorts",
    "rfm_segmentation",
    "sessionize",
    "pipeline_gopher_filter",
    "seq_pack",
    "text_rake_keyphrases",
    "mm_audio_energy",
    # round-6 batch 2: the composed corpus funnel (reuses the cached
    # LSH pair table like the production pipeline) and the exact
    # distributed-CDF KS drift test
    "pipeline_data_funnel",
    "events_ks_test",
    # shingle-MinHash carries the corpus's md5-per-shingle cost — kept
    # benched after the round-6 lambda-CSE fix (105 s -> ~8 s at
    # sf0.1: shingle hashes now materialize once in a cached table
    # instead of re-hashing per permutation); plus the Holt fold
    "dedup_minhash_shingle",
    "window_holt",
    # round-7: the shingle-LSH production pair path (signatures now
    # Horner-mixed from per-token hashes — no per-shingle md5) and the
    # sharded enveloped-XML sink (executor-side multi-doc write)
    "dedup_minhash_shingle_lsh",
    "sink_xml_sharded",
    # round-7 batch 2: shingle components, SemDeDup survivors, and the
    # grid-blocked spatial radius join
    "dedup_shingle_clusters",
    "dedup_semantic_keep",
    "join_spatial_grid",
    # round-7 batch 3: exact rank-sum test (distributed midranks)
    "events_mannwhitney",
    # round-7 batch 4: tokenizer application (train + replay over the
    # vocab grain) and the broadcast-back group-median imputation
    "bpe_encode",
    "impute_group_median",
    # round-7 batch 5: integer-exact systematic PPS sampling over the
    # range-distributed grouped running-sum helper
    "sample_weighted_systematic",
    # round-7 batch 6: third iterative graph family — synchronous LPA
    # over the LSH pair graph (keyed shuffle + window argmax per round)
    "graph_label_propagation",
    # round-7 batch 7: info-theoretic source drift (closed-form
    # absent-term mass) and prior-window Bollinger gating
    "corpus_js_divergence",
    "window_bollinger",
    # round-7 batch 8: frontier BFS over the near-dup graph (third
    # Pregel-style iterative family in the bench), filtered vector
    # search (the metadata-constrained retrieval shape), hard-negative
    # mining, and the rolling-correlation co-movement window
    "graph_bfs_distances",
    "ann_filtered_topk",
    "ann_hard_negatives",
    "window_rolling_corr",
    # round-7 session 2: the PPJoin exact similarity self-join (prefix
    # + positional filtering), hyperplane SRP-LSH over embeddings,
    # in-document repeated-span removal (pure-HOF text transform),
    # the binned big-x-big range join, the composite bot-score gate,
    # and CUPED variance reduction (moment-partial statistics)
    "dedup_ppjoin_prefix",
    "dedup_embedding_srp",
    "text_dedup_intra_span",
    "join_range_binned",
    "events_bot_score",
    "ab_cuped",
    # round-8: the corpus-scaled k-means dedup path (nlist = ceil(sqrt(N))
    # — these two were the round-7 scale-killers, benched to keep the 1x
    # cost honest), HITS over the dedup digraph, the DCT perceptual
    # hash, PSI drift, the windowed funnel, and the session-grain
    # feature rollup
    "dedup_embedding_kmeans",
    "graph_hits",
    "mm_phash",
    "corpus_psi",
    "funnel_time_constrained",
    "features_session_profile",
    # round-8 session 2: the Markov removal-effect attribution (8
    # broadcast-joined value-iteration rounds — the heaviest plan in
    # the new batch) and the Hamming-prefilter ANN rung
    "funnel_attribution_markov",
    "ann_binary_quant",
]

#: Version-pinned STABLE subset (round 10, VERDICT_r9 item 7): the
#: 80-key round-8/9 headline set frozen as an explicit list, reported
#: as a second total (`stable_total_sec`) alongside the full headline
#: total every round. Round-over-round comparisons read the stable
#: total — headline growth then never confounds the delta again (the
#: r9 1.09×-in-suite vs ~0.99×-isolated ambiguity was exactly that
#: confound). DO NOT edit this list when adding headline keys: append
#: new keys to HEADLINE above; mint a STABLE_V<next> only when the
#: old one's members change meaning.
STABLE_V10 = (
    "agg_multi_measure", "join_sortmerge", "join_broadcast_inner",
    "window_running_sum", "join_asof", "migration_reconciliation",
    "stream_tumbling", "dedup_minhash_lsh", "dedup_incremental",
    "dedup_exact", "dedup_paragraph", "decontaminate_ngrams",
    "shuffle_shards", "sql_returned_items", "sql_large_volume_customers",
    "scd2_intervals", "ann_cosine_topk", "ann_ivf_kmeans_topk",
    "ann_ivfpq_topk", "text_lm_score", "text_bm25", "join_temporal",
    "stream_join_static", "text_quality", "text_fingerprint",
    "text_tfidf", "cdc_snapshot_diff", "sql_product_profit",
    "join_salted", "corpus_ngrams", "pca_power_top1", "events_ohlc",
    "text_cooccurrence", "ann_hybrid_rrf", "anomaly_cusum",
    "interval_concurrency", "graph_pagerank", "graph_kcore",
    "merge_cdc_apply", "retention_cohorts", "rfm_segmentation",
    "sessionize", "pipeline_gopher_filter", "seq_pack",
    "text_rake_keyphrases", "mm_audio_energy", "pipeline_data_funnel",
    "events_ks_test", "dedup_minhash_shingle", "window_holt",
    "dedup_minhash_shingle_lsh", "sink_xml_sharded",
    "dedup_shingle_clusters", "dedup_semantic_keep", "join_spatial_grid",
    "events_mannwhitney", "bpe_encode", "impute_group_median",
    "sample_weighted_systematic", "graph_label_propagation",
    "corpus_js_divergence", "window_bollinger", "graph_bfs_distances",
    "ann_filtered_topk", "ann_hard_negatives", "window_rolling_corr",
    "dedup_ppjoin_prefix", "dedup_embedding_srp", "text_dedup_intra_span",
    "join_range_binned", "events_bot_score", "ab_cuped",
    "dedup_embedding_kmeans", "graph_hits", "mm_phash", "corpus_psi",
    "funnel_time_constrained", "features_session_profile",
    "funnel_attribution_markov", "ann_binary_quant",
)

# import-time drift guard: every stable key must still be a headline
# key, or stable_total_sec silently shrinks (ADVICE r10)
_stable_orphans = set(STABLE_V10) - set(HEADLINE)
assert not _stable_orphans, (
    f"STABLE_V10 keys not in HEADLINE: {sorted(_stable_orphans)}"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pro_etl_spark.session import get_spark
    import pro_etl_spark

    # subset override for apples-to-apples round comparisons: a
    # comma-separated key list (e.g. the round-6 headline set) runs
    # alone, in the given order, with the same warm-up/session shape —
    # isolating plan regressions from suite-growth noise
    global HEADLINE
    subset = os.environ.get("SPARK_GRAFT_HEADLINE")
    if subset:
        HEADLINE = [k.strip() for k in subset.split(",") if k.strip()]

    spark = get_spark("pro_etl_spark-bench")
    queries = pro_etl_spark.get_queries()

    def run_to_completion(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm-up (not timed): run every headline query once at the tiny
    # scale factor so whole-stage-codegen classes compile (Janino cache
    # is keyed by generated source — identical expression shapes on the
    # tiny inputs compile the same classes the timed run uses) and JVM
    # JIT/parquet-footer machinery spins up. Timings below then measure
    # steady-state execution, which is what matters at scale — compile
    # cost is a constant, not a function of data size. The warm-up uses
    # a DIFFERENT sf dir, so nothing the timed run reads (plans, caches,
    # memoized streams — all keyed by path) is pre-materialized.
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001"
    )
    run_to_completion(queries["agg_count"](spark, sf_dir))
    if warm_dir != sf_dir:
        for name in HEADLINE:
            run_to_completion(queries[name](spark, warm_dir))
        # drop the warm-up's cached tables (token/pair/embedding tables
        # keyed by the warm dir) so the timed pass starts from a clean
        # cache and its within-pass reuse is what gets measured
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        run_to_completion(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # Membership drift guard (ADVICE r10): a STABLE_V10 key renamed or
    # dropped from HEADLINE would silently shrink stable_total_sec and
    # break the round-over-round comparison the stable set exists for.
    # Fail loudly instead — unless an explicit SPARK_GRAFT_HEADLINE
    # subset run is in play, where partial intersection is the point.
    stable_set = set(STABLE_V10)
    if not subset:
        missing = stable_set - set(timings)
        assert not missing, (
            f"STABLE_V10 keys missing from HEADLINE timings: "
            f"{sorted(missing)} — stable_total_sec would silently "
            f"shrink; restore the keys or mint STABLE_V11"
        )
    stable = {k: v for k, v in timings.items() if k in stable_set}
    stable_total = round(sum(stable.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # The round driver stores only a bounded tail of stdout (~2 KB) and
    # parses the LAST line as JSON. With 75+ headline queries the full
    # per-query dict overflows that tail and the front of the line gets
    # truncated away (BENCH_r07/r08: "parsed": null). So: the complete
    # per-query dict goes on an EARLIER line (for logs/archive), and the
    # final line is a compact, always-complete JSON object whose queries
    # dict is capped (slowest-first) to fit the tail.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec_full",
                "value": total,
                "unit": "sec",
                "stable_total_sec": stable_total,
                "stable_n": len(stable),
                "stable_set": "v10",
                "queries": timings,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )
    budget = 1600  # bytes for the final line, safely under the tail cap
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    compact: dict[str, float] = {}
    for k, v in slowest:
        compact[k] = v
        line = json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "stable_total_sec": stable_total,
                "stable_n": len(stable),
                "stable_set": "v10",
                "queries": compact,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
        if len(line) > budget:
            del compact[k]
            break
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "stable_total_sec": stable_total,
                "stable_n": len(stable),
                "stable_set": "v10",
                "queries": compact,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
