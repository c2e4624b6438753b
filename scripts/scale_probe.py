"""Scale-probe the iterative / driver-loop / dedup-graph family at an
amplified documents+embeddings layout (see make_scale_probe.py) — the
would-it-survive-10x check above the sf0.1 sweep. Only keys that read
documents/embeddings are probed (the amplified layout carries no
TPC-H tables).

Round-7 result (SCALEPROBE_r7.json): 43/43 keys, zero errors at 10×
the bench scale; linear-ish except the pinned identical-copies
stress quadratics (dedup_embedding_kmeans ~269 s, dedup_semantic_keep
~279 s, dedup_embedding_srp ~68 s — every cell/bucket gets 10× denser
so candidates grow 100×; production mitigation: nlist ≈ √N for IVF,
more/wider bands for SRP). The probe also caught and fixed
decontaminate_substring's O(docs × probes) BroadcastNestedLoopJoin
(118 s → 48 s after the windowed equi-join rewrite, now linear).

Usage: python scripts/scale_probe.py [SF_DIR] [OUT_JSON] [KEY ...]
Defaults: /tmp/testdata_sf1, SCALEPROBE.json (repo root); with KEY
args only those keys run and the OUT_JSON is MERGED (existing
timings for other keys are kept) — lets a long probe resume past the
~200 s dedup_embedding_kmeans stress case without rerunning it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: documents/embeddings-only keys, heaviest families first: iterative
#: loops (clusters, k-core, pagerank, BPE, k-means, PCA), the LSH
#: pair paths, and the composed funnel
KEYS = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_lsh",
    "dedup_minhash_shingle",
    "dedup_minhash_shingle_lsh",
    "dedup_shingle_clusters",
    "dedup_simhash_lsh",
    "dedup_clusters",
    "dedup_paragraph",
    "dedup_incremental",
    "graph_pagerank",
    "graph_triangles",
    "graph_kcore",
    "bpe_pair_counts",
    "bpe_train_merges",
    "pca_power_top1",
    "pipeline_gopher_filter",
    "pipeline_data_funnel",
    "text_cooccurrence",
    "corpus_ngrams",
    "text_tfidf",
    "text_bm25",
    "seq_pack",
    "shuffle_shards",
    "decontaminate_ngrams",
    # round-7 additions: third iterative graph family (LPA), tokenizer
    # application (train + replay), info-theoretic drift, and the
    # grouped-running-sum PPS sampler
    "graph_label_propagation",
    "bpe_encode",
    "corpus_lang_entropy",
    "sample_weighted_systematic",
    # round-7 session 2: PPJoin exact similarity join (batch-gated),
    # hyperplane SRP-LSH, intra-doc span removal, degree
    # assortativity, exact-substring + two-method contamination,
    # leakage-safe split (consumes the CC labeling), fragment stitch,
    # dim-stats, cluster-size spectrum
    "dedup_ppjoin_prefix",
    "dedup_embedding_srp",
    "text_dedup_intra_span",
    "graph_assortativity",
    "decontaminate_substring",
    "corpus_contamination_report",
    "split_leakage_safe",
    "text_fragment_stitch",
    "embed_dim_stats",
    "dedup_cluster_size_histogram",
    # round-8 additions: the repartitioned embedding-cache family
    # (the round-7 scale-killers), the kmeans twins, the new
    # Hamming/banding paths and the heavier new analytics
    "dedup_embedding_kmeans",
    "dedup_semantic_keep",
    "ann_ivf_kmeans_topk",
    "kmeans_train",
    "ivf_kmeans_assign",
    "ann_binary_quant",
    "embed_random_projection",
    "mm_phash",
    "mm_phash_near_dup",
    "pca_power_top2",
    "funnel_attribution_markov",
    "graph_closeness_landmarks",
    "events_roc_auc",
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALEPROBE.json"
    only = [k for k in sys.argv[3:]]
    import pro_etl_spark
    from pro_etl_spark.session import get_spark

    spark = get_spark("scale-probe")
    qs = pro_etl_spark.get_queries()
    # `--all` (round 9): probe EVERY registered key — the amplified
    # layout now carries the full star schema (make_scale_probe.py),
    # so the window/join/SQL-API families are probe-able too, not
    # just the documents/embeddings heavy hitters. Keys that are
    # already in KEYS keep their place at the front (heaviest first)
    # so a partial run still covers the risk-ranked set.
    if only == ["--all"]:
        only = KEYS + sorted(k for k in qs if k not in KEYS)
    out = {}
    if only and os.path.exists(out_path):
        prior = json.load(open(out_path))
        out.update(prior.get("queries", {}))
    t_all = time.perf_counter()
    for name in only or KEYS:
        # isolate each key's measurement: without this, cached tables
        # from earlier keys accumulate until the storage pool thrashes
        # and LATE keys pay eviction pressure they didn't cause
        # (round 9: agg_corr_matrix measured 69 s mid-probe vs 9 s
        # clean — a 7× phantom). Each key now builds its own caches
        # inside its own timing; driver-side model memos (centroids,
        # codebooks, counts) survive, as they would in production.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)
        except Exception as e:
            out[name] = f"ERR: {type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({name: out[name]}), flush=True)
    # `value` is the PER-KEY SUM, not this run's wall clock: with the
    # merge/resume path (key args) a partial rerun's wall would
    # otherwise masquerade as the registry total (the round-9 record's
    # 996 s was exactly this artifact — its true full-pass sum was
    # 3202 s). `wall_sec` keeps this invocation's wall for reference.
    doc = {
        "metric": "scale_probe_total_sec",
        "value": round(
            sum(v for v in out.values() if isinstance(v, (int, float))), 2
        ),
        "unit": "sec",
        "wall_sec": round(time.perf_counter() - t_all, 2),
        "queries": out,
        "sf_dir": sf,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    errs = {k: v for k, v in out.items() if isinstance(v, str)}
    print(f"\n{len(out)} probed, {len(errs)} errors -> {out_path}",
          file=sys.stderr)
    for k, v in sorted(
        ((k, v) for k, v in out.items() if not isinstance(v, str)),
        key=lambda kv: -kv[1],
    )[:12]:
        print(f"{v:8.1f}  {k}", file=sys.stderr)


if __name__ == "__main__":
    main()
