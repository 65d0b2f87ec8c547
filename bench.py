"""Benchmark harness — driver contract (BASELINE.md grid).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once to warm the JVM/scan caches' code paths
(not cached data — a fresh action re-reads parquet), then timed over
`RUNS` runs taking the median, with a count() action to force full
execution without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RUNS = 3

BENCH_QUERIES = [
    # BASELINE.md grid anchors
    "dense_topk_cosine",        # topk_cosine (Q1)
    "dense_knn_by_id",          # Q2
    "dense_rocchio_rerank",     # Q3 feedback
    "tpch_q1_pricing_summary",  # TPC-H agg
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
]

# extended anchors appended as the registry grows; missing names skip
OPTIONAL_QUERIES = [
    "sparse_tfidf_topk",
    "sparse_bm25_topk",
    "sparse_multichannel_context",
    "fusion_dual_model_ensemble",
    "fusion_hybrid_sparse_dense",
    "bridge_interval_join",
    "group_hits_by_source",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "text_simhash_fingerprints",
    "text_quality_scores",
    "ann_lsh_topk_cosine",
    "emb_near_dup_lsh",
    "multimodal_decode_features",
    "stream_tumbling_event_counts",
    "session_window_stats",
    "dense_batch_topk_cosine",
    "sparse_batch_tfidf_topk",
    "ann_ivf_topk_cosine",
    "text_bigram_lm_scores",
    "dense_topk_cosine_arrow",
    "dense_batch_topk_cosine_arrow",
    "dedup_cluster_components",
    "heavy_hitters_tokens",
    "sketch_kmv_distinct_tokens",
    "emb_label_centroid_norms",
    "ann_pq_adc_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as se
    from multi_search_retrival_big_data_spark.session import get_spark

    spark = get_spark("msrbd-bench")
    qs = se.queries()
    names = [n for n in BENCH_QUERIES if n in qs] + [
        n for n in OPTIONAL_QUERIES if n in qs
    ]
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm-up
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total wall-clock over headline queries (each the median of 3 runs)",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
