#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall seconds.

Queries are fully materialized via the `noop` sink (no driver collect, no
sink I/O in the measurement). One warmup query runs first so JVM/codegen
startup isn't billed to the first headliner.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_real_time_data_warehouse_spark.queries import registry  # noqa: E402
from flink_real_time_data_warehouse_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "province_stats",
    "product_stats",
    "order_wide",
    "payment_wide",
    "visitor_stats",
    "visitor_stats_cumulate",
    "keyword_stats",
    "top_customers",
    "local_supplier_volume",
    "cube_sales",
    "status_pivot",
    "customer_spend_quartiles",
    "urgent_part_suppliers",
    "order_value_quantiles",
    "running_gmv",
    "moving_avg_gmv",
    "uv_daily",
    "bounce_events",
    "asof_click_attribution",
    "scd2_user_status",
    "purchase_status_asof",
    "session_stats",
    # datapipe headliners (registered as they land)
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dup_spans",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "ann_topk",
    "ann_ivf_topk",
    "embedding_cosine_pairs",
    "embedding_clusters",
    "text_quality",
    "keyword_stats_cjk",
    "keyword_stats_dict",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "embedding_quantize",
    "ingest_pipeline",
    "multimodal_decode",
    "decontaminate",
    "dedup_clusters",
    "pack_sequences",
    "chunk_documents",
    "repetition_stats",
    "corpus_profile",
    "skew_salted_sales",
    "mixture_sample",
    "source_quota_sample",
    "token_budget_sample",
    "pii_scrub",
    "lm_surprisal",
    "cluster_balanced_sample",
    "vocab_topk",
    "tfidf_search",
    "frame_sample",
    "audio_chunks",
    "kmeans_centroids",
    "curation_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("frtdw-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run("q1_pricing_summary")  # warmup (JVM + codegen + parquet footer caches)

    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        times[name] = run(name)

    print(json.dumps({
        "metric": "headline query wall time at sf" + sf,
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
