"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name:
sec}, "sf": ...}``.

Each query is executed once with a full action (count via noop write would be
ideal; ``toPandas`` would measure arrow transfer — we use ``count`` on the
final frame which forces full execution of every operator upstream).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import oe_batch_processing_spark.operators  # noqa: F401
from oe_batch_processing_spark import registry
from oe_batch_processing_spark.session import get_spark

# Headline set: one per operator family, weighted toward the expensive paths
# (fact-fact joins, windows over the full fact table, dedup/similarity).
HEADLINE = [
    "q1_pricing_summary",
    "flagship_revenue_by_nation",
    "q3_top_unshipped",
    "join_range_ship_latency",
    "join_left_order_counts",
    "agg_rollup_nation_priority",
    "agg_count_distinct",
    "win_topk_orders_per_priority",
    "win_running_customer_spend",
    "events_hourly_rollup",
    "events_user_stats",
    "array_norm_embeddings",
    # LLM-data ops:
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_jaccard_shingles",
    "text_quality_scores",
    "text_fingerprint_dedup",
    "similarity_topk_cosine",
    "similarity_topk_lsh",
    # advanced relational + streaming + UDAF:
    "asof_purchase_last_click",
    "stats_exact_moments",
    "udaf_user_value_trend",
    "stream_tumbling_counts",
    "fw_parse_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("bench")
    # Warm the JVM + parquet footers with a trivial action so per-query
    # timings measure the queries, not session startup.
    spark.range(1).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
