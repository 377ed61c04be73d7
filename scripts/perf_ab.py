#!/usr/bin/env python
"""A/B harness for bench-scale conf tuning.

Times a representative query subset under several runtime-settable
conf variants in ONE session (table cache stays warm, so deltas are
attributable to the conf, not scan replay). Best-of-3 per query, same
protocol as bench.py.

Usage: python scripts/perf_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filemapreduce_spark.queries import load_all
from filemapreduce_spark.session import get_spark

SUBSET = [
    "q1_pricing_summary",
    "q6_revenue_delta",
    "q9_profit_by_nation",
    "q13_order_count_distribution",
    "window_topk_per_brand",
    "exact_quantiles_events",
    "dedup_exact_by_source",
    "bitmap_distinct_users",
    "ewma_daily_value",
    "semdedup_cluster_prune",
    "similarity_ivf_probe2",
    "dsir_importance_weights",
    "pandas_udf_char_classes",
    "apply_in_pandas_top3",
]

VARIANTS = {
    "base(32part,aqe)": {
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "true",
    },
    "8part,aqe": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "true",
    },
    "8part,noaqe": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "false",
    },
    "32part,noaqe": {
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "false",
    },
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry = load_all()
    spark = get_spark(app_name="perf_ab")
    spark.range(1000).count()

    results: dict[str, dict[str, float]] = {}
    for vname, conf in VARIANTS.items():
        for k, v in conf.items():
            spark.conf.set(k, v)
        times = {}
        for name in SUBSET:
            spec = registry[name]
            best = None
            for _ in range(3):
                t0 = time.time()
                df = spec.fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times[name] = best
        results[vname] = times
        print(f"{vname:18s} total={sum(times.values()):6.2f}s", flush=True)

    print()
    hdr = f"{'query':34s}" + "".join(f"{v:>18s}" for v in VARIANTS)
    print(hdr)
    for name in SUBSET:
        row = f"{name:34s}" + "".join(
            f"{results[v][name]:18.3f}" for v in VARIANTS
        )
        print(row)


if __name__ == "__main__":
    main()
