#!/usr/bin/env python
"""A/B harness for bench-scale conf tuning.

Times a representative query subset under several runtime-settable
conf variants in ONE session (table cache stays warm, so deltas are
attributable to the conf, not scan replay). Best-of-3 per query, same
protocol as bench.py.

Usage: python scripts/perf_ab.py [sf_dir]
       python scripts/perf_ab.py --suite [sf_dir]

--suite runs the CONCURRENT axis instead (round-6 verdict item 4:
the driver's suite_ratio swung 0.40 -> 0.88 between rounds): the
full bench HEADLINE submitted from 8 threads against one session —
bench.py's suite_wall protocol — once per conf variant, best-of-2
walls, interleaved A/B/A/B so machine-load drift cancels. Answers
whether the serial-loop scan-partition cap (minPartitionNum) helps
or hurts overlapped execution.
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


SUITE_VARIANTS = {
    # the bench serial-loop confs (sf<=0.2 block in bench.py)
    "bench(sh2,mp2,noaqe)": {
        "spark.sql.shuffle.partitions": "2",
        "spark.sql.files.minPartitionNum": "2",
        "spark.sql.adaptive.enabled": "false",
    },
    # round-6's serial confs, to isolate the round-6 change
    "r6(sh4,mp4,noaqe)": {
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.files.minPartitionNum": "4",
        "spark.sql.adaptive.enabled": "false",
    },
    # no scan cap: leaf-parallelism default (the r5 behavior)
    "nocap(sh4,noaqe)": {
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.files.minPartitionNum": "32",
        "spark.sql.adaptive.enabled": "false",
    },
}


def suite_mode(sf_dir: str) -> None:
    """Concurrent-suite A/B: bench.py's ThreadPool protocol per variant."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    os.environ["FMR_STREAM_FORCE_REEXEC"] = "1"
    import bench  # repo-root module; HEADLINE is the driver's suite

    registry = load_all()
    spark = get_spark(app_name="perf_ab_suite")
    spark.range(1000).count()

    def run_one(name: str) -> None:
        df = registry[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()

    def one_wall() -> float:
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(run_one, bench.HEADLINE))
        return time.time() - t0

    # untimed warm pass so rep 1 of variant 1 isn't the codegen run
    for k, v in next(iter(SUITE_VARIANTS.values())).items():
        spark.conf.set(k, v)
    one_wall()
    spark.catalog.clearCache()

    # interleave variants (A/B/C/A/B/C) so load drift hits all equally
    walls: dict[str, list[float]] = {v: [] for v in SUITE_VARIANTS}
    for _rep in range(2):
        for vname, conf in SUITE_VARIANTS.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            w = one_wall()
            spark.catalog.clearCache()
            walls[vname].append(round(w, 3))
            print(f"rep{_rep} {vname:22s} wall={w:6.2f}s", flush=True)
    print()
    for vname, ws in walls.items():
        print(f"{vname:22s} walls={ws} best={min(ws):.2f}s")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--suite":
        suite_mode(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        )
        return
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
            # start each (variant, query) cell cache-cold: a query
            # that persists a shared base would otherwise hand later
            # variants data materialized under an EARLIER variant's
            # confs, flattening exactly the A/B delta being measured
            spark.catalog.clearCache()
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
