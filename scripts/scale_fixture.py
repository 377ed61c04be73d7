#!/usr/bin/env python
"""Materialize a 10x synthetic scale fixture ("sf1") from sf0.1.

Round-12 scaling evidence (r11 verdict item 2): at sf<=0.1 the bench
pins toy-scale confs and nothing parallelizes, so core-count scaling
has only ever been argued from plan shape. This writes a dataset big
enough for the data-sized confs (AQE on, default partitions) to
engage: every table is 10 offset copies of its sf0.1 form — integer
keys shifted per copy so join/group cardinalities scale with the
data, payload columns byte-identical (duplicate texts/vectors across
copies exercise the dedup collapse at its intended regime).

PERF FIXTURE ONLY: no oracle parity claim (DuckDB twins are not run
against it); correctness stays pinned to the driver's testdata.
Output dir name contains "sf1" so bench-style sf parsing reads 1.0
and the toy-scale conf guard stays off.

Usage: python scripts/scale_fixture.py [out=/tmp/sf1synth] [src=/root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filemapreduce_spark.session import get_spark

OFFSET = 10_000_000

# per-table (key columns, copies): FK pairs shift together so
# referential joins scale. 50x everywhere (~1 GB): at 10x the fact
# shuffles AQE-coalesce below 8 partitions and per-stage fixed costs
# dominate, so nothing separates 8 from 32 cores.
KEYS = {
    "lineitem": (["l_orderkey"], 50),
    "orders": (["o_orderkey", "o_custkey"], 50),
    "customer": (["c_custkey"], 50),
    "events": (["event_id", "user_id"], 50),
    "documents": (["doc_id"], 50),
    "embeddings": (["vec_id"], 50),
    # dims stay single-copy: supplier/part/nation/region cardinality
    # is not what the corpus-pass heavies scale with
}
SINGLE = ("supplier", "part", "nation", "region")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1synth"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_fixture")
    os.makedirs(out, exist_ok=True)
    for name in SINGLE:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: single copy")
    for name, (keys, copies) in KEYS.items():
        base = spark.read.parquet(f"{src}/{name}.parquet")
        parts = []
        for i in range(copies):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            parts.append(c)
        uni = parts[0]
        for c in parts[1:]:
            uni = uni.unionAll(c)
        # 64 output files so the 32-core scan has real split
        # parallelism (8 files capped BOTH core counts at 8 scan
        # tasks and flattened the ratios)
        uni.repartition(64).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(f"{name}: {n} rows x{copies}")


if __name__ == "__main__":
    main()
