#!/usr/bin/env python
"""Shared-scan probe: does multi-job execution over ONE persisted
files DataFrame beat running the same jobs as independent scans?

This is the reference's one real optimization (scan sharing: N jobs,
one traversal, one open+parse per file — /root/reference/jobs.go:3-5,
mapreduce.go:176-184) re-expressed as DataFrame persistence. The probe
synthesizes a file tree, runs K jobs shared vs. isolated, and prints
one JSON line with both times.

Usage: python scripts/sharedscan_probe.py [n_files] [k_jobs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filemapreduce_spark import FileEngine, Job
from filemapreduce_spark.session import get_spark

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
K_JOBS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def build_tree(root: str, n: int) -> None:
    """n small line-of-integers files across a 3-level hierarchy."""
    for i in range(n):
        d = os.path.join(root, f"top{i % 7}", f"mid{i % 13}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"f{i}.txt"), "w") as fh:
            fh.write("\n".join(str((i * 37 + j) % 1000) for j in range(50)))


def make_jobs(k: int) -> list[Job]:
    def lines(df):
        return df.select(
            F.explode(F.split(F.col("data"), "\n")).alias("line")
        ).filter(F.col("line") != "")

    templates = [
        lambda name: Job(
            name=name, path_filter="**/*.txt", loader="text",
            mapper=lines,
            reducer=lambda df: df.agg(F.count("*").alias("v")),
            finalizer=lambda df: df.collect()[0]["v"],
        ),
        lambda name: Job(
            name=name, path_filter="**/*.txt", loader="text",
            mapper=lambda df: lines(df).select(
                F.col("line").cast("long").alias("x")
            ),
            reducer=lambda df: df.agg(F.sum("x").alias("v")),
            finalizer=lambda df: df.collect()[0]["v"],
        ),
        lambda name: Job(
            name=name, path_filter="top1/**/*.txt", loader="text",
            mapper=lambda df: lines(df).select(
                F.col("line").cast("long").alias("x")
            ),
            reducer=lambda df: df.agg(F.max("x").alias("v")),
            finalizer=lambda df: df.collect()[0]["v"],
        ),
        lambda name: Job(
            name=name, path_filter="**/*.txt",
            finalizer=lambda df: df.count(),
        ),
    ]
    return [templates[i % len(templates)](f"job{i}") for i in range(k)]


def main():
    spark = get_spark(app_name="sharedscan_probe")
    spark.range(1000).count()  # warmup
    root = tempfile.mkdtemp(prefix="sharedscan_")
    try:
        build_tree(root, N_FILES)

        # isolated: each job is its own engine run — its own scan
        t0 = time.time()
        isolated_results = {}
        for job in make_jobs(K_JOBS):
            isolated_results.update(FileEngine(spark, root=root).run([job]))
        isolated_s = round(time.time() - t0, 3)

        # shared: one engine run, one persisted files DF
        t0 = time.time()
        shared_results = FileEngine(spark, root=root).run(make_jobs(K_JOBS))
        shared_s = round(time.time() - t0, 3)

        assert shared_results == isolated_results, (
            shared_results,
            isolated_results,
        )
        print(
            json.dumps(
                {
                    "metric": "sharedscan_speedup",
                    "n_files": N_FILES,
                    "k_jobs": K_JOBS,
                    "isolated_sec": isolated_s,
                    "shared_sec": shared_s,
                    "speedup": round(isolated_s / shared_s, 2),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
