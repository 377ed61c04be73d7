#!/usr/bin/env python
"""Round-12 isolated query probe: time registry queries under the
committed bench confs (one warmed session, noop sink, best-of-N,
clearCache between queries) and optionally dump explain("formatted")
to plans/r12/<name>_<tag>.txt.

Usage:
  python scripts/probe_r12.py q1 q2 ...            # time, best-of-5
  python scripts/probe_r12.py --reps 7 q1 q2       # more reps
  python scripts/probe_r12.py --explain before q1  # also dump plans
  python scripts/probe_r12.py --interleave q1 q2   # A/B/A/B rep order
                                                   # (load cancels)

Prints one JSON line {"name": {"best": s, "reps": [...]}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filemapreduce_spark.queries import load_all
from filemapreduce_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    explain_tag = None
    interleave = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--explain":
            explain_tag = args[i + 1]
            i += 2
        elif a == "--interleave":
            interleave = True
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["FMR_STREAM_FORCE_REEXEC"] = "1"
    registry = load_all()
    spark = get_spark(app_name="probe_r12")
    # committed bench confs (toy scale)
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.minPartitionNum", "2")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
    spark.range(1000).count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )

    def one_rep(name: str) -> float:
        spec = registry[name]
        rebuild = name.startswith("streaming_")
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        construct = time.time() - t0
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        spark.catalog.clearCache()
        return el + (construct if rebuild else 0.0)

    out: dict[str, dict] = {n: {"reps": []} for n in names}
    if explain_tag:
        os.makedirs(plans_dir, exist_ok=True)
        for n in names:
            df = registry[n].fn(spark, sf_dir)
            p = os.path.join(plans_dir, f"{n}_{explain_tag}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            spark.catalog.clearCache()

    order = (
        [n for _ in range(reps) for n in names]
        if interleave
        else [n for n in names for _ in range(reps)]
    )
    for n in order:
        spark.sparkContext.setJobDescription(f"probe:{n}")
        out[n]["reps"].append(round(one_rep(n), 4))
    for n in names:
        out[n]["best"] = min(out[n]["reps"])
        out[n]["median"] = sorted(out[n]["reps"])[len(out[n]["reps"]) // 2]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
