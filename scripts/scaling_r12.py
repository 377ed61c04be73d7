#!/usr/bin/env python
"""Round-12 core-count scaling evidence (r11 verdict item 2).

Runs the corpus-pass heavies on the 10x synthetic fixture
(scripts/scale_fixture.py, sf parsed as 1.0 so the bench's toy-scale
confs stay OFF — AQE on, shuffle partitions sized to cores) under
local[32] and local[8], same timing protocol as bench.py (build once,
3 reps, best; streaming rebuilds per rep). Each core count runs in
its own subprocess so the JVM is sized honestly.

Usage:
  python scripts/scaling_r12.py              # parent: runs 32 then 8
  python scripts/scaling_r12.py --worker     # child (internal)

Prints one JSON line: {"sf_dir":..., "heavies": [...],
"sec_32": {...}, "sec_8": {...}, "ratio_8_over_32": {...}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEAVIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_profit_by_nation",
    "q18_large_orders",
    "proration_largest_remainder",
    "exact_quantiles_events",
    "image_decode_downsample",
    "audio_frame_energy_top2",
    "crossdoc_span_dedup",
    "containment_contamination_screen",
    "trigram_index_search",
    "winnowing_shared_fingerprints",
    "heavy_hitters_exact_mg",
    "dedup_survivors_minhash",
    "semdedup_cluster_prune",
    "sessionize_events",
]


def worker() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["FMR_STREAM_FORCE_REEXEC"] = "1"
    from filemapreduce_spark.queries import load_all
    from filemapreduce_spark.session import get_spark

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    registry = load_all()
    spark = get_spark(app_name="scaling_r12")
    spark.range(1000).count()
    times = {}
    for name in HEAVIES:
        spec = registry[name]
        df = spec.fn(spark, sf_dir)
        best = None
        for _ in range(3):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            e = time.time() - t0
            best = e if best is None else min(best, e)
        times[name] = round(best, 3)
        spark.catalog.clearCache()
    print("SCALEJSON " + json.dumps(times))


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1synth"
    out = {"sf_dir": sf_dir, "heavies": HEAVIES}
    for cpus in (32, 8):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [
            ln for ln in r.stdout.splitlines() if ln.startswith("SCALEJSON ")
        ]
        if not line:
            print(r.stdout[-2000:], file=sys.stderr)
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"worker cpus={cpus} produced no record")
        out[f"sec_{cpus}"] = json.loads(line[-1][len("SCALEJSON "):])
    out["ratio_8_over_32"] = {
        n: round(out["sec_8"][n] / out["sec_32"][n], 2)
        for n in HEAVIES
        if out["sec_32"].get(n)
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
