#!/usr/bin/env python
"""Build the DEGENERATE sparse fixture: a deterministic ~10% row
sample of sf0.001 (region/nation kept whole), written as the same ten
parquet tables. Running driver_sim over it is the eighth sweep axis:
many groups/pairs/seeds that every real SF populates go EMPTY here,
which is exactly the regime where a Spark plan and its DuckDB oracle
can silently disagree (found round 7: hll_intersection_overlap's
inner-join pair drop, kcenter's fabricated-seed oracle row,
minhash_lsh_recall's ANSI divide-by-zero on an empty truth set).

The sample is row-order hash-based (row_number * Knuth constant mod
100 < 10), so both engines see byte-identical files and the fixture
is reproducible without a seed store. Referential integrity is NOT
preserved — joins against dropped keys are part of the point; both
engines compute over the same holes.

Usage: python scripts/sparse_fixture.py [out_dir] [src_sf_dir] [pct]
       (defaults: /tmp/sfsparse, /root/testdata/sf0.001, 10)
Then:  python scripts/driver_sim.py /tmp/sfsparse

pct=2 builds the ULTRA-degenerate variant (supplier goes fully empty,
several tables single-digit rows) — the regime that exposed the
divide-by-zero / fabricated-row / literal-vs-observed-boundary class
(7 more findings in round 7).
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
KEEP_WHOLE = {"region", "nation"}  # already tiny dimension tables


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfsparse"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tmp = os.path.join(out, "_sample_tmp.parquet")
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if t in KEEP_WHOLE:
            con.execute(
                f"COPY (SELECT * FROM '{s}') TO '{d}' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM (SELECT *, row_number() OVER ()"
                f" AS _rn FROM '{s}') WHERE (_rn * 2654435761) % 100"
                f" < {pct}) TO '{tmp}' (FORMAT PARQUET)"
            )
            con.execute(
                f"COPY (SELECT * EXCLUDE (_rn) FROM '{tmp}') TO '{d}'"
                f" (FORMAT PARQUET)"
            )
        n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
        print(f"{t}: {n} rows")
    if os.path.exists(tmp):
        os.remove(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
