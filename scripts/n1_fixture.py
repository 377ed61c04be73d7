#!/usr/bin/env python
"""Build the N=1-PER-GROUP adversarial fixture: exactly one row per
natural grouping key of each fact table (one event per event_type,
one order per priority, one lineitem per (returnflag, linestatus),
one customer per market segment, one document per lang, one
embedding, one part, one supplier; region/nation whole).

This is the third degenerate regime between "empty" and "small":
aggregates EXIST but every sample-variance denominator (n-1), every
zero-spread denominator (all group members equal), and every
single-member correlation hits 0 — exactly the class where a DuckDB
oracle NULLs a double/0 while ANSI Spark raises DIVIDE_BY_ZERO
(4 such bugs found by the round-8 pct=1 / pct=3 fixtures before
this fixture existed to target the class directly).

Usage: python scripts/n1_fixture.py [out_dir] [src_sf_dir]
       (defaults: /tmp/sfn1, /root/testdata/sf0.001)
Then:  python scripts/driver_sim.py /tmp/sfn1
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> grouping key(s) to keep one row per value-combo of;
# None = keep the whole table; () = keep exactly one row
SPEC = {
    "region": None,
    "nation": None,
    "customer": ("c_mktsegment",),
    "supplier": (),
    "part": ("p_brand",),
    "orders": ("o_orderpriority", "o_orderstatus"),
    "lineitem": ("l_returnflag", "l_linestatus"),
    "events": ("event_type",),
    "documents": ("lang",),
    "embeddings": ("label",),
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfn1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SPEC.items():
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if keys is None:
            con.execute(
                f"COPY (SELECT * FROM '{s}') TO '{d}' (FORMAT PARQUET)"
            )
        else:
            part = ", ".join(keys) if keys else "1"
            # deterministic representative: first row by full row order
            con.execute(
                f"COPY (SELECT * EXCLUDE (_rn, rowid) FROM ("
                f"  SELECT *, row_number() OVER ("
                f"    PARTITION BY {part} ORDER BY rowid) AS _rn"
                f"  FROM (SELECT *, row_number() OVER () AS rowid"
                f"        FROM '{s}')"
                f") WHERE _rn = 1) TO '{d}' (FORMAT PARQUET)"
            )
        n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
