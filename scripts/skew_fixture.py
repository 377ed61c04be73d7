#!/usr/bin/env python
"""Build the HEAVY-SKEW adversarial fixture (round-9 sweep axis 16):
99% of rows share ONE value on every high-traffic join/window key.
This is the regime AQE's skew-join splitting re-plans at runtime —
the axis proves the registry's OUTPUTS are invariant under that
re-plan (splitting a skewed partition must not change any aggregate,
window, or join result), not just that the salted-join operator's own
gate passes.

Key rewrites (hot value = the most frequent EXISTING value of the
column, so referential integrity survives — the hot key still points
at a real customer/supplier/part/user):

  orders.o_custkey     -> 99% hot customer (orders⋈customer skew)
  lineitem.l_suppkey   -> 99% hot supplier (lineitem⋈supplier skew)
  lineitem.l_partkey   -> 99% hot part     (lineitem⋈part skew)
  events.user_id       -> 99% hot user     (per-user windows: one
                          user now holds ~99% of all events — the
                          single-partition window regime)
  documents.lang       -> 99% one lang     (groupBy skew + per-lang
                          sampling/stratification with a dominant
                          stratum)

Row choice is row-order hash-based (row_number * Knuth constant mod
100 < 99) — byte-identical files for both engines, reproducible with
no seed store. Primary keys are untouched; only FK/grouping columns
are rewritten, so per-table row counts and all non-rewritten columns
are identical to the source.

Usage: python scripts/skew_fixture.py [out_dir] [src_sf_dir]
       (defaults: /tmp/sfskew, /root/testdata/sf0.01 — the driver's
        own correctness SF, big enough that the hot key's partition
        actually dominates)
Then:  python scripts/driver_sim.py /tmp/sfskew
"""

from __future__ import annotations

import os
import sys

import duckdb

KNUTH = 2654435761

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# table -> {column: pct_hot}
SKEW: dict[str, dict[str, int]] = {
    "orders": {"o_custkey": 99},
    "lineitem": {"l_suppkey": 99, "l_partkey": 99},
    "events": {"user_id": 99},
    "documents": {"lang": 99},
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        repl = SKEW.get(t)
        if not repl:
            con.execute(
                f"COPY (SELECT * FROM '{s}') TO '{d}' (FORMAT PARQUET)"
            )
        else:
            sets = []
            for i, (c, pct) in enumerate(sorted(repl.items())):
                row = con.execute(
                    f"SELECT {c} FROM '{s}' WHERE {c} IS NOT NULL"
                    f" GROUP BY {c} ORDER BY COUNT(*) DESC, {c} LIMIT 1"
                ).fetchone()
                if row is None:
                    continue  # empty source column: leave untouched
                hot = row[0]
                # render the hot value as a type-safe SQL literal:
                # escape quotes in strings; cast any non-int rendering
                # (date, timestamp, decimal, float) back to the source
                # column's own type so it never parses as arithmetic
                ctype = con.execute(
                    f"DESCRIBE SELECT {c} FROM '{s}'"
                ).fetchone()[1]
                if isinstance(hot, bool):
                    lit = "TRUE" if hot else "FALSE"
                elif isinstance(hot, int):
                    lit = str(hot)
                else:
                    esc = str(hot).replace("'", "''")
                    lit = f"'{esc}'::{ctype}"
                sets.append(
                    f"CASE WHEN (_rn * {KNUTH} + {i * 7919})"
                    f" % 100 < {pct} THEN {lit} ELSE {c} END AS {c}"
                )
            if not sets:
                con.execute(
                    f"COPY (SELECT * FROM '{s}') TO '{d}'"
                    " (FORMAT PARQUET)"
                )
            else:
                con.execute(
                    f"COPY (SELECT * EXCLUDE (_rn) REPLACE"
                    f" ({', '.join(sets)}) FROM (SELECT *,"
                    f" row_number() OVER () AS _rn FROM '{s}'))"
                    f" TO '{d}' (FORMAT PARQUET)"
                )
        n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
        print(f"{t}: {n} rows")
    for t, repl in SKEW.items():
        for c in repl:
            top = con.execute(
                f"SELECT {c}, COUNT(*) FROM '{out}/{t}.parquet'"
                f" GROUP BY {c} ORDER BY COUNT(*) DESC LIMIT 1"
            ).fetchone()
            tot = con.execute(
                f"SELECT COUNT(*) FROM '{out}/{t}.parquet'"
            ).fetchone()[0]
            print(
                f"  skew {t}.{c}: hot={top[0]!r}"
                f" {top[1]}/{tot} ({100.0 * top[1] / tot:.1f}%)"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
