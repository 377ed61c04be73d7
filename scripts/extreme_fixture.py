#!/usr/bin/env python
"""Build the EXTREME-VALUE adversarial fixture (round-10 sweep axis):
numeric magnitudes at the edges of the engine contract, pushed through
the integer-cents / micro-nat quantize-then-accumulate paths, plus
pre-epoch and far-future timestamps through the bucketing math.

Per column class, 5% of rows (row-order hash, per-column salt — same
reproducible Knuth scheme as the other fixtures) are replaced with a
rotation of boundary values:

  money DOUBLEs     ±1e12 (8 orders above TPC-H domain; cents stay
                    within BIGINT through every fixture-scale sum),
                    sub-cent 0.005/-0.005, and -0.0 (signed-zero
                    rendering/compare class)
  rates (disc/tax)  domain edges 0.0 / 1.0 / 0.9999 (zero-revenue,
                    division-by-(1-d) and log1p edges)
  l_quantity        1e9 / 0.001 / -0.0 (products with price stay
                    within DOUBLE; qty*100 cents stay within BIGINT)
  events.value      ±1e12, 5e-324 (denormal), 1e-15, ±0.0 — the
                    float-contract column (moments, EWMA, z-scores,
                    entropy/surprisal micro-nats)
  n_chars BIGINT    2^62 and 2^62+41 — a SUM of two of these
                    overflows BIGINT: the 100 TB-real class where
                    Spark ANSI raises while DuckDB widens to HUGEINT;
                    queries must carry DECIMAL(38)/DOUBLE sufficient
                    statistics instead
  p_size INT32      2147483647 (int32 max through averages/buckets)
  timestamps        1900-01-07 (pre-epoch: negative unix time through
                    floor-division bucketing), 1969-12-31 23:59:59
                    (epoch-1s), 2250-01-01 (ns-epoch ~8.8e18, inside
                    int64-ns/pandas range with headroom for +90d
                    window arithmetic)

Usage: python scripts/extreme_fixture.py [out] [src]
       (defaults /tmp/sfextreme, /root/testdata/sf0.001)
Then:  python scripts/driver_sim.py /tmp/sfextreme
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

MONEY = ["1e12", "-1e12", "0.005", "-0.005", "-0.0"]
RATE = ["0.0", "1.0", "0.9999"]
QTY = ["1e9", "0.001", "-0.0"]
VALUE = ["1e12", "-1e12", "5e-324", "1e-15", "-0.0", "0.0"]
NCHARS = ["4611686018427387904", "4611686018427387945"]
SIZE32 = ["2147483647"]
TS = [
    "TIMESTAMP '1900-01-07 03:04:05'",
    "TIMESTAMP '1969-12-31 23:59:59'",
    "TIMESTAMP '2250-01-01 12:00:00'",
]

# table -> {column: (pct, [literal, ...])}
EXTREME: dict[str, dict[str, tuple[int, list[str]]]] = {
    # supplier has only 10 rows at sf0.001 — 5% would hash-select
    # zero rows; 30% guarantees the small-dim table participates
    "customer": {"c_acctbal": (5, MONEY)},
    "supplier": {"s_acctbal": (30, MONEY)},
    "part": {"p_retailprice": (5, MONEY), "p_size": (5, SIZE32)},
    "orders": {
        "o_totalprice": (5, MONEY),
        "o_orderdate": (5, TS),
    },
    "lineitem": {
        "l_extendedprice": (5, MONEY),
        "l_quantity": (5, QTY),
        "l_discount": (5, RATE),
        "l_tax": (5, RATE),
        "l_shipdate": (5, TS),
    },
    "events": {"value": (5, VALUE), "ts": (5, TS)},
    "documents": {"n_chars": (5, NCHARS)},
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfextreme"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        repl = EXTREME.get(t)
        if not repl:
            con.execute(
                f"COPY (SELECT * FROM '{s}') TO '{d}' (FORMAT PARQUET)"
            )
        else:
            types = dict(
                con.execute(
                    "SELECT column_name, column_type FROM "
                    "(DESCRIBE SELECT * FROM read_parquet(?))",
                    [s],
                ).fetchall()
            )
            sets = []
            for i, (c, (pct, rot)) in enumerate(sorted(repl.items())):
                # hash stream 1 selects WHICH rows are extreme; an
                # independently-salted stream 2 picks the rotation
                # slot, so every slot appears on every selected column
                pick = " ".join(
                    f"WHEN (_rn * {KNUTH} + {i * 7919 + 31})"
                    f" % {len(rot)} = {j} THEN"
                    f" CAST({lit} AS {types[c]})"
                    for j, lit in enumerate(rot)
                )
                sets.append(
                    f"CASE WHEN (_rn * {KNUTH} + {i * 7919})"
                    f" % 100 < {pct} THEN (CASE {pick} END)"
                    f" ELSE {c} END AS {c}"
                )
            con.execute(
                f"COPY (SELECT * EXCLUDE (_rn) REPLACE"
                f" ({', '.join(sets)}) FROM (SELECT *,"
                f" row_number() OVER () AS _rn FROM '{s}'))"
                f" TO '{d}' (FORMAT PARQUET)"
            )
        n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
        print(f"{t}: {n} rows")
    # fixture self-audit: show the replaced-value histogram per column
    for t, repl in EXTREME.items():
        for c in sorted(repl):
            pct, rot = repl[c]
            lits = ", ".join(f"CAST({v} AS VARCHAR)" for v in rot)
            hit = con.execute(
                f"SELECT COUNT(*) FROM '{out}/{t}.parquet'"
                f" WHERE CAST({c} AS VARCHAR) IN ({lits})"
            ).fetchone()[0]
            tot = con.execute(
                f"SELECT COUNT(*) FROM '{out}/{t}.parquet'"
            ).fetchone()[0]
            print(f"  extreme {t}.{c}: {hit}/{tot} rows boundary")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
