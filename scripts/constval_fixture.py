#!/usr/bin/env python
"""Build the CONSTANT-VALUE adversarial fixture: sf0.001's row
population with every numeric MEASURE column overwritten by one
constant (keys, dates, text untouched). Groups keep n >= 2 but all
spread collapses to exactly 0 — the regime the n=1 fixture cannot
reach (there n-1 = 0 NULLs the variance first): correlation /
OLS-slope / z-score / rank-correlation denominators are 0 with
WELL-DEFINED variances, which DuckDB NULLs (double/0) while an
unguarded ANSI Spark plan raises or IEEE-NaNs.

Usage: python scripts/constval_fixture.py [out_dir] [src_sf_dir]
       (defaults: /tmp/sfconst, /root/testdata/sf0.001)
Then:  python scripts/driver_sim.py /tmp/sfconst
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: constant SQL literal}
CONST = {
    "region": {},
    "nation": {},
    "customer": {"c_acctbal": "100.00"},
    "supplier": {"s_acctbal": "100.00"},
    "part": {"p_retailprice": "50.00", "p_size": "10"},
    "orders": {"o_totalprice": "100.00"},
    "lineitem": {
        "l_quantity": "10",
        "l_extendedprice": "100.00",
        "l_discount": "0.05",
        "l_tax": "0.02",
    },
    "events": {"value": "5.0"},
    "documents": {},
    "embeddings": {},
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfconst"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, repl in CONST.items():
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if repl:
            # column types from the parquet SCHEMA (DESCRIBE), not a
            # typeof() over row 1 — an empty source table has no row 1
            # (fetchone() -> None -> TypeError), and parameterized
            # read_parquet avoids quote-fragile path interpolation
            # (r8 advice)
            types = dict(
                con.execute(
                    "SELECT column_name, column_type FROM "
                    "(DESCRIBE SELECT * FROM read_parquet(?))",
                    [s],
                ).fetchall()
            )
            sets = ", ".join(
                f"CAST({lit} AS {types[c]}) AS {c}"
                for c, lit in repl.items()
            )
            con.execute(
                f"COPY (SELECT * REPLACE ({sets}) FROM '{s}')"
                f" TO '{d}' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{s}') TO '{d}' (FORMAT PARQUET)"
            )
        n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
