#!/usr/bin/env python
"""Build the NULL-SATURATION adversarial fixtures (round-9 sweep
axes 15a/15b): the constructed-boundary regime the r8 verdict named
next — NULL group/join keys everywhere nullable, and all-NULL
measure columns.

Two variants (both written from sf0.001 so both engines see
byte-identical files; NULL choice is row-order hash-based —
row_number * Knuth constant mod 100 — so the fixture is reproducible
with no seed store):

  keys      — 25% of rows get NULL in every FK / grouping / dimension
              column, 10% in every timestamp column. Measures are
              untouched. Exercises: NULL-group rows (GROUP BY makes a
              NULL group in BOTH engines but downstream joins drop
              it asymmetrically), join-key NULL semantics (equi joins
              drop NULL=NULL, null-safe <=> keeps it), window ORDER
              BY over NULL ordering keys (RANGE frames put NULLs in
              their own frame), NULL date bucketing.
  measures  — every additive measure column is 100% NULL, keys are
              untouched. Groups EXIST but every SUM/AVG/STDDEV/CORR/
              PERCENTILE over them is NULL: the regime where ANSI
              Spark raises (divide by a NULL-propagated 0), returns
              NaN where DuckDB returns NULL, or where a
              COALESCE(x, 0) on one side only silently fabricates a
              zero the other side doesn't have.
  mixed     — BOTH at once, partially: the keys-variant NULL rates on
              keys/timestamps PLUS 30% NULL on every measure column.
              The interaction regime the pure variants cannot reach:
              per-group aggregates where SOME values are NULL (a
              multi-column IGNORE NULLS can mix fields from different
              rows; skipna sums disagree with NULL-propagating ones),
              NULL measures on rows whose keys are also NULL, partial
              windows.

  text      — 20% NULL documents.text and events.props, everything
              else untouched. The LLM-pipeline payload regime: Python
              boundaries crash on None (UDTF .split, bytes(None),
              astype(int64) on NaN), VFS/blob builders encode None,
              corpus statistics (BM25 n_docs/avgdl) count textless
              docs their token explode excludes.

Usage: python scripts/null_fixture.py keys     [out] [src]
       python scripts/null_fixture.py measures [out] [src]
       python scripts/null_fixture.py mixed    [out] [src]
       python scripts/null_fixture.py text     [out] [src]
       (defaults: /tmp/sfnullkeys | /tmp/sfnullmeas | /tmp/sfnullmix
        | /tmp/sftextnull)
Then:  python scripts/driver_sim.py <out>
"""

from __future__ import annotations

import os
import sys

import duckdb

# Knuth multiplicative constant — same family as sparse_fixture.py
KNUTH = 2654435761

# variant "keys": column -> null percentage, applied per table
NULL_KEYS: dict[str, dict[str, int]] = {
    "region": {},
    "nation": {},
    "customer": {"c_nationkey": 25, "c_mktsegment": 25},
    "supplier": {"s_nationkey": 25},
    "part": {"p_brand": 25, "p_type": 25},
    "orders": {
        "o_custkey": 25,
        "o_orderstatus": 25,
        "o_orderpriority": 25,
        "o_orderdate": 10,
    },
    "lineitem": {
        "l_partkey": 25,
        "l_suppkey": 25,
        "l_returnflag": 25,
        "l_linestatus": 25,
        "l_shipdate": 10,
        # l_orderkey at a LOWER rate: it's the spine of most TPC-H
        # joins — 10% NULL exercises the join-drop asymmetry without
        # hollowing out every downstream fixture
        "l_orderkey": 10,
    },
    "events": {
        "user_id": 25,
        "event_type": 25,
        "ts": 10,
    },
    "documents": {"lang": 25, "source": 25},
    "embeddings": {"label": 25},
}

# variant "measures": columns set 100% NULL
NULL_MEASURES: dict[str, tuple[str, ...]] = {
    "region": (),
    "nation": (),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice", "p_size"),
    "orders": ("o_totalprice",),
    "lineitem": (
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    ),
    "events": ("value",),
    "documents": ("n_chars",),
    "embeddings": (),
}


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "keys"
    if variant not in ("keys", "measures", "mixed", "text"):
        print(
            f"unknown variant {variant!r}: use keys|measures|mixed|text"
        )
        return 2
    defaults = {
        "keys": "/tmp/sfnullkeys",
        "measures": "/tmp/sfnullmeas",
        "mixed": "/tmp/sfnullmix",
        "text": "/tmp/sftextnull",
    }
    out = sys.argv[2] if len(sys.argv) > 2 else defaults[variant]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in NULL_KEYS:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        # assemble the per-column null spec for this variant
        repl: dict[str, int] = {}
        if variant in ("keys", "mixed"):
            repl.update(NULL_KEYS[t])
        if variant == "measures":
            repl.update({c: 100 for c in NULL_MEASURES[t]})
        elif variant == "mixed":
            repl.update({c: 30 for c in NULL_MEASURES[t]})
        elif variant == "text":
            if t == "documents":
                repl["text"] = 20
            elif t == "events":
                repl["props"] = 20
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
            # per-column DIFFERENT hash stream (salt by ordinal) so
            # the NULL masks don't coincide row-for-row; pct=100
            # short-circuits to a typed NULL literal
            sets = ", ".join(
                (
                    f"CAST(NULL AS {types[c]}) AS {c}"
                    if pct >= 100
                    else f"CASE WHEN (_rn * {KNUTH} + {i * 7919})"
                    f" % 100 < {pct} THEN NULL ELSE {c} END AS {c}"
                )
                for i, (c, pct) in enumerate(sorted(repl.items()))
            )
            con.execute(
                f"COPY (SELECT * EXCLUDE (_rn) REPLACE ({sets})"
                f" FROM (SELECT *, row_number() OVER () AS _rn"
                f" FROM '{s}')) TO '{d}' (FORMAT PARQUET)"
            )
        n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
