#!/usr/bin/env python
"""Driver-style correctness check: run every registered query through
Spark AND its DuckDB oracle on the same parquet tables; compare row
count, sorted column names, and canonicalized values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

from filemapreduce_spark.queries import load_all
from filemapreduce_spark.session import get_spark

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(v):
    """Canonicalize a value for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exact match required
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    import datetime

    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def rows_to_canon(cols, rows):
    """Sort columns by name, canonicalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    registry = load_all()
    spark = get_spark(app_name="check_oracle")

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        spark.catalog.clearCache()  # bound per-query persist residue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue

        if spec.oracle is None:
            print(
                f"rows-only {name}: {len(srows)} rows, "
                f"{len(scols)} cols  [{time.time()-t0:.1f}s]"
            )
            n_rows_only += 1
            continue

        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: ORACLE SQL ERROR")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue

        sc, sv = rows_to_canon(scols, srows)
        oc, ov = rows_to_canon(ocols, orows)
        msgs = []
        if len(srows) != len(orows):
            msgs.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sc != oc:
            msgs.append(f"cols spark={sc} oracle={oc}")
        if not msgs and sv != ov:
            ndiff = sum(1 for a, b in zip(sv, ov) if a != b)
            msgs.append(f"values differ in {ndiff}/{len(sv)} rows")
            for a, b in list(zip(sv, ov))[:2000]:
                if a != b:
                    msgs.append(f"  spark : {a}\n  oracle: {b}")
                    break
        if msgs:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
            failures.append(name)
        else:
            print(
                f"PASS {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]"
            )
            n_pass += 1

    print(
        f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail"
        + (f"  FAILURES: {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
