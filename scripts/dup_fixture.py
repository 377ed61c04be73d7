#!/usr/bin/env python
"""Build the DUPLICATE-SATURATED corpus fixture (round-11 sweep axis):
the corpus regime a 100 TB crawl actually lives in — most rows are
exact or near copies of a handful of payloads — pushed through every
dedup cap, LSH bucket bound, keep-first rule, winnowing cap-eviction,
trigram stop-key, and cluster-bounded quadratic, all of which sit
exactly AT their boundary when duplicate classes are huge.

Every prior axis varies values/NULLs/text form; none made the corpus
MOSTLY duplicates (the unicode axis brushed it — its duplicated
payloads produced the >0-pairs winnowing path). This makes it
systematic:

  documents.text   90% of rows drawn from a 5-payload rotation
                   (below): duplicate classes of ~n/5 rows each;
                   n_chars re-synced to length(text) for every row.
  events.props     90% from 5 distinct JSON payloads (VARIANT /
                   get_json_object surface with massive key-value
                   duplication).
  customer.c_name  80% from 5 names — fuzzy-Levenshtein blocking and
                   sorted-neighborhood candidates go block-hot.
  part.p_name      80% from 5 names — regex/LIKE and ER surfaces.
  embeddings       90% of vectors copied from 5 anchor rows (vec_id
                   1..5): cosine/SemDeDup/IVF/SRP cluster-bounded
                   quadratics at their boundary; labels untouched.

The 5 text payloads are chosen to hit specific operators AT scale:
  P0 a ~400-char paragraph with a REPEATED LINE (segment/C4 line
     dedup mass), long enough for every shingler/winnower;
  P1 P0 with one word changed (a near-duplicate CLASS, not pair:
     LSH/Jaccard/SimHash banding between two huge classes);
  P2 a short doc below most shingle sizes (k-gram edge);
  P3 a pathological n-gram repetition (dup-ngram mass, winnowing
     self-repetition, trigram postings go df-hot);
  P4 shares a long common SPAN with P0 (crossdoc-span >0 path).

Usage: python scripts/dup_fixture.py [out] [src]
       (defaults /tmp/sfdup, /root/testdata/sf0.001)
Then:  python scripts/driver_sim.py /tmp/sfdup
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

_PARA = (
    "the quick brown fox jumps over the lazy dog near the river bank. "
    "data pipelines deduplicate documents before training begins. "
    "the quick brown fox jumps over the lazy dog near the river bank. "
    "shared fingerprints reveal copied passages across the corpus. "
    "every crawler revisits the same page and stores it again."
)

TEXTS = [
    # P0: repeated-line paragraph (segment dedup mass; winnowing base)
    _PARA,
    # P1: P0 with ONE word changed -> a huge near-duplicate class
    _PARA.replace("lazy dog", "sleepy dog"),
    # P2: short doc below most shingle sizes
    "tiny note",
    # P3: pathological n-gram repetition
    "copy paste " * 40,
    # P4: long common span with P0 + distinct tail
    "the quick brown fox jumps over the lazy dog near the river bank. "
    "shared fingerprints reveal copied passages across the corpus. "
    "but this trailing sentence exists nowhere else in the corpus.",
]

PROPS = [
    '{"device":"phone","cat":"a","n":1}',
    '{"device":"phone","cat":"a","n":2}',
    '{"device":"tablet","cat":"b","n":1}',
    '{"device":"phone","cat":"a","n":1,"dup":true}',
    '{"k":"v"}',
]

NAMES = [
    "Customer#000000001",
    "Customer#000000001 ",
    "Customer#000000002",
    "Duplicated Name Co",
    "Duplicated Name Co.",
]

# table -> {column: (pct, rotation)}
DUP: dict[str, dict[str, tuple[int, list[str]]]] = {
    "documents": {"text": (90, TEXTS)},
    "events": {"props": (90, PROPS)},
    "customer": {"c_name": (80, NAMES)},
    "part": {"p_name": (80, NAMES)},
}

EMB_PCT = 90
EMB_ANCHORS = 5


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdup"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if t == "embeddings":
            # 90% of rows take the vector of anchor row (hash % 5)+1;
            # anchors themselves and the 10% tail keep their own.
            # vec_id/label untouched: only the VALUE is duplicated,
            # which is what cosine/SemDeDup/IVF bucket on.
            # hash() mixing, not bare (_rn * KNUTH) % m: a raw Knuth
            # product preserves residues mod small m (KNUTH is odd,
            # KNUTH % 5 == 1), so a modulus that shares a factor with
            # a query's own doc_id % k split would alias — the r11
            # incremental query's delta split (doc_id % 10) saw ONE
            # payload for every saturated delta doc until this fix
            body = (
                "SELECT b._vid AS vec_id,"
                " CASE WHEN hash(b._rn * {k}) % 100 < {p} AND a.embedding"
                " IS NOT NULL THEN a.embedding ELSE b.embedding END"
                " AS embedding, b.label"
                " FROM (SELECT vec_id AS _vid, embedding, label,"
                "  row_number() OVER (ORDER BY vec_id) AS _rn"
                f"  FROM '{s}') b"
                " LEFT JOIN (SELECT vec_id, embedding FROM"
                f" '{s}' WHERE vec_id BETWEEN 1 AND {EMB_ANCHORS}) a"
                f" ON a.vec_id = hash(b._rn * {KNUTH} + 7)"
                f" % {EMB_ANCHORS} + 1"
            ).format(k=KNUTH, p=EMB_PCT)
            con.execute(
                f"COPY ({body}) TO '{d}' (FORMAT PARQUET)"
            )
            n, ndist = con.execute(
                f"SELECT COUNT(*), COUNT(DISTINCT embedding::VARCHAR)"
                f" FROM '{d}'"
            ).fetchone()
            print(f"{t}: {n} rows, {ndist} distinct vectors")
            continue
        repl = DUP.get(t)
        if not repl:
            con.execute(
                f"COPY (SELECT * FROM '{s}') TO '{d}' (FORMAT PARQUET)"
            )
            n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
            print(f"{t}: {n} rows")
            continue
        sets = []
        for i, (c, (pct, rot)) in enumerate(sorted(repl.items())):
            # hash() mixing (see the embeddings note above): bare
            # Knuth products alias with doc_id % k splits for any k
            # sharing a factor with len(rot) or 100
            pick = " ".join(
                f"WHEN hash(_rn * {KNUTH} + {i * 7919 + 31})"
                f" % {len(rot)} = {j} THEN {_lit(v)}"
                for j, v in enumerate(rot)
            )
            sets.append(
                f"CASE WHEN hash(_rn * {KNUTH} + {i * 7919})"
                f" % 100 < {pct} THEN (CASE {pick} END)"
                f" ELSE {c} END AS {c}"
            )
        body = (
            f"SELECT * EXCLUDE (_rn) REPLACE ({', '.join(sets)})"
            f" FROM (SELECT *, row_number() OVER () AS _rn FROM '{s}')"
        )
        if t == "documents":
            # metadata column re-synced to the replaced payload (same
            # code-point length() on both engines)
            body = (
                "SELECT * REPLACE (CASE WHEN text IS NULL THEN n_chars"
                f" ELSE length(text) END AS n_chars) FROM ({body})"
            )
        con.execute(f"COPY ({body}) TO '{d}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
        print(f"{t}: {n} rows")
    for t, repl in DUP.items():
        for c in sorted(repl):
            pct, rot = repl[c]
            lits = ", ".join(_lit(v) for v in rot)
            hit, tot = con.execute(
                f"SELECT COUNT(*) FILTER ({c} IN ({lits})), COUNT(*)"
                f" FROM '{out}/{t}.parquet'"
            ).fetchone()
            print(f"  dup {t}.{c}: {hit}/{tot} rows saturated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
