#!/usr/bin/env python
"""Build the UNICODE / DEGENERATE-TEXT adversarial fixture (round-10
sweep axis): multi-byte, combining-mark, zero-width, astral-plane,
case-folding-unstable, and empty-string payloads pushed through every
tokenizer, shingler, regex counter, Levenshtein head, URL/JSON parser
and casing path — the text classes where Java (Spark) and utf8proc
(DuckDB) string semantics have historically diverged.

Replacements (row-order Knuth hash, per-column salt, reproducible):

  documents.text   30% of rows get one of 14 adversarial payloads
                   (below); n_chars is re-synced to length(text) for
                   EVERY row so the metadata column never contradicts
                   the payload.
  customer.c_name  20% unicode names (diacritics, CJK, quotes,
                   empty) — the Levenshtein / fuzzy-pair head.
  supplier.s_name  30% (10-row table) same rotation.
  part.p_name      20% — regex/LIKE filter surface.
  events.props     25% unicode JSON (multi-byte values, \\uXXXX
                   escapes, unicode keys, ZWSP inside values) — the
                   VARIANT/get_json_object surface; all VALID JSON.

Payload classes in the text rotation: NFC vs NFD (same glyphs,
different code points), CJK without word boundaries, emoji ZWJ
families + flags (astral plane, 4-byte UTF-8), zero-width spaces
inside "words", RTL Arabic, fullwidth forms (digits that \\d must NOT
match), EMPTY STRING (the ''-vs-NULL axis), German sharp-s (upper()
changes the LENGTH), dotless/dotted I (Turkish casing trap), combining
enclosing marks, math alphanumerics, a 1000-char 2-gram repetition
(rolling-hash/winnowing stress), ligatures, and a mixed-script word.

Usage: python scripts/unicode_fixture.py [out] [src]
       (defaults /tmp/sfunicode, /root/testdata/sf0.001)
Then:  python scripts/driver_sim.py /tmp/sfunicode
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

TEXTS = [
    # NFC latin diacritics
    "héllo wörld café naïve résumé",
    # NFD: same glyphs as café but combining marks
    "café étoile èlève déjà vu",
    # CJK, no spaces: whitespace tokenizers must yield ONE token
    "日本語のテキストです。"
    "漢字とひらがな。",
    # emoji ZWJ family + flag + skin tone (astral, 4-byte UTF-8)
    "\U0001f469‍\U0001f469‍\U0001f467‍\U0001f466 emoji "
    "\U0001f1fa\U0001f1f8 flags \U0001f3f3️‍\U0001f308 "
    "\U0001f44d\U0001f3fd done",
    # zero-width spaces INSIDE words
    "zero​width​joined words he‌re an‍d there",
    # RTL arabic
    "العربية نص "
    "من اليمين right to left",
    # fullwidth forms: \d and [0-9] must not match １２３
    "ＦＵＬＬＷＩＤＴＨ "
    "ｔｅｘｔ １２３ digits",
    # EMPTY string: the ''-vs-NULL boundary
    "",
    # sharp-s and casing-unstable: upper('ß') = 'SS' (longer)
    "straße groß FUẞBALL ßß",
    # dotted/dotless I (the Turkish trap), final sigma
    "İstanbul ışık İ ΣΤΙ"
    "ΓΜΑΣ στιγμας",
    # math alphanumerics (astral) + enclosing marks
    "\U0001d518\U0001d52b\U0001d526\U0001d520\U0001d52c\U0001d521"
    "\U0001d522 \U0001d5d4\U0001d5ee\U0001d5cd\U0001d5f5 a⃝ b⃣",
    # pathological 2-gram repetition, 1000 chars
    "ab" * 500,
    # ligatures + digraphs
    "ﬃcient ﬂight ﬁnd ǳone Ĳsselmeer "
    "ﬆreet",
    # mixed-script single word + NBSP-separated tokens
    "abcдеф中文xyz one two three",
]

NAMES = [
    "Müller#000042",
    "日本株式会社",
    "Ånna''Quóte",
    "",
    "François Østergård",
    "\U0001f3ed Factory ™",
]

PROPS = [
    '{"k":"café","device":"üphone"}',
    '{"cat":"日本語","n":1,"ok":true}',
    '{"emoji":"\U0001f469‍\U0001f469‍\U0001f467",'
    '"nested":{"ü":"ß"}}',
    '{"s":"\\u00e9clair \\u65e5\\u672c","esc":"a\\nb"}',
    '{"zw":"a​b","rtl":"عربي"}',
    '{"İstanbul":"ı","empty":""}',
]

# table -> {column: (pct, rotation)}
UNICODE: dict[str, dict[str, tuple[int, list[str]]]] = {
    "documents": {"text": (30, TEXTS)},
    "customer": {"c_name": (20, NAMES)},
    "supplier": {"s_name": (30, NAMES)},
    "part": {"p_name": (20, NAMES)},
    "events": {"props": (25, PROPS)},
}


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfunicode"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        repl = UNICODE.get(t)
        if not repl:
            con.execute(
                f"COPY (SELECT * FROM '{s}') TO '{d}' (FORMAT PARQUET)"
            )
            n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
            print(f"{t}: {n} rows")
            continue
        sets = []
        for i, (c, (pct, rot)) in enumerate(sorted(repl.items())):
            pick = " ".join(
                f"WHEN (_rn * {KNUTH} + {i * 7919 + 31})"
                f" % {len(rot)} = {j} THEN {_lit(v)}"
                for j, v in enumerate(rot)
            )
            sets.append(
                f"CASE WHEN (_rn * {KNUTH} + {i * 7919})"
                f" % 100 < {pct} THEN (CASE {pick} END)"
                f" ELSE {c} END AS {c}"
            )
        body = (
            f"SELECT * EXCLUDE (_rn) REPLACE ({', '.join(sets)})"
            f" FROM (SELECT *, row_number() OVER () AS _rn FROM '{s}')"
        )
        if t == "documents":
            # re-sync the metadata column to the (possibly replaced)
            # payload for EVERY row: DuckDB length() counts code
            # points, same as Spark F.length, so both engines see a
            # consistent (text, n_chars) pair
            body = (
                "SELECT * REPLACE (CASE WHEN text IS NULL THEN n_chars"
                f" ELSE length(text) END AS n_chars) FROM ({body})"
            )
        con.execute(f"COPY ({body}) TO '{d}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{d}'").fetchone()[0]
        print(f"{t}: {n} rows")
    for t, repl in UNICODE.items():
        for c in sorted(repl):
            pct, rot = repl[c]
            lits = ", ".join(_lit(v) for v in rot)
            hit = con.execute(
                f"SELECT COUNT(*) FROM '{out}/{t}.parquet'"
                f" WHERE {c} IN ({lits})"
            ).fetchone()[0]
            tot = con.execute(
                f"SELECT COUNT(*) FROM '{out}/{t}.parquet'"
            ).fetchone()[0]
            print(f"  unicode {t}.{c}: {hit}/{tot} rows adversarial")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
