"""Short-document edge cases for the n-gram/trigram operators.

Spark's ``sequence(1, stop)`` counts DOWN when ``stop < 1``
(``sequence(1, 0) = [1, 0]``), so an unguarded
``transform(sequence(1, length - 2), ...)`` emits phantom 1-2-char
"trigrams" (and NULL n-grams) on documents shorter than the gram
size — silently diverging from the DuckDB oracle, whose
``range(1, stop)`` is empty for ``stop <= 1``. The shipped fixtures
never trip this (their shortest document is 44 chars), so these
tests run the affected queries against a synthetic corpus of 0-, 1-,
2-char and 1-, 2-word documents and compare Spark vs the query's own
DuckDB oracle exactly.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from filemapreduce_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.fixture(scope="module")
def short_doc_dir(tmp_path_factory):
    """A scratch sf_dir whose documents table is dominated by docs
    shorter than the 3-char / 3-word gram windows."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(12, dtype=np.int64),
            "text": [
                "",  # 0 chars, 0 words
                "a",  # 1 char
                "ab",  # 2 chars — the sequence(1,0) trap
                "abc",  # exactly one trigram
                "x y",  # 2 words — one bigram, no trigram
                "w",  # 1 word — no bigram (the greatest(.,0) trap)
                "ngram ngram",  # repeated bigram token
                "the quick brown fox",  # normal doc
                "  ",  # whitespace only → 0 words, 2 chars
                "ab cd",  # 2 words, 5 chars
                "spark runs a window over the vector",  # term hits
                "ab",  # duplicate 2-char doc
            ],
            "lang": ["en"] * 12,
            "source": ["s0"] * 6 + ["s1"] * 6,
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype(np.int64)
    d = tmp_path_factory.mktemp("short_docs")
    docs.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def _oracle_frame(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if df.empty:
        return df.reset_index(drop=True)
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    order = np.argsort(key.to_numpy(), kind="stable")
    return df.iloc[order].reset_index(drop=True)


@pytest.mark.parametrize(
    "name", ["distinct_n_diversity", "trigram_index_search"]
)
def test_short_docs_match_oracle(spark, registry, short_doc_dir, name):
    spec = registry[name]
    got = _canon(spec.fn(spark, short_doc_dir).toPandas())
    want = _canon(_oracle_frame(spec.oracle, short_doc_dir))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_distinct_n_no_phantom_grams(spark, registry, short_doc_dir):
    """1-word docs must contribute zero bigrams and 2-word docs zero
    trigrams: total_ngrams per (source, n) must equal the exact
    hand-count, not be inflated by descending-sequence NULLs."""
    rows = {
        (r["source"], r["n"]): r
        for r in registry["distinct_n_diversity"]
        .fn(spark, short_doc_dir)
        .collect()
    }
    # s0 docs: "", "a", "ab", "abc", "x y", "w"
    #   unigrams: a, ab, abc, x, y, w          = 6
    #   bigrams : "x y"                         = 1
    #   trigrams: none
    assert rows[("s0", 1)]["total_ngrams"] == 6
    assert rows[("s0", 2)]["total_ngrams"] == 1
    assert ("s0", 3) not in rows
