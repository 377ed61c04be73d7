"""Invariant tests for the corpus-assembly operators (queries/pipeline.py)
beyond the DuckDB hash gate: closed-form packing/chunking math checked
against brute-force Python on the collected small corpus, and
determinism across repeated runs.
"""

import math

import pytest
from pyspark.sql import functions as F

from filemapreduce_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.fixture(scope="module")
def doc_tokens(spark):
    """doc_id → (source, token count), collected once."""
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            "source",
            F.size(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("tok"),
        )
        .collect()
    )
    return {r.doc_id: (r.source, r.tok) for r in rows}


def test_sequence_pack_invariants(spark, registry, doc_tokens):
    out = {
        r.source: r
        for r in registry["sequence_pack_streams"].fn(spark, SF).collect()
    }
    by_source = {}
    for source, tok in doc_tokens.values():
        by_source.setdefault(source, []).append(tok)
    assert set(out) == set(by_source)
    for source, toks in by_source.items():
        row = out[source]
        assert row.n_docs == len(toks)
        assert row.total_tokens == sum(toks)
        assert row.n_seqs == math.ceil(sum(toks) / 256)
        assert 0 <= row.n_crossing <= row.n_docs
        # brute-force the crossing count from the doc order
        ordered = sorted(
            (d for d, (s, _) in doc_tokens.items() if s == source)
        )
        cum, crossing = 0, 0
        for d in ordered:
            tok = doc_tokens[d][1]
            if cum // 256 != (cum + tok - 1) // 256:
                crossing += 1
            cum += tok
        assert row.n_crossing == crossing


def test_chunk_overlap_matches_bruteforce(spark, registry, doc_tokens):
    rows = registry["chunk_overlap_windows"].fn(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, (_, tok) in doc_tokens.items():
        expected = 1 if tok <= 64 else 1 + math.ceil((tok - 64) / 48)
        chunks = by_doc[doc_id]
        assert len(chunks) == expected
        assert [c.chunk_idx for c in chunks] == list(range(expected))
        assert all(c.n_chunks == expected and c.tok == tok for c in chunks)
        # stride 48 must cover the whole token stream with 64-wide windows
        last_start = (expected - 1) * 48
        assert last_start < tok
        assert last_start + 64 >= tok


def test_segment_dedup_accounting(spark, registry, doc_tokens):
    out = registry["segment_dedup_corpus"].fn(spark, SF).collect()
    total_segs = sum(r.n_segments for r in out)
    expected_segs = sum(
        math.ceil(tok / 8) for _, tok in doc_tokens.values()
    )
    assert total_segs == expected_segs
    for r in out:
        assert 0 <= r.segs_removed <= r.n_segments
        # removed segments have at most 8 words each
        assert r.words_removed <= 8 * r.segs_removed


def test_mixture_resample_deterministic_and_bounded(spark, registry):
    fn = registry["mixture_resample_epochs"].fn
    a = [tuple(r) for r in fn(spark, SF).collect()]
    b = [tuple(r) for r in fn(spark, SF).collect()]
    assert a == b  # hash-gated, not rand(): identical across runs
    rows = {r[0]: r for r in a}
    # zh is upsampled 2.25×: every doc appears 2 or 3 times
    zh = rows["zh"]
    assert 2 * zh[1] <= zh[2] <= 3 * zh[1]
    # en is downsampled to ~half: fewer rows out than docs in corpus
    en = rows["en"]
    assert en[1] == en[2]  # no replication, selection only


def test_asof_forward_direction_semantics(spark):
    """Forward as-of: earliest right AT-OR-AFTER left time, tolerance
    nulls matches beyond the horizon, ties at equal time break by
    tiebreak ascending (inclusive >= semantics)."""
    from datetime import datetime

    from filemapreduce_spark.operators.asof import asof_join

    T = datetime
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0)), (1, T(2024, 1, 1, 23, 0)),
         (2, T(2024, 1, 1, 12, 0))],
        "k INT, lt TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0), 100), (1, T(2024, 1, 1, 11, 0), 101),
         (1, T(2024, 1, 1, 10, 0), 99), (2, T(2024, 1, 1, 11, 0), 200)],
        "k INT, rt TIMESTAMP, pid INT",
    )
    out = {
        (r.k, r.lt): r.next_pid
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_payload=["pid"], tiebreak="pid", prefix="next_",
            tolerance="2 HOURS", direction="forward",
        ).collect()
    }
    # inclusive: equal-time right rows match; tie at 10:00 -> lowest pid
    assert out[(1, T(2024, 1, 1, 10, 0))] == 99
    # no right row within 2h after 23:00 -> nulled by tolerance
    assert out[(1, T(2024, 1, 1, 23, 0))] is None
    # right row strictly BEFORE left time never matches forward
    assert out[(2, T(2024, 1, 1, 12, 0))] is None
