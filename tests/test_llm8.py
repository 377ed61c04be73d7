"""Planted-ground-truth tests for the llm8 corpus-statistics batch.

- Chao1: a 3-doc corpus with two singleton trigrams and one doubleton
  gives exactly V + f1(f1-1)/(2(f2+1)) = 3.5.
- Good-Turing: the same corpus gives r*=1 at r=1 and r*=0 at r=2
  (N_3 = 0).
- Keyness: planted en-vs-rest counts reproduce the exact Dunning G²
  from a pure-Python mirror, with the sign from the integer
  cross-product rule.
- T5 span plan: the md5 lanes are mirrored bit-for-bit in Python for
  single-block and multi-block docs; spans never cross blocks and the
  masked count matches the mirror exactly.
"""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import pytest

from filemapreduce_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_docs(spark, docs):
    d = tempfile.mkdtemp(prefix="fmr_llm8_")
    spark.createDataFrame(docs, _DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_chao1_exact(spark, registry):
    """Docs 'a b c d' + 'x y z' x2 in one source: trigram types
    {a b c, b c d} once each and {x y z} twice -> V=3, f1=2, f2=1,
    chao1 = 3 + 2*1/(2*2) = 3.5."""
    d = _write_docs(
        spark,
        [
            (1, "a b c d", "en", "s0", 7),
            (2, "x y z", "en", "s0", 5),
            (3, "x y z", "en", "s0", 5),
        ],
    )
    out = registry["chao1_vocab_richness"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) == (4, 3, 2, 1)
    assert r["chao1_milli"] == 3500


def test_good_turing_exact(spark, registry):
    """Same corpus: N_1=2, N_2=1, N_3=0 -> r*(1) = 2*1/2 = 1 and
    r*(2) = 0 (the undefined-tail convention)."""
    d = _write_docs(
        spark,
        [
            (1, "a b c d", "en", "s0", 7),
            (2, "x y z", "en", "s0", 5),
            (3, "x y z", "en", "s0", 5),
        ],
    )
    out = {
        r["r"]: r
        for r in registry["good_turing_smoothed_counts"].fn(spark, d).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1]["n_r"], out[1]["n_next"]) == (2, 1)
    assert out[1]["r_star_micro"] == 1_000_000
    assert (out[2]["n_r"], out[2]["n_next"]) == (1, 0)
    assert out[2]["r_star_micro"] == 0


def _g2(a, b, ta, tb):
    n, tt = a + b, ta + tb
    ea, eb = n * ta / tt, n * tb / tt
    mag = 2.0 * (
        (a * math.log(a / ea) if a > 0 else 0.0)
        + (b * math.log(b / eb) if b > 0 else 0.0)
    )
    return mag if a * tb >= b * ta else -mag


def test_keyness_matches_python(spark, registry):
    """'hot' 10x in en / 5x elsewhere, 'cold' the mirror, 'base'
    balanced: top keyword must be 'hot' with the exact G² of the
    pure-Python mirror; 'cold' must carry a negative G²."""
    d = _write_docs(
        spark,
        [
            (1, " ".join(["hot"] * 10 + ["base"] * 10), "en", "s0", 1),
            (2, " ".join(["cold"] * 5 + ["base"] * 10), "en", "s0", 1),
            (3, " ".join(["cold"] * 10 + ["base"] * 10), "fr", "s1", 1),
            (4, " ".join(["hot"] * 5 + ["base"] * 10), "fr", "s1", 1),
        ],
    )
    out = registry["keyness_loglik_terms"].fn(spark, d).collect()
    ta = 10 + 5 + 20  # en tokens
    tb = 10 + 5 + 20  # rest tokens
    byw = {r["w"]: r for r in out}
    assert out[0]["w"] == "hot" and (out[0]["a"], out[0]["b"]) == (10, 5)
    assert out[0]["g2_micro"] == round(1e6 * _g2(10, 5, ta, tb))
    assert byw["cold"]["g2_micro"] == round(1e6 * _g2(5, 10, ta, tb))
    assert byw["cold"]["g2_micro"] < 0
    assert byw["base"]["g2_micro"] == 0  # 20*35 == 20*35 -> sign +, g2 0


def _t5_mirror(doc_id, n_tokens, block=20, off_mod=16):
    """Pure-Python mirror of the md5 span lanes."""
    masked = set()
    spans = 0
    for blk in range((n_tokens + block - 1) // block):
        h = hashlib.md5(f"{doc_id}:{blk}".encode()).hexdigest()
        off = int(h[0:4], 16) % off_mod
        ln = 2 + int(h[4:8], 16) % 3
        start = blk * block + 1 + off
        cov = {i for i in range(start, start + ln) if i <= n_tokens}
        if cov:
            spans += 1
        masked |= cov
    return spans, len(masked)


def test_t5_span_plan_matches_md5_mirror(spark, registry):
    """One 20-token doc (single block) and one 41-token doc (three
    blocks, last block nearly empty): spans and masked counts must
    equal the bit-for-bit Python md5 mirror, and the span length is
    always within 2..4 per block."""
    docs = [
        (7, " ".join(f"w{i}" for i in range(20)), "en", "s0", 1),
        (9, " ".join(f"w{i}" for i in range(41)), "en", "s0", 1),
    ]
    d = _write_docs(spark, docs)
    out = {
        r["doc_id"]: r
        for r in registry["t5_span_corruption_plan"].fn(spark, d).collect()
    }
    for doc_id, n in ((7, 20), (9, 41)):
        spans, masked = _t5_mirror(doc_id, n)
        r = out[doc_id]
        assert r["n_tokens"] == n
        assert r["n_spans"] == spans
        assert r["n_masked"] == masked
        assert r["pct_masked_milli"] == round(1000 * masked / n)
    # single full block masks between 2 and 4 tokens
    assert 2 <= out[7]["n_masked"] <= 4
