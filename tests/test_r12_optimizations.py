"""Focused invariance tests for the round-12 optimizations.

Each rewrite changed an operator's internals while promising an
IDENTICAL result; these pin the equivalences against naive per-doc /
JVM-shaped references on small synthetic inputs (the oracle gate is
driver_sim; this pins the algebra and the byte-level contracts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------
# Vectorized container synths produce byte-identical payloads
# ---------------------------------------------------------------
def _ref_wav(doc_id: int) -> bytes:
    import struct

    from filemapreduce_spark.queries.llm import _WAV_A, _WAV_B, _WAV_C

    n_frames = 50 + doc_id % 77
    ch = 1 + doc_id % 2
    rate = 8000 + (doc_id % 3) * 4000
    n = n_frames * ch
    j = np.arange(n, dtype=np.int64)
    raw = (doc_id * _WAV_A + j * _WAV_B + _WAV_C) % 65536
    pcm = (raw - 32768).astype("<i2").tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16,
        b"data", len(pcm),
    )
    return header + pcm


def test_vectorized_wav_synth_byte_identical():
    from filemapreduce_spark.queries.llm import synth_wav_pdf

    ids = [0, 1, 2, 5, 76, 77, 153, 1000]
    out = synth_wav_pdf(pd.DataFrame({"doc_id": ids}))
    for doc_id, payload in zip(out["doc_id"], out["payload"]):
        assert bytes(payload) == _ref_wav(int(doc_id))


def _ref_ppm(doc_id: int) -> bytes:
    from filemapreduce_spark.queries.llm import _WAV_A, _WAV_B, _WAV_C

    w = 8 + doc_id % 9
    h = 6 + doc_id % 7
    q = np.arange(w * h * 3, dtype=np.int64)
    px = ((doc_id * _WAV_A + q * _WAV_B + _WAV_C) % 256).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def test_vectorized_ppm_synth_byte_identical():
    from filemapreduce_spark.queries.multimodal2 import synth_ppm_pdf

    ids = [0, 1, 8, 9, 62, 63, 64, 997]
    out = synth_ppm_pdf(pd.DataFrame({"doc_id": ids}))
    for doc_id, payload in zip(out["doc_id"], out["payload"]):
        assert bytes(payload) == _ref_ppm(int(doc_id))


# ---------------------------------------------------------------
# Vectorized decoders == per-doc references
# ---------------------------------------------------------------
def test_batch_frame_energy_top2_equals_per_doc():
    from filemapreduce_spark.queries.llm import parse_wav, synth_wav_pdf
    from filemapreduce_spark.queries import multimodal2 as m2

    ids = [0, 1, 2, 3, 76, 77, 154, 321]
    pdf = synth_wav_pdf(pd.DataFrame({"doc_id": ids}))

    # reference: per-doc loop (the r11 form)
    ref = []
    for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
        doc_id = int(doc_id)
        ch, _r, data = parse_wav(doc_id, bytes(b))
        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
        ch0 = samples[0::ch]
        frames = np.arange(len(ch0)) // m2._FRAME
        nf = int(frames[-1]) + 1 if len(ch0) else 0
        energy = np.bincount(frames, weights=ch0 * ch0, minlength=nf)
        counts = np.bincount(frames, minlength=nf)
        order = np.lexsort((np.arange(nf), -energy))[:2]
        for rk, fi in enumerate(order, start=1):
            ref.append(
                (doc_id, int(fi), int(counts[fi]), int(energy[fi]), rk)
            )

    # fish the batch implementation out of the query builder without a
    # Spark session: rebuild its generator from the module functions
    import types

    fn_src = None
    # replicate by calling the inner generator through mapInPandas-free
    # execution: the builder closes over locals, so reconstruct the
    # pipeline via a tiny driver below instead
    def run_batch(pdf):
        # mirror of the fused stage: synth already applied, run decode
        gen = None
        # reuse the module-level code path by importing the query fn is
        # heavy (needs Spark); re-run the vectorized math inline from
        # the committed implementation via its helper-level semantics:
        from filemapreduce_spark.queries.llm import parse_wav as pw

        ids_l, chs_l, chunks = [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            doc_id = int(doc_id)
            ch, _rate, data = pw(doc_id, bytes(b))
            ids_l.append(doc_id)
            chs_l.append(ch)
            chunks.append(data)
        ids_a = np.array(ids_l, dtype=np.int64)
        chs = np.array(chs_l, dtype=np.int64)
        samples = np.frombuffer(b"".join(chunks), dtype="<i2").astype(
            np.int64
        )
        n_samp = np.array([len(c) // 2 for c in chunks], dtype=np.int64)
        s_off = np.zeros(len(ids_a) + 1, dtype=np.int64)
        np.cumsum(n_samp, out=s_off[1:])
        n0 = (n_samp + chs - 1) // chs
        o0 = np.zeros(len(ids_a) + 1, dtype=np.int64)
        np.cumsum(n0, out=o0[1:])
        kk = np.arange(o0[-1], dtype=np.int64) - np.repeat(o0[:-1], n0)
        ch0 = samples[np.repeat(s_off[:-1], n0) + kk * np.repeat(chs, n0)]
        f_local = kk // m2._FRAME
        nf = (n0 + m2._FRAME - 1) // m2._FRAME
        f_off = np.zeros(len(ids_a) + 1, dtype=np.int64)
        np.cumsum(nf, out=f_off[1:])
        gframe = np.repeat(f_off[:-1], n0) + f_local
        energy = np.bincount(
            gframe, weights=(ch0 * ch0).astype(np.float64),
            minlength=f_off[-1],
        ).astype(np.int64)
        counts = np.bincount(gframe, minlength=f_off[-1])
        doc_of_frame = np.repeat(np.arange(len(ids_a)), nf)
        frame_local = (
            np.arange(f_off[-1], dtype=np.int64)
            - np.repeat(f_off[:-1], nf)
        )
        order = np.lexsort((frame_local, -energy, doc_of_frame))
        d_s = doc_of_frame[order]
        first = np.empty(len(d_s), dtype=bool)
        first[0] = True
        first[1:] = d_s[1:] != d_s[:-1]
        pos = np.arange(len(d_s))
        rk = pos - np.maximum.accumulate(np.where(first, pos, 0)) + 1
        keep = order[rk <= 2]
        return list(
            zip(
                ids_a[doc_of_frame[keep]].tolist(),
                frame_local[keep].tolist(),
                counts[keep].tolist(),
                energy[keep].tolist(),
                rk[rk <= 2].tolist(),
            )
        )

    got = sorted(run_batch(pdf))
    assert got == sorted(ref)


def test_batch_ppm_decode_pool_equals_per_doc():
    from filemapreduce_spark.queries.multimodal2 import (
        parse_ppm,
        parse_ppm_header,
        synth_ppm_pdf,
    )

    ids = [0, 1, 8, 9, 62, 63, 64, 997]
    pdf = synth_ppm_pdf(pd.DataFrame({"doc_id": ids}))

    ref = []
    for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
        doc_id = int(doc_id)
        w, h, arr = parse_ppm(doc_id, bytes(b))
        h2, w2 = h - h % 2, w - w % 2
        crop = arr[:h2, :w2, :]
        pooled = (
            crop[0::2, 0::2]
            + crop[0::2, 1::2]
            + crop[1::2, 0::2]
            + crop[1::2, 1::2]
        ) // 4
        pi, pj = np.indices(pooled.shape[:2])
        weight = (
            1
            + (
                pi[:, :, None] * 31
                + pj[:, :, None] * 17
                + np.arange(3)[None, None, :] * 7
            )
            % 97
        )
        ref.append(
            (
                doc_id, w, h,
                int(arr[:, :, 0].sum()),
                int(arr[:, :, 1].sum()),
                int(arr[:, :, 2].sum()),
                int((pooled * weight).sum()),
            )
        )

    # batch path (mirror of the committed vectorized implementation)
    ids_l, ws_l, hs_l, chunks = [], [], [], []
    for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
        doc_id = int(doc_id)
        w, h, data = parse_ppm_header(doc_id, bytes(b))
        ids_l.append(doc_id)
        ws_l.append(w)
        hs_l.append(h)
        chunks.append(data)
    ids_a = np.array(ids_l, dtype=np.int64)
    w = np.array(ws_l, dtype=np.int64)
    h = np.array(hs_l, dtype=np.int64)
    vals = np.frombuffer(b"".join(chunks), np.uint8).astype(np.int64)
    n = w * h * 3
    off = np.zeros(len(ids_a) + 1, dtype=np.int64)
    np.cumsum(n, out=off[1:])
    q = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], n)
    chan = np.bincount(
        np.repeat(np.arange(len(ids_a)) * 3, n) + q % 3,
        weights=vals.astype(np.float64),
        minlength=3 * len(ids_a),
    ).astype(np.int64).reshape(len(ids_a), 3)
    pw_ = (w - w % 2) // 2
    ph = (h - h % 2) // 2
    np_el = ph * pw_ * 3
    poff = np.zeros(len(ids_a) + 1, dtype=np.int64)
    np.cumsum(np_el, out=poff[1:])
    k = np.arange(poff[-1], dtype=np.int64) - np.repeat(poff[:-1], np_el)
    pwr = np.repeat(pw_, np_el)
    wr = np.repeat(w, np_el)
    dsr = np.repeat(off[:-1], np_el)
    i = k // (pwr * 3)
    j = (k % (pwr * 3)) // 3
    c = k % 3
    p0 = dsr + ((2 * i) * wr + 2 * j) * 3 + c
    p2 = dsr + ((2 * i + 1) * wr + 2 * j) * 3 + c
    pooled = (vals[p0] + vals[p0 + 3] + vals[p2] + vals[p2 + 3]) // 4
    weight = 1 + (i * 31 + j * 17 + c * 7) % 97
    checksum = np.bincount(
        np.repeat(np.arange(len(ids_a)), np_el),
        weights=(pooled * weight).astype(np.float64),
        minlength=len(ids_a),
    ).astype(np.int64)
    got = [
        (
            int(ids_a[x]), int(w[x]), int(h[x]),
            int(chan[x, 0]), int(chan[x, 1]), int(chan[x, 2]),
            int(checksum[x]),
        )
        for x in range(len(ids_a))
    ]
    assert got == ref


# ---------------------------------------------------------------
# semdedup numpy kernels == the former JVM fold semantics
# ---------------------------------------------------------------
def test_semdedup_numpy_assignment_matches_fold():
    rng = np.random.RandomState(7)
    vecs = rng.randint(-(10**6), 10**6, size=(40, 64)).astype(np.int64)
    cent = vecs[:8]
    ids = np.arange(8, dtype=np.int64)
    # reference: per (row, centroid) fold, min key, % 1024
    ref = []
    for v in vecs:
        keys = [
            int(((v - c) * (v - c)).sum()) * 1024 + int(i)
            for i, c in zip(ids, cent)
        ]
        ref.append(min(keys) % 1024)
    # vectorized kernel (mirror of assign_fn)
    nrm2 = (vecs * vecs).sum(axis=1)
    d = nrm2[:, None] - 2 * (vecs @ cent.T) + (cent * cent).sum(axis=1)[None, :]
    got = (d * 1024 + ids[None, :]).min(axis=1) % 1024
    assert got.tolist() == ref


def test_semdedup_numpy_gram_cosine_matches_fold():
    rng = np.random.RandomState(11)
    vecs = rng.randint(-(10**6), 10**6, size=(12, 64)).astype(np.int64)
    nrm2 = (vecs * vecs).sum(axis=1)
    # reference: scalar dot / (sqrt * sqrt) — the JVM expression order
    import math

    n = np.sqrt(nrm2.astype(np.float64))
    gram = (vecs @ vecs.T).astype(np.float64)
    got = gram / (n[:, None] * n[None, :])
    for a in range(12):
        for b in range(12):
            dot = int((vecs[a] * vecs[b]).sum())
            refv = float(dot) / (math.sqrt(float(nrm2[a])) * math.sqrt(float(nrm2[b])))
            assert got[a, b] == refv


# ---------------------------------------------------------------
# bigram model-grid regrouping: uni/bi from the grid == from the stream
# ---------------------------------------------------------------
def test_bigram_grid_counts_equal_stream_counts():
    rng = np.random.RandomState(3)
    langs = ["en", "fr"]
    rows = []  # (doc, lang, w, nxt)
    for doc in range(30):
        lang = langs[doc % 2]
        toks = [f"t{rng.randint(0, 12)}" for _ in range(rng.randint(1, 9))]
        for i, w in enumerate(toks):
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            rows.append((doc, lang, w, nxt))
    df = pd.DataFrame(rows, columns=["doc", "lang", "w", "nxt"])
    # stream-level counts (the r11 form)
    uni_stream = df.groupby(["lang", "w"]).size()
    bi_stream = df.dropna(subset=["nxt"]).groupby(["lang", "w", "nxt"]).size()
    # grid-level (the r12 form): group incl. NULL nxt, then roll up
    grid = df.groupby(["lang", "w", "nxt"], dropna=False).size()
    uni_grid = grid.groupby(level=["lang", "w"]).sum()
    bi_grid = grid[grid.index.get_level_values("nxt").notna()]
    assert uni_grid.sort_index().equals(uni_stream.sort_index())
    assert (
        bi_grid.sort_index().astype(int).tolist()
        == bi_stream.sort_index().astype(int).tolist()
    )


# ---------------------------------------------------------------
# MG pass-1 marker rows: candidates vs partition totals
# ---------------------------------------------------------------
def test_mg_partition_emits_candidates_and_total():
    from filemapreduce_spark.queries import llm4

    # drive the generator directly with two batches
    toks = pd.DataFrame({"tok": ["a"] * 50 + ["b"] * 30 + ["c"] * 5})
    toks2 = pd.DataFrame({"tok": ["a"] * 20 + ["d"] * 2})
    # grab the inner generator from the query source: re-implemented
    # minimal driver — mg_partition is a closure, so exercise the
    # contract through its committed semantics: value_counts summaries
    # merged with COMBINE+PRUNE and one (NULL, n) total row. We call
    # the real code path via a tiny fake mapInPandas.
    captured = {}

    class FakeDF:
        def mapInPandas(self, fn, schema):
            captured["fn"] = fn
            return self

        def persist(self):
            return self

    import unittest.mock as mock

    with mock.patch.object(llm4, "t") as fake_t, mock.patch.object(
        llm4, "words"
    ), mock.patch.object(llm4.F, "explode"), mock.patch.object(
        llm4.F, "broadcast", side_effect=lambda x: x
    ):
        fake_t.return_value.select.return_value = FakeDF()
        try:
            llm4.heavy_hitters_exact_mg(spark=None, sf_dir="/nonexistent")
        except Exception:
            pass  # downstream fails without Spark; pass-1 fn captured
    assert "fn" in captured
    out = pd.concat(list(captured["fn"](iter([toks, toks2]))))
    total = out[out["tok"].isna()]
    cands = out[out["tok"].notna()]
    assert total["cnt"].sum() == len(toks) + len(toks2)
    assert cands["cnt"].isna().all()
    assert "a" in set(cands["tok"])  # heavy token survives the prune
