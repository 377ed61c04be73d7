"""Round-3 multimodal batch: feature extraction AFTER decode — audio
frame energy over decoded PCM, and a real image (PPM/P6) decode with
2×2 average-pool downsampling.

Both operators run the full production plumbing — binary container in
an opaque column, a real header-walking parser (not fixed-offset
peeks), Arrow-batched ``mapInPandas`` stages, typed output schema —
with deterministic synthesized payloads so every byte is re-derivable
by the DuckDB oracle (no rows-only waiver). A production pipeline
swaps only the parser body for libsndfile/Pillow.

Reference parity: the reference's loader stage is bytes→rows
(`/root/reference/jobs.go:31-42`); these extend it with the
decode→feature-extract→downsample stages a multimodal training
pipeline needs (SURVEY.md §2 Part B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (presentation sorts)

from filemapreduce_spark.queries import register
from filemapreduce_spark.queries.llm import (
    _WAV_A,
    _WAV_B,
    _WAV_C,
    parse_wav,
    synth_wav_pdf,
)
from filemapreduce_spark.sources.tables import load_table as t

_FRAME = 16  # audio energy window, in per-channel samples


def _python_stage_partitions(spark: SparkSession) -> int:
    """Task count for Arrow/Python stages over the toy corpus: match
    the session's shuffle sizing (per-task Python dispatch costs
    ~15-20 ms, so more tasks than shuffle partitions is a net loss at
    this data volume)."""
    try:
        return max(2, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return 8


# --------------------------------------------------------------------
# Audio: per-frame energy over decoded channel-0 PCM, top-2 frames.
# --------------------------------------------------------------------
@register(
    "audio_frame_energy_top2",
    f"""
    WITH p AS (
      SELECT doc_id, 50 + doc_id % 77 AS n_samp, 1 + doc_id % 2 AS ch
      FROM documents
    ), s AS (
      SELECT doc_id, ch, unnest(generate_series(0, n_samp - 1)) AS i
      FROM p
    ), v AS (
      SELECT doc_id, i // {_FRAME} AS frame_idx,
             (doc_id * {_WAV_A} + (i * ch) * {_WAV_B} + {_WAV_C}) % 65536
               - 32768 AS val
      FROM s
    ), e AS (
      SELECT doc_id, frame_idx,
             CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(SUM(val * val) AS BIGINT) AS energy
      FROM v GROUP BY doc_id, frame_idx
    ), rk AS (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY energy DESC, frame_idx)
             AS BIGINT) AS rk
      FROM e
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           n_samples, energy, rk
    FROM rk WHERE rk <= 2
    ORDER BY doc_id, rk
    """,
    tags=("multimodal", "audio", "llm"),
)
def audio_frame_energy_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction on DECODED samples: synthesize real
    WAV containers, chunk-walk the RIFF structure back to PCM, window
    channel 0 into 16-sample frames, and keep each document's two
    highest-energy frames (sum of squared samples — the standard
    voice-activity/loudness primitive). The DuckDB oracle re-derives
    every sample from the shared recurrence, so a parser that
    misreads channel interleave or frame boundaries fails the hash.

    Scale shape: synth/decode/energy are row-local Arrow stages (the
    per-doc top-2 selection happens inside the decode batch — nothing
    but finalist rows leave Python); the only shuffle is the
    presentation sort.
    """
    import numpy as np
    import pandas as pd

    # the toy corpus is one parquet file → one scan task; spread the
    # doc_id seed so BOTH Python stages run task-parallel, sized like
    # a shuffle stage (more tasks than that just multiplies Python
    # dispatch overhead; a real multi-file corpus arrives
    # pre-partitioned and skips this)
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(_python_stage_partitions(spark))
    )

    def synth(batches):
        for pdf in batches:
            yield synth_wav_pdf(pdf)

    def frame_energy(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "frame_idx", "n_samples", "energy", "rk")}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                doc_id = int(doc_id)
                ch, _rate, data = parse_wav(doc_id, bytes(b))
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                ch0 = samples[0::ch]
                n = len(ch0)
                frames = np.arange(n) // _FRAME
                sq = ch0 * ch0
                n_frames = int(frames[-1]) + 1 if n else 0
                energy = np.bincount(frames, weights=sq, minlength=n_frames)
                counts = np.bincount(frames, minlength=n_frames)
                # top-2 by (energy desc, frame asc): lexsort on
                # (-energy, frame)
                order = np.lexsort((np.arange(n_frames), -energy))[:2]
                for rk, fi in enumerate(order, start=1):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(int(fi))
                    out["n_samples"].append(int(counts[fi]))
                    out["energy"].append(int(energy[fi]))
                    out["rk"].append(rk)
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, frame_idx long, n_samples long, energy long, rk long"
    )
    return (
        d.mapInPandas(synth, schema="doc_id long, payload binary")
        .mapInPandas(frame_energy, schema=schema)
        .orderBy("doc_id", "rk")
    )


# --------------------------------------------------------------------
# Image: real PPM (P6) decode + per-channel sums + 2×2 avg downsample.
# --------------------------------------------------------------------
def parse_ppm(doc_id, b):
    """Token-walking PPM/P6 parse → (width, height, pixel ndarray).
    Validates magic, maxval and payload length; raises on corruption."""
    import numpy as np

    if b[:2] != b"P6":
        raise ValueError(f"doc {doc_id}: not a P6 PPM payload")
    idx, vals = 2, []
    ws = b" \t\r\n"
    while len(vals) < 3:
        while idx < len(b) and b[idx : idx + 1] in (b" ", b"\t", b"\r", b"\n"):
            idx += 1
        start = idx
        while idx < len(b) and b[idx : idx + 1] not in (
            b" ", b"\t", b"\r", b"\n",
        ):
            idx += 1
        if start == idx:
            raise ValueError(f"doc {doc_id}: truncated PPM header")
        vals.append(int(b[start:idx]))
    del ws
    idx += 1  # exactly one whitespace byte after maxval
    w, h, maxv = vals
    if maxv != 255:
        raise ValueError(f"doc {doc_id}: unsupported maxval {maxv}")
    data = b[idx:]
    if len(data) != w * h * 3:
        raise ValueError(
            f"doc {doc_id}: payload {len(data)} != {w}*{h}*3"
        )
    arr = np.frombuffer(data, np.uint8).reshape(h, w, 3).astype(np.int64)
    return w, h, arr


@register(
    "image_decode_downsample",
    f"""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
      FROM documents
    ), fullpx AS (
      SELECT doc_id, unnest(generate_series(0, w * h * 3 - 1)) AS q
      FROM p
    ), fb AS (
      SELECT doc_id, q % 3 AS c,
             (doc_id * {_WAV_A} + q * {_WAV_B} + {_WAV_C}) % 256 AS b
      FROM fullpx
    ), sums AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN c = 0 THEN b ELSE 0 END) AS BIGINT) AS r_sum,
             CAST(SUM(CASE WHEN c = 1 THEN b ELSE 0 END) AS BIGINT) AS g_sum,
             CAST(SUM(CASE WHEN c = 2 THEN b ELSE 0 END) AS BIGINT) AS b_sum
      FROM fb GROUP BY doc_id
    ), pooldims AS (
      SELECT doc_id, w, (w - w % 2) // 2 AS pw, (h - h % 2) // 2 AS ph
      FROM p
    ), pk AS (
      SELECT doc_id, w, pw,
             unnest(generate_series(0, ph * pw * 3 - 1)) AS k
      FROM pooldims
    ), pc AS (
      SELECT doc_id, w,
             k // (pw * 3) AS i, (k % (pw * 3)) // 3 AS j, k % 3 AS c
      FROM pk
    ), pv AS (
      SELECT doc_id, i, j, c,
             ( (doc_id * {_WAV_A} + (((2*i) * w + 2*j) * 3 + c)
                  * {_WAV_B} + {_WAV_C}) % 256
             + (doc_id * {_WAV_A} + (((2*i) * w + 2*j + 1) * 3 + c)
                  * {_WAV_B} + {_WAV_C}) % 256
             + (doc_id * {_WAV_A} + (((2*i + 1) * w + 2*j) * 3 + c)
                  * {_WAV_B} + {_WAV_C}) % 256
             + (doc_id * {_WAV_A} + (((2*i + 1) * w + 2*j + 1) * 3 + c)
                  * {_WAV_B} + {_WAV_C}) % 256 ) // 4 AS pb
      FROM pc
    ), chks AS (
      SELECT doc_id,
             CAST(SUM(pb * (1 + (i * 31 + j * 17 + c * 7) % 97)) AS BIGINT)
               AS down_checksum
      FROM pv GROUP BY doc_id
    )
    SELECT p.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           r_sum, g_sum, b_sum, down_checksum
    FROM p JOIN sums USING (doc_id) JOIN chks USING (doc_id)
    ORDER BY p.doc_id
    """,
    tags=("multimodal", "image", "llm"),
)
def image_decode_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + resize, end to end and REAL: binary PPM (P6)
    containers are synthesized per document (header + raw RGB bytes
    from the shared recurrence), then a token-walking parser recovers
    dimensions and pixels, computes per-channel byte sums, and
    average-pools 2×2 blocks (integer floor — the deterministic
    'resize' step), emitting a position-weighted checksum of the
    downsampled image so a transposed/shifted pool layout fails the
    hash. The DuckDB oracle re-derives every pixel and pooled block
    independently.

    Scale shape: synth/decode/pool are row-local Arrow stages — no
    shuffle before the presentation sort; image bytes never leave
    their partition. A real JPEG/PNG path swaps the parser body for
    Pillow inside the same ``mapInPandas`` contract.
    """
    import numpy as np
    import pandas as pd

    # single-file toy scan → repartition so both Python stages are
    # task-parallel (see audio_frame_energy_top2)
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(_python_stage_partitions(spark))
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 9
                h = 6 + doc_id % 7
                q = np.arange(w * h * 3, dtype=np.int64)
                px = ((doc_id * _WAV_A + q * _WAV_B + _WAV_C) % 256).astype(
                    np.uint8
                )
                header = f"P6\n{w} {h}\n255\n".encode("ascii")
                payloads.append(header + px.tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode_pool(batches):
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "width", "height",
                    "r_sum", "g_sum", "b_sum", "down_checksum",
                )
            }
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
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["r_sum"].append(int(arr[:, :, 0].sum()))
                out["g_sum"].append(int(arr[:, :, 1].sum()))
                out["b_sum"].append(int(arr[:, :, 2].sum()))
                out["down_checksum"].append(int((pooled * weight).sum()))
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, width long, height long, r_sum long, g_sum long, "
        "b_sum long, down_checksum long"
    )
    return (
        d.mapInPandas(synth, schema="doc_id long, payload binary")
        .mapInPandas(decode_pool, schema=schema)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# Corpus-level pixel-intensity histogram over decoded images.
# --------------------------------------------------------------------
@register(
    "image_pixel_histogram",
    f"""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
      FROM documents
    ), fullpx AS (
      SELECT doc_id, unnest(generate_series(0, w * h * 3 - 1)) AS q
      FROM p
    ), fb AS (
      SELECT q % 3 AS channel,
             ((doc_id * {_WAV_A} + q * {_WAV_B} + {_WAV_C}) % 256) // 32
               AS bin
      FROM fullpx
    )
    SELECT CAST(channel AS BIGINT) AS channel,
           CAST(bin AS BIGINT) AS bin,
           COUNT(*) AS n_pixels
    FROM fb
    GROUP BY channel, bin
    ORDER BY channel, bin
    """,
    tags=("multimodal", "image", "histogram", "llm"),
)
def image_pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-level pixel-intensity histogram over DECODED images:
    synthesize the PPM containers, parse them with the real
    header-walking decoder, and histogram every pixel byte into 8
    intensity bins per channel — the brightness/contrast profile a
    vision-data pipeline computes before normalization (mean/std
    image stats, exposure skew, dead-channel detection). The DuckDB
    oracle re-derives every pixel from the shared recurrence, so the
    counts must match exactly.

    Scale shape: synth/decode/histogram are row-local Arrow stages
    emitting 24 partial rows per TASK (channel × bin counts reduce
    inside the Python stage before the one tiny shuffle) — image
    bytes never cross the network, which is the only viable layout
    when frames are MB-scale.
    """
    import numpy as np
    import pandas as pd

    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(_python_stage_partitions(spark))
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 9
                h = 6 + doc_id % 7
                q = np.arange(w * h * 3, dtype=np.int64)
                px = ((doc_id * _WAV_A + q * _WAV_B + _WAV_C) % 256).astype(
                    np.uint8
                )
                header = f"P6\n{w} {h}\n255\n".encode("ascii")
                payloads.append(header + px.tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def hist_partial(batches):
        # per-TASK partial histogram: 24 rows leave Python per batch,
        # never per image
        for pdf in batches:
            acc = np.zeros((3, 8), dtype=np.int64)
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                doc_id = int(doc_id)
                _, _, arr = parse_ppm(doc_id, bytes(b))
                for c in range(3):
                    acc[c] += np.bincount(
                        (arr[:, :, c] >> 5).ravel(), minlength=8
                    )
            ch, bins = np.indices(acc.shape)
            yield pd.DataFrame(
                {
                    "channel": ch.ravel(),
                    "bin": bins.ravel(),
                    "n_pixels": acc.ravel(),
                }
            )

    return (
        d.mapInPandas(synth, schema="doc_id long, payload binary")
        .mapInPandas(
            hist_partial, schema="channel long, bin long, n_pixels long"
        )
        .groupBy("channel", "bin")
        .agg(F.sum("n_pixels").cast("long").alias("n_pixels"))
        .orderBy("channel", "bin")
    )


# --------------------------------------------------------------------
# Audio decimation: decode → channel-0 → 2:1 block-sum downsample.
# --------------------------------------------------------------------
@register(
    "audio_decimate_2to1",
    f"""
    WITH p AS (
      SELECT doc_id, 50 + doc_id % 77 AS n_frames, 1 + doc_id % 2 AS ch
      FROM documents
    ), outk AS (
      SELECT doc_id, ch,
             unnest(generate_series(0, n_frames // 2 - 1)) AS k
      FROM p
    ), y AS (
      SELECT doc_id, k,
             ((doc_id * {_WAV_A} + (2 * k) * ch * {_WAV_B} + {_WAV_C})
                % 65536 - 32768)
             + ((doc_id * {_WAV_A} + (2 * k + 1) * ch * {_WAV_B} + {_WAV_C})
                % 65536 - 32768) AS v
      FROM outk
    )
    SELECT doc_id,
           COUNT(*) AS n_out,
           CAST(SUM(v * (1 + k % 97)) AS BIGINT) AS checksum,
           CAST(MAX(abs(v)) AS BIGINT) AS peak
    FROM y
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("multimodal", "audio", "dsp", "llm"),
)
def audio_decimate_2to1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decimation on decoded PCM: synthesize the WAV corpus,
    parse it with the real RIFF chunk walker, take channel 0, and
    downsample 2:1 by summing sample pairs (the anti-aliased
    production version convolves a low-pass FIR first — the plumbing
    is identical), emitting the output length, a position-weighted
    checksum of the decimated signal, and its peak amplitude. The
    oracle re-derives channel-0 samples from the shared recurrence
    (channel-0 frame i sits at interleaved index i·ch).

    Scale shape: synth/decode/decimate are row-local Arrow stages;
    the decimated payload reduces to three numbers per doc inside
    Python, so only the summary shuffles. Sample-rate conversion at
    fleet scale is exactly this map over the audio shards.
    """
    import numpy as np
    import pandas as pd

    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(_python_stage_partitions(spark))
    )

    def synth(batches):
        for pdf in batches:
            yield synth_wav_pdf(pdf)

    def decimate(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_out": [], "checksum": [], "peak": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                doc_id = int(doc_id)
                ch, rate, data = parse_wav(doc_id, bytes(b))
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                ch0 = samples[::ch]
                n_out = len(ch0) // 2
                pairs = ch0[: 2 * n_out].reshape(n_out, 2)
                y = pairs.sum(axis=1)
                k = np.arange(n_out, dtype=np.int64)
                out["doc_id"].append(doc_id)
                out["n_out"].append(n_out)
                out["checksum"].append(int((y * (1 + k % 97)).sum()))
                out["peak"].append(int(np.abs(y).max()) if n_out else 0)
            yield pd.DataFrame(out)

    return (
        d.mapInPandas(synth, schema="doc_id long, payload binary")
        .mapInPandas(
            decimate,
            schema="doc_id long, n_out long, checksum long, peak long",
        )
        .orderBy("doc_id")
    )
