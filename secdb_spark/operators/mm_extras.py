"""Round-11 additions, batch 3 — EXACT-certified multimodal plumbing.

The mm_* family (llm_pipeline.py) certifies rows-only because real codec
bytes can't be recomputed by a SQL oracle.  These two ops close that gap
for the PLUMBING itself: the payloads are deterministic synthetic
PCM/bitmap bytes whose decoded statistics are pure integer functions of
(doc_id, position), so DuckDB recomputes every output row from
generate_series arithmetic while the Spark side goes through the REAL
binary path — numpy pack → BinaryType column → frombuffer decode →
vectorized stats in mapInPandas.  A byte-order bug, a stride bug, or an
off-by-one in framing breaks the hash match.

House conventions: exact integer sums; the only doubles are single
shared-IEEE closings (sqrt of an exact ratio), quantized e3.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register

#: audio synth: 16-bit PCM, little-endian, N samples framed into FRAME
AUDIO_N = 4096
AUDIO_FRAME = 1024
AUDIO_MOD = 1 << 16
#: deterministic sample generator multipliers (Knuth/odd constants)
A_MUL, A_STEP = 2654435761, 40503
#: image synth: W x H grayscale bytes, 8 histogram bins of width 32
IMG_W, IMG_H = 32, 32
IMG_BINS = 8
P_MUL_D, P_MUL_Y, P_MUL_X = 31, 7, 13
#: subset: one synthetic asset per doc_id % MM_PICK == 0
MM_PICK = 50


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % MM_PICK == 0)
    )


@register(
    "mm_audio_frame_rms",
    oracle=f"""
    WITH ids AS (
      SELECT doc_id FROM documents WHERE doc_id % {MM_PICK} = 0
    ), s AS (
      SELECT doc_id, i,
             (doc_id * {A_MUL} + i * {A_STEP}) % {AUDIO_MOD} - 32768 AS v
      FROM ids, unnest(generate_series(0, {AUDIO_N - 1})) AS t(i)
    )
    SELECT doc_id, CAST(i // {AUDIO_FRAME} AS INT) AS frame_idx,
           CAST(sum(v * v) AS BIGINT) AS ssq,
           CAST(floor(sqrt(CAST(sum(v * v) AS DOUBLE) / {AUDIO_FRAME})
                      * 1000 + 0.5) AS BIGINT) AS rms_q
    FROM s GROUP BY doc_id, i // {AUDIO_FRAME}
    """,
)
def mm_audio_frame_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame RMS over REAL binary PCM — the audio half of the
    multimodal plumbing, EXACT-certified: each selected doc synthesizes
    {AUDIO_N} little-endian int16 samples v(d,i) = (d*{A_MUL} +
    i*{A_STEP}) mod 2^16 - 32768, packs them through an actual
    BinaryType column, and a second Arrow stage frombuffer-decodes and
    frames them ({AUDIO_FRAME}/frame) — byte order ('<i2'), stride, and
    framing are all on the hash path because the DuckDB oracle
    recomputes every frame from the arithmetic alone.  ssq is an exact
    int64; rms quantizes the one shared-IEEE sqrt e3.  Returns
    (doc_id, frame_idx, ssq, rms_q).

    Scale: both stages are map-only Arrow batches (no shuffle at all);
    payload bytes never leave the executor that synthesized them —
    exactly the shape a real decode-and-featurize pass has, with the
    codec swapped for the deterministic generator (the documented
    mm-family stub discipline, now hash-checked)."""
    import numpy as np

    ids = _doc_ids(spark, sf_dir)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            i = np.arange(AUDIO_N, dtype=np.int64)
            out = []
            for d in b["doc_id"].to_numpy():
                v = (d * A_MUL + i * A_STEP) % AUDIO_MOD - 32768
                out.append((int(d), v.astype("<i2").tobytes()))
            yield pd.DataFrame(out, columns=["doc_id", "pcm"])

    pcm = ids.mapInPandas(synth, "doc_id long, pcm binary")

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, buf in zip(b["doc_id"], b["pcm"]):
                v = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                fr = v.reshape(-1, AUDIO_FRAME)
                ssq = (fr * fr).sum(axis=1)
                rms_q = np.floor(
                    np.sqrt(ssq.astype(np.float64) / AUDIO_FRAME) * 1000
                    + 0.5
                ).astype(np.int64)
                for fi, (s, r) in enumerate(zip(ssq, rms_q)):
                    rows.append((int(d), fi, int(s), int(r)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "ssq", "rms_q"]
            )

    return pcm.mapInPandas(
        rms, "doc_id long, frame_idx int, ssq long, rms_q long"
    )


@register(
    "mm_image_hist",
    oracle=f"""
    WITH ids AS (
      SELECT doc_id FROM documents WHERE doc_id % {MM_PICK} = 0
    ), px AS (
      SELECT doc_id,
             (doc_id * {P_MUL_D} + (i // {IMG_W}) * {P_MUL_Y}
              + (i % {IMG_W}) * {P_MUL_X}) % 256 AS p
      FROM ids, unnest(generate_series(0, {IMG_W * IMG_H - 1})) AS t(i)
    )
    SELECT doc_id, CAST(p // 32 AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_px
    FROM px GROUP BY doc_id, p // 32
    """,
)
def mm_image_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grayscale-histogram feature over REAL binary bitmaps — the image
    half of the exact-certified multimodal plumbing: each selected doc
    synthesizes a {IMG_W}x{IMG_H} uint8 raster p(d,y,x) = (d*{P_MUL_D}
    + y*{P_MUL_Y} + x*{P_MUL_X}) mod 256 through an actual BinaryType
    column; the decode stage frombuffer-reshapes (H,W) and buckets the
    pixel values into {IMG_BINS} bins of width 32 — raster order and
    reshape stride are on the hash path because the oracle recomputes
    every count from row-major index arithmetic.  Returns
    (doc_id, bin, n_px); only bins that occur are emitted (count > 0),
    matching the oracle's GROUP BY.

    Scale: two map-only Arrow stages, no shuffle; the histogram is the
    canonical decode-and-featurize shape (mm_features' real-bitmap
    discipline, upgraded from rows-only to an exact hash check)."""
    import numpy as np

    ids = _doc_ids(spark, sf_dir)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            y = np.arange(IMG_H, dtype=np.int64)[:, None]
            x = np.arange(IMG_W, dtype=np.int64)[None, :]
            out = []
            for d in b["doc_id"].to_numpy():
                p = (d * P_MUL_D + y * P_MUL_Y + x * P_MUL_X) % 256
                out.append((int(d), p.astype(np.uint8).tobytes()))
            yield pd.DataFrame(out, columns=["doc_id", "img"])

    img = ids.mapInPandas(synth, "doc_id long, img binary")

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, buf in zip(b["doc_id"], b["img"]):
                p = np.frombuffer(buf, dtype=np.uint8).reshape(IMG_H, IMG_W)
                counts = np.bincount(p.ravel() // 32, minlength=IMG_BINS)
                for bi, n in enumerate(counts):
                    if n > 0:
                        rows.append((int(d), bi, int(n)))
            yield pd.DataFrame(rows, columns=["doc_id", "bin", "n_px"])

    return img.mapInPandas(hist, "doc_id long, bin int, n_px long")
