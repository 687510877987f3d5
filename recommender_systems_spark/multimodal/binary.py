"""Binary-payload operators (training-data-pipeline extension:
multimodal columns).

Design: a multimodal row is ``(id, payload binary, meta struct)``. All
transforms are ``mapInPandas`` stages — Arrow moves the raw bytes into
the Python worker in columnar batches (no per-row pickling), the
extractor emits a fixed-schema frame, and Spark's partitioning carries
the work: at 100 TB this is embarrassingly parallel with NO shuffle
(mapInPandas is a narrow transformation; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so worker memory is
payload-bounded, not partition-bounded).

``decode_image`` is a REAL zero-dependency decoder for the two
uncompressed formats (binary PPM, 24-bit BMP) — compressed codecs
(JPEG/PNG via PIL, absent from this container) would slot into the same
parse branch. ``sample_audio_frames`` likewise decodes PCM WAV headers
with NumPy; compressed audio (ffmpeg) is the documented extension.
``byte_features`` remains the deterministic stand-in that keeps the
codec-free pipeline oracle-checkable end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BYTES = 8


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pack a string column into the multimodal shape: UTF-8 payload
    bytes + typed metadata struct. (In production the payload column
    arrives pre-encoded from the lakehouse; this adapter lets the
    driver's ``documents`` table exercise the binary path.)"""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


def byte_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    k: int = FEATURE_BYTES,
) -> DataFrame:
    """Deterministic per-payload features: byte length + the first ``k``
    bytes scaled to [0,1]. The stand-in for a real decoder so the
    mapInPandas plumbing (schema, Arrow batching, narrow parallelism)
    is fully exercised and oracle-checkable."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "features": payloads.map(
                        lambda b: [x / 255.0 for x in bytes(b)[:k]]
                    ),
                }
            )

    return df.mapInPandas(
        extract, schema=f"{id_col} long, n_bytes long, features array<double>"
    )


FRAME_BYTES = 16
FRAME_STRIDE = 4
MAX_FRAMES = 8


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Frame sampling over a binary payload — the video/audio pattern
    (decode → sample every ``stride``-th frame → per-frame feature)
    with a deterministic fake decoder: a "frame" is ``frame_bytes``
    consecutive payload bytes, its feature the mean byte value scaled
    to [0,1]. The plumbing is the production shape: Arrow-batched
    ``mapInPandas``, fixed schema, narrow (no shuffle), worker memory
    bounded by batch size × payload — swap the feature lambda for a
    real codec and nothing else changes."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            n_frames: list[int] = []
            sampled: list[list[int]] = []
            feats: list[list[float]] = []
            for b in pdf[payload_col]:
                raw = bytes(b)
                n = len(raw) // frame_bytes
                idxs = list(range(0, n, stride))[:max_frames]
                n_frames.append(n)
                sampled.append(idxs)
                feats.append(
                    [
                        # int sum → exact in float64; /frame_bytes/255
                        # in the same order as the oracle SQL.
                        round(
                            sum(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
                            / float(frame_bytes)
                            / 255.0,
                            5,
                        )
                        for fi in idxs
                    ]
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_frames": pd.Series(n_frames, dtype="int64"),
                    "sampled_frames": sampled,
                    "frame_features": feats,
                }
            )

    return df.mapInPandas(
        extract,
        schema=(
            f"{id_col} long, n_frames long, sampled_frames array<int>, "
            "frame_features array<double>"
        ),
    )


GRID = 16
POOL = 2
OUT = GRID // POOL


def resize_grid(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize stage with a deterministic fake decoder: the first
    GRID×GRID payload bytes are a grayscale "image" (zero-padded when
    the payload is short), average-pooled POOL×POOL to OUT×OUT and
    scaled to [0,1] — the image-resize pattern (decode → pool → float
    grid) with the codec stubbed (decode_image is the real thing's
    slot). Same production plumbing as every stage here: Arrow-batched
    mapInPandas, fixed schema, narrow, no shuffle."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[list[float]] = []
            for b in pdf[payload_col]:
                raw = bytes(b)[: GRID * GRID]
                arr = np.zeros(GRID * GRID, dtype=np.int64)
                arr[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                pooled = (
                    arr.reshape(GRID, GRID)
                    .reshape(OUT, POOL, OUT, POOL)
                    .sum(axis=(1, 3))
                )
                # int sum → /POOL² → /255, same op order as the oracle.
                vals = np.round(pooled / float(POOL * POOL) / 255.0, 5)
                out.append([float(v) for v in vals.ravel()])
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out})

    return df.mapInPandas(extract, schema=f"{id_col} long, resized array<double>")


def _parse_ppm(raw: bytes):
    """Binary PPM (P6): ASCII header (width, height, maxval; ``#``
    comments allowed), one whitespace, then packed RGB rows."""
    import numpy as np

    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(raw[start:pos]))
    pos += 1  # the single whitespace byte that terminates the header
    w, h, _maxval = vals
    px = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )
    return w, h, px


def _parse_bmp(raw: bytes):
    """Uncompressed 24-bit BI_RGB Windows bitmap: little-endian header
    fields, 4-byte-padded BGR rows stored bottom-up (top-down when the
    height field is negative)."""
    import numpy as np

    off = int.from_bytes(raw[10:14], "little")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    comp = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    flip, h = h > 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=off).reshape(
        h, stride
    )
    px = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
    if flip:
        px = px[::-1]
    return w, h, px


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    pool: int = 1,
) -> DataFrame:
    """Image decode: zero-dependency header-parse + NumPy reshape for
    the two uncompressed formats (binary PPM ``P6``, 24-bit BI_RGB
    BMP), then ``pool``×``pool`` average-pooled grayscale in [0,1].

    Emits ``(id, width, height, fmt, gray array<double>)`` — width and
    height are the DECODED dims, ``gray`` the row-major pooled grid,
    gray value = Σ(r+g+b over the pool block) / (3·pool²) / 255 (the
    integer byte sum is exact in float64, so the single division order
    is reproducible bit-for-bit by an oracle). Undecodable payloads
    (wrong magic, compressed BMP) yield a NULL-dims row with fmt NULL
    rather than failing the batch.

    Same production plumbing as every stage here: Arrow-batched
    ``mapInPandas``, fixed schema, narrow (no shuffle), worker memory
    bounded by batch size × decoded frame. Swapping in a JPEG/PNG codec
    (PIL, absent from this container) changes only the parse branch."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, out_f, out_g = [], [], [], []
            for b in pdf[payload_col]:
                raw = bytes(b)
                try:
                    if raw[:2] == b"P6":
                        fmt, (w, h, px) = "ppm", _parse_ppm(raw)
                    elif raw[:2] == b"BM":
                        fmt, (w, h, px) = "bmp", _parse_bmp(raw)
                    else:
                        raise ValueError("unknown magic")
                except (ValueError, IndexError):
                    out_w.append(None)
                    out_h.append(None)
                    out_f.append(None)
                    out_g.append(None)
                    continue
                ph, pw = h // pool, w // pool
                sums = (
                    px[: ph * pool, : pw * pool, :]
                    .astype(np.int64)
                    .reshape(ph, pool, pw, pool, 3)
                    .sum(axis=(1, 3, 4))
                )
                gray = np.round(sums / (3.0 * pool * pool) / 255.0, 5)
                out_w.append(w)
                out_h.append(h)
                out_f.append(fmt)
                out_g.append([float(v) for v in gray.ravel()])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.Series(out_w, dtype="Int32"),
                    "height": pd.Series(out_h, dtype="Int32"),
                    "fmt": out_f,
                    "gray": out_g,
                }
            )

    return df.mapInPandas(
        extract,
        schema=f"{id_col} long, width int, height int, fmt string, gray array<double>",
    )


def sample_audio_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_samples: int = 256,
    stride: int = FRAME_STRIDE,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Audio decode + frame sampling: zero-dependency RIFF/WAV chunk
    walk (PCM 16-bit only), NumPy int16 view, then every ``stride``-th
    frame of ``frame_samples`` samples up to ``max_frames``; per-frame
    feature = mean |amplitude| scaled to [0,1]
    (Σ|s| / frame_samples / 32768 — integer sum exact in float64, one
    reproducible division order). Undecodable payloads (wrong magic,
    compressed/float WAV) yield NULL dims instead of failing the batch.
    Same narrow Arrow-batched ``mapInPandas`` contract as
    ``sample_frames``; a compressed-audio codec (ffmpeg, absent here)
    would replace only the chunk-walk branch."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_sr, out_n, out_idx, out_feat = [], [], [], []
            for b in pdf[payload_col]:
                raw = bytes(b)
                try:
                    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
                        raise ValueError("not RIFF/WAVE")
                    pos, sr, data = 12, None, None
                    while pos + 8 <= len(raw):
                        cid = raw[pos : pos + 4]
                        sz = int.from_bytes(raw[pos + 4 : pos + 8], "little")
                        body = raw[pos + 8 : pos + 8 + sz]
                        if cid == b"fmt ":
                            codec = int.from_bytes(body[0:2], "little")
                            bits = int.from_bytes(body[14:16], "little")
                            if codec != 1 or bits != 16:
                                raise ValueError("PCM16 only")
                            sr = int.from_bytes(body[4:8], "little")
                        elif cid == b"data":
                            data = body
                        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
                    if sr is None or data is None:
                        raise ValueError("missing fmt/data chunk")
                    samples = np.frombuffer(
                        data, dtype="<i2", count=len(data) // 2
                    ).astype(np.int64)
                except (ValueError, IndexError):
                    out_sr.append(None)
                    out_n.append(None)
                    out_idx.append(None)
                    out_feat.append(None)
                    continue
                n = len(samples) // frame_samples
                idxs = list(range(0, n, stride))[:max_frames]
                out_sr.append(sr)
                out_n.append(n)
                out_idx.append(idxs)
                out_feat.append(
                    [
                        round(
                            int(
                                np.abs(
                                    samples[
                                        fi * frame_samples : (fi + 1) * frame_samples
                                    ]
                                ).sum()
                            )
                            / float(frame_samples)
                            / 32768.0,
                            5,
                        )
                        for fi in idxs
                    ]
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": pd.Series(out_sr, dtype="Int32"),
                    "n_frames": pd.Series(out_n, dtype="Int64"),
                    "sampled_frames": out_idx,
                    "frame_features": out_feat,
                }
            )

    return df.mapInPandas(
        extract,
        schema=(
            f"{id_col} long, sample_rate int, n_frames long, "
            "sampled_frames array<int>, frame_features array<double>"
        ),
    )
