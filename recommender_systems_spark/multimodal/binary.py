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

The image/audio decode stages are STUBS (`NotImplementedError`) because
the codec libraries are not installed here; ``byte_features`` is the
deterministic stand-in that keeps the whole pipeline executable and
oracle-checkable end to end.
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


def decode_image(
    df: DataFrame, payload_col: str = "payload", size: tuple[int, int] = (224, 224)
) -> DataFrame:
    """STUB — image decode + resize to a float tensor column.

    Requires an imaging library (PIL/opencv), not present in this
    container. The production shape is identical to ``byte_features``:
    a ``mapInPandas`` stage emitting
    ``(id, shape array<int>, pixels array<float>)`` per row, narrow,
    Arrow-batched, memory-bounded by batch size × decoded frame."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; use byte_features for the "
        "deterministic plumbing path"
    )


def sample_audio_frames(
    df: DataFrame, payload_col: str = "payload", rate_hz: int = 16000
) -> DataFrame:
    """STUB — audio frame sampling (same mapInPandas contract)."""
    raise NotImplementedError("audio decode requires torchaudio/ffmpeg")
