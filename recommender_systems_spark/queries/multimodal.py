"""Multimodal + streaming queries.

- ``mm_byte_features``: the binary-payload pipeline (documents packed
  as UTF-8 payloads → Arrow-batched mapInPandas byte features). The
  oracle reproduces the byte math from the text (the corpus is ASCII,
  so byte i == code point i — asserted by the n_bytes comparison).
- ``s_stream_window_agg``: the Structured Streaming window aggregate
  drained with an availableNow trigger; its oracle is the SAME SQL as
  the batch twin — a value-hash match proves stream/batch parity.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from recommender_systems_spark.io import _microsecond_copy
from recommender_systems_spark.multimodal.binary import (
    FRAME_BYTES,
    FRAME_STRIDE,
    MAX_FRAMES,
    byte_features,
    sample_frames,
    with_payload,
)
from recommender_systems_spark.registry import _t, register

FEATURE_BYTES = 8

# House hashing rule (queries/core.py f_string_array_ops, VERDICT r4 #1):
# the driver's canonicalizer pandas-sorts raw cell values, and a list
# cell raises `TypeError: unhashable type: 'list'` — so NO query may
# emit a top-level array column.  Every array here is serialised to a
# CSV string; doubles go through round(x * 1e5) → BIGINT first, because
# equal doubles always render as equal integers, while float→string
# formatting can differ between engines.  (Spark's HALF_UP and DuckDB's
# half-away-from-zero agree on the non-negative values used here, and
# the scaled values never land on an exact .5 tie — byte/255 is a
# non-terminating binary fraction except at 0 and 255.)


def _csv_ints(col: str | Column) -> Column:
    """array<int> → 'a,b,c' (engine-portable hashing)."""
    return F.array_join(F.transform(col, lambda v: v.cast("string")), ",")


def _csv_scaled(col: str | Column, scale: int = 100_000) -> Column:
    """array<double> → scaled-integer CSV, e.g. [0.00392,…] → '392,…'."""
    return F.array_join(
        F.transform(col, lambda v: F.round(v * scale).cast("long").cast("string")),
        ",",
    )


_MM_SQL = f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           array_to_string(
               list_transform(range(1, {FEATURE_BYTES + 1}),
                   i -> CAST(round(ascii(text[i:i]) / 255.0 * 100000) AS BIGINT)),
               ',') AS features
    FROM documents
"""


@register("mm_byte_features", _MM_SQL)
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal extension: documents → (payload binary, meta struct)
    → mapInPandas byte-feature extraction (length + first-8-bytes/255).
    The extractor is the deterministic stand-in for a codec stage
    (multimodal.binary.decode_image is the real-codec slot); what
    this query proves is the binary plumbing — encode, Arrow batch
    transfer, fixed-schema narrow map — end to end against an oracle.
    The feature vector is serialised per the house hashing rule."""
    docs = _t(spark, sf_dir, "documents")
    feats = byte_features(with_payload(docs), k=FEATURE_BYTES)
    return feats.select("doc_id", "n_bytes", _csv_scaled("features").alias("features"))


# The oracle replays the deterministic fake decoder byte-for-byte: the
# corpus is ASCII (asserted by mm_byte_features' n_bytes == length(text)
# agreement), so byte j of the payload == ascii(text[j+1:j+1]).  The
# division order (sum / frame_bytes / 255) matches the Python extractor
# so both sides round the same float64.
_FRAMES_SQL = f"""
    SELECT doc_id,
           CAST(length(text) // {FRAME_BYTES} AS BIGINT) AS n_frames,
           array_to_string(
               list_transform(
                   list_slice(
                       range(0, CAST(length(text) // {FRAME_BYTES} AS BIGINT),
                             {FRAME_STRIDE}),
                       1, {MAX_FRAMES}),
                   fi -> CAST(fi AS INTEGER)),
               ',') AS sampled_frames,
           array_to_string(
               list_transform(
                   list_slice(
                       range(0, CAST(length(text) // {FRAME_BYTES} AS BIGINT),
                             {FRAME_STRIDE}),
                       1, {MAX_FRAMES}),
                   fi -> CAST(round(round(
                       list_sum(list_transform(
                           range(fi * {FRAME_BYTES} + 1,
                                 fi * {FRAME_BYTES} + {FRAME_BYTES} + 1),
                           j -> ascii(text[j:j])))
                       / {FRAME_BYTES}.0 / 255.0, 5) * 100000) AS BIGINT)),
               ',') AS frame_features
    FROM documents
"""


@register("mm_frame_sample", _FRAMES_SQL)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal extension: frame sampling over binary payloads — the
    video/audio shape (decode → every-``stride``-th frame → per-frame
    feature) with the deterministic fake decoder from
    ``multimodal.binary.sample_frames``. Narrow Arrow-batched
    mapInPandas: at 100 TB this is shuffle-free and embarrassingly
    parallel; swapping the fake decoder for ffmpeg changes nothing in
    the plan. Both array outputs are serialised per the house hashing
    rule (module docstring above _csv_ints)."""
    docs = _t(spark, sf_dir, "documents")
    frames = sample_frames(with_payload(docs))
    return frames.select(
        "doc_id",
        "n_frames",
        _csv_ints("sampled_frames").alias("sampled_frames"),
        _csv_scaled("frame_features").alias("frame_features"),
    )


def _stream_dir(sf_dir: str) -> str:
    """A directory containing the (timestamp-normalised) events parquet
    — the file-stream source lists directories, and the driver's raw
    file carries ns timestamps Spark's reader rejects."""
    src = _microsecond_copy(f"{sf_dir}/events.parquet")
    out_dir = src[:-8] + "_streamdir"  # strip .parquet
    target = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(target):
        os.makedirs(out_dir, exist_ok=True)
        shutil.copy(src, target + ".tmp")
        os.replace(target + ".tmp", target)
    return out_dir


@register(
    "s_stream_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def s_stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming extension: the event-time tumbling-window aggregate
    run as a REAL Structured Streaming job (file source → watermark →
    windowed state → memory sink, availableNow trigger) and compared
    against the batch SQL — the value-hash match is a stream/batch
    parity proof (same F.window semantics, SURVEY §2.9)."""
    from recommender_systems_spark.streaming.events import run_available_now

    name = f"stream_events_{abs(hash(sf_dir)) % 10**8}"
    return run_available_now(spark, _stream_dir(sf_dir), name)


@register(
    "s_stream_enrich",
    """
    SELECT date_trunc('hour', e.ts) AS window_start,
           c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def s_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming extension: stream-static enrichment — the events
    stream joins the STATIC customer dimension (broadcast per
    micro-batch, zero streaming state for the join) and rolls up into
    per-segment event-time windows. The oracle is the equivalent batch
    join+aggregate, so the value-hash match proves stream/batch parity
    for the second core streaming pattern after pure windowed
    aggregation (SURVEY §2.9)."""
    from recommender_systems_spark.streaming.events import run_enrich_available_now

    dim = _t(spark, sf_dir, "customer")
    name = f"stream_enrich_{abs(hash(sf_dir)) % 10**8}"
    return run_enrich_available_now(spark, _stream_dir(sf_dir), dim, name)


@register(
    "s_stream_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def s_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming extension: stateful exact dedup — the third core
    streaming pattern (after windowed aggregation and stream-static
    enrichment). ``dropDuplicates`` over the (user_id, event_type) key
    projection in append mode: each key emits exactly once, on first
    arrival; the oracle's SELECT DISTINCT proves the drained stream
    equals batch dedup. See streaming.events.stream_dedup_keys for the
    determinism argument and the WithinWatermark scale variant."""
    from recommender_systems_spark.streaming.events import run_dedup_available_now

    name = f"stream_dedup_{abs(hash(sf_dir)) % 10**8}"
    return run_dedup_available_now(spark, _stream_dir(sf_dir), name)


def _byte_sql(i: str) -> str:
    """Zero-padded byte read: ascii code of 1-based char i, 0 past the
    end (the corpus is ASCII — byte i == code point i, asserted by
    mm_byte_features' n_bytes comparison)."""
    return f"(CASE WHEN {i} <= length(text) THEN ascii(text[{i}:{i}]) ELSE 0 END)"


_GRID, _POOL, _OUT = 16, 2, 8

_RESIZE_SQL = f"""
    SELECT doc_id,
           array_to_string(
               list_transform(range({_OUT * _OUT}), k ->
                   CAST(round(round((CAST(
                       {_byte_sql(f"((k // {_OUT}) * {_POOL}) * {_GRID} + (k % {_OUT}) * {_POOL} + 1")}
                     + {_byte_sql(f"((k // {_OUT}) * {_POOL}) * {_GRID} + (k % {_OUT}) * {_POOL} + 2")}
                     + {_byte_sql(f"((k // {_OUT}) * {_POOL} + 1) * {_GRID} + (k % {_OUT}) * {_POOL} + 1")}
                     + {_byte_sql(f"((k // {_OUT}) * {_POOL} + 1) * {_GRID} + (k % {_OUT}) * {_POOL} + 2")}
                   AS DOUBLE) / {_POOL * _POOL}.0) / 255.0, 5) * 100000) AS BIGINT)),
               ',') AS resized
    FROM documents
"""


@register("mm_resize", _RESIZE_SQL)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal extension: the resize stage — first 16×16 payload
    bytes as a zero-padded grayscale grid, 2×2 average-pooled to 8×8 in
    [0,1] via Arrow-batched mapInPandas (multimodal.binary.resize_grid;
    decode_image is the stubbed real codec slot). Completes the
    advertised decode / feature-extract / resize / frame-sample
    quartet; the oracle reproduces the pooling arithmetic byte-by-byte
    from the text. The pooled grid is serialised per the house hashing
    rule (module docstring above _csv_ints)."""
    from recommender_systems_spark.multimodal.binary import resize_grid, with_payload

    docs = _t(spark, sf_dir, "documents")
    grid = resize_grid(with_payload(docs))
    return grid.select("doc_id", _csv_scaled("resized").alias("resized"))


# ---------------------------------------------------------------------------
# Real decoders over synthesized payloads.  The fixture side (payload
# synthesis from `documents.text`) runs in Spark; the ORACLE never sees
# the payload — it replays the decode arithmetic from the text directly
# (corpus is ASCII, so byte j == ascii(text[j:j]), asserted by
# mm_byte_features' n_bytes comparison), which makes these true
# independent checks of the decode path.
# ---------------------------------------------------------------------------

_DEC_W = 8  # synthesized PPM is 8×8 RGB
_DEC_POOL = 2
_DEC_OUT = _DEC_W // _DEC_POOL

# Byte position (1-based, within text) of lambda vars k (pooled cell,
# row-major over a 4×4 grid) and j (0..11: 4 pixels × RGB): pixel row
# r = (k//4)*2 + (j//3)//2, col c = (k%4)*2 + (j//3)%2, channel j%3.
_DEC_POS = (
    f"(3*(((k // {_DEC_OUT}) * {_DEC_POOL} + (j // 3) // {_DEC_POOL}) * {_DEC_W}"
    f" + (k % {_DEC_OUT}) * {_DEC_POOL} + (j // 3) % {_DEC_POOL}) + (j % 3) + 1)"
)

_DECODE_SQL = f"""
    SELECT doc_id,
           CAST({_DEC_W} AS INTEGER) AS width,
           CAST({_DEC_W} AS INTEGER) AS height,
           'ppm' AS fmt,
           array_to_string(
               list_transform(range({_DEC_OUT * _DEC_OUT}), k ->
                   CAST(round(round(
                       list_sum(list_transform(range({3 * _DEC_POOL * _DEC_POOL}),
                           j -> {_byte_sql(_DEC_POS)}))
                       / {3 * _DEC_POOL * _DEC_POOL}.0 / 255.0, 5)
                   * 100000) AS BIGINT)),
               ',') AS gray
    FROM documents
"""


@register("mm_decode", _DECODE_SQL)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: the REAL image-decode slot — each document's first
    192 bytes are packed into a binary PPM (P6 header + RGB rows,
    zero-padded; built in-plan from string expressions since the corpus
    is ASCII), then ``multimodal.binary.decode_image`` header-parses,
    reshapes, and 2×2-average-pools to a 4×4 grayscale grid. The oracle
    replays the pooled-grayscale arithmetic from the raw text,
    independent of the decoder. Narrow Arrow-batched mapInPandas; a
    JPEG/PNG codec would change only the parse branch."""
    from recommender_systems_spark.multimodal.binary import decode_image

    docs = _t(spark, sf_dir, "documents")
    body_len = _DEC_W * _DEC_W * 3
    payload = F.encode(
        F.concat(
            F.lit(f"P6\n{_DEC_W} {_DEC_W}\n255\n"),
            F.rpad(F.substring("text", 1, body_len), body_len, "\x00"),
        ),
        "UTF-8",
    )
    dec = decode_image(
        docs.select("doc_id", payload.alias("payload")), pool=_DEC_POOL
    )
    return dec.select(
        "doc_id", "width", "height", "fmt", _csv_scaled("gray").alias("gray")
    )


_AUD_FRAME = 16  # samples per frame
_AUD_STRIDE = 2
_AUD_MAX = 4
_AUD_RATE = 8000

# Sample t (0-based) is the little-endian int16 at text bytes
# (2t+1, 2t+2); ASCII ⇒ high byte ≤ 127 ⇒ value in [0, 32639], so
# |amplitude| == value and no sign handling is needed in SQL.
_AUD_SAMPLE = "(ascii(text[(2*t+1):(2*t+1)]) + 256 * ascii(text[(2*t+2):(2*t+2)]))"
_AUD_N = f"((length(text) // 2) // {_AUD_FRAME})"

_AUDIO_SQL = f"""
    SELECT doc_id,
           CAST({_AUD_RATE} AS INTEGER) AS sample_rate,
           CAST({_AUD_N} AS BIGINT) AS n_frames,
           array_to_string(
               list_transform(
                   list_slice(range(0, {_AUD_N}, {_AUD_STRIDE}), 1, {_AUD_MAX}),
                   fi -> CAST(fi AS INTEGER)),
               ',') AS sampled_frames,
           array_to_string(
               list_transform(
                   list_slice(range(0, {_AUD_N}, {_AUD_STRIDE}), 1, {_AUD_MAX}),
                   fi -> CAST(round(round(
                       list_sum(list_transform(
                           range(fi * {_AUD_FRAME}, fi * {_AUD_FRAME} + {_AUD_FRAME}),
                           t -> {_AUD_SAMPLE}))
                       / {_AUD_FRAME}.0 / 32768.0, 5) * 100000) AS BIGINT)),
               ',') AS frame_features
    FROM documents
"""


@register("mm_audio", _AUDIO_SQL)
def mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: the REAL audio-decode slot — each document's bytes
    become the PCM16 data chunk of a synthesized RIFF/WAV (fixture
    kernel), then ``multimodal.binary.sample_audio_frames`` walks the
    chunk headers, views the samples as int16, and samples every 2nd
    16-sample frame (mean |amplitude| feature). The oracle recomputes
    the little-endian sample values from the raw text, independent of
    the decoder."""
    import pandas as pd

    from recommender_systems_spark.multimodal.binary import sample_audio_frames

    docs = _t(spark, sf_dir, "documents")

    def synth_wav(batches):
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                data = t.encode("utf-8")
                hdr = (
                    b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
                    + b"fmt " + (16).to_bytes(4, "little")
                    + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
                    + _AUD_RATE.to_bytes(4, "little")
                    + (_AUD_RATE * 2).to_bytes(4, "little")
                    + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
                    + b"data" + len(data).to_bytes(4, "little")
                )
                payloads.append(hdr + data)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    wav = docs.select("doc_id", "text").mapInPandas(
        synth_wav, "doc_id long, payload binary"
    )
    framed = sample_audio_frames(
        wav, frame_samples=_AUD_FRAME, stride=_AUD_STRIDE, max_frames=_AUD_MAX
    )
    return framed.select(
        "doc_id",
        "sample_rate",
        "n_frames",
        _csv_ints("sampled_frames").alias("sampled_frames"),
        _csv_scaled("frame_features").alias("frame_features"),
    )


@register(
    "s_stream_join",
    """
    SELECT v.user_id,
           v.event_id AS view_id,
           v.ts AS view_ts,
           p.ts AS purchase_ts,
           round(p.value, 2) AS purchase_value,
           CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 60000000 AS BIGINT)
               AS delay_min
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def s_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming extension: stream-stream inner join (view→purchase
    attribution pairs within a 1-hour horizon) run as a REAL Structured
    Streaming job — two watermarked streams over the same file source,
    time-range join state bounded by the horizon, append-mode drain —
    compared against the equivalent batch join: the value-hash match
    is the stream/batch parity proof for the fourth core streaming
    pattern (streaming.events.stream_stream_join for the eviction
    argument)."""
    from recommender_systems_spark.streaming.events import (
        run_stream_join_available_now,
    )

    name = f"stream_join_{abs(hash(sf_dir)) % 10**8}"
    return run_stream_join_available_now(spark, _stream_dir(sf_dir), name)


@register(
    "s_stream_cdc_apply",
    """
    WITH ranked AS (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        FROM events
    )
    SELECT user_id, CAST(n_changes AS BIGINT) AS n_changes,
           round(value, 5) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def s_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming extension: INCREMENTAL CDC apply — the sixth core
    streaming pattern (after windowed agg, enrichment, dedup,
    sessionization, stream-stream join): foreachBatch reduces each
    micro-batch to an associative per-key summary and MERGEs it into a
    hash-bucketed parquet state table, rewriting ONLY the buckets
    containing touched keys (dynamic partition overwrite — per-batch
    cost is touched-bucket-sized, not total-key-sized); the final
    snapshot (minus 'error' tombstones) carries s_cdc_snapshot's batch
    oracle, so the
    value-hash match proves the incremental apply equals the batch
    recompute for ANY micro-batch split (associativity argument in
    streaming.events.run_cdc_apply_available_now)."""
    import tempfile

    from recommender_systems_spark.streaming.events import (
        run_cdc_apply_available_now,
    )

    cache_root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "..",
                              ".data_cache")
    cache_root = os.path.abspath(cache_root)
    os.makedirs(cache_root, exist_ok=True)
    state_root = tempfile.mkdtemp(prefix="cdc_state_", dir=cache_root)
    name = f"stream_cdc_{abs(hash(state_root)) % 10**8}"
    return run_cdc_apply_available_now(
        spark, _stream_dir(sf_dir), name, state_root
    )


@register(
    "s_stream_left_join",
    """
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
          FROM events WHERE event_type = 'view'),
    p AS (SELECT user_id AS p_user, ts AS purchase_ts, value
          FROM events WHERE event_type = 'purchase'),
    mx AS (SELECT least((SELECT max(view_ts) FROM v),
                        (SELECT max(purchase_ts) FROM p)) AS m)
    SELECT v.user_id, v.view_id, v.view_ts,
           p.purchase_ts, round(p.value, 2) AS purchase_value
    FROM v JOIN p
      ON p.p_user = v.user_id
     AND p.purchase_ts > v.view_ts
     AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
    UNION ALL
    SELECT v.user_id, v.view_id, v.view_ts,
           CAST(NULL AS TIMESTAMP) AS purchase_ts,
           CAST(NULL AS DOUBLE) AS purchase_value
    FROM v, mx
    WHERE v.view_ts < mx.m - INTERVAL 2 HOUR
      AND NOT EXISTS (
          SELECT 1 FROM p
          WHERE p.p_user = v.user_id
            AND p.purchase_ts > v.view_ts
            AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
      )
    """,
)
def s_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming extension: LEFT OUTER stream-stream join — the
    attribution join that ALSO emits views that never converted, which
    is the shape funnel-loss analytics needs. The outer side is where
    streaming semantics get subtle: an unmatched view emits only when
    the watermark PROVES no future purchase can match (state eviction
    at view_ts + horizon), so the drained result equals matched pairs
    plus unmatched views older than
    (least(max view ts, max purchase ts) − 2·horizon): Spark's
    multipleWatermarkPolicy=min takes the minimum across the two
    post-filter watermark operators, so only views and purchases
    advance the global watermark (clicks/signups never do) — that
    closed-form eviction contract IS the oracle, making the value-hash
    match a proof of Spark's outer-join eviction semantics, not just
    of the join predicate (streaming.events.
    run_stream_left_join_available_now for the boundary argument)."""
    from recommender_systems_spark.streaming.events import (
        run_stream_left_join_available_now,
    )

    name = f"stream_ljoin_{abs(hash(sf_dir)) % 10**8}"
    return run_stream_left_join_available_now(
        spark, _stream_dir(sf_dir), name
    )
