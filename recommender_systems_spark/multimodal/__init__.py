"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` stages (``multimodal.binary``). Decoding uses
zero-dependency pure-Python parsers for self-describing formats —
PPM/BMP pixel decode and RIFF/WAV sample decode (``binary.py``) — so
the full decode → feature → resize / frame-sample path is real and
oracle-tested end to end. Formats needing external codec libraries
(JPEG/PNG/MP3/MP4 — PIL / torchaudio / ffmpeg are not in this
container) raise a clearly-marked ``ValueError`` at the parser
boundary; the Spark-side plumbing (schema, batching, partitioning,
UDF signatures) is shared with the real decoders and unchanged.
"""

from recommender_systems_spark.multimodal.binary import (  # noqa: F401
    byte_features,
    decode_image,
    with_payload,
)
