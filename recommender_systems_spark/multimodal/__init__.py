"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` stages (``multimodal.binary``). Real codec work (PIL /
torchaudio / ffmpeg) is stubbed behind clearly-marked
``NotImplementedError`` — those libraries are not in this container —
but the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and oracle-tested via the deterministic byte-level
feature path.
"""

from recommender_systems_spark.multimodal.binary import (  # noqa: F401
    byte_features,
    decode_image,
    with_payload,
)
