"""Batch/stream parity for the stateful sessionizer: the closed
sessions emitted by applyInPandasWithState must exactly equal the batch
sessionization minus each user's final (still-open) session."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_stateful_sessionize_matches_batch(spark):
    from recommender_systems_spark.io import _microsecond_copy
    from recommender_systems_spark.queries.multimodal import _stream_dir
    from recommender_systems_spark.queries.sessions import s_sessionize
    from recommender_systems_spark.streaming.sessions import (
        run_sessionize_available_now,
    )

    _ = _microsecond_copy  # ensures the conversion path is importable
    src = _stream_dir(SF_SMALL)
    streamed = run_sessionize_available_now(spark, src, "t_sessions_parity")
    got = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in streamed.collect()
    }

    batch = s_sessionize(spark, SF_SMALL)
    # Drop each user's last session (still open in the drained stream).
    last = batch.groupBy("user_id").agg(F.max("session_no").alias("last_no"))
    closed = batch.join(last, "user_id").filter(
        F.col("session_no") < F.col("last_no")
    )
    want = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in closed.collect()
    }
    assert got == want
    assert len(got) > 0
