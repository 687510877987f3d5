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


def test_cdc_apply_multi_batch_equals_batch(spark, tmp_path):
    """The incremental CDC apply's central claim: the final state is
    IDENTICAL for any micro-batch split. Split the events log into 3
    files, drain with maxFilesPerTrigger=1 (3 real micro-batches), and
    compare against the single-pass batch compaction."""
    import os

    from recommender_systems_spark.queries.multimodal import _stream_dir
    from recommender_systems_spark.queries.sessions import s_cdc_snapshot
    from recommender_systems_spark.streaming.events import (
        run_cdc_apply_available_now,
    )

    # 3-file copy of the (µs-normalised) events log.
    src = _stream_dir(SF_SMALL)
    multi = str(tmp_path / "events3")
    spark.read.parquet(src).repartition(3).write.parquet(multi)

    state_root = str(tmp_path / "state")
    os.makedirs(state_root)
    stream = (
        spark.readStream.schema(spark.read.parquet(multi).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi)
    )
    from pyspark.sql import functions as F2

    from recommender_systems_spark.streaming.events import _cdc_reduce

    def _apply(batch_df, batch_id):
        reduced = _cdc_reduce(
            batch_df.withColumn("n_changes", F2.lit(1).cast("long"))
        )
        vs = sorted(
            int(d[1:]) for d in os.listdir(state_root) if d.startswith("v")
        )
        if vs:
            cur = batch_df.sparkSession.read.parquet(
                os.path.join(state_root, f"v{vs[-1]}")
            )
            reduced = _cdc_reduce(cur.unionByName(reduced))
        nxt = (vs[-1] + 1) if vs else 0
        reduced.write.mode("overwrite").parquet(
            os.path.join(state_root, f"v{nxt}")
        )

    q = (
        stream.writeStream.foreachBatch(_apply)
        .queryName("cdc_multi_batch_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vs = sorted(int(d[1:]) for d in os.listdir(state_root) if d.startswith("v"))
    assert len(vs) >= 3, "expected >= 3 micro-batches"
    final = (
        spark.read.parquet(os.path.join(state_root, f"v{vs[-1]}"))
        .filter(F2.col("event_type") != "error")
        .select("user_id", "n_changes", F2.round("value", 5).alias("last_value"))
    )
    batch = s_cdc_snapshot(spark, SF_SMALL)
    got = {tuple(r) for r in final.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
