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
    files, drain with maxFilesPerTrigger=1 (3 real micro-batches)
    through the REAL runner, and compare against the single-pass batch
    compaction."""
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
    final = run_cdc_apply_available_now(
        spark,
        multi,
        "cdc_multi_batch_test",
        state_root,
        max_files_per_trigger=1,
    )
    batch = s_cdc_snapshot(spark, SF_SMALL)
    got = {tuple(r) for r in final.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert len(got) > 0


def _bucket_files(state_root):
    """{bucket_dir: {relpath: md5}} fingerprint of the state table."""
    import hashlib
    import os

    out = {}
    for d in sorted(os.listdir(state_root)):
        if not d.startswith("bucket="):
            continue
        files = {}
        bdir = os.path.join(state_root, d)
        for root, _, names in os.walk(bdir):
            for n in names:
                p = os.path.join(root, n)
                with open(p, "rb") as fh:
                    files[os.path.relpath(p, bdir)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
        out[d] = files
    return out


def test_cdc_apply_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100-TB contract of the bucketed CDC state table: a
    micro-batch rewrites ONLY the buckets containing its keys; every
    other bucket's files are byte-identical before and after the
    batch. Drives cdc_apply_batch (the exact function foreachBatch
    runs) batch-by-batch so the filesystem can be fingerprinted
    between batches, then checks the final snapshot against the batch
    compaction oracle."""
    import os

    from pyspark.sql import functions as F

    from recommender_systems_spark.queries.multimodal import _stream_dir
    from recommender_systems_spark.queries.sessions import s_cdc_snapshot
    from recommender_systems_spark.streaming.events import (
        cdc_apply_batch,
        cdc_state_snapshot,
    )

    n_buckets = 8
    src = _stream_dir(SF_SMALL)
    events = spark.read.parquet(src)
    # Batch 1: the bulk of the log. Batches 2 and 3: narrow slices of
    # users, so most buckets are guaranteed untouched.
    splits = [
        events.filter(
            (F.col("user_id") % 17 != 0) | F.col("user_id").isNull()
        ),
        events.filter((F.col("user_id") % 17 == 0) & (F.col("user_id") % 2 == 0)),
        events.filter((F.col("user_id") % 17 == 0) & (F.col("user_id") % 2 == 1)),
    ]
    state_root = str(tmp_path / "state")
    os.makedirs(state_root)

    cdc_apply_batch(splits[0], state_root, n_buckets=n_buckets)
    saw_untouched = False
    for part in splits[1:]:
        before = _bucket_files(state_root)
        touched = cdc_apply_batch(part, state_root, n_buckets=n_buckets)
        after = _bucket_files(state_root)
        untouched = [
            d for d in before
            if int(d.split("=")[1]) not in touched
        ]
        assert untouched, "split produced no untouched buckets"
        saw_untouched = True
        for d in untouched:
            assert after[d] == before[d], (
                f"untouched bucket {d} was rewritten"
            )
    assert saw_untouched

    got = {tuple(r) for r in cdc_state_snapshot(spark, state_root).collect()}
    want = {tuple(r) for r in s_cdc_snapshot(spark, SF_SMALL).collect()}
    assert got == want


def test_cdc_apply_batch_replay_is_idempotent(spark, tmp_path):
    """At-least-once redelivery: replaying an already-applied
    micro-batch (same foreachBatch batch_id) must be a no-op —
    latest-wins is naturally idempotent but the additive n_changes
    count is not, so the _last_batch marker has to dedup the replay.
    A NEW batch id with new data must still apply."""
    import os

    from pyspark.sql import functions as F

    from recommender_systems_spark.queries.multimodal import _stream_dir
    from recommender_systems_spark.streaming.events import (
        cdc_apply_batch,
        cdc_state_snapshot,
    )

    events = spark.read.parquet(_stream_dir(SF_SMALL))
    b0 = events.filter(F.col("user_id") % 2 == 0)
    b1 = events.filter((F.col("user_id") % 2 == 1) | F.col("user_id").isNull())
    state_root = str(tmp_path / "state")
    os.makedirs(state_root)

    assert cdc_apply_batch(b0, state_root, batch_id=0) != []
    snap = {tuple(r) for r in cdc_state_snapshot(spark, state_root).collect()}
    # Replay of batch 0 (crash-recovery redelivery): skipped entirely.
    assert cdc_apply_batch(b0, state_root, batch_id=0) == []
    replay = {tuple(r) for r in cdc_state_snapshot(spark, state_root).collect()}
    assert replay == snap, "replayed batch changed state (double count)"
    # A genuinely new batch still applies and advances the marker.
    assert cdc_apply_batch(b1, state_root, batch_id=1) != []
    with open(os.path.join(state_root, "_last_batch")) as fh:
        assert fh.read() == "1"


def test_stream_join_restores_session_confs(spark):
    """The stream-join runners set transient session confs (shuffle
    partitions, no-data micro-batches) for the drain; both must be
    restored afterward — a leaked conf would silently re-plan every
    subsequent query in the session."""
    from recommender_systems_spark.queries.multimodal import _stream_dir
    from recommender_systems_spark.streaming.events import (
        run_stream_join_available_now,
        run_stream_left_join_available_now,
    )

    shuffle_before = spark.conf.get("spark.sql.shuffle.partitions")
    nodata_before = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    src = _stream_dir("/root/testdata/sf0.001")
    run_stream_join_available_now(spark, src, "conf_restore_inner").collect()
    run_stream_left_join_available_now(
        spark, src, "conf_restore_left"
    ).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == shuffle_before
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
        == nodata_before
    )
