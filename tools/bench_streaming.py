#!/usr/bin/env python
"""Scale measurement for the seven streaming operators (VERDICT r12
#5): throughput and STATE-STORE behaviour under availableNow
multi-batch drains at sf1 / sf10 — the parity oracles prove the values,
this records whether the watermarks actually BOUND the state the way
the docstrings claim.

Per op and scale: wall-clock, input rows, rows/s, number of
micro-batches, peak state rows (max stateOperators.numRowsTotal over
batches), total rows evicted (numRowsRemoved), and final state rows.
"bounded" = peak state ≪ input rows (the windowed/join ops) or = the
inherent key cardinality (exact dedup).

The source is a MULTI-FILE copy of the events table (16 parquet files,
``maxFilesPerTrigger=4`` → 4 data micro-batches) so the watermark
advances ACROSS batches and eviction is observable — a single-file
drain is one batch and exercises no eviction at all.

Usage:
    python tools/bench_streaming.py                    # sf1 + sf10
    python tools/bench_streaming.py /root/repo/.data_cache/sf1
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from recommender_systems_spark.io import cache_path, cache_ready, load_table  # noqa: E402
from recommender_systems_spark.session import get_spark  # noqa: E402

N_FILES = 16
FILES_PER_TRIGGER = 4


def multi_file_stream_dir(spark, sf_dir: str) -> str:
    """16-file µs-timestamp copy of the events table — the multi-batch
    availableNow source. Content-keyed like every derived artifact."""
    out = cache_path(f"events_stream{N_FILES}", sf_dir, "events")
    if not cache_ready(out):
        load_table(spark, sf_dir, "events").repartition(N_FILES).write.mode(
            "overwrite"
        ).parquet(out)
    return out


def drain(spark, df, output_mode: str, confs: dict[str, str] | None = None):
    """Run a streaming df to completion on the noop sink; return
    (wall_s, progress list)."""
    old: dict[str, str] = {}
    for k, v in (confs or {}).items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    t0 = time.perf_counter()
    try:
        q = (
            df.writeStream.format("noop")
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = [json.loads(str(p)) for p in q.recentProgress]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return round(time.perf_counter() - t0, 2), progress


def summarize(wall: float, progress) -> dict:
    rows_in = sum(p.get("numInputRows", 0) for p in progress)
    peak_state = 0
    removed = 0
    final_state = 0
    for p in progress:
        for so in p.get("stateOperators", []):
            peak_state = max(peak_state, so.get("numRowsTotal", 0))
            removed += so.get("numRowsRemoved", 0)
    for p in reversed(progress):
        ops = p.get("stateOperators", [])
        if ops:
            final_state = sum(so.get("numRowsTotal", 0) for so in ops)
            break
    return {
        "wall_s": wall,
        "rows_in": rows_in,
        "rows_per_s": round(rows_in / wall) if wall > 0 else None,
        "batches": len(progress),
        "peak_state_rows": peak_state,
        "rows_evicted": removed,
        "final_state_rows": final_state,
    }


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".data_cache", d)
        for d in ("sf1", "sf10")
    ]
    spark = get_spark("bench-streaming")
    out: dict[str, dict] = {}
    from recommender_systems_spark.streaming.events import (
        EVENTS_SCHEMA,
        cdc_apply_batch,
        cdc_state_snapshot,
        stream_dedup_keys,
        stream_enrich_agg,
        stream_stream_join,
        stream_window_agg,
    )
    from recommender_systems_spark.streaming.sessions import sessionize_stream

    for sf_dir in sf_dirs:
        m = re.search(r"sf([0-9.]+)$", sf_dir.rstrip("/"))
        sf_tag = f"sf{m.group(1)}" if m else os.path.basename(sf_dir)
        src_dir = multi_file_stream_dir(spark, sf_dir)

        def src(extra_files_opt: bool = True):
            s = spark.readStream.schema(EVENTS_SCHEMA)
            if extra_files_opt:
                s = s.option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            return s.parquet(src_dir)

        dim = load_table(spark, sf_dir, "customer")
        join_confs = {
            # The runners' trim: 4 state stores per shuffle partition
            # per batch for a stream-stream join.
            "spark.sql.shuffle.partitions": "8",
        }
        res: dict[str, dict] = {}

        wall, prog = drain(spark, stream_window_agg(src()), "append")
        res["window_agg"] = summarize(wall, prog)

        wall, prog = drain(spark, stream_enrich_agg(src(), dim), "append")
        res["enrich_agg"] = summarize(wall, prog)

        wall, prog = drain(
            spark, stream_dedup_keys(src(), ["user_id", "event_type"]), "append"
        )
        res["dedup"] = summarize(wall, prog)

        s = src()
        wall, prog = drain(
            spark,
            stream_stream_join(
                s.filter(F.col("event_type") == "view"),
                s.filter(F.col("event_type") == "purchase"),
            ),
            "append",
            {**join_confs,
             "spark.sql.streaming.noDataMicroBatches.enabled": "false"},
        )
        res["join_inner"] = summarize(wall, prog)

        s = src()
        horizon = "1 hour"
        v = (
            s.filter(F.col("event_type") == "view")
            .withWatermark("ts", horizon)
            .select("user_id", F.col("event_id").alias("view_id"),
                    F.col("ts").alias("view_ts"))
        )
        p = (
            s.filter(F.col("event_type") == "purchase")
            .withWatermark("ts", horizon)
            .select(F.col("user_id").alias("p_user"),
                    F.col("ts").alias("purchase_ts"),
                    F.col("value").alias("purchase_value"))
        )
        left = v.join(
            p,
            (v["user_id"] == p["p_user"])
            & (p["purchase_ts"] > v["view_ts"])
            & (p["purchase_ts"] <= v["view_ts"] + F.expr(f"interval {horizon}")),
            "left_outer",
        )
        wall, prog = drain(spark, left, "append", join_confs)
        res["join_left"] = summarize(wall, prog)

        wall, prog = drain(spark, sessionize_stream(src()), "append")
        res["sessionize"] = summarize(wall, prog)

        # CDC apply: state lives in the bucketed parquet table, not a
        # state store — report the final snapshot key count as state.
        state_root = cache_path(f"cdc_bench_{os.getpid()}", sf_dir, "events")
        shutil.rmtree(state_root, ignore_errors=True)
        os.makedirs(state_root, exist_ok=True)
        t0 = time.perf_counter()
        q = (
            src()
            .writeStream.foreachBatch(
                lambda b, bid: cdc_apply_batch(b, state_root, 16, batch_id=bid)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 2)
        prog = [json.loads(str(x)) for x in q.recentProgress]
        snap = cdc_state_snapshot(spark, state_root).count()
        cdc = summarize(wall, prog)
        cdc["final_state_rows"] = snap
        res["cdc_apply"] = cdc
        shutil.rmtree(state_root, ignore_errors=True)

        out[sf_tag] = res
        for op, r in res.items():
            print(f"{sf_tag} {op}: {r}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
