#!/usr/bin/env python
"""Scaling-slope harness: time the most expensive registry queries at
sf0.1 (driver testdata) and sf1 (tools/gen_sf1.py output — 10x rows,
10x key spaces, constant per-key density), and print per-query
sf1/sf0.1 ratios. A data-linear query should land near 10x (same
parallelism, 10x work); materially above ~12-15x indicates a
super-linear term worth root-causing. Results are recorded in
PLANS.md (scaling-slope table).

Usage: python tools/bench_sf1.py [query ...]   (default: TOP list)
Env: SPARK_GRAFT_SF1_REPEAT (default 3, medians).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommender_systems_spark import registry
from recommender_systems_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".data_cache", "sf1")

# Top-10 most expensive queries per BENCH_DETAIL.json round 7.
TOP = [
    "m_ials_train",
    "m_bpr_train",
    "m_als_genre_train",
    "s_stream_join",
    "m_bias_only",
    "m_als_train",
    "dedup_clusters",
    "m_fold_in_vector",
    "g_local_clustering",
    "g_pagerank",
]


def timed_median(spark, name: str, sf_dir: str, repeat: int) -> float:
    ts = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
        # Same residue hygiene as bench.py: drop checkpoints/broadcasts
        # outside the timing window.
        df = None
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    ts.sort()
    return round(ts[len(ts) // 2], 3)


def main() -> None:
    if not os.path.isdir(SF1):
        sys.exit(f"{SF1} missing — run tools/gen_sf1.py first")
    names = sys.argv[1:] or TOP
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_SF1_REPEAT", "3")))
    spark = get_spark("bench-sf1")
    registry.QUERIES["flagship_top_customers"](spark, SF01).collect()  # warm
    out = {}
    for name in names:
        t01 = timed_median(spark, name, SF01, repeat)
        t1 = timed_median(spark, name, SF1, repeat)
        # Guard the ratio: medians are rounded to 3dp above, so a
        # sub-millisecond sf0.1 median would divide by zero.
        out[name] = {
            "sf0.1": t01,
            "sf1": t1,
            "ratio": round(t1 / max(t01, 1e-3), 2),
        }
        print(f"{name}: sf0.1={t01}s sf1={t1}s ratio={out[name]['ratio']}x",
              file=sys.stderr)
    print(json.dumps({"repeat": repeat, "queries": out}))


if __name__ == "__main__":
    main()
