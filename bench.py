#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line with per-query
wall-clock seconds.

Each query is fully executed through the `noop` sink (forces complete
evaluation of every partition without driver collection), matching how
a production job would consume the result.
"""

from __future__ import annotations

import gc
import json
import os
import re
import time

from recommender_systems_spark import registry
from recommender_systems_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("bench")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not classloading.
    registry.QUERIES["flagship_top_customers"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(registry.QUERIES):
        t0 = time.perf_counter()
        df = None
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one bad query must not zero the bench
            errors[name] = str(exc).split("\n")[0][:200]
        # Release the query's session residue OUTSIDE its timing window:
        # localCheckpoint blocks are only unpersisted when their Python
        # DataFrame is garbage-collected, so without this the block
        # manager accumulates every training query's checkpoints and
        # later queries pay the GC pressure (measured: per-query times
        # swing 5-10× run-to-run at sf0.1 without the cleanup).
        df = None
        gc.collect()
        spark.catalog.clearCache()
        # Python gc only drops the py4j refs; the JVM frees the
        # checkpoint/broadcast blocks (via ContextCleaner) on ITS next
        # collection, which may land mid-way through a later query's
        # timing window. Forcing it here keeps each query's number free
        # of its predecessors' cleanup (measured: the post-training tail
        # ran 2-4x slower without this at sf0.1).
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
