#!/usr/bin/env python
"""Capture `.explain("formatted")` for named registry queries.

Usage: python tools/capture_plans.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).  Run from the repo
whose plans you want (HEAD or a pinned worktree) — the file records the
physical plan the judge checks optimization claims against.
"""

from __future__ import annotations

import os
import sys

# Resolve the package from the CURRENT working directory first, so the
# same tool file can capture a pinned worktree's plans when run with
# cwd inside that worktree (cwd beats this file's own repo).
sys.path.insert(0, os.getcwd())

from recommender_systems_spark import registry  # noqa: E402
from recommender_systems_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    try:
        return jvm.PythonSQLUtils.explainString(jdf.queryExecution(), "formatted")
    except Exception:
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return jdf.queryExecution().explainString(mode)


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = registry.QUERIES[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_formatted(df))
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
