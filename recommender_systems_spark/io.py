"""Sources and sinks (SURVEY §2.1, S1-S6).

The reference ingests header CSVs with inferred types
(``explicit_ratings/functions.py:20``) and persists model state as ``.npy``
tensors (``prac_1.py:163-204``). Here every source declares an explicit
schema (no inference — determinism at scale) and model state is Parquet
``(id, features array)`` DataFrames, which is also MLlib's native model
shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Driver-provided star-schema tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join these.
DIMENSION_TABLES = frozenset({"region", "nation", "supplier", "part"})

# Reference-shaped schemas (FIXTURES.md §A). Declared, never inferred.
RATINGS_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.LongType(), False),
        T.StructField("movieId", T.LongType(), False),
        T.StructField("rating", T.DoubleType(), False),
        T.StructField("timestamp", T.LongType(), True),
    ]
)

MOVIES_SCHEMA = T.StructType(
    [
        T.StructField("movieId", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("genres", T.StringType(), True),
    ]
)

FACTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

BIAS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("bias", T.DoubleType(), False),
    ]
)


def cache_key(sf_dir: str, *source_tables: str) -> str:
    """12-hex digest identifying ``sf_dir`` AND the identity (size,
    mtime) of the named source parquet files. Derived caches keyed on
    this digest invalidate automatically when the driver regenerates
    the test data — a path-only key would silently serve a stale cache
    while the DuckDB oracle recomputes from the live files."""
    import hashlib

    key = sf_dir
    for t in source_tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            key += f"|{t}:{st.st_size}:{st.st_mtime_ns}"
        except OSError:
            key += f"|{t}:missing"
    return hashlib.sha1(key.encode()).hexdigest()[:12]


_MANIFEST_LOGGED: set[str] = set()


def cache_path(prefix: str, sf_dir: str, *source_tables: str) -> str:
    """Directory under the repo's ``.data_cache`` for a derived artifact
    (fingerprint store, IVF index, bucketed tables), keyed by source
    data identity via ``cache_key``. Derivation constants that change
    the artifact's CONTENT (band counts, caps, k) belong in ``prefix``
    — the data-identity digest only tracks the inputs.

    Each resolved path is recorded (once per process) in
    ``MANIFEST.jsonl`` next to the artifacts: the derivation recipe
    (prefix, sf_dir, tables) is what lets ``gc_data_cache`` recompute
    the CURRENT digest later and reap artifacts stranded by a
    superseded source identity — without the manifest, a digest-named
    dir is unattributable and can only ever accumulate (VERDICT r12
    #6)."""
    import json

    root = _cache_root()
    name = f"{prefix}_{cache_key(sf_dir, *source_tables)}"
    if name not in _MANIFEST_LOGGED:
        _MANIFEST_LOGGED.add(name)
        try:
            os.makedirs(root, exist_ok=True)
            with open(os.path.join(root, "MANIFEST.jsonl"), "a") as fh:
                fh.write(
                    json.dumps(
                        {
                            "dir": name,
                            "prefix": prefix,
                            "sf_dir": sf_dir,
                            "tables": list(source_tables),
                        }
                    )
                    + "\n"
                )
        except OSError:
            pass
    return os.path.join(root, name)


# Prefix families of the persisted derived artifacts (VERDICT r11's
# transparency item: these make heavy queries serve warm, so the bench
# needs a mode that wipes them and measures the cold build).
DERIVED_CACHE_PREFIXES = (
    # cc_round_* is deliberately NOT here: those are per-PID scratch
    # dirs of a LIVE connected-components run, not persisted artifacts
    # — wiping them mid-loop fails a concurrent run (ADVICE r12).
    # Dead-owner round dirs are gc_data_cache's job.
    "ab_catalog",
    "cc_edges",
    "cc_near",
    "cooc_edges",
    "fp_store",
    "ivf_index",
    "lsh_grams",
)


def _cache_root() -> str:
    return os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".data_cache")
    )


def wipe_derived_cache(prefixes: tuple[str, ...] = DERIVED_CACHE_PREFIXES) -> list[str]:
    """Remove persisted derived-artifact directories so the next run
    rebuilds them from the source parquet — the cold-build bench mode
    (``SPARK_GRAFT_COLD=1``) and the wipe-rebuild correctness test both
    go through here. Never touches the µs-timestamp table cache, the
    sf1/sf10 generated data, or streaming state dirs."""
    import shutil

    root = _cache_root()
    removed: list[str] = []
    if not os.path.isdir(root):
        return removed
    for d in sorted(os.listdir(root)):
        if d.startswith(prefixes):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            removed.append(d)
    return removed


def gc_data_cache(max_age_hours: float = 24.0) -> list[str]:
    """Sweep session-scoped residue out of ``.data_cache``: package
    zips belonging to dead PIDs (``deploy._build_zip`` writes one per
    process), orphaned streaming ``cdc_state_*`` dirs and per-run CC
    round dirs past ``max_age_hours``. Content-keyed artifacts are NOT
    touched — their staleness is handled by ``cache_key`` + the
    constants-in-prefix rule."""
    import re
    import shutil
    import time

    root = _cache_root()
    removed: list[str] = []
    if not os.path.isdir(root):
        return removed
    now = time.time()
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        m = re.fullmatch(r"recommender_systems_spark_(\d+)\.zip", d)
        if m:
            pid = int(m.group(1))
            if pid != os.getpid() and not os.path.isdir(f"/proc/{pid}"):
                try:
                    os.remove(full)
                    removed.append(d)
                except OSError:
                    pass
            continue
        m = re.match(r"cc_round[01]_(\d+)_", d)
        if m:
            # Per-run CC round dirs carry their owner PID: a dead owner
            # means the run was killed before its finally-cleanup (the
            # one way they leak) — remove regardless of age.
            pid = int(m.group(1))
            if pid != os.getpid() and not os.path.isdir(f"/proc/{pid}"):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(d)
            continue
        if d.startswith("cdc_state_"):
            try:
                if now - os.stat(full).st_mtime > max_age_hours * 3600:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(d)
            except OSError:
                pass
    removed += _gc_stale_identities(root, max_age_hours)
    return removed


def _gc_stale_identities(root: str, max_age_hours: float) -> list[str]:
    """Reap content-keyed artifact dirs whose source identity has been
    SUPERSEDED (VERDICT r12 #6): every regenerated sf1/sf10 dataset (or
    driver-refreshed testdata) changes ``cache_key``, stranding the old
    digest's artifacts forever. ``MANIFEST.jsonl`` records each dir's
    derivation recipe (prefix, sf_dir, tables); recomputing the digest
    against the CURRENT files tells live from stale. Age-gated like the
    cdc_state sweep so a dir serving a long-running older process is
    not yanked mid-read; the manifest is compacted to the surviving
    entries."""
    import json
    import shutil
    import time

    manifest = os.path.join(root, "MANIFEST.jsonl")
    if not os.path.exists(manifest):
        return []
    removed: list[str] = []
    entries: dict[str, dict] = {}
    try:
        with open(manifest) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                    entries[e["dir"]] = e
                except (json.JSONDecodeError, KeyError):
                    continue
    except OSError:
        return []
    now = time.time()
    keep: dict[str, dict] = {}
    for name, e in entries.items():
        full = os.path.join(root, name)
        if not os.path.isdir(full):
            # Not on disk (yet) — keep the recipe: cache_path only
            # appends once per process, so dropping it here could
            # leave a later same-process rebuild unattributed.
            keep[name] = e
            continue
        current = f"{e['prefix']}_{cache_key(e['sf_dir'], *e['tables'])}"
        if name == current:
            keep[name] = e
            continue
        try:
            stale_long_enough = (
                now - os.stat(full).st_mtime > max_age_hours * 3600
            )
        except OSError:
            continue
        if stale_long_enough:
            shutil.rmtree(full, ignore_errors=True)
            removed.append(name)
        else:
            keep[name] = e
    try:
        with open(manifest, "w") as fh:
            for e in keep.values():
                fh.write(json.dumps(e) + "\n")
    except OSError:
        pass
    return removed


def cache_ready(path: str) -> bool:
    """True iff a derived-artifact directory holds a COMPLETE Spark
    write. A write interrupted mid-job leaves the directory present but
    partial; only the committer's ``_SUCCESS`` marker proves the job
    finished, so every cache guard checks the marker, never bare
    ``isdir``."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


_ROW_COUNT_CACHE: dict[str, int] = {}


def ckpt_eager(
    sf_dir: str, table: str = "lineitem", threshold: int = 5_000_000
) -> bool:
    """Eagerness for a multi-consumer ``localCheckpoint``: LAZY below
    the threshold — the first consumer materialises the blocks inside
    the main action instead of paying a separate blocking driver
    action (measured +10–20% per query at sf0.1, round-13) — and
    EAGER past it, where concurrent first-computation of an
    unmaterialised lazy checkpoint under memory pressure is the
    documented sf10 "Block rdd_N does not exist" failure mode (the
    e_ab_simulation / abtest._ab_big idiom, generalised). Row count
    from the parquet footer — zero Spark jobs."""
    return table_rows(sf_dir, table) > threshold


def scan_splits(sf_dir: str, name: str) -> int:
    """How many tasks a parquet scan of ``name`` can actually produce:
    the ROW-GROUP count from footer metadata (driver-local pyarrow
    read, zero Spark jobs, memoized alongside ``table_rows``). Spark
    assigns parquet row groups to input splits by midpoint, so a file
    with one row group is ONE task no matter how the byte range is
    sliced — the sf0.1 tables are all single-file single-row-group, so
    every scan stage is serial at any core count (round-14 census)."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        key = f"rg|{path}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = f"rg|{path}"
    if key not in _ROW_COUNT_CACHE:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            n = sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_row_groups
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            n = pq.ParquetFile(path).metadata.num_row_groups
        _ROW_COUNT_CACHE[key] = n
    return _ROW_COUNT_CACHE[key]


def spread_scan(df, sf_dir: str, table: str):
    """Rebalance a CPU-heavy stage fed by a low-parallelism scan (guide
    §2.5 "input skew: one huge unsplittable file — repartition
    immediately after the read"): when the scan's maximum task count
    (row groups, from footer metadata) cannot feed the local cores, pay
    one round-robin exchange of the slim projected rows so the
    downstream kernel (md5 ladders, tokenise+explode, shingle hashing)
    runs on every core. At production scale the scan arrives with
    thousands of row groups and this is a NO-OP — zero added shuffle —
    so it is scale-adaptive by construction, not a local[32] constant.
    Apply AFTER projecting to the columns the kernel needs (§2.3)."""
    sc = df.sparkSession.sparkContext
    if scan_splits(sf_dir, table) * 2 <= sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def table_rows(sf_dir: str, name: str) -> int:
    """Row count of a driver parquet table from footer METADATA — a
    driver-local pyarrow read, zero Spark jobs. Memoized per file
    identity (path+size+mtime): the adaptive-LSH capacity ladders
    (``similarity.ann.adaptive_bits``, ``dedup.minhash.simhash_n_tables``)
    need only this scalar, and an eager ``df.count()`` per query was a
    measured fixed-overhead regression (VERDICT r10 #2). At 100 TB the
    same scalar comes from the table catalog / manifest statistics —
    never from a full scan."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        key = f"{path}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = path
    if key not in _ROW_COUNT_CACHE:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            n = sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            n = pq.ParquetFile(path).metadata.num_rows
        _ROW_COUNT_CACHE[key] = n
    return _ROW_COUNT_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1/S6: read one driver parquet table. Column pruning and predicate
    pushdown reach the scan because callers express plans declaratively.

    Fallback: Spark's parquet reader rejects INT64 TIMESTAMP(NANOS)
    columns (the driver's ``events.ts``); those files are transparently
    rewritten once with nanoseconds truncated to microseconds (exactly
    what DuckDB's reader does) into a local cache, preserving the
    distributed scan path.
    """
    path = f"{sf_dir}/{name}.parquet"
    if _needs_microsecond_copy(path):
        path = _microsecond_copy(path)
    return spark.read.parquet(path)


def _needs_microsecond_copy(path: str) -> bool:
    """Driver-side footer sniff: does this file carry a timestamp[ns]
    column Spark's reader would reject? Costs one local footer read (no
    Spark job) instead of letting ``spark.read`` launch a schema-inference
    job that fails and falls back."""
    if path in _NANOS_CACHE:
        return _NANOS_CACHE[path]
    needs = False
    if os.path.isfile(path):
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            needs = any(
                pa.types.is_timestamp(f.type) and f.type.unit == "ns"
                for f in schema
            )
        except Exception:
            needs = False
    _NANOS_CACHE[path] = needs
    return needs


_NANOS_CACHE: dict[str, bool] = {}


def _microsecond_copy(path: str) -> str:
    """Rewrite a parquet file with timestamp[ns] columns cast to
    timestamp[us], cached under the repo. Truncation (not rounding)
    matches DuckDB's ns→us conversion."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    digest = hashlib.sha1(path.encode()).hexdigest()[:12]
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".data_cache"
    )
    out = os.path.join(os.path.abspath(out_dir), f"{digest}.parquet")
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        table = pq.read_table(path)
        fields = []
        for f in table.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                fields.append(pa.field(f.name, pa.timestamp("us")))
            else:
                fields.append(f)
        tmp = out + ".tmp"
        pq.write_table(table.cast(pa.schema(fields), safe=False), tmp)
        os.replace(tmp, out)
    return out


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def read_ratings_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: ratings CSV with declared schema (reference:
    explicit_ratings/functions.py:20 uses pd.read_csv with inference)."""
    return spark.read.schema(RATINGS_SCHEMA).option("header", True).csv(path)


def read_movies_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: movies dim CSV — titles contain commas/quotes, so quoting on."""
    return (
        spark.read.schema(MOVIES_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S4: CSV sink (reference: ab_test.py:234 ``to_csv``). ``single_file``
    mirrors pandas' one-file output for small results; large results keep
    their partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_factors(df: DataFrame, path: str) -> None:
    """S5: model-state sink — Parquet replaces .npy (prac_1.py:163-204)."""
    df.write.mode("overwrite").parquet(path)


def read_factors(spark: SparkSession, path: str) -> DataFrame:
    """S6: model-state source (ab_test.py:72-85 ``np.load``)."""
    return spark.read.parquet(path)
