"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference recommender-systems codebase
(CassandraDurr/recommender_systems), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession builder (AQE on, tuned for local[N] testing,
                   scale-safe defaults for cluster runs).
- ``io``         : sources/sinks (SURVEY S1-S6) — schema-declared CSV/Parquet.
- ``operators``  : relational operator library (SURVEY §2.2-2.6) — filters,
                   anti-joins, aggregations, id densification, top-k, windows.
- ``functions``  : scalar/array/vector kernels (dot product, cosine, norms,
                   text statistics, fingerprints).
- ``ml``         : ALS (MLlib + bias-augmented custom solver), BPR SGD,
                   cold-start fold-in, ranking metrics, A/B statistics.
- ``dedup``      : exact (dual-fingerprint key) + MinHash-LSH (with exact
                   shingle-Jaccard verify) + SimHash near-duplicate detection.
- ``similarity`` : brute-force and LSH-bucketed approximate nearest neighbour
                   (embedding-cosine near-dup search).
- ``multimodal`` : binary-column (image/audio/video) plumbing with stubbed
                   decoders.
- ``streaming``  : Structured Streaming variants of the aggregation operators.
- ``queries``    : the driver-facing registry — every operator above exposed
                   as a named (Spark plan, DuckDB oracle) pair.
"""

__version__ = "0.1.0"
