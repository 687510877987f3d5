"""Driver-gate replica: every queries() entry with an oracle must
hash-match DuckDB at sf0.01 (same comparison the driver runs)."""

from __future__ import annotations

import pytest

from recommender_systems_spark import registry
from tests.conftest import SF_MED
from tests.oracle_harness import compare_query


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(spark, name):
    ok, msg = compare_query(
        spark, name, registry.QUERIES[name], registry.ORACLE.get(name), SF_MED
    )
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_all_oracles_have_queries():
    assert set(registry.ORACLE) <= set(registry.QUERIES)
