"""Analysis-only smoke test over the whole registry.

Builds every ``registry.QUERIES`` DataFrame at sf0.001 and touches
``.schema`` — forcing Catalyst analysis (column resolution, generator
placement, type checks) WITHOUT executing the plan.  This is the cheap
guard the round-8 post-mortem asked for: ``t_dsir_weights`` shipped in
a snapshot commit with ``F.explode`` nested inside an expression and
failed at analysis time (``UNSUPPORTED_GENERATOR.NESTED_IN_EXPRESSIONS``)
— an error this test catches in seconds, no oracle run needed.

Iterative trainers execute driver-side jobs while *constructing* their
result DataFrame; at sf0.001 those are sub-second, so the whole sweep
stays well under a minute.
"""

from __future__ import annotations

import pytest

from recommender_systems_spark import registry

from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_registry_query_analyzes(spark, name):
    df = registry.QUERIES[name](spark, SF_SMALL)
    # .schema triggers full analysis (and nothing more for lazy plans).
    assert len(df.schema.fields) > 0, f"{name}: empty schema"
