"""Analysis + plan-structure smoke test over the whole registry.

Builds every ``registry.QUERIES`` DataFrame at sf0.001 and

1. touches ``.schema`` — forcing Catalyst analysis (column resolution,
   generator placement, type checks) WITHOUT executing the plan.  This
   is the cheap guard the round-8 post-mortem asked for:
   ``t_dsir_weights`` shipped in a snapshot commit with ``F.explode``
   nested inside an expression and failed at analysis time
   (``UNSUPPORTED_GENERATOR.NESTED_IN_EXPRESSIONS``) — an error this
   test catches in seconds, no oracle run needed; and
2. renders the PHYSICAL plan and asserts two registry-wide structural
   invariants the 100-TB design leans on:
   - no ``CartesianProduct`` anywhere (1-row scalar broadcasts plan as
     ``BroadcastNestedLoopJoin``, which is fine — a CartesianProduct
     means a data×data blowup);
   - no ``BatchEvalPython`` (row-at-a-time Python UDF — the slow path;
     ``ArrowEvalPython``/``MapInPandas``/``FlatMapGroupsInPandas`` are
     the sanctioned vectorized kernels and remain allowed).

Iterative trainers execute driver-side jobs while *constructing* their
result DataFrame; at sf0.001 those are sub-second, so the whole sweep
stays a few minutes.
"""

from __future__ import annotations

import pytest

from recommender_systems_spark import registry

from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_registry_query_analyzes_and_plans_clean(spark, name):
    df = registry.QUERIES[name](spark, SF_SMALL)
    # .schema triggers full analysis (and nothing more for lazy plans).
    assert len(df.schema.fields) > 0, f"{name}: empty schema"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in physical plan — a data-sized "
        "cross join; candidates must come from an equi-join on a key"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in physical plan — use a "
        "pandas_udf / mapInPandas Arrow kernel instead"
    )
