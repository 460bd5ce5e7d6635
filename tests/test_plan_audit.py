"""Registry-wide physical-plan audit: EVERY batch query's executed
plan must be free of the two biggest 100 TB scale-killers —
row-at-a-time Python evaluation (BatchEvalPython; Arrow-batched
ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas are the
sanctioned Python paths) and unbounded cartesian products
(CartesianProduct; the engine's 1-row-aggregate and broadcast-dim
crossJoins plan as BroadcastNestedLoopJoin over broadcast singletons,
which is fine and stays distinguishable).

The per-operator plan tests (test_plan_quality.py) pin specific
shapes; this audit guarantees no NEW registry key ever ships either
anti-pattern unnoticed.
"""

from __future__ import annotations

import pytest

from landsat_tair_data_pipeline_spark.registry import all_queries

SPECS = all_queries()
# streaming specs execute a real stream to produce their frame — their
# micro-batch plans are exercised by tests/test_streaming.py instead
BATCH_KEYS = sorted(
    n for n in SPECS if not n.startswith("stream_") and n != "ext_stream_window"
)


@pytest.mark.parametrize("name", BATCH_KEYS)
def test_no_rowwise_python_and_no_cartesian(spark, sf_dir, name):
    plan = (
        SPECS[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
