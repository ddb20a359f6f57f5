"""Plan regression tests: the scale-critical physical-plan properties
(pushdown reached the scan, dimension joins broadcast, no cartesian
products, whole-stage codegen present) — the `.explain` discipline."""

from __future__ import annotations

from bishe_gpu_database_spark.operators import relational as R
from bishe_gpu_database_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    formatted_plan,
)
from tests.conftest import SF_SMALL


def test_scan_project_filter_pushdown(spark):
    plan = formatted_plan(R.scan_project_filter(spark, SF_SMALL))
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, plan
    # Projection pruned to exactly the 5 referenced columns at the scan.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"]:
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_q1_pushdown_and_codegen(spark):
    df = R.q1_pricing_summary(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan
    df.collect()  # materialize so AQE finalizes the physical plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in final, final  # whole-stage-codegen stage markers
    # Partial aggregation before the exchange (map-side combine).
    assert plan.count("HashAggregate") >= 2


def test_broadcast_dimension_joins(spark):
    assert_broadcast_join(R.join_broadcast_inner(spark, SF_SMALL))
    assert_broadcast_join(R.q5_local_supplier_volume(spark, SF_SMALL))


def test_no_cartesian_in_range_join(spark):
    # Equi-prefix keeps the range join a hash/SMJ, not a cartesian.
    assert_no_cartesian(R.join_range_theta(spark, SF_SMALL))


def test_topn_uses_take_ordered(spark):
    plan = formatted_plan(R.sort_limit_topn(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan
