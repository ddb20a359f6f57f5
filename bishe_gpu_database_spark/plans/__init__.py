"""Plan introspection helpers: the engine's `.explain` discipline.

The reference's only introspection is printf dumps
(ref: src/database/ycsb/TransctionManager.cuh:87-95); here we lean on
Catalyst's formatted plans and assert scale-critical properties of them
(pushdown reached the scan, the dimension join broadcast, no cartesian
product) — used by tests/test_plans.py as *plan regression tests*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def plan_has(df: DataFrame, *needles: str) -> bool:
    """True iff every needle appears in the formatted physical plan."""
    plan = formatted_plan(df)
    return all(n in plan for n in needles)


def assert_pushed_filters(df: DataFrame) -> None:
    """Assert the parquet scan received pushed filters."""
    plan = formatted_plan(df)
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, plan


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
