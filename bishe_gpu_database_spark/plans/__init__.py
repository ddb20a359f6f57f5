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


def simple_plan(df: DataFrame) -> str:
    """The 'simple' physical plan: tree with inline arguments (the form
    where ``Exchange SinglePartition`` appears on the node line itself)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def _node_indent(line: str) -> int | None:
    """Tree depth of a plan line = offset of the node name past the
    ``+-``/``:- ``/``|``-drawing prefix; None for non-node lines."""
    i = 0
    while i < len(line) and line[i] in " :+|-":
        i += 1
    if i >= len(line) or not line[i].isalpha():
        return None
    return i


def single_partition_sort_offenders(plan: str) -> list[str]:
    """Scale red flag (r3 verdict item 2): ``Exchange SinglePartition``
    feeding a Sort or Window — a full sort of the input through ONE task.
    Walks the simple-plan tree and reports each single-partition exchange
    whose parent chain (within the sort/window subtree) contains a Sort or
    Window node. Global final aggregates (HashAggregate over a
    single-partition exchange of partials) are NOT flagged — those move
    #partitions rows, not the input. A ``WindowGroupLimit`` BELOW the
    exchange is exempt: each task pre-limits to k rows, so the exchange
    moves ≤ k·#partitions rows (the global top-k rank-filter pattern)."""
    lines = plan.splitlines()
    nodes = []  # (line_no, indent, text)
    for ln, line in enumerate(lines):
        ind = _node_indent(line)
        if ind is not None:
            nodes.append((ln, ind, line[ind:]))
    offenders = []
    for i, (ln, ind, text) in enumerate(nodes):
        if "Exchange SinglePartition" not in text:
            continue
        # parent chain: nearest preceding nodes with strictly smaller indent
        parents = []
        cur = ind
        for j in range(i - 1, -1, -1):
            _, pind, ptext = nodes[j]
            if pind < cur:
                parents.append(ptext)
                cur = pind
            if len(parents) >= 3:
                break
        head = " <- ".join(p.split("[", 1)[0].strip() for p in parents[:2])
        # exact node names — "SortAggregate"/"WindowGroupLimit" must NOT
        # match (a global SortAggregate of partials moves #partitions rows)
        if not any(
            p.split(" ", 1)[0].rstrip(",") in ("Sort", "Window") for p in parents[:2]
        ):
            continue
        # exempt: WindowGroupLimit below the exchange bounds what it moves
        limited = any(
            ctext.startswith(("WindowGroupLimit", "LocalLimit"))
            for _, cind, ctext in nodes[i + 1 : i + 3]
            if cind > ind
        )
        if not limited:
            offenders.append(f"Exchange SinglePartition under [{head}]")
    return offenders


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
