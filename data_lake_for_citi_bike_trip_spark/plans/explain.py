"""Physical-plan introspection helpers.

`.explain` is the feedback loop for scale design: these helpers pull the
formatted plan and assert the properties that matter at 100 TB —
predicate pushdown reaching the scan, column pruning (ReadSchema),
broadcast vs sort-merge joins, whole-stage codegen coverage.
Used by tests/test_plans.py and tools/dump_plans.py (PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_facts(df: DataFrame) -> dict[str, object]:
    """Summarize the scale-relevant properties of a plan."""
    plan = formatted_plan(df)
    # codegen fusion spans show as "*(n)" only in the executed plan
    executed = executed_plan(df)
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange"),
        "codegen_stages": executed.count("*("),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "plan": plan,
    }
