"""Physical-plan inspection helpers (SURVEY §4).

The engine writes no custom Catalyst rules — correctness of the physical
strategy is instead ENFORCED by assertion: tests use these helpers to pin
the plans that matter at 100 TB (pushdown reached the scan, dims
broadcast, aggregation is partial+final, no accidental nested-loop
joins). A plan regression fails CI the same way a wrong value would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, run: bool = False) -> str:
    """The physical plan string; ``run=True`` executes first so AQE's
    final plan (with codegen annotations) is inspected instead of the
    initial one."""
    if run:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The ``PushedFilters: [...]`` payload of the first scan."""
    p = executed_plan(df)
    if "PushedFilters:" not in p:
        return ""
    return p.split("PushedFilters:")[1].split("]")[0].lstrip(" [")


def read_schema(df: DataFrame) -> str:
    """The ``ReadSchema:`` payload of the first scan — what the columnar
    reader will actually materialize (column pruning's ground truth)."""
    p = executed_plan(df)
    if "ReadSchema:" not in p:
        return ""
    return p.split("ReadSchema:")[1].splitlines()[0].strip()


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)
