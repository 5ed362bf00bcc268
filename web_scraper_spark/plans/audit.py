"""Physical-plan audit helpers: make plan-shape properties testable.

The optimizer burden in this engine is deliberately "let Catalyst do it"
(SURVEY.md §4.2) — these helpers are how we VERIFY Catalyst actually did:
filters reached the parquet scan, small dims broadcast, no accidental
cartesian products, expressions stayed inside whole-stage codegen. CI
asserts plan shape so a refactor that silently de-optimizes a query (e.g.
a UDF sneaking above a filter and blocking pushdown) fails loudly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True when the parquet scan carries PushedFilters (optionally one
    mentioning `fragment`)."""
    plan = physical_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if not m:
        return False
    if fragment is None:
        return any(x.strip() for x in m)
    return any(fragment in x for x in m)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads (pruning check)."""
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_op(df: DataFrame, op: str) -> int:
    return physical_plan(df).count(op)


def has_cartesian(df: DataFrame) -> bool:
    p = physical_plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def broadcast_joins(df: DataFrame) -> int:
    return count_op(df, "BroadcastHashJoin")


def hash_exchanges(df: DataFrame) -> list[str]:
    """Argument lists of every `Exchange hashpartitioning(...)` in the plan.
    Lets tests assert exactly WHICH keys get shuffled (e.g. the robots
    decision may shuffle the tiny rules table by host but never the
    frontier by its row columns)."""
    # formatted mode prints exchange specs as `Arguments: hashpartitioning(...)`
    return re.findall(r"hashpartitioning\(([^)]*?), \d+\)", physical_plan(df))


def single_partition_exchanges(df: DataFrame) -> int:
    """Count of `Exchange SinglePartition` nodes — each is a potential
    all-rows-in-one-task bottleneck (unpartitioned Window / global limit).
    Scale-safe plans keep this at 0 on data-scale streams (a single-
    partition exchange over a tiny aggregate, e.g. a ≤num_ranges-row count
    table, is acceptable — see rangepartitioning audit below)."""
    return physical_plan(df).count("SinglePartition")


def range_exchanges(df: DataFrame) -> int:
    return physical_plan(df).count("rangepartitioning(")


def codegen_stages(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans in the EXECUTED plan. Forces
    execution first: under AQE the codegen markers (`*(n)`) only exist in
    the finalized plan."""
    df.collect()  # count() would build a different query execution
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
