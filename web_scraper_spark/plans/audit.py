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


def _balanced(s: str, start: int, open_ch: str, close_ch: str) -> str:
    """Substring inside the bracket pair opening at s[start] (balanced)."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == open_ch:
            depth += 1
        elif s[i] == close_ch:
            depth -= 1
            if depth == 0:
                return s[start + 1 : i]
    return s[start + 1 :]


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on sep at bracket depth 0 only (nested <>/() kept intact)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """TOP-LEVEL column lists each parquet scan actually reads (pruning
    check). Balanced-bracket parsing: a naive [^>]* capture truncates at
    the first '>' inside a nested type (array<struct<...>>) and a flat
    comma split would report struct FIELDS as top-level columns."""
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct", plan):
        body = _balanced(plan, m.end(), "<", ">")
        cols = [c.split(":")[0].strip() for c in _split_top(body) if c.strip()]
        out.append(cols)
    return out


def count_op(df: DataFrame, op: str) -> int:
    """Count plan NODES named `op` — formatted plans print each node twice
    (tree line + '(n) Op' detail header), so a raw substring count would
    double every operator; count only the detail headers."""
    return len(re.findall(rf"^\(\d+\) {re.escape(op)}", physical_plan(df), re.MULTILINE))


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
    # formatted mode prints exchange specs as `Arguments: hashpartitioning(...)`.
    # Balanced-paren capture: keys can be full expressions with nested
    # parens (pmod(...), coalesce(...)) that [^)]* would truncate, silently
    # dropping those exchanges from the audit.
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"hashpartitioning", plan):
        args = _balanced(plan, m.end(), "(", ")")
        # strip the trailing ", <numPartitions>"
        parts = _split_top(args)
        if parts and parts[-1].strip().isdigit():
            parts = parts[:-1]
        out.append(",".join(parts).strip())
    return out


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
