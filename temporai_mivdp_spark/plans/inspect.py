"""Plan inspection helpers (wrappers over ``df.explain`` internals)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def plan_summary(df: DataFrame) -> dict[str, int]:
    """Counts of the plan nodes that matter for scale review: joins by
    strategy, exchanges by kind, aggregates, windows, codegen spans."""
    plan = executed_plan(df)
    pats = [
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "Exchange hashpartitioning",
        "Exchange rangepartitioning",
        "Exchange SinglePartition",
        "HashAggregate",
        "ObjectHashAggregate",
        "SortAggregate",
        "Window",
        "WholeStageCodegen",
    ]
    found = re.findall("|".join(re.escape(p) for p in pats), plan)
    return dict(Counter(found))


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the first number to check
    when reviewing an operator for scale (each is a full data movement)."""
    s = plan_summary(df)
    return sum(v for k, v in s.items() if k.startswith("Exchange"))


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the parquet scan (``PushedFilters`` in the
    FileScan node) — empty when a predicate failed to push down."""
    plan = executed_plan(df)
    out: list[str] = []
    # tolerate Spark's "..." list truncation (no closing bracket on line)
    for m in re.finditer(r"PushedFilters: \[([^\]\n]*)", plan):
        body = m.group(1).strip().rstrip(",").rstrip("...").rstrip(",")
        if body:
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets each parquet scan actually reads (``ReadSchema``) —
    a scan reading all columns for a narrow projection means pruning
    failed."""
    plan = executed_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas
