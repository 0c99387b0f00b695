"""Physical-plan introspection utilities.

The engine has no custom optimizer — Catalyst is the optimizer (SURVEY.md
§4: zero custom rules needed). What this package provides is *assertion
and observability* over the plans Catalyst produces: tests and benchmarks
use these helpers to pin the physical properties that matter at 100 TB
(broadcast vs shuffle joins, filter pushdown, scan schema pruning,
exchange counts) so a regression in plan shape fails CI, not production.
"""

from temporai_mivdp_spark.plans.inspect import (
    executed_plan,
    count_exchanges,
    pushed_filters,
    read_schema_columns,
    plan_summary,
)

__all__ = [
    "executed_plan",
    "count_exchanges",
    "pushed_filters",
    "read_schema_columns",
    "plan_summary",
]
