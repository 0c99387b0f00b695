"""Generic relational operators (SURVEY.md §2), each a pure
``DataFrame -> DataFrame`` transformation parameterized by column names.

These are the engine's vocabulary: the clinical pipeline in
``temporai_mivdp_spark.mivdp`` and the driver-facing queries in
``__spark_entry__.py`` are compositions of these.
"""

from temporai_mivdp_spark.operators.filters import (
    dedup,
    null_filter,
    semi_join_filter,
    split_label_union,
)
from temporai_mivdp_spark.operators.joins import (
    anti_join_filter,
    interval_exists_label,
    lookup_first_match,
)
from temporai_mivdp_spark.operators.aggregates import (
    conditional_count,
    group_mean_impute,
    mode_vote_filter,
    two_level_agg,
    winsorize,
)
from temporai_mivdp_spark.operators.sorts import (
    first_row_per_group,
    top_k_by_count,
)
from temporai_mivdp_spark.operators.timeseries import (
    bfill,
    dense_grid,
    ffill,
    hours_from_anchor,
    rollup_cascade,
    tumbling_bucket,
)

__all__ = [
    "dedup",
    "null_filter",
    "semi_join_filter",
    "split_label_union",
    "anti_join_filter",
    "interval_exists_label",
    "lookup_first_match",
    "conditional_count",
    "group_mean_impute",
    "mode_vote_filter",
    "two_level_agg",
    "winsorize",
    "first_row_per_group",
    "top_k_by_count",
    "bfill",
    "dense_grid",
    "ffill",
    "hours_from_anchor",
    "rollup_cascade",
    "tumbling_bucket",
]
