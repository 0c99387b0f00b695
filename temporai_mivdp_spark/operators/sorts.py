"""Sort / limit / top-k operators (SURVEY.md §2.6, O1-O3).

Global sorts (O1) are call-site one-liners (``orderBy``) and usually
unnecessary in a distributed plan — ordering that matters lives inside
window specs. This module holds the deterministic group-wise forms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_by_count(
    df: DataFrame,
    key_col: str,
    k: int,
    count_name: str = "total_count",
) -> DataFrame:
    """O2: the k most frequent values of ``key_col``
    (icu_preprocess_util.py:451-452,469-473 feature caps).

    Ties break by key ascending so the result is deterministic (pandas
    ``value_counts`` tie order is hash/insertion dependent — pinned here).
    The groupBy is a partial-agg shuffle on key; the final top-k is a
    TakeOrdered on the tiny aggregated set, not a global sort of the input.
    """
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_name))
        .orderBy(F.col(count_name).desc(), F.col(key_col).asc())
        .limit(k)
    )


def first_row_per_group(
    df: DataFrame,
    group_keys: str | Sequence[str],
    order_by: Sequence[str],
    descending: bool = False,
) -> DataFrame:
    """O3: deterministic first-row-of-group (the ``.iloc[0]`` lookups at
    disease_cohort.py:53, icu_preprocess_util.py:100,378,
    data_generation_icu.py:711-714). ``row_number() == 1`` over an explicit
    total order — never rely on incoming row order for "first"."""
    keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    cols = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
