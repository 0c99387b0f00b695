"""X6: grouped-map differential harness for the densification stage
(SURVEY.md §2.10).

The production densification is pure window/join Catalyst ops
(mivdp.datagen). This module re-implements the chart path with
per-stay pandas — the one legitimate grouped-map pandas UDF in the engine
— exactly so tests can diff the two implementations row-for-row
(data_generation_icu.py:845-883 semantics: pivot mean, grid reindex,
ffill/bfill, zero fill, 0/1 signal).

Never the production path: Arrow-shipping every stay's events into Python
is 10-100x the cost of the native plan — its value is that bugs in the
window formulation and bugs in the pandas formulation are uncorrelated.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DENSE_CHART_SCHEMA = StructType(
    [
        StructField("stay_id", LongType(), False),
        StructField("hour", LongType(), False),
        StructField("itemid", LongType(), False),
        StructField("signal", IntegerType(), False),
        StructField("valuenum", DoubleType(), True),
    ]
)


def densify_chart_pandas(bucketed_chart: DataFrame, n_buckets: int) -> DataFrame:
    """Per-stay pandas densification (impute='Mean' path), for
    differential testing against datagen.densify_chart."""

    def per_stay(pdf: pd.DataFrame) -> pd.DataFrame:
        stay = int(pdf["stay_id"].iloc[0])
        val = pdf.pivot_table(index="start_time", columns="itemid", values="valuenum")
        sig = val.notna().astype(int)
        grid = range(n_buckets)
        val = val.reindex(grid).sort_index()
        sig = sig.reindex(grid, fill_value=0).sort_index()
        val = val.ffill().bfill()
        val = val.fillna(val.mean()).fillna(0.0)
        out = []
        for item in val.columns:
            for h in grid:
                out.append((stay, h, int(item), int(sig.loc[h, item]), float(val.loc[h, item])))
        return pd.DataFrame(
            out, columns=["stay_id", "hour", "itemid", "signal", "valuenum"]
        )

    return (
        bucketed_chart.select("stay_id", "itemid", "start_time", "valuenum")
        .groupBy("stay_id")
        .applyInPandas(per_stay, DENSE_CHART_SCHEMA)
    )
