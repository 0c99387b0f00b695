"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch engine forward-fills with window functions (W5); on an
unbounded stream that window never closes, so ffill becomes *state*: the
last seen value per series, carried across micro-batches. This is the
``applyInPandasWithState`` pattern every custom stateful operator in this
engine follows — bounded per-key state, explicit timeout, Arrow-batched
group processing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FFILL_OUTPUT_SCHEMA = StructType(
    [
        StructField("series_key", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value_filled", DoubleType(), True),
    ]
)

_STATE_SCHEMA = "last_value double"


def stream_ffill(events: DataFrame, key_col: str = "series_key") -> DataFrame:
    """Streaming forward-fill: per series key, nulls take the most recent
    non-null value seen in ANY earlier micro-batch (state = one double per
    key — strictly bounded).

    Within a micro-batch, rows are ordered by event time before filling;
    cross-batch ordering rides on the state. For strict global order under
    out-of-orderness, pair with a watermark upstream and sort per batch —
    the reference's batch semantics (data_generation_icu.py:745-756) has
    no late data, so this matches it on in-order streams.
    """

    def fill(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            out_vals = []
            for v in pdf["value"]:
                if pd.notna(v):
                    last = float(v)
                out_vals.append(last)
            yield pd.DataFrame(
                {
                    "series_key": pdf[key_col],
                    "ts": pdf["ts"],
                    "value_filled": out_vals,
                }
            )
        if last is not None:
            state.update((last,))

    return events.groupBy(key_col).applyInPandasWithState(
        fill,
        outputStructType=FFILL_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
