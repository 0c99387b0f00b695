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
    StringType,
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


HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", LongType(), False),
        StructField("item", StringType(), True),
        StructField("est_count", LongType(), False),
        StructField("max_err", LongType(), False),
        StructField("n_seen", LongType(), False),
    ]
)

_HH_STATE_SCHEMA = (
    "items array<string>, counts array<bigint>, errs array<bigint>, n_seen bigint"
)


def stream_heavy_hitters(
    events: DataFrame,
    key_col: str = "group_key",
    item_col: str = "item",
    k: int = 8,
) -> DataFrame:
    """Streaming heavy hitters per key — the SpaceSaving sketch
    (Metwally/Agrawal/El Abbadi 2005) as a custom stateful operator.
    Built-in streaming aggregation cannot express this: an exact
    per-item count grows state with DISTINCT items (unbounded on a
    trending-n-gram or hot-key stream), while this keeps exactly ``k``
    counters per group key and still guarantees (a) every item with
    true count > n_seen/k is in the summary, (b) est_count >= true
    count >= est_count - max_err. That bounded-state-for-unbounded-
    domain trade is what a 100 TB firehose needs for hot-key and
    trending detection.

    State per group key = three length-<=k arrays + a total counter —
    strictly bounded. Each micro-batch pre-aggregates its items in
    pandas (value_counts) and folds them into the sketch one item TYPE
    at a time (alphabetical, so replays are deterministic); eviction
    replaces the (count, item)-smallest slot, inheriting its count as
    the new item's error bound. Each batch EMITS the full updated
    summary snapshot; downstream readers keep the snapshot with the
    highest ``n_seen`` per group key (monotone within a key), so
    append-mode sinks stay valid across any number of batches.
    """

    def sketch(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs, n_seen = state.get
            items, counts, errs = list(items), list(counts), list(errs)
        else:
            items, counts, errs, n_seen = [], [], [], 0
        for pdf in pdfs:
            vc = pdf[item_col].dropna().value_counts()
            for item in sorted(vc.index):
                c = int(vc[item])
                n_seen += c
                if item in items:
                    counts[items.index(item)] += c
                elif len(items) < k:
                    items.append(item)
                    counts.append(c)
                    errs.append(0)
                else:
                    j = min(range(len(items)), key=lambda i: (counts[i], items[i]))
                    errs[j] = counts[j]
                    counts[j] += c
                    items[j] = item
        state.update((items, counts, errs, n_seen))
        order = sorted(range(len(items)), key=lambda i: (-counts[i], items[i]))
        yield pd.DataFrame(
            {
                "group_key": [key[0]] * len(order),
                "item": [items[i] for i in order],
                "est_count": [counts[i] for i in order],
                "max_err": [errs[i] for i in order],
                "n_seen": [n_seen] * len(order),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        sketch,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("session_key", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", LongType(), False),
    ]
)

_SESSION_STATE_SCHEMA = "start timestamp, last timestamp, n bigint"


def stream_session_finalize(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "session_key",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap sessionization that emits each session EXACTLY ONCE, when it
    closes — the emit-on-close complement to ``stream_session_windows``
    (whose built-in ``session_window`` aggregation re-emits growing
    sessions under update mode and needs ``complete``/watermark-append
    downstream). Emit-once semantics are what a billing/labeling
    consumer wants: one immutable row per finished session.

    The operator is the canonical EVENT-TIME TIMEOUT pattern: state =
    the one open session per key (start, last event, count). A batch's
    rows (sorted by event time) either extend the open session or —
    when the in-batch gap exceeds ``gap_minutes`` — close it, emitting
    the finished row immediately. A session left open at batch end
    arms ``setTimeoutTimestamp(last + gap)``; when the WATERMARK
    passes that point in a later batch, Spark calls the function with
    ``state.hasTimedOut`` and the session emits without any new row
    for its key having arrived. Requires ``withWatermark`` upstream
    (event-time timeout is rejected otherwise); late rows older than
    the watermark follow watermark semantics (dropped upstream).

    Batch twin: ``operators.timeseries.sessionize`` — the parity test
    feeds the same rows through both and compares per-session
    (start, end, n)."""
    gap_ms = gap_minutes * 60 * 1000

    def sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start, last, n):
            return pd.DataFrame(
                {
                    "session_key": [key[0]],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit(start, last, n)
            return
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        for pdf in pdfs:
            for t in pdf.sort_values(ts_col)[ts_col]:
                t = t.to_pydatetime()
                if last is not None and (t - last).total_seconds() * 1000 > gap_ms:
                    yield emit(start, last, n)
                    start, n = t, 0
                if start is None:
                    start = t
                # a late-but-within-watermark row must never move the
                # session END backwards (or START forwards): extend the
                # envelope, count the event
                start = min(start, t)
                last = t if last is None else max(last, t)
                n += 1
        if last is not None:
            state.update((start, last, n))
            # session timestamps are tz-naive in the session timezone
            # (UTC in this engine); pin UTC explicitly so the epoch-ms
            # timeout is right even on a non-UTC driver
            from datetime import timezone

            state.setTimeoutTimestamp(
                int(last.replace(tzinfo=timezone.utc).timestamp() * 1000) + gap_ms
            )

    return events.groupBy(key_col).applyInPandasWithState(
        sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
