"""Stateful streaming sessionization (custom operator family, SURVEY.md §2.9).

The batch engine sessionizes with a lag/cumulative-sum window
(:func:`py_etl_spark.queries.sessionize_events`, DuckDB-oracle-checked).
This module is the *streaming* form of the same operator: gap-based session
windows over an unbounded event stream, built on
``applyInPandasWithState`` — Spark's arbitrary-stateful-processing hook
(Arrow-batched; state lives in the executor-side state store, partitioned
by the grouping key, so a 1000-executor cluster holds 1000ths of the
session state each; nothing accumulates on the driver).

Per user: events extend the open session while gaps stay ≤ ``gap_s``; a
larger gap closes the session (emitted downstream, append-mode) and opens
the next. Idle sessions are closed by an event-time timeout at
``last_event + gap`` — i.e. when the stream's watermark certifies no
earlier event can still arrive, matching the reference's
watermark-cut semantics (etl.py read-only mode) rather than wall-clock.

Session ids are 1-based ordinals per user in event-time order — the same
numbering the batch query derives from its cumulative break sum, which is
what makes stream-vs-batch parity testable row-for-row.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_GAP_S = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, session_start_ms long"
)
# (next ordinal bookkeeping + the open session)
STATE_SCHEMA = "session_ord long, session_start_ms long, last_ts_ms long, n_events long"


def _ts_ms(series: pd.Series) -> pd.Series:
    """Epoch millis from an Arrow-materialized timestamp column regardless
    of pandas resolution (ns on classic pandas, us under Arrow dtypes)."""
    return pd.to_datetime(series).astype("datetime64[ns]").astype("int64") // 1_000_000


def make_sessionizer(gap_s: int = DEFAULT_GAP_S):
    """Build the applyInPandasWithState function for a given gap."""

    gap_ms = gap_s * 1000

    def gap_exceeded(t_ms: int, last_ms: int) -> bool:
        # Compare in floor-seconds: the batch query computes the gap as
        # cast(ts AS long) - cast(lag(ts) AS long), which truncates to
        # whole seconds — sub-second parity requires the same rule here.
        return t_ms // 1000 - last_ms // 1000 > gap_s

    def sessionize(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple] = []

        if state.hasTimedOut:
            # Watermark passed last_event + gap: no in-order event can
            # extend this session any more — close and clear.
            ord_, start, last, n = state.get
            closed.append((user_id, ord_, n, start))
            state.remove()
        else:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            if state.exists:
                ord_, start, last, n = state.get
            else:
                ord_, start, last, n = 0, None, None, 0
            for t in _ts_ms(pdf["ts"]).tolist():
                if start is None:
                    ord_, start, last, n = ord_ + 1, t, t, 1
                elif gap_exceeded(t, last):
                    closed.append((user_id, ord_, n, start))
                    ord_, start, last, n = ord_ + 1, t, t, 1
                else:
                    last, n = t, n + 1
            state.update((ord_, start, last, n))
            state.setTimeoutTimestamp(last + gap_ms)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "n_events", "session_start_ms"],
            )

    return sessionize


def sessionize_stream(
    events: DataFrame,
    gap_s: int = DEFAULT_GAP_S,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Gap-sessionize a (streaming) events DataFrame.

    ``events`` needs ``user_id``, ``ts`` (timestamp), ``event_id`` (tie
    order). Emits one row per *closed* session (append semantics). Also
    works on a batch DataFrame for testing — Spark runs the same stateful
    function with a one-shot state store.
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_s),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
