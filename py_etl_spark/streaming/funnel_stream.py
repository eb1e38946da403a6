"""Stateful streaming funnel: the unbounded-stream form of
:func:`py_etl_spark.operators.funnel.funnel`.

The batch operator folds each user's full sorted event array; on a stream
the fold state — ``(stage, t_last, completion times)`` — lives in the
executor-side state store via ``applyInPandasWithState``, keyed by user:
a 1000-executor cluster holds 1000ths of the funnel state each, nothing
accumulates on the driver, and state size is O(steps) per user regardless
of event volume.

Semantics match the batch operator exactly (strict ordering: step *i+1*
needs an event strictly after the one that completed step *i*; first
qualifying event wins). One row is emitted per user AT COMPLETION of the
final step (append mode) — the streaming analog of filtering the batch
output to ``reached == n``.

Ordering contract: within a micro-batch events are sorted by
``(ts, event_id)``; across micro-batches the source must not deliver a
user's events out of event-time order (the usual kafka-partition-by-key /
file-batch-per-time-range arrangement). A late event older than the
recorded ``t_last`` is ignored rather than retroactively re-folded —
funnels advance monotonically.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from py_etl_spark.streaming.sessionize import _ts_ms


def _output_schema(n: int) -> str:
    cols = ", ".join(f"t_step{i + 1}_ms long" for i in range(n))
    return f"user_id long, {cols}"


def _state_schema(n: int) -> str:
    cols = ", ".join(f"t{i + 1} long" for i in range(n))
    return f"stage long, t_last long, {cols}"


def make_funnel(steps: list[str]):
    """Build the applyInPandasWithState function for a step list."""
    n = len(steps)

    def advance(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        if state.exists:
            vals = list(state.get)
        else:
            vals = [0, 0] + [0] * n
        stage, t_last, times = int(vals[0]), int(vals[1]), list(vals[2:])
        completed = []
        for t, ty in zip(_ts_ms(pdf["ts"]).tolist(), pdf["event_type"].tolist()):
            if stage >= n:
                break  # funnel complete; nothing else to track
            if ty == steps[stage] and (stage == 0 or t > t_last):
                times[stage] = t
                t_last = t
                stage += 1
                if stage == n:
                    completed.append((user_id, *times))
        state.update((stage, t_last, *times))
        if completed:
            yield pd.DataFrame(
                completed,
                columns=["user_id"] + [f"t_step{i + 1}_ms" for i in range(n)],
            )

    return advance


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Funnel a (streaming) events DataFrame; emits one row per user when
    the final step completes. ``events`` needs ``user_id``, ``ts``,
    ``event_type``, ``event_id``. Also runs on a batch DataFrame (one-shot
    state store) for testing."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel(steps),
            outputStructType=_output_schema(len(steps)),
            stateStructType=_state_schema(len(steps)),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
