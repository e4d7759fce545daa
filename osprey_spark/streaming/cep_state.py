"""Stateful streaming CEP: ordered-pattern matching across micro-batches.

``applyInPandasWithState`` keyed by conversation — the streaming
counterpart of ``operators.sessions.match_sequence``. State per key:
(current step, first-match ts, last seen turn). Turns may arrive across
many micro-batches and slightly out of order **within** a batch (sorted
per group before applying); emission happens once when the pattern
completes. Timeout via event-time watermark evicts idle conversations.

The step predicates are evaluated *before* the stateful operator as
boolean columns (JVM-side), so the Python state function only folds
booleans — the Arrow payload is (key, turn_idx, ts, step flags), not
text.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, matched_at_turn long, matched_at_ts timestamp"
STATE_SCHEMA = "step int, first_ts double, done boolean"


def _make_state_fn(n_steps: int, within_seconds: int | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["conv_id", "matched_at_turn", "matched_at_ts"])
            return
        (step, first_ts, done) = state.get if state.exists else (0, 0.0, False)
        out_rows = []
        for pdf in pdfs:
            if done:
                break
            pdf = pdf.sort_values("turn_idx")
            for _, row in pdf.iterrows():
                ts = row["ts"].timestamp()
                if within_seconds is not None and step > 0 and ts - first_ts > within_seconds:
                    step, first_ts = 0, 0.0
                if step < n_steps and bool(row["flags"][step]):
                    if step == 0:
                        first_ts = ts
                    step += 1
                    if step == n_steps:
                        done = True
                        out_rows.append((key[0], int(row["turn_idx"]), row["ts"]))
                        break
        state.update((step, first_ts, done))
        yield pd.DataFrame(out_rows, columns=["conv_id", "matched_at_turn", "matched_at_ts"])

    return fn


def streaming_match_sequence(
    stream: DataFrame,
    steps: list[Column],
    key: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Attach to a (possibly streaming) DataFrame of turns; emits one row
    per key when the ordered pattern completes."""
    flags = F.array(*[F.coalesce(s.cast("boolean"), F.lit(False)) for s in steps])
    prepared = stream.select(
        F.col(key).alias("conv_id"),
        F.col(order_col).cast("long").alias("turn_idx"),
        F.col(ts_col).alias("ts"),
        flags.alias("flags"),
    )
    return prepared.groupBy("conv_id").applyInPandasWithState(
        _make_state_fn(len(steps), within_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
