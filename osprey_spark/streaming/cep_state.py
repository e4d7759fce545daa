"""Stateful streaming CEP: ordered-pattern matching across micro-batches.

``applyInPandasWithState`` keyed by conversation — the streaming
counterpart of ``operators.sessions.match_sequence``. Turns may arrive
across any number of micro-batches and **out of order** (files/partitions
carry no ordering guarantee): the state buffers turns that arrive ahead
of the next expected ``turn_idx`` (contiguous per conversation, FIXTURES
F1) and feeds the pattern state machine strictly in turn order, so the
result is independent of arrival order — the exactly-once/replay-safe
property the batch operator gets for free from sort_array.

The step predicates are evaluated *before* the stateful operator as a
boolean-bitmask column (JVM-side), so the Python state function only
folds longs — the Arrow payload is (key, turn_idx, ts, mask), not text.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from osprey_spark.streaming._timeutil import epoch_seconds

OUTPUT_SCHEMA = "conv_id string, matched_at_turn long, matched_at_ts timestamp"
STATE_SCHEMA = (
    "step int, first_ts double, done boolean, next_turn long, "
    "buf_turn array<long>, buf_ts array<double>, buf_mask array<long>"
)


def _make_state_fn(n_steps: int, within_seconds: int | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["conv_id", "matched_at_turn", "matched_at_ts"])
            return
        if state.exists:
            step, first_ts, done, next_turn, buf_turn, buf_ts, buf_mask = state.get
            pending = {int(t): (float(s), int(m)) for t, s, m in zip(buf_turn, buf_ts, buf_mask)}
        else:
            step, first_ts, done, next_turn = 0, 0.0, False, 0
            pending = {}

        for pdf in pdfs:
            # columnar epoch conversion once per chunk (numpy, ns-
            # normalized, NaT→NaN) — the per-row work is just the dict
            # insert; NaT rows are dropped rather than folded as
            # INT64_MIN epochs
            ts_arr = epoch_seconds(pdf["ts"])
            for t, s, m in zip(pdf["turn_idx"].to_numpy(), ts_arr, pdf["mask"].to_numpy()):
                if s != s:  # NaT
                    continue
                t = int(t)
                if t >= next_turn and t not in pending:
                    pending[t] = (float(s), int(m))

        out_rows = []
        # consume strictly contiguous turns
        while not done and next_turn in pending:
            ts, mask = pending.pop(next_turn)
            if within_seconds is not None and step > 0 and ts - first_ts > within_seconds:
                step, first_ts = 0, 0.0
            if step < n_steps and (mask >> step) & 1:
                if step == 0:
                    first_ts = ts
                step += 1
                if step == n_steps:
                    done = True
                    out_rows.append(
                        (key[0], next_turn, pd.Timestamp(ts, unit="s"))
                    )
            next_turn += 1
        if done:
            pending.clear()

        turns = sorted(pending)
        state.update(
            (
                step,
                first_ts,
                done,
                next_turn,
                turns,
                [pending[t][0] for t in turns],
                [pending[t][1] for t in turns],
            )
        )
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
    mask = None
    for i, s in enumerate(steps):
        bit = F.when(F.coalesce(s.cast("boolean"), F.lit(False)), F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        mask = bit if mask is None else mask + bit
    prepared = stream.select(
        F.col(key).alias("conv_id"),
        F.col(order_col).cast("long").alias("turn_idx"),
        F.col(ts_col).alias("ts"),
        mask.cast("long").alias("mask"),
    )
    return prepared.groupBy("conv_id").applyInPandasWithState(
        _make_state_fn(len(steps), within_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
