"""Escalation sessions on Spark 4's ``transformWithStateInPandas``.

Same semantics as :mod:`osprey_spark.streaming.escalation_state` (gap
sessions, alert emitted AT the turn that crosses ``min_triggers``, once
per session, event-time state eviction) re-expressed on the
current-generation arbitrary-state API (StatefulProcessor + typed state
handles + named timers) instead of ``applyInPandasWithState``. What the
new API buys at scale:

- **RocksDB-backed state with changelog checkpointing** — keyed state
  lives off-heap and snapshots incrementally, the configuration a
  10^12-turn stream needs (`spark.sql.streaming.stateStore.providerClass
  = ...RocksDBStateStoreProvider`, required by transformWithState).
- **Typed state + TTL** — the session struct is a ValueState with
  schema; timer bookkeeping is explicit (register/delete) instead of the
  single implicit timeout slot.
- **Initial state** — a bootstrap DataFrame can seed sessions on
  migration (``initialState`` arg), which applyInPandasWithState lacks.

The operator keeps the same trigger-column contract (JVM-evaluated
boolean before the stateful op — no text crosses into Python) and the
same optional ``candidates`` semi-join bound on group dispatch.

Interchangeability is pinned by
tests/test_streaming_state.py::test_tws_escalation_matches_apply_in_pandas
— both implementations must produce identical rows on the same input.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from osprey_spark.streaming.escalation_state import OUTPUT_SCHEMA, STATE_SCHEMA
from osprey_spark.streaming._timeutil import epoch_seconds

_COLS = ["conv_id", "session_start", "escalated_at", "n_turns", "n_triggers"]


class _EscalationProcessor(StatefulProcessor):
    def __init__(self, gap_seconds: float, min_triggers: int):
        self.gap_seconds = gap_seconds
        self.min_triggers = min_triggers

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.sess = handle.getValueState("sess", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        if self.sess.exists():
            session_start, last_ts, n_turns, n_triggers, emitted = tuple(self.sess.get())
        else:
            session_start, last_ts, n_turns, n_triggers, emitted = 0.0, None, 0, 0, False

        out = []
        chunks = list(rows)
        batch = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame({"ts": [], "is_trigger": []})
        )
        if len(batch):
            # one vectorized event-time sort per (key, batch) — the same
            # cross-chunk ordering guarantee as escalation_state.py, with
            # the sort and the epoch conversion done columnar (numpy)
            # before the inherently-sequential session fold; on a fat
            # group (hot conversation) this keeps Python-per-row work to
            # the fold itself
            batch = batch.dropna(subset=["ts"]).sort_values("ts", kind="stable")
            ts_arr = epoch_seconds(batch["ts"])
            trig_arr = batch["is_trigger"].to_numpy()
            for t, trig in zip(ts_arr, trig_arr):
                t = float(t)
                if last_ts is None or t - last_ts > self.gap_seconds:
                    session_start, n_turns, n_triggers, emitted = t, 0, 0, False
                last_ts = t
                n_turns += 1
                if bool(trig):
                    n_triggers += 1
                    if n_triggers == self.min_triggers and not emitted:
                        emitted = True
                        out.append(
                            (
                                key[0],
                                pd.Timestamp(session_start, unit="s"),
                                pd.Timestamp(t, unit="s"),
                                n_turns,
                                n_triggers,
                            )
                        )

        self.sess.update((session_start, last_ts, n_turns, n_triggers, emitted))
        # ONE live eviction timer per key: delete stale ones (registerTimer
        # accumulates, unlike the old single-slot setTimeoutTimestamp),
        # clamped past the current watermark for late keys
        for t_old in list(self.handle.listTimers()):
            self.handle.deleteTimer(t_old)
        timeout_ms = int((last_ts + self.gap_seconds) * 1000)
        wm_ms = timerValues.getCurrentWatermarkInMs()
        self.handle.registerTimer(max(timeout_ms, wm_ms + 1))
        yield pd.DataFrame(out, columns=_COLS)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # idle past the watermark: the open session can never extend
        self.sess.clear()
        yield pd.DataFrame(columns=_COLS)

    def handleInitialState(self, key: tuple, initialState, timerValues: TimerValues) -> None:
        # bootstrap (first batch only): seed the open session migrated
        # from history — see escalation_bootstrap_state — so a redeploy
        # continues sessions without replaying the backlog
        row = initialState.iloc[0] if hasattr(initialState, "iloc") else initialState
        last_ts = float(row["last_ts"])
        self.sess.update(
            (
                float(row["session_start"]),
                last_ts,
                int(row["n_turns"]),
                int(row["n_triggers"]),
                bool(row["emitted"]),
            )
        )
        wm_ms = timerValues.getCurrentWatermarkInMs()
        self.handle.registerTimer(
            max(int((last_ts + self.gap_seconds) * 1000), wm_ms + 1)
        )

    def close(self) -> None:
        pass


def escalation_bootstrap_state(
    history: DataFrame,
    trigger: Column,
    key: str = "conv_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    min_triggers: int = 2,
) -> DataFrame:
    """Each conversation's LAST session in ``history``, shaped as the
    escalation operator's keyed state — pass as ``initial_state`` to
    :func:`streaming_escalation_sessions_tws` so a (re)deployed stream
    CONTINUES open sessions instead of replaying the 10^12-turn backlog.

    Built JVM-side: one ``session_window`` aggregation (map-side partial
    combine) + a per-conv ``max_by`` — no Python. ``emitted`` is True
    when the session already crossed ``min_triggers`` in history, so the
    stream will not re-alert for it (once-per-session contract).

    Boundary note: ``session_window`` splits at an event-time gap of
    EXACTLY ``gap_seconds`` where the streaming fold merges (strict
    ``>`` there) — an irrelevant knife-edge for real timestamps, called
    out for exactness."""
    prepared = history.select(
        F.col(key).alias("conv_id"),
        F.col(ts_col).alias("ts"),
        F.coalesce(trigger.cast("boolean"), F.lit(False)).alias("is_trigger"),
    )
    sess = prepared.groupBy(
        "conv_id", F.session_window("ts", f"{int(gap_seconds)} seconds")
    ).agg(
        F.min("ts").alias("_start"),
        F.max("ts").alias("_last"),
        F.count(F.lit(1)).alias("_n_turns"),
        F.sum(F.col("is_trigger").cast("long")).alias("_n_triggers"),
    )
    payload = F.struct(
        F.col("_start").cast("timestamp").cast("double").alias("session_start"),
        F.col("_last").cast("timestamp").cast("double").alias("last_ts"),
        F.col("_n_turns").alias("n_turns"),
        F.col("_n_triggers").alias("n_triggers"),
        (F.col("_n_triggers") >= min_triggers).alias("emitted"),
    )
    return (
        sess.groupBy("conv_id")
        .agg(F.max_by(payload, F.col("_last")).alias("_s"))
        .select("conv_id", "_s.*")
    )


def streaming_escalation_sessions_tws(
    stream: DataFrame,
    trigger: Column,
    key: str = "conv_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    min_triggers: int = 2,
    candidates: "DataFrame | None" = None,
    initial_state: "DataFrame | None" = None,
) -> DataFrame:
    """transformWithStateInPandas twin of
    :func:`osprey_spark.streaming.escalation_state.streaming_escalation_sessions`
    — identical output contract. Requires the RocksDB state store
    provider (set ``spark.sql.streaming.stateStore.providerClass`` to
    ``org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
    before starting the query). ``initial_state``: per-conversation open
    sessions to seed on the FIRST batch (build with
    :func:`escalation_bootstrap_state`) — the redeploy-without-replay
    migration path."""
    prepared = stream.select(
        F.col(key).alias("conv_id"),
        F.col(ts_col).alias("ts"),
        F.coalesce(trigger.cast("boolean"), F.lit(False)).alias("is_trigger"),
    )
    if candidates is not None:
        cand = candidates.select(
            F.col(candidates.columns[0]).cast("string").alias("conv_id")
        ).distinct()
        prepared = prepared.join(F.broadcast(cand), on="conv_id", how="leftsemi")
    return prepared.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=_EscalationProcessor(gap_seconds, min_triggers),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
        initialState=initial_state.groupBy("conv_id") if initial_state is not None else None,
    )
