"""Watermarked stream-stream join: turn events against a live alert
stream.

The pipeline's cross-turn correlation joins turns against ACCUMULATED
verdict state (stream-static over the MOR store — exact, replayable).
This operator is the complementary native mechanism the north rule's
"stateful join" names: when the second side is itself a LIVE stream
(alerts raised by another query, moderation events from a different
topic), Spark's stream-stream join buffers both sides in keyed state and
evicts by watermark + the time-range predicate — no user-managed store.

Reference parity: the reference correlates an event with recent
label/verdict activity through per-entity service lookups
(worker/lib/storage/labels.py reads at event time); here the correlation
window is declared and the state eviction is provably bounded:

- both inputs carry event-time watermarks;
- the join condition bounds alert time to
  ``[turn_ts - lookback, turn_ts]``, so Spark derives a state watermark
  for each side and drops buffered rows that can no longer match
  (state size is O(rows within lookback), not O(stream));
- LEFT OUTER emits unmatched turns once the alert-side watermark passes
  the window end — late-arriving alerts inside the watermark still
  match, which a stream-static join against a point-in-time snapshot
  would miss.

At 10^12-turn scale both sides shuffle-partition on the join key, so a
hot conversation concentrates one partition's state; feed the alert side
through the escalation candidates prefilter (or dedupe alerts per conv ×
window) before the join when alert volume per conversation is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def turns_with_recent_alerts(
    turns: DataFrame,
    alerts: DataFrame,
    key: str = "conv_id",
    turn_ts: str = "ts",
    alert_ts: str = "alert_ts",
    lookback_seconds: int = 1800,
    turn_watermark: str = "10 minutes",
    alert_watermark: str = "30 minutes",
    how: str = "leftOuter",
) -> DataFrame:
    """Each turn joined to alerts on the SAME conversation raised within
    ``[turn_ts - lookback_seconds, turn_ts]`` (inclusive both ends).

    ``turns`` and ``alerts`` must be STREAMING DataFrames; ``alerts``
    needs columns ``(key, alert_ts, ...)``. Output carries every turn
    column plus the alert columns (null for unmatched turns under
    ``leftOuter``). Both watermarks are applied here — pass raw streams.
    """
    t = turns.withWatermark(turn_ts, turn_watermark).alias("t")
    a = alerts.withWatermark(alert_ts, alert_watermark).alias("a")
    cond = (
        (F.col(f"t.{key}") == F.col(f"a.{key}"))
        & (F.col(f"a.{alert_ts}") >= F.col(f"t.{turn_ts}") - F.expr(f"INTERVAL {int(lookback_seconds)} SECONDS"))
        & (F.col(f"a.{alert_ts}") <= F.col(f"t.{turn_ts}"))
    )
    alert_cols = [
        F.col(f"a.{c}").alias(c if c != key else f"alert_{key}")
        for c in alerts.columns
    ]
    return t.join(a, cond, how).select("t.*", *alert_cols).drop(f"alert_{key}")
