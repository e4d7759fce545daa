"""Deterministic synthetic transcript generator.

Produces the BASELINE.json ``input_hint`` table shape:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — multi-turn conversation / agent transcripts.

Deterministic for a given (seed, n_convs): conversation sizes are
Zipf-distributed (hot conversations exercise skew salting), trigger
phrases are planted at known rows so rule hits are predictable, ordered
tool sequences (search → code_exec → send_email) are planted for CEP
tests, and a bounded fraction of rows arrive out-of-order for watermark
tests. No external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "tool"]
TOOLS = ["", "search", "code_exec", "browser", "send_email"]

_VOCAB = (
    "please help me with this task thanks let us check the results again "
    "model agent answer question data code run tool output input safety "
    "review policy system message long short quick slow good bad new old"
).split()

_TRIGGERS = [
    "hello world",
    "please send email to admin@example.com now",
    "visit https://example.com/login today",
    "my number is 1234567890",
    "h3llo there",
]

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def transcripts_pdf(
    n_convs: int = 200,
    seed: int = 42,
    zipf_a: float = 1.5,
    max_turns: int = 400,
    late_fraction: float = 0.02,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    sizes = np.minimum(rng.zipf(zipf_a, size=n_convs) + 2, max_turns)
    total = int(sizes.sum())
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])

    conv_ids = np.repeat(
        np.char.add("conv_", np.char.zfill(np.arange(n_convs).astype(str), 8)), sizes
    )
    # turn_idx = global position - conversation start offset (vectorized)
    pos = np.arange(total, dtype="int64")
    turn_idx = (pos - np.repeat(offsets, sizes)).astype("int32")
    roles = np.array(ROLES)[(turn_idx % 3)]

    tool_draw = rng.integers(0, len(TOOLS), size=total)
    tools = np.array(TOOLS)[tool_draw]
    tools = np.where(roles == "tool", tools, "")

    # text: a deterministic pool of 4096 sentences indexed per row (fast at
    # 10^7 rows), trigger phrases appended on every 13th row
    pool_idx = np.random.default_rng(seed + 1).integers(0, len(_VOCAB), size=(4096, 8))
    pool = np.array([" ".join(_VOCAB[j] for j in row) for row in pool_idx])
    texts = pool[rng.integers(0, len(pool), size=total)].astype(object)
    trig_rows = np.arange(0, total, 13)
    trig_vals = np.array(_TRIGGERS, dtype=object)[np.arange(len(trig_rows)) % len(_TRIGGERS)]
    texts[trig_rows] = np.char.add(
        np.char.add(texts[trig_rows].astype(str), " "), trig_vals.astype(str)
    )

    # plant an ordered tool-abuse sequence in every 10th conversation
    seq_convs = np.arange(0, n_convs, 10)
    seq_convs = seq_convs[sizes[seq_convs] >= 6]
    for step, off in enumerate((1, 3, 5)):
        idx = offsets[seq_convs] + off
        tools[idx] = ("search", "code_exec", "send_email")[step]
        roles[idx] = "tool"

    # per-conversation monotone timestamps: global cumsum of gaps minus the
    # cumsum at each conversation's start, plus a staggered start epoch
    gaps = rng.integers(1, 90, size=total).astype("int64")
    cs = np.cumsum(gaps)
    conv_base = cs[offsets] - gaps[offsets]  # cumsum before each conv's first row
    starts = BASE_EPOCH + rng.integers(0, 86400, size=n_convs).astype("int64")
    ts = cs - np.repeat(conv_base, sizes) + np.repeat(starts, sizes)
    # inject bounded lateness
    late = rng.random(total) < late_fraction
    ts[late] -= 120

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts.astype(str),
            "tool": tools,
            "ts": pd.to_datetime(ts, unit="s"),
        }
    )


def generate_transcripts(spark, n_convs: int = 200, seed: int = 42, **kw):
    pdf = transcripts_pdf(n_convs=n_convs, seed=seed, **kw)
    return spark.createDataFrame(pdf)
