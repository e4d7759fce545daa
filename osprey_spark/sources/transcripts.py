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

    conv_ids = np.repeat([f"conv_{i:08d}" for i in range(n_convs)], sizes)
    turn_idx = np.concatenate([np.arange(s) for s in sizes]).astype("int32")
    roles = np.array(ROLES)[(turn_idx % 3)]

    tool_draw = rng.integers(0, len(TOOLS), size=total)
    tools = np.array(TOOLS)[tool_draw]
    tools = np.where(roles == "tool", tools, "")

    word_idx = rng.integers(0, len(_VOCAB), size=(total, 8))
    texts = np.array([" ".join(_VOCAB[j] for j in row) for row in word_idx], dtype=object)

    # plant trigger phrases deterministically: every 13th row gets a trigger
    trig_rows = np.arange(0, total, 13)
    for k, r in enumerate(trig_rows):
        texts[r] = texts[r] + " " + _TRIGGERS[k % len(_TRIGGERS)]

    # plant an ordered tool-abuse sequence in every 10th conversation
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    for ci in range(0, n_convs, 10):
        if sizes[ci] >= 6:
            base = offsets[ci]
            tools[base + 1] = "search"
            tools[base + 3] = "code_exec"
            tools[base + 5] = "send_email"
            roles[base + 1] = roles[base + 3] = roles[base + 5] = "tool"

    # per-conversation monotone timestamps with 1-90s gaps; conversations
    # start at staggered offsets
    gaps = rng.integers(1, 90, size=total).astype("int64")
    ts = np.empty(total, dtype="int64")
    for ci in range(n_convs):
        s, e = offsets[ci], offsets[ci] + sizes[ci]
        start = BASE_EPOCH + int(rng.integers(0, 86400))
        ts[s:e] = start + np.cumsum(gaps[s:e])
    # inject bounded lateness: swap a small fraction of adjacent rows' ts
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
