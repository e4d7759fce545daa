"""Spark-native deterministic transcript generator for large inputs.

The pandas generator (transcripts.py) is fine up to ~10^6 rows; bench
and scaling runs need 10^7+ rows, generated distributed: ``spark.range``
over conversations → explode a per-conversation turn sequence → all
attributes derived from ``xxhash64`` of (conv, turn, salt) — pure Column
expressions, no driver-side data, deterministic for a given seed.

Shape matches FIXTURES.md F1 / BASELINE input_hint: Zipf-ish
conversation sizes (Pareto inverse-CDF on a uniform hash), roles cycling
user/assistant/tool, planted trigger phrases every ~13th turn, planted
ordered tool sequences in every 10th conversation, monotone per-conv
timestamps with bounded out-of-order rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from osprey_spark.sources.transcripts import BASE_EPOCH, ROLES, TOOLS, _TRIGGERS, _VOCAB


def _u(seed_cols: list[Column], salt: int) -> Column:
    """Uniform [0,1) from xxhash64."""
    h = F.xxhash64(*seed_cols, F.lit(salt))
    return (F.pmod(h, F.lit(1 << 40))).cast("double") / float(1 << 40)


def generate_transcripts_df(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    zipf_alpha: float = 1.5,
    max_turns: int = 400,
    avg_gap_seconds: int = 45,
    late_fraction: float = 0.02,
) -> DataFrame:
    conv = spark.range(n_convs).select(F.col("id").alias("cid"))
    cseed = [F.col("cid"), F.lit(seed)]
    # Pareto inverse CDF ~ Zipf tail: size = 2 + u^(-1/(alpha-1)), clipped
    u = _u(cseed, 1)
    # clamp in double space BEFORE the int cast (the Pareto tail overflows int)
    size = (
        F.least(
            F.lit(2.0) + F.pow(F.lit(1.0) - u, F.lit(-1.0 / (zipf_alpha - 1.0))),
            F.lit(float(max_turns)),
        )
    ).cast("int")
    conv = conv.select(
        "cid",
        F.format_string("conv_%08d", F.col("cid")).alias("conv_id"),
        size.alias("n_turns"),
        (F.lit(BASE_EPOCH) + F.pmod(F.xxhash64(*cseed, F.lit(2)), F.lit(86400))).alias("start_epoch"),
    )
    turns = conv.select(
        "cid", "conv_id", "start_epoch",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    tseed = [F.col("cid"), F.col("turn_idx"), F.lit(seed)]
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), F.pmod(F.col("turn_idx"), F.lit(3)).cast("int") + 1
    )
    tool_rand = F.element_at(
        F.array(*[F.lit(t) for t in TOOLS]),
        F.pmod(F.xxhash64(*tseed, F.lit(3)), F.lit(len(TOOLS))).cast("int") + 1,
    )
    # planted ordered sequence in every 10th conversation at turns 1/3/5
    planted = (F.pmod(F.col("cid"), F.lit(10)) == 0) & (F.col("turn_idx").isin(1, 3, 5))
    planted_tool = (
        F.when(F.col("turn_idx") == 1, F.lit("search"))
        .when(F.col("turn_idx") == 3, F.lit("code_exec"))
        .otherwise(F.lit("send_email"))
    )
    role = F.when(planted, F.lit("tool")).otherwise(role)
    tool = F.when(planted, planted_tool).otherwise(
        F.when(role == "tool", tool_rand).otherwise(F.lit(""))
    )

    # text: 8 vocab words picked by hash + trigger every 13th turn
    words = F.concat_ws(
        " ",
        *[
            F.element_at(
                F.array(*[F.lit(w) for w in _VOCAB]),
                F.pmod(F.xxhash64(*tseed, F.lit(10 + i)), F.lit(len(_VOCAB))).cast("int") + 1,
            )
            for i in range(8)
        ],
    )
    trig_idx = F.pmod(F.xxhash64(*tseed, F.lit(20)), F.lit(len(_TRIGGERS))).cast("int") + 1
    trigger = F.element_at(F.array(*[F.lit(t) for t in _TRIGGERS]), trig_idx)
    is_trig = F.pmod(F.xxhash64(*tseed, F.lit(21)), F.lit(13)) == 0
    text = F.when(is_trig, F.concat_ws(" ", words, trigger)).otherwise(words)

    # monotone per-conv ts: fixed stride + sub-stride jitter (< stride)
    jitter = F.pmod(F.xxhash64(*tseed, F.lit(30)), F.lit(avg_gap_seconds))
    epoch = F.col("start_epoch") + F.col("turn_idx").cast("long") * avg_gap_seconds + jitter
    late = _u(tseed, 31) < late_fraction
    epoch = F.when(late, epoch - 120).otherwise(epoch)

    return turns.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(epoch).alias("ts"),
    )


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_convs: int,
    seed: int = 42,
    partitions: int | None = None,
) -> int:
    df = generate_transcripts_df(spark, n_convs, seed=seed)
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()
