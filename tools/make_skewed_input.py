"""Build the Zipf-skewed full-stack input: same rows as the uniform
scaling input, but a deterministic ~10% of ALL turns re-keyed onto ONE
hot conversation (plus the existing Zipf-ish tail) — the hot-key shape
that breaks naive per-key stateful pipelines at 10^12-turn scale.

Text/ts/tool stay byte-identical to the uniform copy, so a skewed-vs-
uniform bench pair isolates the KEY DISTRIBUTION as the only variable.
turn_idx is re-sequenced within the hot conversation (row_number over
ts) so per-conv ordering invariants hold.

Usage: python tools/make_skewed_input.py [n_convs] [hot_tenths]
Writes {uniform_input}_skew and prints the hot-conv share.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import _GEN, INPUT_BASE  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    hot_tenths = int(sys.argv[2]) if len(sys.argv) > 2 else 1  # 1 → 10%
    uniform = f"{INPUT_BASE}_{n_convs}"
    out = f"{uniform}_skew"
    if not os.path.exists(os.path.join(uniform, "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c", _GEN.format(repo=REPO, input_dir=uniform), str(n_convs)],
            capture_output=True, text=True, timeout=1800, check=True,
        )

    sys.path.insert(0, REPO)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from osprey_spark.session import get_spark

    spark = get_spark(cores=32, app_name="make_skew", shuffle_partitions=64)
    df = spark.read.parquet(uniform)
    hot = F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(10)) < hot_tenths
    skewed = df.withColumn(
        "conv_id", F.when(hot, F.lit("conv_hot")).otherwise(F.col("conv_id"))
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    skewed = skewed.withColumn(
        "turn_idx",
        F.when(F.col("conv_id") == "conv_hot", F.row_number().over(w) - 1).otherwise(
            F.col("turn_idx")
        ),
    )
    skewed.repartition(64).write.mode("overwrite").parquet(out)
    total = spark.read.parquet(out).count()
    hot_n = spark.read.parquet(out).filter(F.col("conv_id") == "conv_hot").count()
    print(f"wrote {out}: {total:,} rows, hot conv holds {hot_n:,} ({hot_n/total:.1%})")


if __name__ == "__main__":
    main()
