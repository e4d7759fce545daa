"""Hot-key skew evidence: one conversation holding ~50% of all turns.

Compares the plain tumbling count (one reducer owns the hot key) against
the salted two-stage aggregation (`velocity.two_stage_count`) on the same
skewed input — the BASELINE's "salted repartitioning to defuse
hot-conversation skew". Results are asserted identical; timings appended
to BENCH.md.

Usage: python tools/skew_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from pyspark.sql import functions as F

    from osprey_spark.session import get_spark
    from osprey_spark.operators.velocity import tumbling_counts, two_stage_count

    spark = get_spark(cores=32, shuffle_partitions=32)
    # half the rows in one hot conversation, rest spread over 100k keys
    df = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("conv_hot"))
            .otherwise(F.concat(F.lit("conv_"), (F.col("id") % 100_000).cast("string")))
            .alias("conv_id"),
            F.timestamp_seconds(F.lit(1704067200) + (F.col("id") % 864000)).alias("ts"),
        )
        .repartition(64)
    )
    df.write.mode("overwrite").parquet("/tmp/skew_bench_input")
    df = spark.read.parquet("/tmp/skew_bench_input")

    def timed(fn):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return best

    plain = timed(lambda: tumbling_counts(df, "conv_id", "1 hour"))
    salted = timed(lambda: two_stage_count(df, "conv_id", "1 hour", salt_buckets=32))

    a = tumbling_counts(df, "conv_id", "1 hour")
    b = two_stage_count(df, "conv_id", "1 hour", salt_buckets=32)
    mismatch = a.join(b, ["conv_id", "window_start"]).filter(a["n"] != b["n"]).count()

    summary = {
        "rows": n_rows,
        "hot_key_share": 0.5,
        "plain_groupby_sec": round(plain, 2),
        "salted_two_stage_sec": round(salted, 2),
        "speedup": round(plain / salted, 2),
        "results_identical": mismatch == 0,
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            "\n## Skew microbench (appended by tools/skew_bench.py)\n\n"
            f"| plain groupBy | {plain:.2f}s | salted two-stage | {salted:.2f}s | "
            f"identical: {mismatch == 0} |\n\n"
            "For algebraic aggregates map-side partial aggregation already\n"
            "defuses the hot key; salting is for holistic/stateful paths.\n"
        )


if __name__ == "__main__":
    main()
