"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship metric mirrors BASELINE.json: sustained rule-evaluation
throughput (turns/sec) of the compiled SML plan — reported in
``extra.rule_eval_rows_per_sec`` alongside per-query wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "rule_eval",
    "timeseries_hourly",
    "topn_event_types",
    "distinct_users_by_type",
    "velocity_tumbling",
    "velocity_trailing",
    "sessionization",
    "cep_ordered_pattern",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_token_counts",
    "text_lang_id",
    "sim_cosine_topk",
    "sim_knn_join",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from osprey_spark.session import get_spark

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark(cores=CPUS, app_name="osprey_spark_bench", shuffle_partitions=CPUS)

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # warm the JVM + parquet footers once
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    for name in HEADLINE:
        fn = queries[name]
        best = None
        # two runs, report the min: the sandbox host has noisy neighbors
        # and a single run can catch a CPU-contention spike
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # noop sink: forces full evaluation of every output column —
            # a bare count() would let Catalyst prune the computed columns
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        if name == "rule_eval":
            n = df.count()
            extra["rule_eval_rows"] = n
            extra["rule_eval_rows_per_sec"] = round(n / best, 1)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "sum of headline query wall times (rule eval, analytics, velocity, sessions, CEP, dedup, textstats, similarity)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "extra": extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
