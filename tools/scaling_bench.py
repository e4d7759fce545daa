"""Scaling-efficiency evidence for the north rule: run the identical
rule-evaluation job on the identical input at two local parallelism
levels (N and 4N cores) and report sustained turns/sec at each plus
``efficiency = T(4N) / (4 * T(N))``.

No real cluster exists in this sandbox (BASELINE.md): local[k] is the
sanctioned stand-in. Each level runs in a fresh JVM (spawned
subprocess) so executor-thread pools don't leak between measurements.

Usage: python tools/scaling_bench.py [n_small] [n_large] [sf_dir]
Writes BENCH.md with the table and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from osprey_spark.session import get_spark
import __spark_entry__ as entry_mod

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
runs = int(sys.argv[3])

spark = get_spark(cores=cores, app_name=f"scaling_{{cores}}", shuffle_partitions=cores)
fn = entry_mod.queries()["rule_eval"]
# warm: JVM, parquet footers, plan compilation
n = fn(spark, sf_dir).count()
best = None
for _ in range(runs):
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cores": cores, "rows": n, "sec": best, "rows_per_sec": n / best}}))
"""


def run_level(cores: int, sf_dir: str, runs: int = 3) -> dict:
    script = _WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), sf_dir, str(runs)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    small = run_level(n_small, sf_dir)
    large = run_level(n_large, sf_dir)
    ratio = n_large / n_small
    efficiency = (large["rows_per_sec"] / small["rows_per_sec"]) / ratio
    summary = {
        "input_rows": small["rows"],
        "sf_dir": sf_dir,
        f"local[{n_small}]_rows_per_sec": round(small["rows_per_sec"], 1),
        f"local[{n_large}]_rows_per_sec": round(large["rows_per_sec"], 1),
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(efficiency, 3),
        "meets_0.8_target": efficiency >= 0.8,
    }
    print(json.dumps(summary, indent=2))

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — throughput + scaling evidence\n\n"
            "Sustained rule-evaluation throughput (compiled SML plan, flagship\n"
            "`rule_eval` query) on identical input at two parallelism levels —\n"
            "the sandbox stand-in for the N vs 4N executor criterion\n"
            "(BASELINE.md). Best of 3 timed runs after warm-up, fresh JVM per level.\n\n"
            f"| level | turns/sec | wall sec (rows={small['rows']}) |\n|---|---|---|\n"
            f"| local[{n_small}] | {small['rows_per_sec']:.0f} | {small['sec']:.3f} |\n"
            f"| local[{n_large}] | {large['rows_per_sec']:.0f} | {large['sec']:.3f} |\n\n"
            f"- parallelism ratio: {ratio:.0f}x\n"
            f"- **scaling efficiency = T({n_large}) / ({ratio:.0f} x T({n_small})) = "
            f"{efficiency:.3f}**\n"
            f"- target >= 0.8: {'MET' if efficiency >= 0.8 else 'NOT MET'}\n\n"
            "Caveat: local[k] shares one JVM/driver; shuffle is in-process, so\n"
            "this measures compute scaling, not network shuffle. Input size per\n"
            "the driver's sf0.1 tables; per-core work is small at this SF, which\n"
            "understates large-level efficiency vs a real cluster at 10^12 rows.\n"
        )


if __name__ == "__main__":
    main()
