"""Sustained streaming throughput with the FULL stateful stack enabled
in one run: compiled rule plan + HasLabel state reads + label-state
MERGEs + cross-turn verdict tracking + exactly-once sink, with the
stateful escalation-sessions operator (applyInPandasWithState) running
concurrently over the same stream — the complete north-star pipeline,
not the compute kernel.

Reports sustained turns/sec (first batch excluded — JVM/codegen warmup
amortizes to zero on a long-lived stream) and the per-batch label-merge
stats, whose flatness as state accumulates across ≥8 batches is the
O(delta) evidence (a full-snapshot-rewrite store grows linearly here).

Usage: python tools/streaming_full_stack_bench.py [cores] [n_convs]
Appends to BENCH.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import _GEN, INPUT_BASE  # noqa: E402

RULES_FULL = {
    "main.sml": """
ConvId: Entity[str] = EntityJson(type='Conversation', path='$.conv_id')
Role: str = JsonData(path='$.role')
Text: str = JsonData(path='$.text')
Tool: str = JsonData(path='$.tool')
AlreadyFlagged = HasLabel(entity=ConvId, label='flagged')
SaysHello = Rule(
  when_all=[TextContains(text=Text, phrase='hello')],
  description='turn contains hello',
)
HasEmail = Rule(
  when_all=[RegexMatch(target=Text, pattern='[a-z0-9.]+@[a-z0-9.]+')],
  description='turn contains an email address',
)
RepeatOffender = Rule(
  when_all=[SaysHello, AlreadyFlagged],
  description='hello from an already-flagged conversation',
)
WhenRules(
  rules_any=[SaysHello, HasEmail],
  then=[DeclareVerdict(verdict='flag_turn'), LabelAdd(entity=ConvId, label='flagged')],
)
WhenRules(
  rules_any=[RepeatOffender],
  then=[DeclareVerdict(verdict='repeat_offender')],
)
"""
}

_WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from osprey_spark.session import get_spark
from osprey_spark.streaming.pipeline import RuleStreamPipeline
from osprey_spark.streaming.escalation_state import streaming_escalation_sessions

RULES = {rules!r}
cores = int(sys.argv[1])

spark = get_spark(cores=cores, app_name=f"full_stack_{{cores}}", shuffle_partitions=cores)
n = spark.read.parquet({input_dir!r}).count()

import os as _os0
wd = tempfile.mkdtemp(prefix=f"full_stack_{{cores}}_")
max_files = _os0.environ.get("FULL_STACK_MAX_FILES", "8")
pipe = RuleStreamPipeline(
    spark, RULES, wd,
    track_verdict_state=_os0.environ.get("FULL_STACK_VERDICT", "1") != "0",
    salt_buckets=0 if _os0.environ.get("FULL_STACK_SALT", "1") == "0" else cores,
    snapshot_cache=_os0.environ.get("FULL_STACK_SNAPSHOT_CACHE", "0") == "1",
    label_max_delta_files=int(_os0.environ.get("FULL_STACK_LABEL_MAX_DELTA", "8")),
)

def _labels_disk():
    # live file count from the manifest + total bytes actually on disk
    # (including superseded generations not yet expired) — the long-
    # horizon evidence that compaction + expiry bound both
    doc = pipe.labels.store._load_manifest(pipe.labels.current_version())
    live = sum(len(rels) for rels in doc["buckets"].values())
    total = 0
    for root, _dirs, files in _os0.walk(pipe.labels.path):
        for fn in files:
            try:
                total += _os0.path.getsize(_os0.path.join(root, fn))
            except OSError:
                pass
    return live, total

walls, merge_stats = [], []

def timed(df, bid):
    t = time.perf_counter()
    pipe.process_batch(df, bid)
    walls.append((bid, time.perf_counter() - t))
    live, disk = _labels_disk()
    merge_stats.append((bid, dict(pipe.labels.last_merge_stats,
                                  live_files=live, disk_mb=round(disk / 1e6, 1))))
    print("BATCH", bid, round(walls[-1][1], 2), "s", flush=True)

q1 = (
    spark.readStream.schema(pipe.schema)
    .option("maxFilesPerTrigger", max_files)
    .parquet({input_dir!r})
    .withWatermark("ts", "10 minutes")
    .writeStream.foreachBatch(timed)
    .option("checkpointLocation", pipe.checkpoint)
    .trigger(availableNow=True)
    .start()
)
import os as _os
q2 = None
if _os.environ.get("FULL_STACK_ESC", "1") != "0":
    esc_in = (
        spark.readStream.schema(pipe.schema)
        .option("maxFilesPerTrigger", "8")
        .parquet({input_dir!r})
        .withWatermark("ts", "30 minutes")
    )
    # candidate pre-filter (default on; FULL_STACK_ESC_PREFILTER=0 for the
    # unfiltered baseline): the cheap JVM-side index of convs with >= 1
    # trigger turn, semi-joined before the stateful operator so Python
    # group dispatch is bounded by trigger density, not conv density.
    # Exactness contract documented on streaming_escalation_sessions.
    cand = None
    if _os.environ.get("FULL_STACK_ESC_PREFILTER", "1") != "0":
        cand = (
            spark.read.parquet({input_dir!r})
            .filter(F.col("text").contains("hello"))
            .select("conv_id").distinct()
        )
    # FULL_STACK_ESC_IMPL=tws runs the transformWithStateInPandas twin
    # (RocksDB state provider) instead of applyInPandasWithState
    if _os.environ.get("FULL_STACK_ESC_IMPL", "apply") == "tws":
        from osprey_spark.streaming.escalation_tws import streaming_escalation_sessions_tws
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        esc = streaming_escalation_sessions_tws(
            esc_in, trigger=F.col("text").contains("hello"), gap_seconds=1800.0,
            min_triggers=2, candidates=cand,
        )
    else:
        esc = streaming_escalation_sessions(
            esc_in, trigger=F.col("text").contains("hello"), gap_seconds=1800.0,
            min_triggers=2, candidates=cand,
        )
    q2 = (
        esc.writeStream.format("noop")
        .option("checkpointLocation", wd + "/esc_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
t0 = time.perf_counter()
q1.awaitTermination()
if q2 is not None:
    q2.awaitTermination()
wall_both = time.perf_counter() - t0

rows_by_batch = {{m["batch_id"]: m["rows"] for m in pipe.sink.metrics()}}
total = sum(rows_by_batch.values())
assert total == n, (total, n)
tail = [(bid, w) for bid, w in walls if bid > 0]
tail_rows = sum(rows_by_batch[bid] for bid, _ in tail)
tail_sec = sum(w for _, w in tail)
# steady-state median: per-batch throughput, median over the tail — the
# noise-robust number on this host (episodic early-batch stalls inflate
# the sustained mean; see BENCH.md round-5 attribution)
import statistics
per_batch_rates = sorted(rows_by_batch[bid] / w for bid, w in tail)
steady_median = statistics.median(per_batch_rates) if per_batch_rates else 0.0
shutil.rmtree(wd, ignore_errors=True)
print(json.dumps({{
    "cores": cores, "rows": n, "batches": len(walls),
    "sustained_rows_per_sec": tail_rows / tail_sec,
    "steady_median_rows_per_sec": steady_median,
    "wall_both_queries_sec": wall_both,
    "batch_walls": [round(w, 2) for _, w in walls],
    "merge_stats": [{{"batch": bid, **st}} for bid, st in merge_stats],
}}))
"""


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    # FULL_STACK_INPUT overrides the generated input (e.g. the Zipf-skewed
    # copy tools/make_skewed_input.py writes)
    input_dir = os.environ.get("FULL_STACK_INPUT", f"{INPUT_BASE}_{n_convs}")
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c", _GEN.format(repo=REPO, input_dir=input_dir), str(n_convs)],
            capture_output=True, text=True, timeout=1800, check=True,
        )
    script = _WORKER.format(repo=REPO, rules=RULES_FULL, input_dir=input_dir)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-3000:], out.stderr[-3000:])
        raise RuntimeError("full-stack worker produced no result")
    r = json.loads(lines[-1])
    print(json.dumps(r, indent=2))

    ms = r["merge_stats"]
    appended = [m.get("rows_appended", 0) for m in ms if m["batch"] > 0]
    compacted = [m.get("rows_compacted", 0) for m in ms if m["batch"] > 0]
    stats_rows = "\n".join(
        f"| {m['batch']} | {m.get('partitions_touched', 0)} | {m.get('rows_appended', 0)} "
        f"| {m.get('buckets_compacted', 0)} | {m.get('rows_compacted', 0)} "
        f"| {m.get('live_files', '')} | {m.get('disk_mb', '')} |"
        for m in ms
    )
    # stamp the actual configuration into the section header so appended
    # runs stay self-describing (round-4 nit: a TWS run carried the
    # applyInPandasWithState boilerplate caption)
    esc_on = os.environ.get("FULL_STACK_ESC", "1") != "0"
    esc_impl = (
        "transformWithStateInPandas twin, RocksDB state provider"
        if os.environ.get("FULL_STACK_ESC_IMPL", "apply") == "tws"
        else "applyInPandasWithState"
    )
    esc_part = (
        f", with streaming escalation sessions ({esc_impl}) running concurrently "
        "on the same input"
        if esc_on
        else " (escalation query OFF for this run)"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:  # append-only
        f.write(
            "\n## Full-stack streaming run (tools/streaming_full_stack_bench.py)\n\n"
            f"local[{r['cores']}], {r['rows']:,} turns in {r['batches']} micro-batches; "
            "rule plan + HasLabel reads + merge-on-read label deltas + verdict tracking "
            f"+ exactly-once sink{esc_part}.\n\n"
            f"- sustained (batch 0 excluded): **{r['sustained_rows_per_sec']:,.0f} turns/s** "
            f"(steady-state median per-batch rate: {r.get('steady_median_rows_per_sec', 0):,.0f} turns/s)\n"
            f"- wall for BOTH queries: {r['wall_both_queries_sec']:.1f}s\n"
            f"- per-batch label write cost is the DELTA, not the flagged set: appended "
            f"min {min(appended):,} / max {max(appended):,} rows; compaction (amortized, "
            f"fires when a bucket exceeds max_delta_files) "
            f"min {min(compacted):,} / max {max(compacted):,} rows\n\n"
            "| batch | buckets touched | rows appended | buckets compacted | rows compacted | live files | labels disk MB |\n"
            "|---|---|---|---|---|---|---|\n"
            + stats_rows + "\n"
        )


if __name__ == "__main__":
    main()
