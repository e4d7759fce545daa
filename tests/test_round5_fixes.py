"""Round-5 hardening: the incrementally-maintained resolved snapshot
cache (HasLabel reads stop re-running MOR resolution every batch) and
manifest-carried size statistics (no per-batch filesystem walk)."""

import datetime

from pyspark.sql import functions as F

from osprey_spark.streaming.label_state import LabelStateStore
from osprey_spark.streaming.state_store import HashPartitionedStateStore

T0 = datetime.datetime(2024, 1, 1)
MSCHEMA = (
    "entity_type string, entity_id string, label_name string, "
    "status int, event_ts timestamp, expires_ts timestamp"
)


def _muts(spark, ids, status=1, label="bad"):
    return spark.createDataFrame(
        [("User", f"u{i}", label, status, T0, None) for i in ids], MSCHEMA
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_snapshot_cache_matches_scan_across_merges_and_compaction(spark, tmp_path):
    """Two handles over the SAME store directory — one serving reads from
    the incrementally-maintained resolved snapshot, one from the plain
    MOR scan — must agree after every batch, through delta growth, lazy
    compaction, and manual-override conflicts."""
    path = str(tmp_path / "labels")
    cached = LabelStateStore(path, num_partitions=4, max_delta_files=3, snapshot_cache=True)
    plain = LabelStateStore(path, num_partitions=4, max_delta_files=3)
    for b in range(10):
        # overlapping keys: re-labels u0..u9 every batch (dense per-key
        # history → resolution matters), plus 10 new keys
        ids = list(range(10)) + list(range(10 + b * 10, 20 + b * 10))
        cached.apply_mutations(_muts(spark, ids), batch_id=b)
        assert _rows(cached.read(spark)) == _rows(plain.read(spark))
    # a manual REMOVE on u0 must win over later automatic adds — through
    # the cache's incremental fold, not just a fresh resolution
    cached.apply_mutations(_muts(spark, [0], status=2), batch_id=10)
    cached.apply_mutations(_muts(spark, [0], status=1), batch_id=11)
    got = {r["entity_id"]: r["status"] for r in cached.read(spark).collect()}
    assert got["u0"] == 2  # CANNOT_OVERRIDE_MANUAL survives the fold
    assert _rows(cached.read(spark)) == _rows(plain.read(spark))
    # compaction actually fired during the run (the rebase path was exercised)
    manifest = cached.store._manifest(cached.current_version())
    assert any("x" in rels[0].split("/", 1)[0] for rels in manifest.values())


def test_snapshot_cache_sum_resolver_survives_compaction(spark, tmp_path):
    """The rebase path must DISCARD cached rows for compacted buckets —
    folding a cached sum with a compacted (already-total) file would
    double-count. Hammer one key so its bucket compacts repeatedly."""
    store = HashPartitionedStateStore(
        str(tmp_path / "s"),
        key_cols=["k"],
        schema="k string, n long",
        num_partitions=2,
        max_delta_files=2,
        resolve_fn=lambda df: df.groupBy("k").agg(F.sum("n").alias("n")),
        snapshot_cache=True,
    )
    for b in range(12):
        store.merge_append(
            spark.createDataFrame([("hot", 1), (f"k{b}", 10)], "k string, n long"),
            batch_id=b,
        )
        got = {r["k"]: r["n"] for r in store.read(spark).collect()}
        assert got["hot"] == b + 1, f"batch {b}: sum drifted (double-count?)"
    assert sum(got.values()) == 12 + 12 * 10


def test_snapshot_cache_read_has_no_resolution_aggregate(spark, tmp_path):
    """The point of the cache: a current-version read is served from the
    materialized resolved snapshot — NO aggregate (and no parquet scan)
    in the plan — where the MOR scan of the same store must aggregate."""
    path = str(tmp_path / "labels")
    cached = LabelStateStore(path, num_partitions=4, snapshot_cache=True)
    plain = LabelStateStore(path, num_partitions=4)
    for b in range(3):  # >1 delta file per bucket → MOR read must resolve
        cached.apply_mutations(_muts(spark, range(20)), batch_id=b)
    cached_plan = (
        cached.read(spark)._jdf.queryExecution().optimizedPlan().toString()
    )
    plain_plan = plain.read(spark)._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in cached_plan and "Relation" not in cached_plan
    assert "Aggregate" in plain_plan


def test_snapshot_cache_replay_read_pins_previous_version(spark, tmp_path):
    """Exactly-once replay: after batch b's state delta landed, a replayed
    read(before_batch=b) must see the PRE-b snapshot even while the cache
    holds a version — both when the cache happens to hold that older
    version (served) and when it does not (MOR-scan fallback)."""
    path = str(tmp_path / "labels")
    cached = LabelStateStore(path, num_partitions=4, snapshot_cache=True)
    plain = LabelStateStore(path, num_partitions=4)
    cached.apply_mutations(_muts(spark, range(5)), batch_id=0)
    cached.read(spark)  # cache now holds v(batch 0)
    cached.apply_mutations(_muts(spark, range(5, 9)), batch_id=1)
    # cache at old version == replay version → served from cache
    assert _rows(cached.read(spark, before_batch=1)) == _rows(
        plain.read(spark, before_batch=1)
    )
    assert cached.read(spark, before_batch=1).count() == 5
    # advance the cache to the new current, then replay again:
    # version mismatch → scan fallback, same rows
    assert cached.read(spark).count() == 9
    assert _rows(cached.read(spark, before_batch=1)) == _rows(
        plain.read(spark, before_batch=1)
    )


def test_manifest_stats_survive_and_size_query_never_walks(spark, tmp_path):
    """approx_size_bytes (the per-batch broadcast guard) must be a
    manifest lookup: stats recorded at publish, carried through
    compaction, and the query itself touches no filesystem glob."""
    import os
    from unittest import mock

    from osprey_spark.streaming import state_store as ss

    store = LabelStateStore(str(tmp_path / "labels"), num_partitions=4, max_delta_files=3)
    for b in range(8):  # trips compaction (max_delta_files=3)
        store.apply_mutations(_muts(spark, range(b * 10, b * 10 + 10)), batch_id=b)
    doc = store.store._load_manifest(store.current_version())
    live = {rel for rels in doc["buckets"].values() for rel in rels}
    assert set(doc["stats"]) == live  # every live rel has stats, no dead ones
    # stats match the actual files on disk
    for rel, (rows, size) in doc["stats"].items():
        d = os.path.join(store.path, rel)
        files = [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]
        assert size == sum(os.path.getsize(f) for f in files)
    expect = sum(s[1] for s in doc["stats"].values())
    with mock.patch.object(ss.glob, "glob", side_effect=AssertionError("fs walk!")):
        assert store.approx_size_bytes() == expect
        assert isinstance(store.broadcastable(), bool)


def test_crash_between_concurrent_state_merges_replays_exactly_once(spark, tmp_path):
    """Round-5 overlaps the label and verdict merges within a batch; a
    crash AFTER one store applied but BEFORE the other (and before the
    sink marker) must replay into: already-applied merge skipped
    (idempotent batch_id), missing merge applied, sink row counts exact —
    and HasLabel must still see the PRE-batch label snapshot on replay."""
    import datetime

    from pyspark.sql import functions as F

    from osprey_spark.streaming.pipeline import RuleStreamPipeline

    RULES = {
        "main.sml": """
ConvId: Entity[str] = EntityJson(type='Conversation', path='$.conv_id')
Text: str = JsonData(path='$.text')
Flagged = HasLabel(entity=ConvId, label='flagged')
Hello = Rule(when_all=[TextContains(text=Text, phrase='hello')], description='d')
Repeat = Rule(when_all=[Hello, Flagged], description='r')
WhenRules(rules_any=[Hello], then=[DeclareVerdict(verdict='flag'), LabelAdd(entity=ConvId, label='flagged')])
WhenRules(rules_any=[Repeat], then=[DeclareVerdict(verdict='repeat')])
"""
    }
    TS = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    t0 = datetime.datetime(2024, 1, 1)
    pipe = RuleStreamPipeline(
        spark, RULES, str(tmp_path / "p"), track_verdict_state=True
    )

    def batch(b):
        rows = [
            (f"c{i}", b, "user", "hello" if i % 2 == 0 else "ok", "",
             t0 + datetime.timedelta(minutes=b))
            for i in range(4)
        ]
        return spark.createDataFrame(rows, TS)

    pipe.process_batch(batch(0), 0)

    # crash batch 1 after the LABEL merge landed but before the VERDICT
    # merge (the concurrent window) — and before the sink marker
    orig = pipe._update_verdict_state
    calls = {"n": 0}

    def boom(out, bid):
        if bid == 1 and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("injected crash between state merges")
        return orig(out, bid)

    pipe._update_verdict_state = boom
    import pytest

    with pytest.raises(RuntimeError, match="injected crash"):
        pipe.process_batch(batch(1), 1)
    assert pipe.labels.store.last_batch_id() == 1  # label merge DID land
    assert pipe.verdict_state.last_batch_id() == 0  # verdict merge did NOT
    assert not pipe.sink.is_committed(1)

    pipe.process_batch(batch(1), 1)  # replay
    pipe.process_batch(batch(2), 2)

    res = pipe.results()
    assert res.count() == 12  # 3 batches x 4 rows, no duplicates
    # repeat fires for hello-convs in batches 1 and 2 only (reads the
    # PRE-batch snapshot even on the replay whose labels already landed)
    n_repeat = res.filter(F.array_contains("__verdicts", "repeat")).count()
    assert n_repeat == 4
    # verdict counts: hello-convs emitted 1 (b0) + 2 (b1) verdicts -> rows
    # of batch 2 see exactly 3 priors; double-applied state would show more
    got = {
        (r["conv_id"], r["turn_idx"]): r["prior_verdict_count"]
        for r in res.collect()
    }
    assert got[("c0", 2)] == 3 and got[("c0", 1)] == 1 and got[("c2", 2)] == 3
    assert got[("c1", 2)] == 0


def test_label_store_matches_sequential_reference_fold_property(spark, tmp_path):
    """Property check: for RANDOM mutation sequences, the MOR store's
    resolved snapshot (delta appends + associative resolver + whatever
    compaction happened to fire) must equal a pure-Python sequential fold
    of the reference's conflict rules (osprey_shared/labels.py):
    within a batch the higher (status, event_ts) wins per key; across
    batches an automatic mutation cannot override a standing manual
    status. Randomness is seeded — failures reproduce."""
    import itertools
    import random

    rnd = random.Random(20260817)
    m = datetime.timedelta(minutes=1)
    for case, max_delta in [(0, 1), (1, 2), (2, 99)]:
        # small alphabet → dense conflicts; max_delta 1/2 force heavy
        # compaction so the associative fold is exercised over many
        # prefix shapes
        store = LabelStateStore(
            str(tmp_path / f"labels_{case}"),
            num_partitions=2,
            max_delta_files=max_delta,
        )
        state: dict[tuple, tuple] = {}  # key -> (status, created_at)
        counter = itertools.count()
        for b in range(6):
            batch = [
                (
                    "User",
                    f"u{rnd.randrange(3)}",
                    f"l{rnd.randrange(2)}",
                    rnd.randrange(4),
                    T0 + next(counter) * m,
                    None,
                )
                for _ in range(rnd.randrange(1, 6))
            ]
            store.apply_mutations(
                spark.createDataFrame(batch, MSCHEMA), batch_id=b
            )
            # reference fold: in-batch winner = max (status, event_ts);
            # cross-batch: manual state only yields to manual mutations
            winners: dict[tuple, tuple] = {}
            for et, eid, lbl, st, ts, _ in batch:
                k = (et, eid, lbl)
                w = winners.get(k)
                if w is None or (st, ts) > (w[0], w[1]):
                    winners[k] = (st, ts)
            for k, (st, ts) in winners.items():
                cur = state.get(k)
                if cur is not None and cur[0] in (2, 3) and st not in (2, 3):
                    continue  # CANNOT_OVERRIDE_MANUAL
                state[k] = (st, ts)
        got = {
            (r["entity_type"], r["entity_id"], r["label_name"]): (
                r["status"],
                r["created_at"],
            )
            for r in store.read(spark).collect()
        }
        assert got == state, f"case {case} (max_delta_files={max_delta})"


def test_mx_lookup_stub_contract(spark):
    """MXLookup is a documented stub (live DNS out of scope, SURVEY
    §2.C): it must compile, type as an optional string, return null for
    every row, and compose with ResolveOptional's default arm — the
    contract a caller relies on until a resolver plugin lands."""
    from osprey_spark.sml import RulesetCompiler

    df = spark.createDataFrame([("e1", "example.com")], "event_id string, props string")
    sml = {
        "main.sml": """
Domain: str = JsonData(path='$.props')
Mx = MXLookup(domain=Domain)
MxOr = ResolveOptional(value=Mx, default='none')
"""
    }
    import datetime

    df = df.withColumn("ts", F.lit(datetime.datetime(2024, 1, 1)))
    plan = RulesetCompiler(
        sml, input_schema=df.schema, action_name_col="event_id", timestamp_col="ts"
    ).compile()
    row = plan.apply(df, passthrough=["event_id"]).collect()[0]
    assert row["Mx"] is None and row["MxOr"] == "none"


def test_console_sink_prints_batch(spark, tmp_path, capsys):
    """The StdoutOutputSink analog (`console=True`): each committed batch
    is shown on stdout alongside the durable sink — the debugging tee the
    reference's stdout sink provides."""
    import datetime

    from osprey_spark.streaming.pipeline import RuleStreamPipeline

    RULES = {
        "main.sml": """
Text: str = JsonData(path='$.text')
R = Rule(when_all=[TextContains(text=Text, phrase='hello')], description='d')
WhenRules(rules_any=[R], then=[DeclareVerdict(verdict='flag')])
"""
    }
    TS = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    pipe = RuleStreamPipeline(spark, RULES, str(tmp_path / "p"), console=True)
    pipe.process_batch(
        spark.createDataFrame(
            [("c0", 0, "user", "hello world", "", datetime.datetime(2024, 1, 1))], TS
        ),
        0,
    )
    printed = capsys.readouterr().out
    assert "__verdicts" in printed and "hello world" in printed
    assert pipe.results().count() == 1  # the durable sink still committed
