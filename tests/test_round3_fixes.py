"""Round-3 fixes, each pinned by a regression test:

- minhash verification is candidate-sized (ONE full-corpus shingle pass,
  proven with an accumulator, immune to host noise),
- escalation sessions sort across ALL Arrow chunks of a key in a batch,
- LSH bucket caps and the ngram df-cap are observable / opt-in,
- expire_snapshots survives a stale manifest with no published pointer,
- a non-unique label_state no longer fans out event rows.
"""

import datetime

import pandas as pd
import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- minhash


def _counting_shingle_udf(acc, k=3):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def counting(norm: pd.Series) -> pd.Series:
        acc.add(len(norm))
        out = []
        for t in norm:
            w = t.split(" ") if t else [""]
            if len(w) >= k:
                out.append(
                    list(dict.fromkeys(" ".join(w[i : i + k]) for i in range(len(w) - k + 1)))
                )
            else:
                out.append([" ".join(w)])
        return pd.Series(out)

    return counting.asNondeterministic()


def test_minhash_verify_is_candidate_sized(spark):
    """The round-2 verify stage re-evaluated the shingle UDF over the
    FULL corpus twice more (3 passes total). Count actual UDF input rows
    with an accumulator: must be ≤ 1 corpus pass + 2 candidate-sized
    passes — i.e. well under 2 corpus passes."""
    import osprey_spark.operators.textstats as ts

    acc = spark.sparkContext.accumulator(0)
    saved = ts._SHINGLE_UDFS.pop(3, None)
    ts._SHINGLE_UDFS[3] = _counting_shingle_udf(acc)
    try:
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["dedup_minhash_lsh"](spark, SF)
        n_pairs = df.count()
        docs = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert n_pairs > 0
        # 1 full pass + 2 * (candidate ids) — candidates are ≤ 2*pairs*2
        assert acc.value <= docs + 4 * n_pairs + 32, (
            f"shingle UDF ran over {acc.value} rows for a {docs}-doc corpus "
            f"({acc.value / docs:.2f} passes) — verify stage is not candidate-sized"
        )
    finally:
        ts._SHINGLE_UDFS.pop(3, None)
        if saved is not None:
            ts._SHINGLE_UDFS[3] = saved


def test_ngram_uncapped_is_single_pass_at_scale_shape(spark):
    """With shuffle joins (the 100-TB shape — AQE only broadcasts at toy
    scale), the uncapped exact-Jaccard operator evaluates the shingle UDF
    exactly once over the corpus: set size rides along the explode and
    the l/r self-join reuses one g-exchange."""
    import osprey_spark.operators.textstats as ts
    from osprey_spark.operators.dedup import ngram_jaccard_pairs

    acc = spark.sparkContext.accumulator(0)
    saved = ts._SHINGLE_UDFS.pop(3, None)
    ts._SHINGLE_UDFS[3] = _counting_shingle_udf(acc)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n_docs = docs.count()
        ngram_jaccard_pairs(docs, threshold=0.4).count()
        assert acc.value == n_docs, (
            f"shingle UDF ran {acc.value / n_docs:.2f} corpus passes (expected 1)"
        )
    finally:
        ts._SHINGLE_UDFS.pop(3, None)
        if saved is not None:
            ts._SHINGLE_UDFS[3] = saved
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


# --------------------------------------------------- escalation chunk order


def test_escalation_sorts_across_chunks():
    """applyInPandasWithState gives no cross-chunk ordering for a key:
    events split out-of-order across chunks in ONE batch must still be
    processed in event-time order (session_start = earliest, escalation
    at the crossing turn)."""
    from osprey_spark.streaming.escalation_state import _make_escalation_fn

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutTimestamp(self, ms):
            pass

        def getCurrentWatermarkMs(self):
            return 0

    def chunk(ts_list, trig_list):
        return pd.DataFrame(
            {
                "ts": [pd.Timestamp(2024, 1, 1, 0, 0, s) for s in ts_list],
                "is_trigger": trig_list,
            }
        )

    fn = _make_escalation_fn(gap_seconds=5.0, min_triggers=2)
    state = FakeState()
    # one micro-batch, two chunks, LATER event in the first chunk
    out = pd.concat(
        list(fn(("c",), iter([chunk([3], [True]), chunk([0], [True])]), state))
    )
    assert len(out) == 1
    assert out.iloc[0]["session_start"] == pd.Timestamp(2024, 1, 1, 0, 0, 0)
    assert out.iloc[0]["escalated_at"] == pd.Timestamp(2024, 1, 1, 0, 0, 3)


# ------------------------------------------------------------- cap signals


def test_bucket_cap_reports_drops(spark):
    from osprey_spark.operators.dedup import _bucket_pairs

    rows = [(i, 0, 7) for i in range(5)] + [(10, 0, 8), (11, 0, 8)]
    banded = spark.createDataFrame(rows, "doc_id long, band int, bh long")
    obs = Observation("caps")
    pairs = _bucket_pairs(banded, "doc_id", max_bucket_size=3, caps_observation=obs)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(10, 11)}  # the size-5 bucket was dropped
    assert obs.get["dropped_buckets"] == 1
    assert obs.get["dropped_bucket_rows"] == 5


def test_bucket_cap_zero_drops_means_exact(spark):
    from osprey_spark.operators.dedup import _bucket_pairs

    banded = spark.createDataFrame(
        [(1, 0, 7), (2, 0, 7)], "doc_id long, band int, bh long"
    )
    obs = Observation()
    _bucket_pairs(banded, "doc_id", max_bucket_size=3, caps_observation=obs).collect()
    assert obs.get["dropped_buckets"] == 0


def test_ngram_df_cap_is_opt_in_and_observable(spark):
    from osprey_spark.operators.dedup import ngram_jaccard_pairs

    # 4 docs sharing one hot shingle; distinct tails
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tail{i} end{i}") for i in range(4)],
        "doc_id long, text string",
    )
    exact = ngram_jaccard_pairs(docs, threshold=0.01)  # default: NO cap
    assert exact.count() == 6  # all pairs share 'alpha beta gamma'
    obs = Observation()
    capped = ngram_jaccard_pairs(
        docs, threshold=0.01, max_doc_freq=3, caps_observation=obs
    )
    assert capped.count() == 0  # the only shared shingle was capped away
    assert obs.get["capped_shingles"] == 1


# ------------------------------------------------------- state-store guard


def test_expire_snapshots_with_stale_manifest_no_pointer(tmp_path):
    from osprey_spark.streaming.state_store import HashPartitionedStateStore

    store = HashPartitionedStateStore(
        str(tmp_path / "st"), key_cols=["k"], schema="k string, v long"
    )
    # crash between manifest write and pointer publish on the first merge
    with open(store._manifest_file(0), "w") as f:
        f.write("{}")
    assert store.current_version() == -1
    assert store.expire_snapshots(keep_versions=2) == 0  # no ValueError


# ------------------------------------------------ label-state fanout guard


def test_non_unique_label_state_does_not_fan_out(spark):
    from osprey_spark.sml.compiler import RulesetCompiler

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    h = datetime.timedelta(hours=1)
    state = spark.createDataFrame(
        [
            # TWO rows for the same (User, u1, bad) key — e.g. per-reason
            ("User", "u1", "bad", 0, t0 - 3 * h, None, None),
            ("User", "u1", "bad", 1, t0 - 1 * h, None, None),  # latest: added
        ],
        "entity_type string, entity_id string, label_name string, "
        "status int, created_at timestamp, expires_ts timestamp, apply_at timestamp",
    )
    events = spark.createDataFrame(
        [("u1", "evt", t0), ("u2", "evt", t0)], "uid string, action_name string, ts timestamp"
    )
    plan = RulesetCompiler(
        {
            "main.sml": """
U: Entity[str] = EntityJson(type='User', path='$.uid')
Bad = HasLabel(entity=U, label='bad')
"""
        },
        input_schema=events.schema,
        action_name_col="action_name",
    ).compile()
    out = plan.apply(events, passthrough=["uid"], label_state=state)
    rows = {r["uid"]: r["Bad"] for r in out.collect()}
    assert out.count() == 2  # no fanout despite the duplicate key
    assert rows["u1"] is True  # latest created_at row (added) wins
    assert rows["u2"] is False


# --------------------------------------------------------- kNN broadcast guard


def test_knn_join_rejects_oversized_query_side(spark):
    from osprey_spark.operators.similarity import knn_join

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        knn_join(vecs, vecs, k=2, max_query_rows=5)
    # under the limit: works; explicit None skips the guard entirely
    assert knn_join(vecs, vecs.limit(3), k=2).count() == 6
    assert knn_join(vecs, vecs.limit(3), k=2, max_query_rows=None).count() == 6
