"""Round-4 regression tests for the ADVICE r3 defect list: caps metrics
on empty relations, the 63-hyperplane bit-packing limit, and the
knn_join guard's minimal-projection probe."""

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_caps_observation_zero_on_empty_buckets(spark):
    """ADVICE r3: bare F.sum over an EMPTY buckets relation yields NULL,
    breaking the documented 'zero means exact' contract. The metrics
    must coalesce to 0."""
    from osprey_spark.operators.dedup import minhash_lsh_pairs

    # fully dissimilar docs → no LSH bucket ever holds 2 members → the
    # buckets relation the caps metrics observe is empty
    docs = spark.createDataFrame(
        [(i, f"totally unrelated document number {i} " + "zq" * i) for i in range(6)],
        "doc_id long, text string",
    )
    obs = Observation()
    out = minhash_lsh_pairs(docs, caps_observation=obs)
    assert out.count() == 0
    assert obs.get["dropped_buckets"] == 0  # not None
    assert obs.get["dropped_bucket_rows"] == 0


def test_capped_shingles_zero_on_empty_dfreq(spark):
    """Runtime-empty dfreq relation (texts too short to shingle — the
    scan is non-empty so Catalyst can't prune the CollectMetrics node,
    unlike a statically-empty DataFrame) must observe 0, not NULL."""
    from osprey_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "ab"), (2, "cd")], "doc_id long, text string"
    )
    obs = Observation()
    out = ngram_jaccard_pairs(docs, shingle_k=3, max_doc_freq=5, caps_observation=obs)
    assert out.count() == 0
    assert obs.get["capped_shingles"] == 0  # not None


def test_signbits_rejects_over_63_planes(spark):
    """ADVICE r3: 64+ hyperplanes silently wrap the uint64 weight shift
    and int64 cast, desyncing packed bits from Python-side query bits —
    must fail loud instead."""
    from osprey_spark.operators.similarity import hyperplane_bucket, signbits_udf

    with pytest.raises(ValueError, match="63"):
        signbits_udf([[0.0] * 8] * 64)
    with pytest.raises(ValueError, match="63"):
        hyperplane_bucket(F.col("embedding"), num_hyperplanes=64, dim=8)
    # 63 is fine
    signbits_udf([[0.0] * 8] * 63)


def test_knn_guard_probe_prunes_query_plan(spark):
    """ADVICE r3: the broadcast guard's eager count must run on a
    minimal id-only projection — an expensive embedding-producing UDF
    upstream of the query side must NOT execute during the probe."""
    import pandas as pd

    from osprey_spark.operators.similarity import knn_join

    calls = spark.sparkContext.accumulator(0)

    @F.pandas_udf("array<float>")
    def expensive_embed(ids: pd.Series) -> pd.Series:
        calls.add(len(ids))
        return pd.Series([[1.0, 0.0]] * len(ids))

    base = spark.range(10).select(F.col("id").alias("vec_id"))
    queries = base.withColumn("embedding", expensive_embed("vec_id"))
    vectors = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    # cap below the query count → the guard raises BEFORE the join runs;
    # the probe's id-only projection must have pruned the embedding UDF
    with pytest.raises(ValueError, match="max_query_rows"):
        knn_join(vectors, queries, k=1, max_query_rows=5)
    assert calls.value == 0
