"""Scale-fix behavior tests for the dedup/similarity operators:
document-frequency cap on the Jaccard posting join, multi-band
embedding LSH recall, uniform (not first-partition) IVF centroid
sampling on a partition-skewed table."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_ngram_cap_noop_below_threshold(spark):
    """With no shingle above the cap, capped output == uncapped output."""
    from osprey_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        (2, "one two three four five six"),
        (3, "one two three four five seven"),
        (4, "totally different words here now ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3, max_doc_freq=None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3, max_doc_freq=100).collect()
    }
    assert uncapped == capped
    assert (0, 1) in capped and (2, 3) in capped


def test_ngram_cap_drops_stop_shingle(spark):
    """A shingle in more docs than the cap is excluded from postings:
    docs that ONLY share the stop-shingle stop pairing."""
    from osprey_spark.operators.dedup import ngram_jaccard_pairs

    # 20 docs all ending with the same phrase; otherwise disjoint
    rows = [(i, f"u{i}a u{i}b u{i}c u{i}d the end marker") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: every pair shares 2 shingles ("the end", "end marker")
    n_uncapped = ngram_jaccard_pairs(df, threshold=0.01, max_doc_freq=None).count()
    assert n_uncapped == 20 * 19 // 2
    # capped at 10 (< 20 docs): the stop shingles drop out → no pairs
    n_capped = ngram_jaccard_pairs(df, threshold=0.01, max_doc_freq=10).count()
    assert n_capped == 0


def test_embedding_multiband_recall(spark):
    """Multi-band sign-LSH finds planted near-duplicate vector pairs and
    only emits pairs meeting the exact cosine threshold."""
    from osprey_spark.operators.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # plant a near-duplicate of each: tiny perturbation → cosine ≈ 1
        rows.append((1000 + i, [float(x) for x in v + 0.01 * rng.standard_normal(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_dup_pairs(
        df, cosine_threshold=0.98, num_hyperplanes=16, bands=4, dim=16
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, 1000 + i) for i in range(40)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9
    assert all(r["cosine"] >= 0.98 for r in pairs)


def test_ivf_uniform_sampling_on_skewed_partitions(spark):
    """Centroids must train on a uniform sample: build a table whose
    FIRST partitions contain only cluster A (limit() would train on A
    alone); IVF recall@20 for a cluster-B query must still be ≥ 0.9."""
    from osprey_spark.operators.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(11)
    center_a = rng.standard_normal(16) * 0.1 + 5.0
    center_b = rng.standard_normal(16) * 0.1 - 5.0
    a = [(i, [float(x) for x in center_a + 0.3 * rng.standard_normal(16)]) for i in range(1500)]
    b = [(2000 + i, [float(x) for x in center_b + 0.3 * rng.standard_normal(16)]) for i in range(1500)]
    # partition-skew: all of A first (one partition), then all of B
    df_a = spark.createDataFrame(a, "vec_id long, embedding array<double>").coalesce(1)
    df_b = spark.createDataFrame(b, "vec_id long, embedding array<double>").coalesce(1)
    df = df_a.union(df_b)

    query = [float(x) for x in center_b]
    exact = {r["vec_id"] for r in cosine_topk(df, query, k=20).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk(df, query, k=20, n_clusters=4, n_probe=1, seed=3).collect()
    }
    assert len(approx & exact) >= 18  # recall@20 ≥ 0.9
