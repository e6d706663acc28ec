"""ANN operator tests: brute-force exactness + IVF recall vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matrixprofiler_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    srp_bucketed_candidates,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_ivf_recall_vs_bruteforce(spark, emb):
    brute = {r.q_id: r.nn_id for r in cosine_topk(emb, k=1, num_queries=20).collect()}
    approx = {r.q_id: r.nn_id for r in ivf_topk(emb, n_lists=8, nprobe=4,
                                                k=1, num_queries=20).collect()}
    assert set(approx) == set(brute)
    recall = sum(approx[q] == brute[q] for q in brute) / len(brute)
    assert recall >= 0.5, recall  # 4/8 lists probed -> decent recall


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """Probing every list is exhaustive -> identical to brute force."""
    brute = {r.q_id: r.nn_id for r in cosine_topk(emb, k=1, num_queries=10).collect()}
    full = {r.q_id: r.nn_id for r in ivf_topk(emb, n_lists=8, nprobe=8,
                                              k=1, num_queries=10).collect()}
    assert full == brute


def test_srp_buckets_deterministic(spark, emb):
    a = {r.vec_id: r.bucket for r in srp_bucketed_candidates(emb).collect()}
    b = {r.vec_id: r.bucket for r in srp_bucketed_candidates(emb.repartition(7)).collect()}
    assert a == b
    assert len(set(a.values())) > 1  # actually buckets
