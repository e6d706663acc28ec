"""Unit tests for the corpus-stats partition planner (plans/partitioning)."""

from __future__ import annotations

from matrixprofiler_spark.plans import plan_partitions


def test_small_corpus_scheduling_bound():
    p = plan_partitions(n_docs=20_000, total_tokens=66_000_000,
                        max_tokens=16_384, cores=32)
    assert p.num_partitions >= 4 * 32  # at least 4 waves
    assert p.spark_confs()["spark.sql.adaptive.enabled"] == "true"


def test_large_corpus_memory_bound():
    # 100 TB-ish: 10^12 sequences of ~100 tokens
    p = plan_partitions(n_docs=10**12, total_tokens=10**14,
                        max_tokens=16_384, cores=4000)
    # memory bound dominates: partitions sized so token mass fits per task
    assert p.target_partition_tokens * 32 <= 512 * 2**20
    assert p.num_partitions > 4 * 4000


def test_chunking_kicks_in_for_long_docs():
    p = plan_partitions(n_docs=1000, total_tokens=2_000_000,
                        max_tokens=1_000_000, cores=8)
    assert p.chunk_len is not None
    assert p.chunk_len >= 4096


def test_no_chunking_for_uniform_short_docs():
    p = plan_partitions(n_docs=10**9, total_tokens=10**11,
                        max_tokens=128, cores=1000)
    assert p.chunk_len is None
