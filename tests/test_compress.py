"""Compression policy (streaming/compress.py — the compress_chunks
analog): kill-and-resume, decode identity (read_fine == input store, row
for row), chunk-quantum semantics, segment pruning before decode, and
input/policy binding inherited from the expiry contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matrixprofiler_spark.codecs import dod_decode
from matrixprofiler_spark.operators.rollup import finest_rollup, retention_policy
from matrixprofiler_spark.sources.tokens import synth_tokens_df
from matrixprofiler_spark.streaming.compress import CompressionPolicyJob

FINE, CHUNK, HORIZON = 16, 64, 32


@pytest.fixture(scope="module")
def fine(spark):
    toks = synth_tokens_df(spark, 40, seed=7)
    df = finest_rollup(toks, FINE).cache()
    df.count()
    return df


def _rows(df):
    cols = ["doc_id", "source", "bucket", "cnt", "sum_v", "sumsq",
            "min_v", "max_v"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_kill_resume_and_decode_identity(spark, fine, tmp_path_factory):
    base = tmp_path_factory.mktemp("compress")
    job = CompressionPolicyJob(spark, base, FINE, CHUNK, HORIZON, n_groups=6)

    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(fine, fail_after=3)
    assert len(job.completed_groups()) == 3
    assert not (base / "_stage_compress_COMMITTED").exists()
    with pytest.raises(RuntimeError, match="compress incomplete"):
        job.read_fine()

    # resume completes exactly the remaining groups
    done_before = set(job.completed_groups())
    job2 = CompressionPolicyJob(spark, base, FINE, CHUNK, HORIZON, n_groups=6)
    assert sorted(job2.run(fine)) == sorted(set(range(6)) - done_before)
    assert (base / "_stage_compress_COMMITTED").exists()

    # decode identity: head UNION decoded segments == input store
    assert _rows(job2.read_fine()) == _rows(fine)

    # the job actually compressed something, and the census is coherent
    m = job2.metrics()
    assert m["rows_compressed"] > 0 and m["n_segments"] > 0
    assert m["rows_in"] == m["rows_head"] + m["rows_compressed"]
    assert m["compression_ratio"] is not None

    # idempotent re-run: nothing left to do
    assert job2.run(fine) == []


def test_chunk_quantum_semantics(spark, fine, tmp_path_factory):
    """A bucket is compressed iff its chunk lies wholly at or below the
    chunk-aligned cutoff — whole-chunk quanta, never a partial chunk."""
    base = tmp_path_factory.mktemp("compress_q")
    job = CompressionPolicyJob(spark, base, FINE, CHUNK, HORIZON, n_groups=2)
    job.run(fine)
    wm = fine.groupBy("doc_id", "source").agg(
        ((F.max("bucket") + 1) * FINE).alias("wm"))
    cut = (F.floor((F.col("wm") - HORIZON) / CHUNK) * CHUNK).cast("long")
    expected_cold = (fine.join(wm, ["doc_id", "source"])
                     .where((F.col("bucket") + 1) * FINE <= cut).drop("wm"))
    cols = ["doc_id", "source", "bucket", "cnt", "sum_v", "sumsq",
            "min_v", "max_v"]
    cold_rows = _rows(
        job.read_fine().select(*cols).exceptAll(job.head().select(*cols)))
    assert cold_rows == _rows(expected_cold)
    # every segment stays within one chunk's bucket span
    bad = job.segments().where(
        (F.col("b_max") - F.col("b_min") + 1) > CHUNK // FINE).count()
    assert bad == 0
    # blobs round-trip their own n_rows
    seg = job.segments().limit(5).collect()
    for r in seg:
        assert dod_decode(bytes(r["bucket_blob"])).size == r["n_rows"]


def test_segment_pruning_before_decode(spark, fine, tmp_path_factory):
    base = tmp_path_factory.mktemp("compress_p")
    job = CompressionPolicyJob(spark, base, FINE, CHUNK, 0, n_groups=2)
    job.run(fine)
    lo, hi = 2, 5
    # pruned read is exactly the direct range filter of the input store
    got = _rows(job.read_fine(bucket_min=lo, bucket_max=hi))
    want = _rows(fine.where(F.col("bucket").between(lo, hi)))
    assert got == want
    # the range predicate reaches the segment parquet scan as pushed
    # filters on the b_min/b_max metadata columns (chunk exclusion)
    plan = job.segments(lo, hi)._jdf.queryExecution().executedPlan().toString()
    assert "b_max" in plan and "b_min" in plan
    assert "PushedFilters: [" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("b_max" in ln or "b_min" in ln for ln in pushed)
    # pruning visibly cuts the segment set on this input
    assert job.segments(lo, hi).count() < job.segments().count()


def test_value_zone_map_pruning(spark, fine, tmp_path_factory):
    """Value zone maps (v_min/v_max per segment): a max_v threshold skips
    segments before decode and serves exactly the direct filter."""
    base = tmp_path_factory.mktemp("compress_v")
    job = CompressionPolicyJob(spark, base, FINE, CHUNK, 0, n_groups=2)
    job.run(fine)
    # pick a threshold between the global median and max of max_v so both
    # pruned and surviving segments exist
    thr = int(fine.approxQuantile("max_v", [0.9], 0.0)[0])
    got = _rows(job.read_fine(max_v_at_least=thr))
    want = _rows(fine.where(F.col("max_v") >= thr))
    assert got == want and len(got) > 0
    assert job.segments(max_v_at_least=thr).count() < job.segments().count()
    plan = (job.segments(max_v_at_least=thr)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan and "v_max" in plan
    # zone maps are consistent with their decoded contents
    seg = job.segments().limit(8).collect()
    for r in seg:
        mn = dod_decode(bytes(r["min_blob"]))
        mx = dod_decode(bytes(r["max_blob"]))
        assert r["v_min"] == int(mn.min()) and r["v_max"] == int(mx.max())


def test_compressed_store_is_drop_in_fine_tier(spark, fine, tmp_path_factory):
    """retention_policy over read_fine() == retention_policy over the
    original store — the compressed store serves transparently."""
    from matrixprofiler_spark.operators.rollup import cascade_tier

    base = tmp_path_factory.mktemp("compress_s")
    job = CompressionPolicyJob(spark, base, FINE, CHUNK, HORIZON, n_groups=2)
    job.run(fine)
    coarse = cascade_tier(fine, FINE, 64, "1h")
    cols = ["doc_id", "source", "bucket", "cnt", "sum_v", "sumsq",
            "min_v", "max_v", "tier"]

    def rows(df):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    served_full = retention_policy(fine, coarse, FINE, 64, HORIZON)
    served_comp = retention_policy(
        job.read_fine().withColumn("tier", F.lit("1m")),
        coarse, FINE, 64, HORIZON)
    assert rows(served_comp) == rows(served_full)


def test_full_lifecycle_compress_then_expire(spark, fine, tmp_path_factory):
    """The TimescaleDB lifecycle triad chained end to end: compress the
    fine store (1 chunk of recent history kept row-form), physically
    expire the DECODED compressed store, then serve — row-identical to
    the retention serving view over the original uncompressed store."""
    from matrixprofiler_spark.operators.rollup import cascade_tier
    from matrixprofiler_spark.streaming.expiry import RetentionExpiryJob

    cbase = tmp_path_factory.mktemp("life_c")
    ebase = tmp_path_factory.mktemp("life_e")
    cjob = CompressionPolicyJob(spark, cbase, FINE, CHUNK, HORIZON, n_groups=2)
    cjob.run(fine)
    # expiry consumes the compressed store THROUGH the decoding view
    decoded = cjob.read_fine().withColumn("tier", F.lit("1m"))
    ejob = RetentionExpiryJob(spark, ebase, FINE, 64, 2 * HORIZON, n_groups=2)
    ejob.run(decoded)
    coarse = cascade_tier(fine, FINE, 64, "1h")
    cols = ["doc_id", "source", "bucket", "cnt", "sum_v", "sumsq",
            "min_v", "max_v", "tier"]

    def rows(df):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    served_lifecycle = retention_policy(
        ejob.result(), coarse, FINE, 64, 2 * HORIZON,
        watermark=ejob.watermarks())
    served_direct = retention_policy(fine, coarse, FINE, 64, 2 * HORIZON)
    assert rows(served_lifecycle) == rows(served_direct)


def test_parallel_group_commit_equivalence(spark, fine, tmp_path_factory):
    """The ``parallelism`` kwarg is accepted for API compatibility (the
    batch single-pass run parallelizes by partition, not driver thread);
    two runs with and without it commit identical stores and censuses."""
    from matrixprofiler_spark.streaming.expiry import RetentionExpiryJob

    b_seq = tmp_path_factory.mktemp("cmp_par_a")
    b_par = tmp_path_factory.mktemp("cmp_par_b")
    j_seq = CompressionPolicyJob(spark, b_seq, FINE, CHUNK, HORIZON, n_groups=6)
    j_par = CompressionPolicyJob(spark, b_par, FINE, CHUNK, HORIZON, n_groups=6)
    assert sorted(j_seq.run(fine)) == sorted(j_par.run(fine, parallelism=4))
    assert _rows(j_seq.read_fine()) == _rows(j_par.read_fine())
    ms, mp_ = j_seq.metrics(), j_par.metrics()
    for k in ("rows_in", "rows_head", "rows_compressed", "n_segments",
              "blob_bytes"):
        assert ms[k] == mp_[k], k
    # expiry inherits the same parallel commit loop
    e_seq = tmp_path_factory.mktemp("exp_par_a")
    e_par = tmp_path_factory.mktemp("exp_par_b")
    js = RetentionExpiryJob(spark, e_seq, FINE, 64, HORIZON, n_groups=6)
    jp = RetentionExpiryJob(spark, e_par, FINE, 64, HORIZON, n_groups=6)
    js.run(fine)
    jp.run(fine, parallelism=4)
    cols = ["doc_id", "source", "bucket", "cnt", "sum_v", "sumsq",
            "min_v", "max_v"]
    assert (sorted(map(tuple, js.result().select(*cols).collect()))
            == sorted(map(tuple, jp.result().select(*cols).collect())))
    assert js.metrics() == {**jp.metrics(),
                            "elapsed_sec": js.metrics()["elapsed_sec"]}


def test_compress_random_configs_match_model(spark, tmp_path_factory):
    """Randomized compression policies: random fine size, chunk multiple,
    horizon and doc lengths, checked against a direct numpy model of the
    chunk-aligned rule — decode identity always holds, every row lands on
    the side (head vs segments) the model predicts, and the segment count
    equals the model's distinct (doc, chunk) census."""
    import numpy as np

    rng = np.random.Generator(np.random.Philox(key=23, counter=[0, 0, 0, 0]))
    for trial in range(4):
        fine_size = int(rng.choice([4, 8, 16]))
        chunk = fine_size * int(rng.choice([2, 4, 8]))
        horizon = int(rng.integers(0, 3 * chunk))
        docs = {f"t{trial}d{i}": int(rng.integers(1, 6 * chunk))
                for i in range(8)}
        tokens = spark.createDataFrame(
            [(d, [int(v) for v in np.arange(n, dtype=np.int64) % 97], n,
              "web") for d, n in docs.items()],
            "doc_id string, tokens array<int>, n_tok int, source string")
        fine_df = finest_rollup(tokens, fine_size).cache()
        fine_df.count()
        base = tmp_path_factory.mktemp(f"cmp_model_{trial}")
        job = CompressionPolicyJob(spark, base, fine_size, chunk, horizon,
                                   n_groups=2)
        job.run(fine_df)
        assert _rows(job.read_fine()) == _rows(fine_df)

        # numpy model of the chunk-aligned compress rule
        expect_cold, expect_segs = set(), set()
        for d, n in docs.items():
            wm = ((n + fine_size - 1) // fine_size) * fine_size
            cut = int(np.floor((wm - horizon) / chunk) * chunk)
            for b in range((n + fine_size - 1) // fine_size):
                if (b + 1) * fine_size <= cut:
                    expect_cold.add((d, b))
                    expect_segs.add((d, b * fine_size // chunk))
        from matrixprofiler_spark.streaming.compress import (
            _FINE_OUT_SCHEMA,
            _decode_segments,
        )

        got_cold = {(r["doc_id"], r["bucket"]) for r in job.segments()
                    .mapInPandas(_decode_segments, schema=_FINE_OUT_SCHEMA)
                    .select("doc_id", "bucket").collect()}
        assert got_cold == expect_cold, (trial, fine_size, chunk, horizon)
        assert job.metrics()["n_segments"] == len(expect_segs), trial
        fine_df.unpersist()


def test_binding_and_validation(spark, fine, tmp_path_factory):
    base = tmp_path_factory.mktemp("compress_b")
    with pytest.raises(ValueError, match="nest"):
        CompressionPolicyJob(spark, base, 16, 40, 0)
    with pytest.raises(ValueError, match="nonnegative"):
        CompressionPolicyJob(spark, base, 16, 64, -1)
    job = CompressionPolicyJob(spark, base, FINE, CHUNK, HORIZON, n_groups=2)
    with pytest.raises(ValueError, match="missing columns"):
        job.run(fine.drop("sumsq"))
    job.run(fine)
    # same base dir + different policy fails loudly
    job3 = CompressionPolicyJob(spark, base, FINE, CHUNK, HORIZON + FINE,
                                n_groups=2)
    with pytest.raises(ValueError, match="fresh base dir"):
        job3.run(fine)
    # no stored watermark table by design
    with pytest.raises(NotImplementedError, match="derivable"):
        job.watermarks()


def test_store_file_counts_bounded(spark, fine, tmp_path_factory):
    """The write layout must bound each store to ~files_per_group files
    per commit group (guide §6 small-files defeat): without the layout
    repartition every hive write fanned shuffle-partitions x n_groups
    tiny files and each later scan paid a task + Python roundtrip per
    couple of files."""
    import glob

    base = tmp_path_factory.mktemp("compress_layout")
    job = CompressionPolicyJob(spark, base, FINE, CHUNK, HORIZON,
                               n_groups=4)
    job.run(fine)
    for store in ("fine_staged", "head", "segments"):
        files = glob.glob(str(base / store / "grp=*" / "*.parquet"))
        # a (grp, doc-hash) pair can collide into a neighbour partition,
        # so allow a small factor over the n_groups * files_per_group
        # target, never the old ~shuffle_partitions x n_groups blowup
        assert 0 < len(files) <= 3 * job.n_groups * job.files_per_group, (
            store, len(files))
    # round-trip identity still holds on the compacted layout
    assert _rows(job.read_fine()) == _rows(fine)
