"""Tiered rollup + downsample + gap-fill over the tokens table.

The engine treats each doc's token array as a time series (offset = time).
Retention tiers are offset bucketings: raw -> 1m -> 1h -> 1d == buckets of
1 / 60 / 3600 / 86400 positions (SURVEY.md §1.4).

Exactness contract
------------------
Bucket stats are kept as EXACT int64 sums (token values are int32, so every
cnt/sum/sumsq below 2^63 is exact). mean/std are derived at read time with
the reference's formulas (mean = sum/w, std = sqrt(sumsq/w - mean^2),
src/windowfunc.cpp:60-84), so a full bucket of size k reproduces
``movmean(x, k)`` / ``movstd(x, k)`` sampled at bucket starts bit-for-bit
(the integer fast path of kernels/window.py is provably equal to the Ogita
compensated loop on integer data). Coarser tiers are composed from finer
tiers by integer addition — algebraically exact, no re-reading raw data.

Scale design
------------
* finest tier computed per doc inside ``mapInPandas`` (vectorized numpy
  reshape-sums; no per-row Python) — docs are independent rows, so there is
  NO shuffle before the kernel; only an optional salted ``repartition`` to
  balance token-length skew.
* tier cascade = ``groupBy(doc_id, bucket/k)`` over already-small
  per-bucket rows (raw_len/60 rows per doc), a tiny shuffle.
* raw tier (per-window statistic series) is emitted as Gorilla-compressed
  binary blobs per doc — one row per doc, not one row per offset.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import dod_encode, gorilla_encode
from ..kernels.window import movmax, movmean, movmin, movstd

TIER_SIZES = {"1m": 60, "1h": 3600, "1d": 86400}

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("sum_v", T.LongType(), False),
        T.StructField("sumsq", T.LongType(), False),
        T.StructField("min_v", T.IntegerType(), False),
        T.StructField("max_v", T.IntegerType(), False),
    ]
)


def salted(df: DataFrame, num_partitions: int) -> DataFrame:
    """Salted hash repartition on (source, doc_id bucket) — defeats
    token-length skew by spreading docs uniformly; partition count should be
    >= 4x cores so AQE/stragglers even out the zipf length tail."""
    return df.repartition(
        num_partitions, F.pmod(F.xxhash64("source", "doc_id"), F.lit(num_partitions))
    )


def finest_rollup(tokens_df: DataFrame, bucket_size: int = 60) -> DataFrame:
    """Per-doc finest-tier bucket aggregates via a vectorized Arrow kernel.

    One output row per (doc, bucket); all math is numpy int64 (exact)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_doc, out_src, out_bucket = [], [], []
            out_cnt, out_sum, out_sumsq, out_min, out_max = [], [], [], [], []
            for doc_id, toks, src in zip(b["doc_id"], b["tokens"], b["source"]):
                x = np.asarray(toks, dtype=np.int64)
                n = x.size
                nb = (n + bucket_size - 1) // bucket_size
                pad = nb * bucket_size - n
                xp = np.pad(x, (0, pad))
                m = xp.reshape(nb, bucket_size)
                valid = np.pad(np.ones(n, dtype=np.int64), (0, pad)).reshape(nb, bucket_size)
                cnt = valid.sum(axis=1)
                s = m.sum(axis=1)
                s2 = (m * m).sum(axis=1)
                mn = np.where(valid.any(axis=1), np.where(valid == 1, m, 2**31 - 1).min(axis=1), 0)
                mx = np.where(valid.any(axis=1), np.where(valid == 1, m, -(2**31)).max(axis=1), 0)
                out_doc.append(np.full(nb, doc_id, dtype=object))
                out_src.append(np.full(nb, src, dtype=object))
                out_bucket.append(np.arange(nb, dtype=np.int64))
                out_cnt.append(cnt)
                out_sum.append(s)
                out_sumsq.append(s2)
                out_min.append(mn.astype(np.int32))
                out_max.append(mx.astype(np.int32))
            if not out_doc:
                yield pd.DataFrame(
                    {f.name: pd.Series(dtype=object) for f in ROLLUP_SCHEMA.fields}
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_doc),
                    "source": np.concatenate(out_src),
                    "tier": "1m",
                    "bucket": np.concatenate(out_bucket),
                    "cnt": np.concatenate(out_cnt),
                    "sum_v": np.concatenate(out_sum),
                    "sumsq": np.concatenate(out_sumsq),
                    "min_v": np.concatenate(out_min),
                    "max_v": np.concatenate(out_max),
                }
            )

    return tokens_df.select("doc_id", "source", "tokens").mapInPandas(
        kernel, schema=ROLLUP_SCHEMA
    )


def cascade_tier(finer: DataFrame, finer_size: int, coarser_size: int,
                 tier_name: str) -> DataFrame:
    """Compose a coarser tier from a finer one by exact integer addition —
    a pure map-side-combinable groupBy (no raw re-read)."""
    k = coarser_size // finer_size
    return (
        finer.groupBy(
            "doc_id", "source", (F.col("bucket") / k).cast("long").alias("bucket")
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.sum("sumsq").alias("sumsq"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .select(
            "doc_id", "source", F.lit(tier_name).alias("tier"), "bucket",
            "cnt", "sum_v", "sumsq", "min_v", "max_v",
        )
    )


def with_derived_stats(rollup: DataFrame) -> DataFrame:
    """Attach mean/std via the reference formulas (movmean/movstd,
    src/windowfunc.cpp:60-84): mean = sum/cnt, std = sqrt(sumsq/cnt - mean^2).
    Computed JVM-side (whole-stage codegen), bit-equal to the kernels on
    integer data because the int sums are exact."""
    mean = F.col("sum_v") / F.col("cnt")
    var = F.col("sumsq") / F.col("cnt") - mean * mean
    return rollup.withColumn("mean", mean).withColumn("std", F.sqrt(var))


def tier_rollup(tokens_df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Full cascade raw->1m->1h->1d; returns the union of tier tables."""
    if num_partitions:
        tokens_df = salted(tokens_df, num_partitions)
    m1 = finest_rollup(tokens_df, TIER_SIZES["1m"])
    h1 = cascade_tier(m1, TIER_SIZES["1m"], TIER_SIZES["1h"], "1h")
    d1 = cascade_tier(h1, TIER_SIZES["1h"], TIER_SIZES["1d"], "1d")
    return m1.unionByName(h1).unionByName(d1)


WINDOW_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("n_windows", T.IntegerType(), False),
        T.StructField("movmean_blob", T.BinaryType(), True),
        T.StructField("movstd_blob", T.BinaryType(), True),
        T.StructField("movmin_blob", T.BinaryType(), True),
        T.StructField("movmax_blob", T.BinaryType(), True),
        T.StructField("offsets_blob", T.BinaryType(), True),
        T.StructField("tokens_back", T.ArrayType(T.IntegerType()), True),
    ]
)


def window_stats(tokens_df: DataFrame, w: int, num_partitions: int | None = None,
                 keep_tokens: bool = False) -> DataFrame:
    """Raw tier: per-window movmean/movstd/movmin/movmax series per doc,
    Gorilla-encoded into binary columns; window offsets delta-of-delta
    encoded. ``keep_tokens`` echoes the input array for the per-row
    token-array-equality invariant check."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, toks, src in zip(b["doc_id"], b["tokens"], b["source"]):
                x = np.asarray(toks, dtype=np.int32)
                n = int(x.size)
                if n < w:
                    rows.append((doc_id, src, w, n, 0, None, None, None, None,
                                 None, list(map(int, x)) if keep_tokens else None))
                    continue
                xf = x.astype(np.float64)
                mm = movmean(xf, w, "ogita")
                ms = movstd(xf, w)
                mi = movmin(xf, w)
                ma = movmax(xf, w)
                offs = np.arange(n - w + 1, dtype=np.int64)
                rows.append(
                    (doc_id, src, w, n, int(n - w + 1),
                     gorilla_encode(mm), gorilla_encode(ms),
                     gorilla_encode(mi), gorilla_encode(ma),
                     dod_encode(offs),
                     list(map(int, x)) if keep_tokens else None)
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in WINDOW_STATS_SCHEMA.fields],
            )

    df = tokens_df
    if num_partitions:
        df = salted(df, num_partitions)
    return df.select("doc_id", "source", "tokens").mapInPandas(
        kernel, schema=WINDOW_STATS_SCHEMA
    )


def gap_fill(rollup: DataFrame) -> DataFrame:
    """Per-doc offset-spine gap fill: build the dense bucket spine
    [0, max_bucket] per (doc_id, tier) with ``F.sequence`` + explode, left
    range-join the observed buckets onto it, and flag filled points.

    Equi-join on (doc_id, tier, bucket) — Catalyst picks sort-merge or
    broadcast by size; the spine is generated, never shuffled raw."""
    spine = (
        rollup.groupBy("doc_id", "source", "tier")
        .agg(F.max("bucket").alias("max_bucket"))
        .select(
            "doc_id", "source", "tier",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("max_bucket"))).alias("bucket"),
        )
    )
    filled = (
        spine.join(rollup, ["doc_id", "source", "tier", "bucket"], "left")
        .withColumn("filled", F.col("cnt").isNull())
        .fillna({"cnt": 0, "sum_v": 0, "sumsq": 0})
    )
    return filled
