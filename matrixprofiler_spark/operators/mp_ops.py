"""Matrix-profile operators over the tokens table — the reference's
top-level "queries" (stomp/mpx/mass) as distributed per-doc kernels.

Each doc's token series is one kernel invocation (the direct analog of the
reference's per-series C++ calls, SURVEY.md §2.10); results are emitted as
Gorilla/DoD-compressed binary columns like the rollup tiers. Cost is
O(n^2) per doc (vectorized diagonals), so the operator takes a
``max_tokens`` cap and relies on salted partitioning for skew: at w=128 a
16k-token doc is ~2.3s of kernel time, a mean-length doc ~0.15s.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import dod_encode, gorilla_encode
from ..kernels.mp import mpx, stomp

MP_BLOBS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("n_used", T.IntegerType(), False),
        T.StructField("truncated", T.BooleanType(), False),
        T.StructField("profile_len", T.IntegerType(), False),
        T.StructField("mp_blob", T.BinaryType(), True),
        T.StructField("pi_blob", T.BinaryType(), True),
        T.StructField("algo", T.StringType(), False),
    ]
)


def matrix_profile_blobs(tokens_df: DataFrame, w: int, algo: str = "mpx",
                         max_tokens: int | None = 8192,
                         num_partitions: int | None = None) -> DataFrame:
    """Self-join matrix profile per doc (MPX by default — the reference's
    fastest algorithm, R/mpx.R:3 — bit-exact vs its goldens), compressed.

    +Inf profile values (zero-variance / skip windows) are stored as-is:
    Gorilla round-trips every bit pattern including infinities.

    Docs longer than ``max_tokens`` are computed on the prefix and flagged
    with ``truncated=True`` / ``n_used`` (no silent caps); chunk-and-stitch
    via AB joins is the full-length path for such docs."""

    if algo not in ("mpx", "stomp"):
        raise ValueError(algo)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, toks, src in zip(b["doc_id"], b["tokens"], b["source"]):
                x = np.asarray(toks, dtype=np.float64)
                n = int(x.size)
                if max_tokens is not None:
                    x = x[:max_tokens]
                n_used = int(x.size)
                trunc = n_used < n
                if x.size < 2 * w:
                    rows.append((doc_id, src, w, n, n_used, trunc, 0,
                                 None, None, algo))
                    continue
                if algo == "mpx":
                    r = mpx(x, w, exclusion_zone=0.5)
                else:
                    r = stomp(x, w, exclusion_zone=0.5)
                mp = np.asarray(r["matrix_profile"], dtype=np.float64)
                pi = np.asarray(r["profile_index"], dtype=np.int64)
                rows.append(
                    (doc_id, src, w, n, n_used, trunc, int(mp.size),
                     gorilla_encode(mp), dod_encode(pi), algo)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MP_BLOBS_SCHEMA.fields])

    df = tokens_df
    if num_partitions:
        from .rollup import salted

        df = salted(df, num_partitions)
    return df.select("doc_id", "source", "tokens").mapInPandas(
        kernel, schema=MP_BLOBS_SCHEMA
    )
