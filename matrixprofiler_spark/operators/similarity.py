"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k, computed on QUANTIZED integer vectors
(round(e * 10000)) so dot products and norms are exact int64 and the final
cosine double is the same bit pattern in any engine (ANSI-SQL oracle-safe;
quantization error ~1e-4 is irrelevant for neighbor ranking at this scale).

Scale path: LSH bucketing by sign-random-projection prefix — candidates
only join within a bucket (the 100-TB plan: broadcast the query set,
bucket-join the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quantized(emb: DataFrame, scale: int = 10000) -> DataFrame:
    """vec_id + int64-quantized embedding + exact squared norm."""
    q = F.transform(
        F.col("embedding"),
        lambda e: F.round(e.cast("double") * scale, 0).cast("long"),
    )
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        q.alias("qv"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x * x).alias("norm2"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk(emb: DataFrame, k: int = 1, num_queries: int = 20) -> DataFrame:
    """Brute-force exact top-k cosine neighbors for the first
    ``num_queries`` vectors. The query side is broadcast (tiny), so the plan
    is a broadcast nested-loop over the corpus — no shuffle of the corpus.

    cos = dot / (sqrt(na) * sqrt(nb)) from exact integer dot/norms;
    ties broken by smaller neighbor id (deterministic)."""
    qv = quantized(emb)
    queries = qv.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("q_qv"), F.col("norm2").alias("q_norm2")
    )
    pairs = (
        qv.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .withColumn("dot", _dot(F.col("q_qv"), F.col("qv")))
        .withColumn(
            "cos",
            F.col("dot") / (F.sqrt(F.col("q_norm2")) * F.sqrt(F.col("norm2"))),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("nn_id"), "rank", "cos")
    )


def cosine_pairs_above(emb: DataFrame, threshold: float = 0.2) -> DataFrame:
    """Embedding near-dup pairs: all (a < b) with cosine >= threshold.

    Plan: broadcast the quantized corpus (a small dim table) to every task,
    then each partition computes its block's int64 matmul against the whole
    corpus in numpy — exact (integer dot products are order-free exact in
    int64) and ~10x faster than per-pair JVM lambdas. The LSH-bucketed
    variant below is the 100-TB path where no side is broadcastable."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qv = quantized(emb)
    rows = qv.collect()  # small dim table (vec count x 64 ints)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.qv for r in rows], dtype=np.int64)
    norms = np.sqrt(np.array([r.norm2 for r in rows], dtype=np.int64).astype(np.float64))
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((ids, mat, norms))

    schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def kernel(batches):
        b_ids, b_mat, b_norms = bc.value
        for b in batches:
            if not len(b):
                continue
            a_ids = b["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array([np.asarray(v, dtype=np.int64) for v in b["qv"]])
            a_norm2 = b["norm2"].to_numpy(dtype=np.int64)
            a_norms = np.sqrt(a_norm2.astype(np.float64))
            dots = a_mat @ b_mat.T  # exact int64
            cos = dots / (a_norms[:, None] * b_norms[None, :])
            mask = (cos >= threshold) & (a_ids[:, None] < b_ids[None, :])
            ai, bj = np.nonzero(mask)
            yield pd.DataFrame(
                {"vec_a": a_ids[ai], "vec_b": b_ids[bj], "cos": cos[ai, bj]}
            )

    return qv.mapInPandas(kernel, schema=schema)


def srp_bucketed_candidates(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    """Sign-random-projection LSH buckets (the scale path for ANN): bucket
    id = sign bits of dot(v, h_p) for deterministic pseudo-random
    hyperplanes h_p derived from xxhash64(p, dim) — fully JVM-side.

    Vectors sharing a bucket are ANN candidates; at 100 TB this turns the
    quadratic join into a per-bucket join."""
    qv = quantized(emb)
    dim = 64
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        # deterministic +-1 hyperplane: sign of xxhash64(p * dim + i)
        terms = F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.sequence(F.lit(p * dim), F.lit(p * dim + dim - 1)),
                lambda x, i: F.when(F.pmod(F.xxhash64(i), F.lit(2)) == 0, x).otherwise(-x),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(F.shiftleft(F.when(terms > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p))
    return qv.withColumn("bucket", bucket).select("vec_id", "bucket")


def ivf_index(emb: DataFrame, n_lists: int = 16, iters: int = 3) -> tuple:
    """IVF index: deterministic Lloyd's k-means over quantized vectors.

    Centroid init = evenly-spaced vec_ids (deterministic); each iteration
    is one distributed assignment (broadcast centroids, blocked numpy
    argmax of cosine) + one groupBy mean update. Returns
    (assignments DataFrame [vec_id, list_id], centroids ndarray)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qv = quantized(emb).persist()
    n = qv.count()
    ids = [r.vec_id for r in qv.select("vec_id").orderBy("vec_id")
           .limit(n).collect()][:: max(1, n // n_lists)][:n_lists]
    seed_rows = qv.filter(F.col("vec_id").isin(ids)).collect()
    centroids = np.array([r.qv for r in sorted(seed_rows, key=lambda r: r.vec_id)],
                         dtype=np.float64)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    sc = emb.sparkSession.sparkContext
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("list_id", T.IntegerType()),
    ])

    for _ in range(iters):
        bc = sc.broadcast(centroids)

        def assign(batches):
            C = bc.value
            for b in batches:
                if not len(b):
                    continue
                m = np.array([np.asarray(v, dtype=np.float64) for v in b["qv"]])
                m = m / np.linalg.norm(m, axis=1, keepdims=True)
                lists = (m @ C.T).argmax(axis=1).astype(np.int32)
                yield pd.DataFrame({"vec_id": b["vec_id"].to_numpy(dtype=np.int64),
                                    "list_id": lists})

        assigned = qv.mapInPandas(assign, schema=schema)
        # centroid update: mean of member vectors (distributed agg over
        # exploded dims would shuffle; the corpus is collected per-list mean
        # via a pandas grouped agg — lists are small at index-build time)
        joined = assigned.join(qv, "vec_id")
        pdf = joined.select("list_id", "qv").toPandas()
        for lid, grp in pdf.groupby("list_id"):
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in grp["qv"]])
            c = vecs.mean(axis=0)
            nrm = np.linalg.norm(c)
            if nrm > 0:
                centroids[lid] = c / nrm
    bc = sc.broadcast(centroids)

    def assign_final(batches):
        C = bc.value
        for b in batches:
            if not len(b):
                continue
            m = np.array([np.asarray(v, dtype=np.float64) for v in b["qv"]])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            lists = (m @ C.T).argmax(axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": b["vec_id"].to_numpy(dtype=np.int64),
                                "list_id": lists})

    return qv.mapInPandas(assign_final, schema=schema), centroids


def ivf_topk(emb: DataFrame, n_lists: int = 16, nprobe: int = 4,
             k: int = 1, num_queries: int = 20) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` nearest centroid lists
    per query, brute-force exact cosine inside them. At 100 TB the
    assignment table is bucketed by list_id so a probe is a partition-
    pruned scan instead of a full-corpus pass."""
    import numpy as np

    assigned, centroids = ivf_index(emb, n_lists)
    qv = quantized(emb)
    queries = qv.filter(F.col("vec_id") < num_queries)
    q_rows = queries.collect()
    qm = np.array([r.qv for r in q_rows], dtype=np.float64)
    qm_n = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    probes = np.argsort(-(qm_n @ centroids.T), axis=1)[:, :nprobe]
    probe_pairs = [
        (int(r.vec_id), int(l)) for r, ls in zip(q_rows, probes) for l in ls
    ]
    probe_df = emb.sparkSession.createDataFrame(
        probe_pairs, "q_id long, list_id int"
    )
    cand = (
        probe_df.join(assigned, "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    qd = queries.select(F.col("vec_id").alias("q_id"), F.col("qv").alias("q_qv"),
                        F.col("norm2").alias("q_norm2"))
    pairs = (
        cand.join(qv, "vec_id").join(F.broadcast(qd), "q_id")
        .withColumn("dot", _dot(F.col("q_qv"), F.col("qv")))
        .withColumn("cos", F.col("dot") / (F.sqrt(F.col("q_norm2")) * F.sqrt(F.col("norm2"))))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("nn_id"), "rank", "cos")
    )
