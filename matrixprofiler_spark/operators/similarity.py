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


_PAIRS_SCHEMA = "vec_a long, vec_b long, cos double"


def cosine_pairs_above(emb: DataFrame, threshold: float = 0.2,
                       num_blocks: int = 8) -> DataFrame:
    """Embedding near-dup pairs: all (a < b) with cosine >= threshold.

    Distributed block-nested-loop: vectors hash to ``num_blocks`` blocks,
    the (small, broadcast) block-pair table (i <= j) fans each block out to
    its pair groups, and a cogrouped Arrow kernel computes each block x
    block tile as one exact int64 matmul. NO driver-side collect of the
    corpus — the replication factor is ~num_blocks/2 and each tile is an
    independent task, so the quadratic work distributes across the cluster
    (size num_blocks so a block fits executor memory). The SRP-bucketed
    join (srp_pairs_above) is the sub-quadratic approximate path at
    100 TB; this operator is the exact-semantics baseline."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    block_pairs = [
        (i, j) for i in range(num_blocks) for j in range(num_blocks) if i <= j
    ]

    def side(role: str) -> DataFrame:
        # fresh projection lineage per side (new expression ids), so the
        # cogroup below is not an ambiguous self-join
        qv = quantized(emb).withColumn(
            "blk", F.pmod(F.col("vec_id"), F.lit(num_blocks)).cast("int")
        )
        bp = spark.createDataFrame(block_pairs, "ba int, bb int")
        return qv.join(F.broadcast(bp), F.col("blk") == F.col(role))

    left = side("ba")
    right = side("bb")

    def tile(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l) or not len(r):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []})
        a_ids = l["vec_id"].to_numpy(dtype=np.int64)
        b_ids = r["vec_id"].to_numpy(dtype=np.int64)
        a_mat = np.array([np.asarray(v, dtype=np.int64) for v in l["qv"]])
        b_mat = np.array([np.asarray(v, dtype=np.int64) for v in r["qv"]])
        a_n = np.sqrt(l["norm2"].to_numpy(dtype=np.int64).astype(np.float64))
        b_n = np.sqrt(r["norm2"].to_numpy(dtype=np.int64).astype(np.float64))
        dots = a_mat @ b_mat.T  # exact int64
        cos = dots / (a_n[:, None] * b_n[None, :])
        # i<j blocks are disjoint id sets; i==j tiles dedup via a<b
        mask = (cos >= threshold) & (a_ids[:, None] != b_ids[None, :])
        ai, bj = np.nonzero(mask)
        va, vb = a_ids[ai], b_ids[bj]
        keep = va < vb if (l["blk"].iat[0] == r["blk"].iat[0]) else np.ones(va.size, bool)
        lo = np.minimum(va, vb)[keep]
        hi = np.maximum(va, vb)[keep]
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos": cos[ai, bj][keep]})

    return (
        left.groupBy("ba", "bb")
        .cogroup(right.groupBy("ba", "bb"))
        .applyInPandas(tile, schema=_PAIRS_SCHEMA)
    )


def srp_signs(n_planes: int = 8, dim: int = 64, salt: str = "srp") -> "np.ndarray":
    """Deterministic +-1 hyperplanes from md5(salt||plane||dim-index) —
    closed-form constants computable by any engine (and embedded as
    literals in the SQL oracle)."""
    import hashlib

    import numpy as np

    signs = np.empty((n_planes, dim), dtype=np.int64)
    for p in range(n_planes):
        for i in range(dim):
            d = hashlib.md5(f"{salt}{p}_{i}".encode()).hexdigest()
            signs[p, i] = 1 if int(d[0], 16) % 2 == 0 else -1
    return signs


def _srp_bucket_col(n_planes: int) -> "F.Column":
    """bucket = sum of sign-bit << p over planes; the per-plane projection
    is an exact int64 sum, fully JVM-side (no UDF)."""
    signs = srp_signs(n_planes)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        arr = F.array(*[F.lit(int(s)).cast("long") for s in signs[p]])
        term = F.aggregate(
            F.zip_with(F.col("qv"), arr, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(term > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << p).cast("long")
    return bucket


def srp_bucketed_candidates(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    """Sign-random-projection LSH buckets (the scale path for ANN):
    vectors sharing a bucket are ANN candidates; at 100 TB this turns the
    quadratic join into a per-bucket equi-join (srp_pairs_above)."""
    qv = quantized(emb)
    return qv.withColumn("bucket", _srp_bucket_col(n_planes)).select("vec_id", "bucket")


def srp_pairs_above(emb: DataFrame, threshold: float = 0.2,
                    n_planes: int = 4) -> DataFrame:
    """The end-to-end SRP-bucketed candidate JOIN: bucket -> per-bucket
    self equi-join -> exact quantized cosine filter. Sub-quadratic (join
    keys bound the fan-out to bucket sizes); recall < 1 by design — pairs
    split across buckets are missed, the standard LSH tradeoff (more
    tables / fewer planes => higher recall)."""
    qv = quantized(emb).withColumn("bucket", _srp_bucket_col(n_planes))
    a = qv.alias("a")
    b = qv.alias("b")
    cos = _dot(F.col("a.qv"), F.col("b.qv")) / (
        F.sqrt(F.col("a.norm2")) * F.sqrt(F.col("b.norm2"))
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cos",
        )
    )


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
    # sparse-/offset-id-safe seed selection (no density assumption): one
    # hash stratum per list, seed = the stratum's smallest vec_id — a
    # single map-side-combinable aggregation; only n_lists rows reach the
    # driver. Tiny inputs where strata go empty fall back to the n_lists
    # smallest ids (bounded distributed top-K).
    seed_ids = (
        qv.groupBy(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_lists)).alias("stratum"))
        .agg(F.min("vec_id").alias("vec_id"))
        .select("vec_id")
    )
    seed_rows = qv.join(seed_ids, "vec_id").collect()
    if len(seed_rows) < n_lists:
        seed_rows = qv.orderBy("vec_id").limit(n_lists).collect()
    if len(seed_rows) < n_lists:
        raise ValueError(
            f"ivf_index needs at least n_lists={n_lists} vectors, "
            f"got {len(seed_rows)}"
        )
    centroids = np.array([r.qv for r in sorted(seed_rows, key=lambda r: r.vec_id)],
                         dtype=np.float64)[:n_lists]
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
        # centroid update as a DISTRIBUTED aggregation: exact int sums per
        # (list, dim) via posexplode + map-side-combined groupBy; only the
        # n_lists x dim summary reaches the driver (never the corpus)
        sums = (
            assigned.join(qv, "vec_id")
            .select("list_id", F.posexplode("qv").alias("dim", "val"))
            .groupBy("list_id", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        acc = centroids.copy()
        for r in sums:
            acc[r.list_id][r.dim] = r.s / r.c
        nrm = np.linalg.norm(acc, axis=1, keepdims=True)
        upd = nrm[:, 0] > 0
        centroids[upd] = acc[upd] / nrm[upd]
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


def ivf_seed_topk(emb: DataFrame, n_lists: int = 8, nprobe: int = 4,
                  k: int = 1, num_queries: int = 20) -> DataFrame:
    """IVF routing with SEED centroids (0 k-means iterations): list l's
    centroid is the quantized vector at vec_id l*floor(n/n_lists), scoring
    dot_int / sqrt(seed_norm2) — every comparison an identical IEEE double
    in any engine, so assignment, probing, and the final exact-cosine
    top-k are all deterministic (the ANSI-SQL-oracle face of the IVF
    operator; k-means refinement is ivf_topk, recall-tested in pytest)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qv = quantized(emb)
    n = qv.count()
    step = max(1, n // n_lists)
    # the SQL oracle pins these positional seeds (vec_id % step == 0),
    # which assumes DENSE ids starting at 0 — assert instead of silently
    # under-seeding on sparse ids (ivf_index is the density-free path)
    seed_rows = sorted(
        qv.filter(
            (F.pmod(F.col("vec_id"), F.lit(step)) == 0)
            & (F.col("vec_id") < step * n_lists)
        ).collect(),
        key=lambda r: r.vec_id,
    )[:n_lists]
    if len(seed_rows) != n_lists:
        raise ValueError(
            f"ivf_seed_topk selected {len(seed_rows)} seeds, expected "
            f"{n_lists}: vec_ids must be dense 0..n-1 (use ivf_index for "
            "sparse or offset ids)"
        )
    S = np.array([r.qv for r in seed_rows], dtype=np.int64)
    s_norm = np.sqrt(np.array([r.norm2 for r in seed_rows], dtype=np.int64).astype(np.float64))
    bc = emb.sparkSession.sparkContext.broadcast((S, s_norm))

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("list_id", T.IntegerType()),
    ])

    def assign(batches):
        Sm, Sn = bc.value
        for b in batches:
            if not len(b):
                continue
            m = np.array([np.asarray(v, dtype=np.int64) for v in b["qv"]])
            score = (m @ Sm.T) / Sn[None, :]  # exact int dots / seed norm
            lists = np.argmax(score, axis=1).astype(np.int32)  # ties -> low id
            yield pd.DataFrame({"vec_id": b["vec_id"].to_numpy(dtype=np.int64),
                                "list_id": lists})

    assigned = qv.mapInPandas(assign, schema=schema)
    queries = qv.filter(F.col("vec_id") < num_queries)
    q_rows = queries.collect()  # the query set is small by definition
    qm = np.array([r.qv for r in q_rows], dtype=np.int64)
    score = (qm @ S.T) / s_norm[None, :]
    L = S.shape[0]
    probe_pairs = []
    for r, sc_row in zip(q_rows, score):
        order = np.lexsort((np.arange(L), -sc_row))  # score desc, list asc
        probe_pairs += [(int(r.vec_id), int(l)) for l in order[:nprobe]]
    probe_df = emb.sparkSession.createDataFrame(probe_pairs, "q_id long, list_id int")
    cand = (
        F.broadcast(probe_df).join(assigned, "list_id")
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
