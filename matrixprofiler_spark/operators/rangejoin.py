"""Range (interval) join — the second time-series join Spark lacks as a
first-class operator: match point rows to every interval containing them,
per key.

Spark-first implementation: BUCKETIZED equi-join. Intervals are exploded
to the fixed-width buckets they overlap (``sequence`` + ``explode``,
JVM-side), points map to their single bucket, and the join runs on
(key, bucket) — a bounded equi-join Catalyst can hash/sort-merge — with
the exact containment predicate applied after and duplicates removed by
construction (an interval can meet a point in exactly one bucket: the
point's). A naive theta-join (l.t BETWEEN r.lo AND r.hi) degenerates to a
per-key nested loop at scale; bucketization bounds the fan-out to
intervals-overlapping-the-bucket x points-in-the-bucket.

Bucket width trades replication (long intervals explode to more buckets)
against join selectivity (wide buckets pair more non-matches); pick it
near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame, key: str, t: str,
               lo: str, hi: str, bucket_width: int) -> DataFrame:
    """Inner-join each point row to every interval row (same ``key``) with
    ``lo <= t <= hi`` (inclusive ends). ``t``/``lo``/``hi`` must be
    integer-like (cast timestamps upstream). Returns points columns +
    interval columns (minus its key).

    One equi-join shuffle on (key, bucket); interval replication factor =
    ceil(interval_len / bucket_width) + 1.
    """
    bw = int(bucket_width)
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bw).cast("long"),
                F.floor(F.col(hi) / bw).cast("long")
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(F.col(t) / bw).cast("long"))
    ivk = [F.col(f"__iv.{c}") for c in intervals.columns if c != key]
    joined = (
        pt.alias("__pt")
        .join(
            iv.alias("__iv"),
            (F.col(f"__pt.{key}") == F.col(f"__iv.{key}"))
            & (F.col("__pt.__b") == F.col("__iv.__b")),
        )
        .filter(
            (F.col(f"__pt.{t}") >= F.col(f"__iv.{lo}"))
            & (F.col(f"__pt.{t}") <= F.col(f"__iv.{hi}"))
        )
    )
    return joined.select(
        *[F.col(f"__pt.{c}") for c in points.columns], *ivk
    )
