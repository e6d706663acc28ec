"""AS-OF join — the time-series join Spark's DataFrame API lacks (the
task-class example of a custom operator): for every left row, attach the
most recent right row at or before the left timestamp, per key.

Spark-first implementation: NO per-row Python and NO range join. The two
sides are union-tagged and a single per-key window ordered by
(ts, side, seq) carries the last-seen right payload forward
(``last(..., ignorenulls=True)``) — one shuffle on the join key, one sort
within partitions, linear work. This is the standard distributed as-of
shape (a sort-merge in disguise); a naive range join would be O(L*R) per
key and a per-key ``mapGroups`` would leave the JVM.

Skew note (100 TB): the window partitions by key — a single hot key
serializes. For hot-key workloads, pre-split the right side by time range
and salt the left with the matching range id (same composition as the
rollup's offset chunking); not needed for the driver tables.

DuckDB oracle face: native ``ASOF JOIN`` (identical semantics: greatest
right ts <= left ts per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload_cols: list[str], tolerance=None) -> DataFrame:
    """For each left row: the right row with the greatest ``ts`` <= left
    ``ts``, matching on ``key`` (backward as-of, inclusive). Right rows
    must be unique per (key, ts) — enforce upstream (e.g. a rollup).

    Returns the left columns plus ``payload_cols`` from the matched right
    row (NULL when no right row precedes the left row, or when the match
    is older than ``tolerance`` seconds if given).
    """
    payload = F.struct(*[F.col(c) for c in payload_cols], F.col(ts).alias("__rts"))
    r = right.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"), payload.alias("__payload"),
    )
    l = left.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType))
    # right rows sort before left rows at equal ts -> inclusive backward
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    matched = F.col("__match")
    if tolerance is not None:
        age = F.col("__ts").cast("double") - matched["__rts"].cast("double")
        matched = F.when(age <= tolerance, matched)
    return carried.select(
        *out_cols,
        *[matched[c].alias(c) for c in payload_cols],
        matched["__rts"].alias("asof_ts"),
    )
