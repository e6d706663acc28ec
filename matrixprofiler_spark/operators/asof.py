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

Skew (100 TB): the plain window partitions by key — a single hot key (a
power-user in an events table) serializes onto one task. ``split_width``
activates the salted variant: both sides are salted with a time-range id
``floor(ts / split_width)`` so the window partitions by (key, range) —
the hot key spreads over its time ranges — and a per-(key, range)
boundary carry (the latest right payload from any EARLIER range,
computed on one-row-per-range aggregates, so the carry window itself
cannot be hot) is injected as a synthetic first row of each bucket.
Same composition as the rollup's offset chunking. Cost: three extra
aggregated shuffles (range census, per-range last, boundary join) — all
over (key, range) cardinality, not row cardinality.

DuckDB oracle face: native ``ASOF JOIN`` (identical semantics: greatest
right ts <= left ts per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _seconds(col, dtype) -> "F.Column":
    """ts column -> double seconds, for any ts type. TIMESTAMP_NTZ has no
    direct double cast in Spark 4; route timestamps through unix_micros
    (an exact int64 — no double rounding until the final divide)."""
    if dtype.typeName().startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")).cast("double") / F.lit(1e6)
    return col.cast("double")


def _project_output(carried: DataFrame, left: DataFrame, right: DataFrame,
                    ts: str, payload_cols: list[str], tolerance) -> DataFrame:
    """Shared output contract of both plans: left columns + matched
    payload + asof_ts, with the optional tolerance age gate."""
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    matched = F.col("__match")
    if tolerance is not None:
        tt = right.schema[ts].dataType
        age = _seconds(F.col("__ts"), tt) - _seconds(matched["__rts"], tt)
        matched = F.when(age <= tolerance, matched)
    return carried.select(
        *out_cols,
        *[matched[c].alias(c) for c in payload_cols],
        matched["__rts"].alias("asof_ts"),
    )


def auto_split_width(left: DataFrame, right: DataFrame, key: str, ts: str,
                     target_rows: int = 100_000) -> float | None:
    """Derive the salted plan's ``split_width`` from data statistics, so
    the 100-TB path needs no manual tuning: a one-pass per-key census
    over BOTH sides (left rows are what serialize in the window, right
    rows ride along) finds the hottest key's row count and the global ts
    span; the width is chosen so that key lands ~``target_rows`` rows per
    (key, range) bucket.

    Returns None — "use the plain single-window plan" — when no key
    exceeds ``target_rows`` (salting would only add three aggregate
    shuffles for nothing) or when no hot key is actually SPLITTABLE:
    ranges cannot split equal timestamps, so a hot key only counts when
    its span is positive AND its modal timestamp holds at most half its
    rows (otherwise the post-split max bucket ~= the pre-split one — a
    key with 99% of its rows on one ts gets no relief from any width,
    and the adversarial-skew pytest pins that we fall back to the plain
    plan instead of emitting a uselessly tiny width).

    The width is derived per hot key from that key's own span — the
    minimum over hot keys of span_k / max(2, ceil(n_k / target)) — NOT
    from the global span: a hot key whose rows occupy a narrow slice of
    a wide global span would otherwise land in ~1 range and get zero
    skew relief. Taking the min width over-splits the other keys, whose
    cost is only extra one-row-per-(key, range) aggregate rows. Every
    hot key with a positive span is guaranteed >= 2 ranges
    (pytest-asserted). Cost: a (key, ts)-grain partial count feeding a
    keyed aggregate + a 1-row reduction; all map-side combinable — the
    (key, ts) grain is the same grain the join's window sorts on, so the
    census is never bigger than the join's own shuffle."""
    ts_type = right.schema[ts].dataType
    both = left.select(
        F.col(key).alias("__k"), _seconds(F.col(ts), ts_type).alias("__s")
    ).unionByName(
        right.select(
            F.col(key).alias("__k"), _seconds(F.col(ts), ts_type).alias("__s")
        )
    )
    per_ts = both.groupBy("__k", "__s").agg(F.count("*").alias("nts"))
    per_key = per_ts.groupBy("__k").agg(
        F.sum("nts").alias("n"), F.min("__s").alias("mn"),
        F.max("__s").alias("mx"), F.max("nts").alias("modal"),
    )
    st = (
        per_key.filter(
            (F.col("n") > target_rows)
            & (F.col("mx") > F.col("mn"))
            # splitting must at least HALVE the hot bucket: the modal ts
            # rides into one range whatever the width
            & (F.col("modal") * 2 <= F.col("n"))
        )
        .select(
            (
                (F.col("mx") - F.col("mn"))
                / F.greatest(
                    F.lit(2), F.ceil(F.col("n") / F.lit(float(target_rows)))
                )
            ).alias("w_k")
        )
        .agg(F.min("w_k").alias("w"))
        .first()
    )
    if st is None or st["w"] is None:
        return None
    return float(st["w"])


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload_cols: list[str], tolerance=None,
              split_width: float | str | None = None,
              auto_target_rows: int = 100_000) -> DataFrame:
    """For each left row: the right row with the greatest ``ts`` <= left
    ``ts``, matching on ``key`` (backward as-of, inclusive). Right rows
    must be unique per (key, ts) — enforce upstream (e.g. a rollup).

    Returns the left columns plus ``payload_cols`` from the matched right
    row (NULL when no right row precedes the left row, or when the match
    is older than ``tolerance`` seconds if given).

    ``split_width`` (same units as ``ts`` cast to double, e.g. seconds
    for timestamps) switches to the salted hot-key-safe plan; results are
    identical for any width (pytest-asserted). ``split_width="auto"``
    derives the width from a per-key census (auto_split_width, targeting
    ``auto_target_rows`` rows per bucket) and falls back to the plain
    plan when no key is hot enough to need salting.
    """
    # both plans derive the range-id / tolerance-age conversion from the
    # RIGHT side's ts dtype and apply it to both sides — a mixed-FAMILY
    # input (e.g. double left, timestamp right) would silently convert the
    # left rows with the wrong branch, so refuse it at entry. Within one
    # family the branch is identical (timestamp vs timestamp_ntz both
    # route through unix_micros), so those mixes are fine. Anything that
    # is neither numeric nor timestamp (string, date, ...) is refused
    # outright: a string ts would make the plain plan sort
    # lexicographically while the salted plan ranges numerically — two
    # silently divergent results.
    from pyspark.sql.types import NumericType

    def _family(dtype):
        if dtype.typeName().startswith("timestamp"):
            return "timestamp"
        if isinstance(dtype, NumericType):
            return "numeric"
        return None

    lt, rt = left.schema[ts].dataType, right.schema[ts].dataType
    for side, t in (("left", lt), ("right", rt)):
        if _family(t) is None:
            raise TypeError(
                f"asof_join: {side}.{ts} is {t.simpleString()}; ts must be "
                "a numeric or timestamp column (cast explicitly)"
            )
    if _family(lt) != _family(rt):
        raise TypeError(
            f"asof_join: left.{ts} is {lt.simpleString()} but right.{ts} is "
            f"{rt.simpleString()}; cast one side so the ts families match"
        )
    if isinstance(split_width, str):
        # only the exact literal "auto" is meaningful; any other string
        # ("Auto", "86400s", ...) would otherwise fall through to the
        # salted plan and die later in float() with an opaque message
        if split_width != "auto":
            raise ValueError(
                f'split_width must be a number, None, or "auto", '
                f"got {split_width!r}"
            )
        split_width = auto_split_width(left, right, key, ts, auto_target_rows)
    if split_width is not None:
        return _asof_join_salted(left, right, key, ts, payload_cols,
                                 tolerance, split_width)
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
    return _project_output(carried, left, right, ts, payload_cols, tolerance)


def _asof_join_salted(left: DataFrame, right: DataFrame, key: str, ts: str,
                      payload_cols: list[str], tolerance,
                      split_width: float) -> DataFrame:
    """Hot-key-safe as-of: window partitioned by (key, time-range).

    A left row in range b may match a right row from an earlier range, so
    each (key, range) bucket is seeded with a boundary row carrying the
    latest right payload from all ranges < b. The carry is computed on
    per-(key, range) MAX aggregates — one row per range per key — so the
    per-key carry window is bounded by the range count, never by row
    count. Struct MAX orders by the leading __ts field; right rows are
    unique per (key, ts) upstream, so the max is well-defined.
    """
    ts_type = right.schema[ts].dataType

    def rid(c):
        return F.floor(_seconds(c, ts_type) / F.lit(float(split_width))).cast("long")

    payload = F.struct(*[F.col(c) for c in payload_cols], F.col(ts).alias("__rts"))
    r = right.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"), payload.alias("__payload"),
    ).withColumn("__r", rid(F.col("__ts")))
    l = left.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    ).withColumn("__r", rid(F.col("__ts")))
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType))

    # every (key, range) that holds a left or right row needs a carry row
    need = l.select("__k", "__r").union(r.select("__k", "__r")).distinct()
    last_in_range = r.groupBy("__k", "__r").agg(
        F.max(F.struct(F.col("__ts"), F.col("__payload"))).alias("__m")
    )
    wb = (
        Window.partitionBy("__k").orderBy("__r")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = (
        need.join(last_in_range, ["__k", "__r"], "left")
        .withColumn("__carry", F.max("__m").over(wb))
        .filter(F.col("__carry").isNotNull())
        .select(
            "__k", "__r",
            F.lit(None).cast(l.schema["__ts"].dataType).alias("__ts"),
            F.lit(-1).alias("__side"),
            F.col("__carry.__payload").alias("__payload"),
            F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
        )
    )
    # boundary rows (side -1, null ts) sort first via the explicit flag;
    # then right-before-left at equal ts (inclusive backward), as in the
    # unsalted plan
    first_flag = F.when(F.col("__side") == -1, F.lit(0)).otherwise(F.lit(1))
    w = (
        Window.partitionBy("__k", "__r")
        .orderBy(first_flag, "__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r).unionByName(bounds)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return _project_output(carried, left, right, ts, payload_cols, tolerance)
