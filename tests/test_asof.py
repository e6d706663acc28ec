"""asof_join operator semantics: inclusive backward match, no-match NULLs,
tolerance, and plan shape (single shuffle, no range/cartesian join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixprofiler_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 3, "c"), (2, 7, "d"), (3, 1, "e")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 4, 100), (1, 10, 200), (2, 9, 300)],
        "k long, t long, v long",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {r.tag: (r.v, r.asof_ts)
           for r in asof_join(left, right, "k", "t", ["v"]).collect()}
    assert out["a"] == (100, 4)    # latest right at t<=5 is t=4
    assert out["b"] == (200, 10)   # equal ts matches (inclusive)
    assert out["c"] == (None, None)  # nothing at or before t=3
    assert out["d"] == (None, None)  # right exists only at t=9 > 7
    assert out["e"] == (None, None)  # key has no right rows


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {r.tag: r.v
           for r in asof_join(left, right, "k", "t", ["v"], tolerance=1).collect()}
    assert out["a"] == 100         # age = 5-4 = 1 <= tolerance 1 -> kept
    out1 = {r.tag: r.v
            for r in asof_join(left, right, "k", "t", ["v"], tolerance=0.5).collect()}
    assert out1["a"] is None       # age 1 > 0.5 -> dropped
    assert out1["b"] == 200        # age 0 always kept


def test_asof_salted_matches_unsalted(spark):
    """The salted (hot-key-safe) plan is result-identical to the plain
    plan for any split width, including widths that slice a key's history
    into many ranges and widths larger than the whole span."""
    left, right = _frames(spark)
    base = sorted(
        (r.k, r.t, r.tag, r.v, r.asof_ts)
        for r in asof_join(left, right, "k", "t", ["v"]).collect()
    )
    for width in (1, 2, 3, 100):
        salted = sorted(
            (r.k, r.t, r.tag, r.v, r.asof_ts)
            for r in asof_join(left, right, "k", "t", ["v"],
                               split_width=width).collect()
        )
        assert salted == base, f"width={width}"
    # tolerance composes identically
    tol = sorted(
        (r.tag, r.v)
        for r in asof_join(left, right, "k", "t", ["v"], tolerance=1).collect()
    )
    tol_s = sorted(
        (r.tag, r.v)
        for r in asof_join(left, right, "k", "t", ["v"], tolerance=1,
                           split_width=2).collect()
    )
    assert tol_s == tol


def test_asof_salted_hot_key_parallelism(spark):
    """One key owning ~all rows: the salted window must partition by
    (key, range) — visible in the plan's window Exchange — and spread the
    hot key across >1 task, while staying result-identical."""
    import random

    rng = random.Random(7)
    hot_left = [(1, t, f"L{t}") for t in range(0, 2000, 2)]
    hot_right = [(1, t, rng.randrange(10**6)) for t in range(1, 2000, 2)]
    left = spark.createDataFrame(hot_left + [(2, 5, "x")],
                                 "k long, t long, tag string")
    right = spark.createDataFrame(hot_right + [(2, 3, 42)],
                                  "k long, t long, v long")
    plain = sorted(
        (r.k, r.t, r.tag, r.v, r.asof_ts)
        for r in asof_join(left, right, "k", "t", ["v"]).collect()
    )
    salted_df = asof_join(left, right, "k", "t", ["v"], split_width=100)
    salted = sorted(
        (r.k, r.t, r.tag, r.v, r.asof_ts) for r in salted_df.collect()
    )
    assert salted == plain
    # the carry-forward window partitions on (key, range id), not key alone
    plan = salted_df._sc._jvm.PythonSQLUtils.explainString(
        salted_df._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning(__k" in plan and "__r" in plan.split(
        "hashpartitioning(__k", 1)[1][:40]
    # the hot key's rows actually land on >1 task in the window stage
    # (AQE would coalesce this test-sized shuffle into one partition, so
    # pin it off for the task-count probe — at real scale the partitions
    # are far above the coalesce target and stay separate)
    saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        n_parts = (
            asof_join(left, right, "k", "t", ["v"], split_width=100)
            .filter(F.col("k") == 1)
            .withColumn("pid", F.spark_partition_id())
            .select("pid").distinct().count()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", saved)
    assert n_parts > 1


def test_asof_plan_no_cartesian(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, "k", "t", ["v"])._sc._jvm.PythonSQLUtils.explainString(
        asof_join(left, right, "k", "t", ["v"])._jdf.queryExecution(), "formatted"
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # exactly the union -> window shape: one exchange on the key
    assert plan.count("Exchange") <= 2


def test_asof_salted_random_equivalence(spark):
    """Randomized sweep: salted == unsalted on adversarial shapes —
    duplicate left timestamps, right rows exactly on range borders, keys
    with left-only / right-only rows, widths from sub-unit to
    whole-span."""
    import random

    rng = random.Random(1234)
    for trial in range(4):
        n_keys = rng.randint(1, 5)
        lrows, rrows = [], []
        for k in range(n_keys):
            for _ in range(rng.randint(0, 40)):
                lrows.append((k, rng.randint(0, 500), f"L{len(lrows)}"))
            seen = set()
            for _ in range(rng.randint(0, 25)):
                t = rng.randint(0, 500)
                if t not in seen:  # right unique per (key, ts)
                    seen.add(t)
                    rrows.append((k, t, rng.randint(0, 10**6)))
        if not lrows:
            lrows.append((0, 1, "L0"))
        left = spark.createDataFrame(lrows, "k long, t long, tag string")
        right = spark.createDataFrame(
            rrows or [(99, 0, 0)], "k long, t long, v long"
        )
        base = sorted(
            (r.k, r.t, r.tag, r.v, r.asof_ts)
            for r in asof_join(left, right, "k", "t", ["v"]).collect()
        )
        for width in (1, 7, 100, 1000):
            got = sorted(
                (r.k, r.t, r.tag, r.v, r.asof_ts)
                for r in asof_join(left, right, "k", "t", ["v"],
                                   split_width=width).collect()
            )
            assert got == base, f"trial {trial} width {width}"


def test_asof_mixed_ts_dtypes_rejected(spark):
    """Both plans derive ts conversions from the RIGHT side's dtype and
    apply them to both sides — mixed-type inputs must be refused at entry
    rather than converting left rows with the wrong branch."""
    import pytest

    left, right = _frames(spark)
    left_ts = left.withColumn("t", F.timestamp_seconds(F.col("t")))
    with pytest.raises(TypeError, match="families match"):
        asof_join(left_ts, right, "k", "t", ["v"])
    with pytest.raises(TypeError, match="families match"):
        asof_join(left_ts, right, "k", "t", ["v"], split_width=10)
    # same-family mixes (timestamp vs timestamp_ntz, long vs double) are
    # legal — the conversion branch is identical within a family
    right_ntz = right.withColumn(
        "t", F.timestamp_seconds(F.col("t")).cast("timestamp_ntz")
    )
    assert asof_join(left_ts, right_ntz, "k", "t", ["v"]).count() == left.count()
    # non-numeric, non-timestamp ts (string, date) are refused outright:
    # the plain plan would sort a string ts lexicographically while the
    # salted plan ranges numerically — silently divergent results
    left_str = left.withColumn("t", F.col("t").cast("string"))
    with pytest.raises(TypeError, match="numeric or timestamp"):
        asof_join(left_str, right, "k", "t", ["v"])
    right_date = right.withColumn(
        "t", F.date_add(F.lit("2024-01-01").cast("date"), F.col("t").cast("int"))
    )
    with pytest.raises(TypeError, match="numeric or timestamp"):
        asof_join(left, right_date, "k", "t", ["v"])


def test_auto_split_width(spark):
    """auto_split_width: (a) returns None when no key exceeds the target
    (plain plan suffices) or when the span is degenerate; (b) for a hot
    key always yields >= 2 ranges across the span (the pathological
    all-rows-one-range salting cannot be produced); (c) the auto-routed
    join is result-identical to plain and fixed-width plans."""
    import math

    from matrixprofiler_spark.operators.asof import auto_split_width

    rows = [(1, t, f"L{t}") for t in range(200)] + [(2, 5, "Lx")]
    left = spark.createDataFrame(rows, "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, t, t * 10) for t in range(0, 200, 7)], "k long, t long, v long"
    )

    # (a) nobody hot -> None; degenerate span -> None
    assert auto_split_width(left, right, "k", "t", target_rows=10_000) is None
    one_ts = spark.createDataFrame([(1, 5, "a")] * 30, "k long, t long, tag string")
    assert auto_split_width(one_ts, right.filter("t = 5"), "k", "t",
                            target_rows=3) is None

    # (b) hot key (key 1: 200 left + 29 right rows, span 199) -> >= 2 ranges
    w = auto_split_width(left, right, "k", "t", target_rows=50)
    assert w is not None and 0 < w < 199  # width < span -> at least 2 ranges
    assert math.ceil(199 / w) >= 2

    # (b2) the width derives from the HOT KEY'S OWN span, not the global
    # one: a hot key bunched in [0, 10] next to a sparse key spanning
    # 100000 must still land in >= 2 ranges
    bunched = spark.createDataFrame(
        [(1, t % 11, f"L{t}") for t in range(100)] + [(2, 0, "s0"), (2, 100000, "s1")],
        "k long, t long, tag string",
    )
    r2 = spark.createDataFrame([(1, 5, 7)], "k long, t long, v long")
    w2 = auto_split_width(bunched, r2, "k", "t", target_rows=50)
    assert w2 is not None and w2 <= 10 / 2  # >= 2 ranges across [0, 10]

    # (c) auto == plain == fixed widths
    base = sorted((r.k, r.t, r.tag, r.v, r.asof_ts)
                  for r in asof_join(left, right, "k", "t", ["v"]).collect())
    got_auto = sorted(
        (r.k, r.t, r.tag, r.v, r.asof_ts)
        for r in asof_join(left, right, "k", "t", ["v"], split_width="auto",
                           auto_target_rows=50).collect()
    )
    assert got_auto == base
    got_fixed = sorted(
        (r.k, r.t, r.tag, r.v, r.asof_ts)
        for r in asof_join(left, right, "k", "t", ["v"], split_width=w).collect()
    )
    assert got_fixed == base


def test_auto_split_width_adversarial_skew(spark):
    """VERDICT r5 #7: one key holds 99% of all rows, its own span is a
    sliver of the global span. The derived width must still split the
    hot key into >1 (key, range) task, and the salted result must match
    the plain plan bit-for-bit. The fully-degenerate variant (hot key
    entirely on ONE timestamp) must fall back to the plain plan (None)
    rather than emit a width that cannot split equal timestamps."""
    import math

    from matrixprofiler_spark.operators.asof import asof_join, auto_split_width

    # 990 of 1000 left rows on key H, all inside ts [1000, 1002];
    # 10 cold rows on key C spread over [0, 100000]
    rows = [(7, 1000 + (i % 3), f"h{i}") for i in range(990)] + [
        (8, i * 10_000, f"c{i}") for i in range(10)]
    left = spark.createDataFrame(rows, "k long, t long, tag string")
    right = spark.createDataFrame(
        [(7, 1000, 70), (7, 1001, 71), (8, 0, 80)], "k long, t long, v long")

    w = auto_split_width(left, right, "k", "t", target_rows=100)
    # hot key's own span is 2; ceil(993/100)=10 target ranges -> w = 2/10
    assert w is not None and w <= 2 / 2  # >= 2 ranges across the sliver
    hot_ranges = {math.floor(t / w) for t in (1000, 1001, 1002)}
    assert len(hot_ranges) > 1  # >1 task for the hot key

    key = lambda r: (r.k, r.t, r.tag, r.v, r.asof_ts)
    plain = sorted(map(key, asof_join(left, right, "k", "t", ["v"]).collect()))
    salted = sorted(map(key, asof_join(
        left, right, "k", "t", ["v"], split_width="auto",
        auto_target_rows=100).collect()))
    assert salted == plain

    # fully degenerate hot key: every row at ONE ts -> auto=None (plain
    # plan; ranges cannot split equal timestamps), result still correct
    deg = spark.createDataFrame(
        [(7, 5, f"h{i}") for i in range(990)] + [(8, 11, "c")],
        "k long, t long, tag string")
    rdeg = spark.createDataFrame([(7, 4, 70), (8, 3, 80)], "k long, t long, v long")
    assert auto_split_width(deg, rdeg, "k", "t", target_rows=100) is None
    got = sorted(map(key, asof_join(
        deg, rdeg, "k", "t", ["v"], split_width="auto",
        auto_target_rows=100).collect()))
    want = sorted(map(key, asof_join(deg, rdeg, "k", "t", ["v"]).collect()))
    assert got == want
