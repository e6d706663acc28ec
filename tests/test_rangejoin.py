"""range_join operator: bucketized interval join semantics + plan shape."""

from __future__ import annotations

from matrixprofiler_spark.operators.rangejoin import range_join


def _frames(spark):
    pts = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 99, "c"), (2, 7, "d")],
        "k long, t long, tag string",
    )
    iv = spark.createDataFrame(
        [(1, 0, 6, "x"), (1, 4, 12, "y"), (1, 50, 60, "z"), (2, 8, 9, "w")],
        "k long, lo long, hi long, name string",
    )
    return pts, iv


def test_range_join_containment(spark):
    pts, iv = _frames(spark)
    for bw in (1, 3, 7, 100):  # result independent of bucket width
        got = sorted(
            (r.tag, r.name)
            for r in range_join(pts, iv, "k", "t", "lo", "hi", bw).collect()
        )
        assert got == [("a", "x"), ("a", "y"), ("b", "y")], (bw, got)


def test_range_join_plan_no_nested_loop(spark):
    pts, iv = _frames(spark)
    df = range_join(pts, iv, "k", "t", "lo", "hi", 10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan
