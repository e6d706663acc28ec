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


def test_asof_plan_no_cartesian(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, "k", "t", ["v"])._sc._jvm.PythonSQLUtils.explainString(
        asof_join(left, right, "k", "t", ["v"])._jdf.queryExecution(), "formatted"
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # exactly the union -> window shape: one exchange on the key
    assert plan.count("Exchange") <= 2
