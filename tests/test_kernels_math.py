"""Golden tests for scalar/vector math kernels (_snaps/math.md) plus the
ed_corr/corr_ed roundtrip property (mirrors test-math.R:1-9)."""

from __future__ import annotations

import numpy as np

from matrixprofiler_spark.kernels import (
    binary_split,
    complexity,
    corr_ed,
    ed_corr,
    normalize,
    std,
    znorm,
)


def test_std_golden(goldens, series):
    assert std(series) == goldens["std"]


def test_znorm_golden(goldens, series):
    np.testing.assert_array_equal(znorm(series), np.asarray(goldens["znorm"]))


def test_normalize_golden(goldens, series):
    np.testing.assert_array_equal(
        normalize(series, 1, 5), np.asarray(goldens["normalize_1_5"])
    )


def test_complexity_golden(goldens, series):
    assert complexity(series) == goldens["complexity"]


def test_binary_split_golden(goldens):
    np.testing.assert_array_equal(binary_split(50), np.asarray(goldens["binary_split_50"]))


def test_ed_corr_roundtrip():
    rng = np.random.default_rng(2021)
    corr = rng.uniform(size=1000)
    ed = corr_ed(corr, 100)
    back = ed_corr(ed, 100)
    np.testing.assert_allclose(back, corr, rtol=1e-12)


def test_znorm_low_variance_branch():
    """sd <= 0.01 -> returns x - mean only (src/mathtools.cpp:123-124)."""
    x = np.full(10, 5.0)
    x[0] = 5.001
    out = znorm(x)
    np.testing.assert_allclose(out, x - np.mean(x), rtol=0, atol=1e-15)
