"""Golden tests for MASS kernels vs _snaps/mass.md (8-dp JSON snapshots,
w=100, index=100, weights=11:110 — test-mass.R:3-6,48-49)."""

from __future__ import annotations

import numpy as np
import pytest

from matrixprofiler_spark.kernels import (
    mass,
    mass_pre,
    mass_pre_abs,
    mass_pre_weighted,
)

W = 100
INDEX = 100  # 1-based, as in the reference


def assert_8dp(actual, expected):
    __tracebackhide__ = True
    a = np.round(np.asarray(actual, dtype=np.float64), 8)
    e = np.asarray(expected, dtype=np.float64)
    assert a.shape == e.shape
    mismatch = np.abs(a - e)
    # 8-dp rounded goldens: a true value within FFT noise (~1e-12) of a
    # rounding midpoint may legitimately round to the adjacent grid step,
    # so allow at most one 1e-8 grid step of disagreement.
    assert mismatch.max() <= 1.01e-8, f"max abs diff {mismatch.max()}"


def test_mass_normalized_golden(goldens, series):
    pre = mass_pre(series, W)
    res = mass(pre, series, index=INDEX)
    assert_8dp(res["distance_profile"], goldens["mass_normalized_distance_profile_8dp"])
    assert_8dp(res["last_product"], goldens["mass_normalized_last_product_8dp"])


def test_mass_non_normalized_golden(goldens, series):
    pre = mass_pre_weighted(series, W, weights=np.ones(W))
    pre["type"] = "non_normalized"
    res = mass(pre, series, index=INDEX)
    assert_8dp(res["distance_profile"], goldens["mass_non_normalized_distance_profile_8dp"])
    assert_8dp(res["last_product"], goldens["mass_non_normalized_last_product_8dp"])


def test_mass_absolute_golden(goldens, series):
    pre = mass_pre_abs(series, W)
    res = mass(pre, series, index=INDEX)
    assert_8dp(res["distance_profile"], goldens["mass_absolute_distance_profile_8dp"])
    assert_8dp(res["last_product"], goldens["mass_absolute_last_product_8dp"])


def test_mass_weighted_golden(goldens, series):
    weights = np.arange(11, 111, dtype=np.float64)
    pre = mass_pre_weighted(series, W, weights=weights)
    res = mass(pre, series, index=INDEX)
    assert_8dp(res["distance_profile"], goldens["mass_weighted_distance_profile_8dp"])
    assert_8dp(res["last_product"], goldens["mass_weighted_last_product_8dp"])


def test_mass_v2_equals_v3(goldens, series):
    """v2 (single FFT) and v3 (chunked) must agree (same math)."""
    pre = mass_pre(series, W)
    r2 = mass(pre, series, index=INDEX, version="v2")
    r3 = mass(pre, series, index=INDEX, version="v3")
    np.testing.assert_allclose(
        r2["distance_profile"], r3["distance_profile"], rtol=1e-8, atol=1e-8
    )


@pytest.mark.parametrize("idx", [1, 50, 300, 776])
def test_mass_vs_bruteforce(series, idx):
    """Every index: FFT MASS == brute-force z-norm ED^2."""
    pre = mass_pre(series, W)
    res = mass(pre, series, index=idx)
    q = series[idx - 1 : idx - 1 + W]
    qz = (q - q.mean()) / q.std()
    n = series.size
    brute = np.empty(n - W + 1)
    for j in range(n - W + 1):
        d = series[j : j + W]
        dz = (d - d.mean()) / d.std()
        brute[j] = np.sum((dz - qz) ** 2)
    np.testing.assert_allclose(res["distance_profile"], brute, rtol=1e-6, atol=1e-6)
