"""Golden-vector tests for the moving-window kernels vs the reference's own
testthat snapshots (matrixprofiler tests/testthat/_snaps/windowfunc.md,
decoded without R by tools/decode_r.py). Window size 150 throughout,
mirroring test-windowfunc.R:3."""

from __future__ import annotations

import numpy as np
import pytest

from matrixprofiler_spark.kernels import (
    movmax,
    movmean,
    movmean_std,
    movmin,
    movstd,
    movsum,
    movsum_ogita,
    movvar,
    muinvn,
)

W = 150


def exact(actual, expected):
    __tracebackhide__ = True
    a = np.asarray(actual, dtype=np.float64)
    e = np.asarray(expected, dtype=np.float64)
    assert a.shape == e.shape
    np.testing.assert_array_equal(a, e)


@pytest.mark.parametrize("kind", ["ogita", "normal", "fading"])
def test_movmean_golden_exact(goldens, series, kind):
    exact(movmean(series, W, kind), goldens[f"mov_mean_{kind}"])


def test_movmean_weighted_golden_8dp(goldens, series):
    got = np.round(movmean(series, W, "weighted"), 8)
    exact(got, goldens["mov_mean_weighted_8dp"])


@pytest.mark.parametrize("kind", ["ogita", "normal", "fading"])
def test_movsum_golden_exact(goldens, series, kind):
    exact(movsum(series, W, kind), goldens[f"mov_sum_{kind}"])


def test_movsum_weighted_golden_8dp(goldens, series):
    exact(np.round(movsum(series, W, "weighted"), 8), goldens["mov_sum_weighted_8dp"])


@pytest.mark.parametrize("kind", ["ogita", "normal", "fading"])
def test_movvar_golden_exact(goldens, series, kind):
    exact(movvar(series, W, kind), goldens[f"mov_var_{kind}"])


def test_movvar_weighted_golden_8dp(goldens, series):
    exact(np.round(movvar(series, W, "weighted"), 8), goldens["mov_var_weighted_8dp"])


def test_movmax_movmin_golden_exact(goldens, series):
    exact(movmax(series, W), goldens["mov_max"])
    exact(movmin(series, W), goldens["mov_min"])


def test_muinvn_golden_exact(goldens, series):
    got = muinvn(series, W)
    exact(got["avg"], goldens["muinvn"]["avg"])
    exact(got["sig"], goldens["muinvn"]["sig"])


def test_movstd_matches_ogita_construction(series):
    """mov_std == sqrt(movvar_ogita) per src/windowfunc.cpp:60-68."""
    exact(movstd(series, W), np.sqrt(movvar(series, W, "ogita")))


def test_movmean_std_struct_consistency(series):
    st = movmean_std(series, W)
    exact(st["avg"], movmean(series, W, "ogita"))
    exact(st["sum"], movsum(series, W, "ogita"))
    exact(st["sd"], movstd(series, W))


def test_ogita_equals_normal(series):
    """Mirrors test-windowfunc.R:22,46,70 (expect_equal at tolerance)."""
    np.testing.assert_allclose(
        movmean(series, W, "ogita"), movmean(series, W, "normal"), rtol=1e-12
    )


def test_integer_fast_path_equals_ogita_loop():
    """The int64 vectorized sliding sum must be bit-identical to the
    sequential Ogita loop on integer-valued data (the 100-TB fast path)."""
    rng = np.random.default_rng(42)
    tok = rng.integers(0, 50257, size=5000).astype(np.float64)
    w = 128
    fast = movsum_ogita(tok, w)  # dispatches to the int path
    # force the float loop by adding then removing a non-integral marker
    tok_f = tok + 0.0
    tok_f[0] += 0.5
    slow = movsum_ogita(tok_f, w)
    # windows not containing index 0 must agree exactly
    np.testing.assert_array_equal(fast[w:], slow[w:])


@pytest.mark.parametrize("w", [2, 32, 437])
def test_movsum_oracle_random_windows(series, w):
    """Cross-check vs a numpy oracle at loose tolerance for extra windows."""
    got = movsum_ogita(series, w)
    c = np.concatenate(([0.0], np.cumsum(series)))
    oracle = c[w:] - c[:-w]
    np.testing.assert_allclose(got, oracle, rtol=1e-9, atol=1e-12)
