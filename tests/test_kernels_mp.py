"""Golden + equivalence tests for the matrix-profile kernels.

Mirrors the reference's strongest invariants:
* golden-snapshot parity per algorithm (w=150, ez=0.5; contrast w=50);
* four-way algorithm equivalence STAMP == STOMP == SCRIMP == MPX
  (test-algorithms.R:44-52).

MPX/MPXAB are FFT-free and asserted BIT-EXACT vs the decoded RDS goldens.
STOMP/STAMP/SCRIMP involve FFT seeds where numpy's FFT differs from R's
mixed-radix FFT at ~1 ulp, so values are asserted at 1e-9 and indexes exact.
"""

from __future__ import annotations

import numpy as np
import pytest

from matrixprofiler_spark.kernels import contrast, mpx, mpxab, scrimp, stamp, stomp

W = 150
EZ = 0.5


def test_mpx_golden_bitexact(goldens, series):
    res = mpx(series, W, exclusion_zone=EZ, idxs=True, euclidean=True)
    g = goldens["mpx"]
    np.testing.assert_array_equal(res["matrix_profile"], np.asarray(g["matrix_profile"]))
    np.testing.assert_array_equal(res["profile_index"], np.asarray(g["profile_index"]))


def test_mpxab_golden_bitexact(goldens, series):
    res = mpxab(series, series[::-1].copy(), W, idxs=True, euclidean=True)
    g = goldens["mpxab"]
    np.testing.assert_array_equal(res["matrix_profile"], np.asarray(g["matrix_profile"]))
    np.testing.assert_array_equal(res["profile_index"], np.asarray(g["profile_index"]))
    np.testing.assert_array_equal(res["mpb"], np.asarray(g["mpb"]))
    np.testing.assert_array_equal(res["pib"], np.asarray(g["pib"]))


def _assert_profile(res, g, rtol=1e-9, check_idx=True):
    __tracebackhide__ = True
    np.testing.assert_allclose(
        res["matrix_profile"], np.asarray(g["matrix_profile"], dtype=np.float64),
        rtol=rtol, atol=1e-9,
    )
    if check_idx:
        np.testing.assert_array_equal(res["profile_index"], np.asarray(g["profile_index"]))


def test_stomp_golden(goldens, series):
    res = stomp(series, W, exclusion_zone=EZ)
    _assert_profile(res, goldens["stomp"])


def test_stamp_golden(goldens, series):
    res = stamp(series, W, exclusion_zone=EZ)
    _assert_profile(res, goldens["stamp"])


def test_scrimp_golden(goldens, series):
    res = scrimp(series, W, exclusion_zone=EZ, pre_scrimp=0.25)
    _assert_profile(res, goldens["scrimp"])


def test_contrast_golden(goldens, series):
    data1 = series[0:400]          # R series[1:400]
    data2 = series[449:750]        # R series[450:750]
    res = contrast(data1, data2, 50)
    g = goldens["contrast"]
    np.testing.assert_allclose(
        res["contrast_profile"], np.asarray(g["contrast_profile"]), rtol=1e-9, atol=1e-9
    )
    assert res["plato_idx"] == g["plato_idx"][0]
    assert res["plato_nn_idx"] == g["plato_nn_idx"][0]
    np.testing.assert_allclose(res["plato"], np.asarray(g["plato"]), rtol=0, atol=0)
    np.testing.assert_allclose(res["plato_nn"], np.asarray(g["plato_nn"]), rtol=0, atol=0)


def test_four_way_equivalence(series):
    """STAMP == STOMP == SCRIMP == MPX (euclidean), as the reference's
    test-algorithms.R asserts across four independent algorithms."""
    r_stamp = stamp(series, W, exclusion_zone=EZ)
    r_stomp = stomp(series, W, exclusion_zone=EZ)
    r_scrimp = scrimp(series, W, exclusion_zone=EZ)
    r_mpx = mpx(series, W, exclusion_zone=EZ)
    for other in (r_stomp, r_scrimp, r_mpx):
        np.testing.assert_allclose(
            r_stamp["matrix_profile"], other["matrix_profile"], rtol=1e-7, atol=1e-7
        )


def test_stomp_ab_join_matches_mpxab(series):
    """AB-join STOMP vs MPXAB matrix_profile (ez forced to 0)."""
    q = series[::-1].copy()
    r1 = stomp(series, W, query=q)
    r2 = mpxab(series, q, W)
    np.testing.assert_allclose(
        r1["matrix_profile"], r2["matrix_profile"], rtol=1e-6, atol=1e-6
    )


def test_stomp_constant_window_inf():
    """sigma < DBL_EPSILON windows -> +Inf distance (src/stomp.cpp:133-138)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=300)
    x[100:140] = 3.14  # constant run -> zero-variance windows
    res = stomp(x, 20, exclusion_zone=0.5)
    psize = x.size - 20 + 1
    # windows fully inside the constant run have sd 0 -> excluded as targets;
    # their own profiles are all-Inf
    assert np.isinf(res["matrix_profile"][110])
    assert res["profile_index"][110] == -1
    assert np.isfinite(res["matrix_profile"][0])


def test_stomp_nan_skip():
    """NA windows are zeroed + masked (src/stomp.cpp:36-51)."""
    rng = np.random.default_rng(8)
    x = rng.normal(size=300)
    x[150] = np.nan
    res = stomp(x, 20, exclusion_zone=0.5)
    # every window covering index 150 is a skip location -> Inf profile
    assert np.isinf(res["matrix_profile"][140])
    assert np.isfinite(res["matrix_profile"][0])


@pytest.mark.parametrize("w", [16, 64])
def test_mpx_vs_bruteforce(w):
    """MPX vs brute-force z-norm ED matrix profile on random data."""
    rng = np.random.default_rng(123)
    x = rng.normal(size=400)
    res = mpx(x, w, exclusion_zone=0.5)
    n = x.size
    plen = n - w + 1
    ez = int(round(w * 0.5 + np.finfo(float).eps)) + 1
    windows = np.lib.stride_tricks.sliding_window_view(x, w)
    mu = windows.mean(axis=1, keepdims=True)
    sd = windows.std(axis=1, keepdims=True)
    z = (windows - mu) / sd
    dist = np.sqrt(np.maximum(
        ((z[:, None, :] - z[None, :, :]) ** 2).sum(axis=2), 0))
    for i in range(plen):
        lo, hi = max(0, i - ez + 1), min(plen, i + ez)
        dist[i, lo:hi] = np.inf
    brute = dist.min(axis=1)
    np.testing.assert_allclose(res["matrix_profile"], brute, rtol=1e-5, atol=1e-5)


def test_left_right_profiles(series):
    """mp == pmin(left, right), mirroring the reference's own invariant
    (test-stomp.R 'Left Right Profiles')."""
    res = stomp(series, W, exclusion_zone=EZ, left_right_profile=True)
    join = np.minimum(res["left_matrix_profile"], res["right_matrix_profile"])
    np.testing.assert_allclose(res["matrix_profile"], join, rtol=0, atol=0)
    # left profile index always < position; right always > position
    lpi = res["left_profile_index"]
    rpi = res["right_profile_index"]
    pos = np.arange(lpi.size)
    ok_l = lpi >= 0
    ok_r = rpi >= 0
    assert (lpi[ok_l] <= pos[ok_l]).all()
    assert (rpi[ok_r] >= pos[ok_r]).all()


def test_mpx_pearson_branch(series):
    """euclidean == corr_ed(pearson) by construction (src/mpx.cpp:981-984)."""
    from matrixprofiler_spark.kernels import corr_ed

    r_e = mpx(series, W, exclusion_zone=EZ, euclidean=True)
    r_p = mpx(series, W, exclusion_zone=EZ, euclidean=False)
    np.testing.assert_array_equal(
        r_e["matrix_profile"], corr_ed(r_p["matrix_profile"], W))


def test_contrast_pearson_branch(series):
    res = contrast(series[0:400], series[449:750], 50, euclidean=False)
    cp = res["contrast_profile"]
    assert np.isfinite(cp).all() and (cp >= 0).all()
    assert 1 <= res["plato_idx"] <= cp.size


def test_scrimpab_vs_masked_bruteforce(series):
    """The real scrimpab kernel (src/scrimp.cpp:461-638) skips diagonals
    |data_off - query_off| <= 1 (compute_order > 1, src/scrimp.cpp:516) —
    verify both profiles against a brute force with those diagonals
    masked, and the indexes' diagonal gap."""
    from matrixprofiler_spark.kernels import scrimpab

    q = series[::-1].copy()
    w = 100
    r = scrimpab(series, q, w)
    m = series.size - w + 1

    wa = np.lib.stride_tricks.sliding_window_view(series, w)
    wb = np.lib.stride_tricks.sliding_window_view(q, w)
    za = (wa - wa.mean(axis=1, keepdims=True)) / wa.std(axis=1, keepdims=True)
    zb = (wb - wb.mean(axis=1, keepdims=True)) / wb.std(axis=1, keepdims=True)
    dist = np.sqrt(np.maximum(((za[:, None, :] - zb[None, :, :]) ** 2).sum(axis=2), 0))
    idx = np.arange(m)
    dist[np.abs(idx[:, None] - idx[None, :]) <= 1] = np.inf  # the quirk

    np.testing.assert_allclose(r["matrix_profile"], dist.min(axis=1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(r["mpb"], dist.min(axis=0), rtol=1e-6, atol=1e-6)
    assert (np.abs((r["profile_index"] - 1) - idx) >= 2).all()
    assert (np.abs((r["pib"] - 1) - idx) >= 2).all()


def test_scrimpab_requires_equal_sizes(series):
    from matrixprofiler_spark.kernels import scrimpab

    with pytest.raises(ValueError):
        scrimpab(series, series[:-10], 100)


def test_scrimp_ab_join_delegates(series):
    """scrimp(query=) routes to the real scrimpab kernel; outside the
    skipped |diag| <= 1 band it agrees with MPXAB."""
    q = series[::-1].copy()
    r1 = scrimp(series, W, query=q)
    r2 = mpxab(series, q, W)
    # positions whose MPXAB nearest neighbor is outside the skipped band
    # must agree exactly (same math, different traversal)
    pos = np.arange(r2["matrix_profile"].size)
    far = np.abs((r2["profile_index"] - 1) - pos) >= 2
    np.testing.assert_allclose(
        r1["matrix_profile"][far], r2["matrix_profile"][far],
        rtol=1e-6, atol=1e-6)
    assert far.mean() > 0.9  # the band rarely holds the best match here


@pytest.mark.parametrize("w", [9, 13])
def test_exclusion_zone_c_round_odd_w(w):
    """C round() (half away from zero) vs Python round() (half to even):
    at w = 9/13 (w*ez = 4.5/6.5 and the +DBL_EPSILON absorbed by the ulp),
    the reference excludes |i-j| <= 5/7 while banker's rounding would keep
    the zone one smaller and admit trivial neighbors (src/stomp.cpp:29).
    All four algorithms must agree with a brute force using the C zone."""
    from matrixprofiler_spark.kernels.mp import c_round

    exc = c_round(w * 0.5 + np.finfo(float).eps)
    assert exc == (w + 1) // 2  # half away from zero, NOT half to even

    rng = np.random.default_rng(7)
    # smooth series: adjacent windows are near-duplicates, so a too-small
    # exclusion zone visibly changes the profile
    x = np.cumsum(rng.normal(size=300)) + 0.01 * rng.normal(size=300)
    plen = x.size - w + 1
    windows = np.lib.stride_tricks.sliding_window_view(x, w)
    mu = windows.mean(axis=1, keepdims=True)
    sd = windows.std(axis=1, keepdims=True)
    z = (windows - mu) / sd
    dist = np.sqrt(np.maximum(((z[:, None, :] - z[None, :, :]) ** 2).sum(axis=2), 0))
    idx = np.arange(plen)
    dist[np.abs(idx[:, None] - idx[None, :]) <= exc] = np.inf
    brute = dist.min(axis=1)

    for algo in (stomp, stamp, scrimp, mpx):
        res = algo(x, w, exclusion_zone=0.5)
        np.testing.assert_allclose(
            res["matrix_profile"], brute, rtol=1e-6, atol=1e-6,
            err_msg=f"{algo.__name__} disagrees with C-round exclusion zone",
        )


def test_tile_partial_minima_matches_whole_matrix():
    """The row-blocked tile kernel (dgemm block + fused expression +
    strict-< column updates) must equal a naive whole-matrix evaluation
    bit-for-bit, including tie resolution and zero-variance masking."""
    import numpy as np

    from matrixprofiler_spark.operators.mp_ops import _tile_partial_minima

    rng = np.random.default_rng(3)
    w, exclusion = 16, 8
    for (m, n, a_off, b_off) in [(300, 300, 0, 0), (300, 277, 0, 284),
                                 (150, 400, 1000, 0), (200, 200, 0, 5)]:
        ai = rng.integers(0, 50, m).astype(np.int64)  # small vocab -> ties
        bi = rng.integers(0, 50, n).astype(np.int64)
        ai[40:40 + w] = 7  # zero-variance window on the a side
        na, nb = m - w + 1, n - w + 1
        gi = a_off + np.arange(na)
        gj = b_off + np.arange(nb)
        # naive reference
        wa = np.lib.stride_tricks.sliding_window_view(ai, w).astype(np.float64)
        wb = np.lib.stride_tricks.sliding_window_view(bi, w).astype(np.float64)
        qt = wa @ wb.T
        ca = np.concatenate(([np.int64(0)], np.cumsum(ai)))
        ca2 = np.concatenate(([np.int64(0)], np.cumsum(ai * ai)))
        mu_a = (ca[w:] - ca[:-w]) / float(w)
        cb = np.concatenate(([np.int64(0)], np.cumsum(bi)))
        cb2 = np.concatenate(([np.int64(0)], np.cumsum(bi * bi)))
        mu_b = (cb[w:] - cb[:-w]) / float(w)
        with np.errstate(invalid="ignore"):
            sd_a = np.sqrt((ca2[w:] - ca2[:-w]) / float(w) - mu_a * mu_a)
            sd_b = np.sqrt((cb2[w:] - cb2[:-w]) / float(w) - mu_b * mu_b)
        with np.errstate(divide="ignore", invalid="ignore"):
            dist = 2 * (w - (qt - w * mu_a[:, None] * mu_b[None, :])
                        / (sd_a[:, None] * sd_b[None, :]))
        dist[dist < 0] = 0
        ok_a, ok_b = sd_a > 0, sd_b > 0
        dist[~ok_a, :] = np.inf
        dist[:, ~ok_b] = np.inf
        dist[np.abs(gi[:, None] - gj[None, :]) <= exclusion] = np.inf
        ref_nn = np.argmin(dist, axis=1)
        ref_d = dist[np.arange(na), ref_nn]
        ref_nnc = np.argmin(dist, axis=0)
        ref_dc = dist[ref_nnc, np.arange(nb)]

        dmin, nn, oka, dmin_c, nn_c, okb = _tile_partial_minima(
            ai, bi, gi, gj, w, exclusion, True)
        assert (oka == ok_a).all() and (okb == ok_b).all()
        fin = np.isfinite(ref_d)
        assert (np.isfinite(dmin) == fin).all()
        assert (dmin[fin] == ref_d[fin]).all()
        assert (nn[fin] == gj[ref_nn[fin]]).all()
        finc = np.isfinite(ref_dc)
        assert (np.isfinite(dmin_c) == finc).all()
        assert (dmin_c[finc] == ref_dc[finc]).all()
        assert (nn_c[finc] == gi[ref_nnc[finc]]).all()
