"""Native (C) MPX inner loop must be byte-identical to the numpy path.

The native path is an optimization of the SAME op sequence (see
kernels/native_mpx.c); this sweep drives both paths of _mpx_core directly
over adversarial inputs — exact correlation ties (tiny alphabets, periodic
series), zero-variance windows (sig = inf branches), NaN/Inf data, edge
sizes around the diagonal batch — and requires bit equality of values AND
indexes (tobytes comparison: array_equal would miss -0.0 vs +0.0).
"""

from __future__ import annotations

import numpy as np
import pytest

from matrixprofiler_spark.kernels.mp import _mpx_core, _native_mpx_lib, mpx
from matrixprofiler_spark.kernels import native as native_mod


def _lib():
    lib = _native_mpx_lib()
    if lib is None:
        pytest.skip("native mpx unavailable (no compiler?)")
    return lib


def _check(x, w):
    lib = _lib()
    x = np.ascontiguousarray(x, dtype=np.float64)
    a = _mpx_core(x, w, 0.5, True, True, lib=None)
    b = _mpx_core(x, w, 0.5, True, True, lib=lib)
    assert a["matrix_profile"].tobytes() == b["matrix_profile"].tobytes()
    assert a["profile_index"].tobytes() == b["profile_index"].tobytes()
    # idxs=False variant (NULL mpi pointer path)
    a2 = _mpx_core(x, w, 0.5, False, True, lib=None)
    b2 = _mpx_core(x, w, 0.5, False, True, lib=lib)
    assert a2["matrix_profile"].tobytes() == b2["matrix_profile"].tobytes()


def test_low_alphabet_ties():
    rng = np.random.default_rng(7)
    for n in (200, 300, 1024, 2100):
        for w in (8, 64, 128):
            if n - w + 1 >= 10:
                _check(rng.integers(0, 3, size=n).astype(np.float64), w)


def test_constant_runs_and_spikes():
    x = np.ones(500)
    x[100:120] = 5.0
    _check(x, 8)
    x = np.zeros(1000)
    x[::97] = 1.0
    _check(x, 16)


def test_periodic_exact_ties():
    _check(np.tile(np.arange(16, dtype=np.float64), 64), 32)
    _check(np.tile(np.array([1.0, 2.0]), 500), 8)


def test_smooth_and_token_like():
    rng = np.random.default_rng(11)
    for n in (1000, 5000):
        _check(np.sin(np.arange(n) * 0.1), 100)
        _check(rng.normal(size=n), 50)
        _check(rng.integers(0, 50257, size=n).astype(np.float64), 128)


def test_nan_inf_data():
    rng = np.random.default_rng(3)
    x = rng.normal(size=800)
    x[100] = np.nan
    x[400] = np.inf
    _check(x, 64)


def test_batch_boundary_sizes():
    # plen around diag_batch transitions (2^17 budget, cap 256)
    rng = np.random.default_rng(5)
    for n in (140, 513 + 127, 512 + 128, 2048 + 127):
        _check(rng.integers(0, 9, size=n).astype(np.float64), 128)


def test_public_mpx_uses_sane_path():
    # whatever path mpx() picks must match the numpy reference core
    rng = np.random.default_rng(9)
    x = rng.integers(0, 5, size=700).astype(np.float64)
    a = mpx(x, 32)
    b = _mpx_core(np.ascontiguousarray(x), 32, 0.5, True, True, lib=None)
    assert a["matrix_profile"].tobytes() == b["matrix_profile"].tobytes()
    assert a["profile_index"].tobytes() == b["profile_index"].tobytes()


def test_kill_switch(monkeypatch):
    # MATRIXPROFILER_NO_NATIVE must force get_lib() to None for new state
    monkeypatch.setenv("MATRIXPROFILER_NO_NATIVE", "1")
    monkeypatch.setattr(native_mod, "_tried", False)
    monkeypatch.setattr(native_mod, "_lib", None)
    assert native_mod.get_lib() is None


def test_native_tile_minima_equality():
    """C rolling-QT tile kernel must be byte-identical to the numpy
    dgemm-block path on adversarial tiles (exact ties, zero-variance
    windows, near-diagonal exclusion bands, asymmetric shapes)."""
    from matrixprofiler_spark.operators.mp_ops import (
        _native_tile_lib, _tile_partial_minima)

    lib = _native_tile_lib()
    if lib is None:
        pytest.skip("native tile kernel unavailable")
    rng = np.random.default_rng(99)
    for trial in range(120):
        w = int(rng.choice([8, 16, 64, 128]))
        na_len = int(rng.integers(w + 1, 300))
        nb_len = int(rng.integers(w + 1, 300))
        alpha = int(rng.choice([2, 3, 50257]))
        ai = rng.integers(0, alpha, size=na_len).astype(np.int64)
        bi = rng.integers(0, alpha, size=nb_len).astype(np.int64)
        if rng.random() < 0.3:
            ai[10 : min(30, na_len)] = 7
        if rng.random() < 0.2:
            bi[:] = 3
        a_off = int(rng.integers(0, 3000))
        b_off = (a_off + int(rng.integers(0, 500))
                 if rng.random() < 0.5 else int(rng.integers(0, 3000)))
        both = bool(rng.random() < 0.7)
        ez = int(rng.choice([0, 4, 64]))
        gi = a_off + np.arange(ai.size - w + 1)
        gj = b_off + np.arange(bi.size - w + 1)
        ra = _tile_partial_minima(ai, bi, gi, gj, w, ez, both, _lib=None)
        rb = _tile_partial_minima(ai, bi, gi, gj, w, ez, both, _lib=lib)
        for va, vb in zip(ra, rb):
            if va is None and vb is None:
                continue
            assert np.asarray(va).tobytes() == np.asarray(vb).tobytes()


def test_native_codecs_equality():
    """C Gorilla/DoD encoders must be byte-identical to the numpy
    assemblers (NaN payloads, +-0.0, infinities, repeats, int64 extremes,
    single-value and empty-adjacent series)."""
    from matrixprofiler_spark.codecs.gorilla import (
        _gorilla_encode_numpy, _native_codec_lib, _native_gorilla_many,
        _native_dod_many, gorilla_decode)
    from matrixprofiler_spark.codecs.dod import _dod_encode_numpy, dod_decode

    lib = _native_codec_lib()
    if lib is None:
        pytest.skip("native codecs unavailable")
    rng = np.random.default_rng(5)
    for t in range(120):
        n = int(rng.integers(1, 300))
        kind = t % 5
        if kind == 0:
            x = rng.normal(size=n)
        elif kind == 1:
            x = np.repeat(rng.normal(size=max(1, n // 7)), 7)[:n]
        elif kind == 2:
            x = rng.integers(0, 2 ** 62, size=n,
                             dtype=np.int64).view(np.float64)
        elif kind == 3:
            x = np.full(n, rng.choice([0.0, -0.0, np.inf, np.nan]))
        else:
            x = np.round(rng.normal(size=n), 1)
        x = np.ascontiguousarray(x, dtype=np.float64)
        blob = _native_gorilla_many(lib, [x],
                                    np.array([x.size], dtype=np.int64))[0]
        assert blob == _gorilla_encode_numpy(x)
        assert (gorilla_decode(blob).view(np.uint64).tobytes()
                == x.view(np.uint64).tobytes())
    for t in range(120):
        n = int(rng.integers(1, 300))
        kind = t % 4
        if kind == 0:
            x = rng.integers(-10, 10, size=n, dtype=np.int64).cumsum()
        elif kind == 1:
            x = np.arange(n, dtype=np.int64) * 60
        elif kind == 2:
            x = rng.integers(np.iinfo(np.int64).min // 2,
                             np.iinfo(np.int64).max // 2,
                             size=n, dtype=np.int64)
        else:
            x = np.full(n, 7, dtype=np.int64)
        x = np.ascontiguousarray(x, dtype=np.int64)
        blob = _native_dod_many(lib, [x],
                                np.array([x.size], dtype=np.int64))[0]
        assert blob == _dod_encode_numpy(x)
        assert np.array_equal(dod_decode(blob), x)
