"""Exact-int kernel faces (operators/mp_exact.py): the face values must
agree with the production kernels (kernel_close TRUE on every row) and the
structural invariants must hold. The bitwise face-vs-DuckDB match is the
driver gate (tools/check_oracles.py); these tests pin the face-vs-kernel
side without DuckDB."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from matrixprofiler_spark.sources.tokens import chars_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chars(spark):
    df = chars_from_documents(spark, SF, 256).limit(60).cache()
    df.count()
    return df


@pytest.mark.parametrize("kernel", ["stomp", "stamp", "scrimp"])
def test_dist_face_kernel_close(spark, chars, kernel):
    from matrixprofiler_spark.operators.mp_exact import mp_dist_face

    rows = mp_dist_face(chars, 64, kernel=kernel,
                        left_right=(kernel == "stomp")).collect()
    assert rows
    assert all(r.kernel_close for r in rows), kernel
    if kernel == "stomp":
        # mp == pmin(left, right) wherever both sides exist
        for r in rows:
            if r.lmp >= 0 and r.rmp >= 0:
                assert r.mp == min(r.lmp, r.rmp)
            assert (r.lnn < r.off) or r.lnn == -1
            assert (r.rnn > r.off) or r.rnn == -1


def test_pearson_face_kernel_close(spark, chars):
    from matrixprofiler_spark.operators.mp_exact import mp_pearson_face

    rows = mp_pearson_face(chars, 64).collect()
    assert rows and all(r.kernel_close for r in rows)
    # mpx exclusion is one larger than stomp's: |off - nn| >= 33
    assert min(abs(r.off - r.nn_off) for r in rows) >= 33


def test_mpxab_contrast_faces_kernel_close(spark, chars):
    from matrixprofiler_spark.operators.mp_exact import contrast_face, mpxab_face

    ab = mpxab_face(chars, 64).collect()
    assert ab and all(r.kernel_close for r in ab)
    cp = contrast_face(chars, 50).collect()
    assert cp and all(r.kernel_close for r in cp)
    assert all(0 <= r.cp <= 1 for r in cp)


@pytest.mark.parametrize("kind,tol", [("normalized", 1e-6), ("absolute", 1e-4),
                                      ("weighted", 1e-5)])
def test_mass_faces_kernel_close(spark, chars, kind, tol):
    from matrixprofiler_spark.operators.mp_exact import mass_face

    rows = mass_face(chars, 64, kind=kind, tol=tol).collect()
    assert rows and all(r.kernel_close for r in rows), kind
    assert all(r.dist >= 0 for r in rows)
