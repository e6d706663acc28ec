"""Connected-components (dedup keep-list) tests: star contraction vs
min-label propagation, long-chain diameters, non-convergence signaling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matrixprofiler_spark.operators.dedup import duplicate_components


def _docs(spark, n):
    return spark.createDataFrame([(f"{i:03d}",) for i in range(n)], "doc_id string")


def _chain(spark, n):
    return spark.createDataFrame(
        [(f"{i:03d}", f"{i + 1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )


def test_star_handles_long_chain_in_log_rounds(spark):
    """Diameter-49 chain: label propagation would need 49 rounds (and now
    raises past max_iters); star contraction converges in O(log n)."""
    docs = _docs(spark, 60)
    pairs = _chain(spark, 50)
    r = {x.doc_id: x for x in
         duplicate_components(docs, pairs, max_iters=12, algorithm="star").collect()}
    assert all(r[f"{i:03d}"].component_id == "000" for i in range(50))
    assert sum(1 for x in r.values() if x.is_keeper) == 11  # 1 chain + 10 singletons
    assert all(r[f"{i:03d}"].component_id == f"{i:03d}" for i in range(50, 60))


def test_label_propagation_raises_on_deep_chain(spark):
    docs = _docs(spark, 30)
    pairs = _chain(spark, 30)
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_components(docs, pairs, max_iters=3, algorithm="label")


def test_star_equals_label_on_clustered_graph(spark):
    """Random-ish clustered pairs: both algorithms produce identical
    (component_id, is_keeper) labelings."""
    docs = _docs(spark, 40)
    rows = []
    for c in range(5):  # 5 clusters of 6, overlapping pair patterns
        base = c * 6
        ids = [f"{base + k:03d}" for k in range(6)]
        rows += [(ids[0], ids[2]), (ids[2], ids[4]), (ids[1], ids[4]),
                 (ids[3], ids[5]), (ids[5], ids[0])]
    pairs = spark.createDataFrame(rows, "doc_a string, doc_b string")
    star = sorted(
        (x.doc_id, x.component_id, x.is_keeper)
        for x in duplicate_components(docs, pairs, algorithm="star").collect()
    )
    label = sorted(
        (x.doc_id, x.component_id, x.is_keeper)
        for x in duplicate_components(docs, pairs, algorithm="label").collect()
    )
    assert star == label
