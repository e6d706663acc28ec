"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in matrixprofiler_spark/; this module is the thin
driver-facing surface:

* ``entry(spark)``      — flagship rollup pipeline at sf0.001.
* ``queries()``         — every implemented operator (SURVEY.md §2 +
                          training-data ops), (spark, sf_dir) -> DataFrame.
* ``oracle_sql()``      — DuckDB-runnable ANSI SQL twins; results are
                          designed to hash-match bit-for-bit (exact integer
                          sums + identical IEEE double expressions); see
                          matrixprofiler_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tiered rollup (1m->1h->1d) + derived stats + gap-fill over
    the tokens view of /root/testdata/sf0.001, returning the filled rollup
    table (one row per doc/tier/bucket)."""
    from matrixprofiler_spark.operators.rollup import (
        gap_fill,
        tier_rollup,
        with_derived_stats,
    )
    from matrixprofiler_spark.sources.tokens import tokens_from_documents

    tokens = tokens_from_documents(spark, "/root/testdata/sf0.001")
    rolled = with_derived_stats(tier_rollup(tokens))
    return gap_fill(rolled.drop("mean", "std")).select(
        "doc_id", "source", "tier", "bucket", "cnt", "sum_v", "sumsq",
        "min_v", "max_v", "filled",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from matrixprofiler_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from matrixprofiler_spark.queries import oracle_sql as _o

    return _o()
