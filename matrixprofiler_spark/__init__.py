"""matrixprofiler_spark — a PySpark-native time-series rollup + downsample +
retention engine whose per-window aggregation kernels reproduce the checked
math of the matrixprofiler reference (movmean/movstd/MASS/STOMP/MPX/...).

Layout:
    kernels/    pure-numpy kernels, bit-exact vs the reference C++ goldens
    operators/  Spark DataFrame operators (rollup tiers, gap-fill, MP ops,
                dedup, similarity search)
    sources/    tokens-table synthesis & IO (Iceberg-shaped parquet)
    functions/  column-level helpers (text analysis, hashing)
    codecs/     Gorilla XOR + delta-of-delta bit-packed codecs
    plans/      partitioning/skew planning helpers
    streaming/  incremental/resume orchestration (snapshot checkpoints)
"""

__version__ = "0.2.0"
