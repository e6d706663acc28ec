"""Dump .explain('formatted') plans for the queries touched in the r7
optimization round. Run from BOTH the round-start tree (suffix 'before')
and the optimized tree (suffix 'after'):

    python tools/dump_plans_r07.py <out_dir> <suffix>
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    out_dir.mkdir(parents=True, exist_ok=True)
    sf = "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from matrixprofiler_spark.queries import queries as qreg

    reg = qreg()
    names = [
        "realtime_rollup", "rollup_1m", "text_stats", "sliding_stats_w8",
        "matrix_profile_w8", "mass_w8", "zero_crossings_w16",
        "dedup_ngram_jaccard", "dedup_minhash_lsh",
    ]
    for n in names:
        try:
            (out_dir / f"{n}_{suffix}.txt").write_text(
                plan_of(reg[n](spark, sf)))
            print("dumped", n)
        except Exception as e:  # noqa: BLE001 - report and continue
            print("FAILED", n, e)

    # lifecycle jobs: run a tiny job, then dump the serving-read plans and
    # the store file censuses (the write-side change is a layout/IO-model
    # change; the read plans show its effect)
    import glob

    from matrixprofiler_spark.operators.rollup import finest_rollup
    from matrixprofiler_spark.sources.tokens import tokens_from_documents
    from matrixprofiler_spark.streaming.compress import CompressionPolicyJob
    from matrixprofiler_spark.streaming.expiry import RetentionExpiryJob

    fine = finest_rollup(tokens_from_documents(spark, sf), 16).cache()
    fine.count()

    base_c = tempfile.mkdtemp(prefix="plans_compress_")
    cjob = CompressionPolicyJob(spark, base_c, 16, 64, 16, n_groups=4)
    cjob.run(fine)
    nseg_files = len(glob.glob(base_c + "/segments/grp=*/*.parquet"))
    nhead_files = len(glob.glob(base_c + "/head/grp=*/*.parquet"))
    txt = (
        f"segment store parquet files: {nseg_files}\n"
        f"head store parquet files: {nhead_files}\n\n"
        + plan_of(cjob.read_fine(bucket_min=0, bucket_max=3))
    )
    (out_dir / f"compressed_range_read_{suffix}.txt").write_text(txt)
    print("dumped compressed_range_read")

    base_e = tempfile.mkdtemp(prefix="plans_expiry_")
    ejob = RetentionExpiryJob(spark, base_e, 16, 64, 32, n_groups=4)
    ejob.run(fine)
    ncomp_files = len(glob.glob(base_e + "/compacted/grp=*/*.parquet"))
    txt = (
        f"compacted store parquet files: {ncomp_files}\n\n"
        + plan_of(ejob.result())
    )
    (out_dir / f"retention_expiry_result_{suffix}.txt").write_text(txt)
    print("dumped retention_expiry_result")
    spark.stop()


if __name__ == "__main__":
    main()
