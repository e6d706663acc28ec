"""Physical retention expiry: the TimescaleDB ``drop_chunks`` analog.

``retention_policy`` (operators/rollup.py) is a serving VIEW — it decides
which tier answers for which offset range, but the expired fine-tier rows
stay on disk. At 100 TB the fine tier dominates storage cost, so the
missing half of the north rule's "retention engine" is a job that
physically REWRITES the stored fine tier dropping every bucket whose
serving responsibility has passed to the coarse tier (reference analog for
the contract shape: the precompute-once/serve-many stats-struct lifecycle
of /root/reference/src/mass.cpp:408-443; commit contract mirrored from
streaming/checkpoint.py's RollupJob).

Semantics (exactly the serving view's fine-tier predicate, so the view
over the compacted store is provably row-identical to the view over the
full store — pytest-asserted):

* per-doc watermark  ``wm = (max(bucket)+1) * fine_size``   (pre-compaction)
* expiry cutoff      ``cut = floor((wm - horizon)/coarse_size)*coarse_size``
  — aligned DOWN to the coarse grid, same math as
  ``retention_policy_multi`` (operators/rollup.py)
* a fine bucket is DROPPED iff ``(bucket+1)*fine_size <= cut``.

The job additionally persists the captured watermark table: after
compaction a fully-expired doc (horizon 0, wm on a coarse boundary) has no
fine rows left, so its watermark can no longer be recomputed from the
store — the serving view over a compacted store must read the stored
watermark (``retention_policy(..., watermark=job.watermarks())``), the
same way TimescaleDB keeps the continuous-aggregate watermark in catalog
metadata rather than deriving it from the hypertable.

Commit contract (identical to RollupJob):

    fine_staged/grp=<k>/...parquet       staged input, hive-partitioned
    compacted/grp=<k>/...parquet         rewritten fine partitions
    watermarks/grp=<k>/...parquet        pre-compaction per-doc watermark
    manifests/expiry_<k>.json            lineage: rows before/dropped/after,
                                         input fingerprint, wall time
    _stage_expiry_COMMITTED              stage-level marker

The per-group manifest is written LAST via write-then-rename — it is the
commit point. A killed run leaves no manifest for the group it died in, so
re-running resumes exactly there (kill-and-resume pytested). A group's
data writes are idempotent overwrites, so a torn data write under a
missing manifest is simply redone.

Scale shape: one staged write + n_groups pruned reads; per group, one
map-side-combinable watermark aggregate over ROLLUP rows (never raw
tokens) and one equi-join on (doc_id, source) — no broadcast of any
corpus-sized side, no skew (one watermark row per doc). At 1000 executors
each group maps to a set of Iceberg partition overwrites (REPLACE WHERE),
committed per group exactly as RollupJob._commit_iceberg does.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import __version__
from ..operators.rollup import retention_policy
from .checkpoint import read_manifest

STAGE = "expiry"


class RetentionExpiryJob:
    """Partition-grouped, resumable physical expiry of a fine-tier rollup
    store. ``fine_size``/``coarse_size``/``horizon`` are the retention
    policy's parameters (coarse_size must be a multiple of fine_size,
    horizon >= 0 — same domain the serving view enforces)."""

    def __init__(self, spark: SparkSession, base_dir: str | Path,
                 fine_size: int, coarse_size: int, horizon: int,
                 n_groups: int = 8):
        if coarse_size % fine_size:
            raise ValueError(
                f"tier sizes must nest: {coarse_size} % {fine_size} != 0")
        if horizon < 0:
            raise ValueError("horizon must be nonnegative")
        self.spark = spark
        self.base = Path(base_dir)
        self.fine_size = fine_size
        self.coarse_size = coarse_size
        self.horizon = horizon
        self.n_groups = n_groups
        (self.base / "manifests").mkdir(parents=True, exist_ok=True)

    # ---------------------------------------------------------- staging

    def group_col(self):
        return F.pmod(F.xxhash64("doc_id"), F.lit(self.n_groups))

    def completed_groups(self) -> list[int]:
        return [
            k for k in range(self.n_groups)
            if read_manifest(self.base, STAGE, k) is not None
        ]

    def input_fingerprint(self, fine: DataFrame) -> dict:
        """Order-independent identity of the fine store: row count + SUM
        of a full-row hash (decimal(38,0), so 2^63-scale addends cannot
        overflow at any realistic row count). Every stat column
        participates, and — unlike a bit_xor, where a duplicated row
        pair XORs to zero — summation is duplicate-sensitive, so
        same-shape inputs differing only in repeated rows cannot alias.
        The job's shape parameters (n_groups included: a resume with
        fewer groups would silently orphan the higher staged groups)
        ride along, making the base dir bind to one (input, policy,
        grouping) triple. One map-side-combinable aggregate."""
        r = fine.agg(
            F.count("*").alias("n"),
            F.sum(
                F.expr(
                    "xxhash64(doc_id, source, bucket, cnt, sum_v,"
                    " sumsq, min_v, max_v)"
                ).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return {
            "n": int(r["n"]), "h": str(r["h"] or 0),
            "policy": [self.fine_size, self.coarse_size, self.horizon,
                       self.n_groups],
        }

    def stage_input(self, fine: DataFrame) -> DataFrame:
        """Write the fine store ONCE, hive-partitioned by doc group, so
        each commit unit is a partition-pruned read. Idempotent; a base
        dir binds to one (input, policy) pair — both a changed input and
        a changed retention policy against committed work fail loudly
        (recompacting with a different horizon over an already-compacted
        layout would silently under- or over-drop)."""
        staged = self.base / "fine_staged"
        fp_path = self.base / "input_fingerprint.json"
        fp = self.input_fingerprint(fine)
        if (staged / "_SUCCESS").exists():
            old = json.loads(fp_path.read_text()) if fp_path.exists() else None
            if old == fp:
                return self.spark.read.parquet(str(staged))
            if old is not None:
                raise ValueError(
                    f"base dir {self.base} was staged for fingerprint/"
                    f"policy {old}, got {fp}; a base dir binds to one "
                    "input and one retention policy — use a fresh base dir"
                )
            # _SUCCESS present but no fingerprint: a run by code that
            # wrote data-first died in the gap. Manifests cannot exist
            # yet (they are written only after staging completes), so
            # restaging is safe — fall through.
        # fingerprint FIRST (write-then-rename), data second: a crash
        # mid-staging leaves fp-without-_SUCCESS and the next run simply
        # restages; the old data-first order left _SUCCESS-without-fp,
        # which bricked an untouched base dir on resume.
        tmp = self.base / ".input_fingerprint.json.tmp"
        tmp.write_text(json.dumps(fp))
        os.replace(tmp, fp_path)
        (
            fine.withColumn("grp", self.group_col())
            .write.mode("overwrite")
            .partitionBy("grp")
            .parquet(str(staged))
        )
        return self.spark.read.parquet(str(staged))

    # ------------------------------------------------------------- run

    def run(self, fine: DataFrame, fail_after: int | None = None) -> list[int]:
        """Compact all incomplete groups; returns the groups processed
        this run. ``fail_after`` aborts after N groups (kill-and-resume
        tests)."""
        done = set(self.completed_groups())
        staged = self.stage_input(fine)
        fp = json.loads((self.base / "input_fingerprint.json").read_text())
        processed = []
        for k in range(self.n_groups):
            if k in done:
                continue
            if fail_after is not None and len(processed) >= fail_after:
                raise RuntimeError(f"injected failure after {fail_after} groups")
            t0 = time.time()
            part = staged.filter(F.col("grp") == k).drop("grp")  # pruned read
            wm = part.groupBy("doc_id", "source").agg(
                ((F.max("bucket") + 1) * self.fine_size).alias("wm")
            )
            wm_path = str(self.base / "watermarks" / f"grp={k}")
            wm.write.mode("overwrite").parquet(wm_path)
            wm_c = self.spark.read.parquet(wm_path)
            cut = (
                F.floor((F.col("wm") - self.horizon) / self.coarse_size)
                * self.coarse_size
            ).cast("long")
            kept = (
                part.join(wm_c, ["doc_id", "source"])
                .where((F.col("bucket") + 1) * self.fine_size > cut)
                .drop("wm")
            )
            out_path = str(self.base / "compacted" / f"grp={k}")
            kept.write.mode("overwrite").parquet(out_path)
            committed = self.spark.read.parquet(out_path)
            rows_before = part.count()
            agg = committed.agg(
                F.count("*").alias("rows"),
                F.countDistinct("doc_id", "source").alias("n_docs"),
            ).collect()[0]
            rows_after, n_docs = int(agg["rows"]), int(agg["n_docs"])
            elapsed = time.time() - t0
            manifest = {
                "stage": STAGE,
                "part": k,
                "rows_before": int(rows_before),
                "rows_dropped": int(rows_before) - rows_after,
                "rows_after": rows_after,
                "n_docs_after": n_docs,
                "policy": {
                    "fine_size": self.fine_size,
                    "coarse_size": self.coarse_size,
                    "horizon": self.horizon,
                },
                "elapsed_sec": round(elapsed, 3),
                "rows_per_sec": round(rows_before / elapsed, 1)
                if elapsed else None,
                "kernel_version": __version__,
                "input_fingerprint": fp,
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            # manifest write-then-rename is the commit point for group k
            tmp = self.base / "manifests" / f".{STAGE}_{k}.json.tmp"
            tmp.write_text(json.dumps(manifest))
            os.replace(tmp, self.base / "manifests" / f"{STAGE}_{k}.json")
            processed.append(k)
        if len(self.completed_groups()) == self.n_groups:
            (self.base / f"_stage_{STAGE}_COMMITTED").touch()
        return processed

    # --------------------------------------------------------- reading

    def _require_committed(self) -> None:
        missing = sorted(
            set(range(self.n_groups)) - set(self.completed_groups()))
        if missing:
            raise RuntimeError(
                f"expiry incomplete: groups {missing} have no manifest — "
                "run() to completion before reading the compacted store"
            )

    def result(self) -> DataFrame:
        """The compacted fine store (all groups; requires full commit)."""
        self._require_committed()
        return self.spark.read.parquet(str(self.base / "compacted")).drop("grp")

    def watermarks(self) -> DataFrame:
        """The pre-compaction per-doc watermark table — the authoritative
        high-water for serving views over the compacted store."""
        self._require_committed()
        return self.spark.read.parquet(str(self.base / "watermarks")).drop("grp")

    def serving_view(self, coarse: DataFrame) -> DataFrame:
        """Retention serving view over the COMPACTED store + stored
        watermark; row-identical to the view over the full store
        (pytest-asserted)."""
        return retention_policy(
            self.result(), coarse, self.fine_size, self.coarse_size,
            self.horizon, watermark=self.watermarks(),
        )

    def metrics(self) -> dict:
        ms = [read_manifest(self.base, STAGE, k) for k in range(self.n_groups)]
        ms = [m for m in ms if m is not None]
        return {
            "groups_committed": len(ms),
            "rows_before": sum(m["rows_before"] for m in ms),
            "rows_dropped": sum(m["rows_dropped"] for m in ms),
            "rows_after": sum(m["rows_after"] for m in ms),
            "elapsed_sec": round(sum(m["elapsed_sec"] for m in ms), 3),
        }
