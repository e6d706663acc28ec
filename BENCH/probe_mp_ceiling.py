"""Machine-ceiling probe for the exact-MP stage: run the mpx kernel alone
under plain multiprocessing (no Spark, no Arrow, no scheduler) at the
bench's per-task shape and report aggregate half-pairs/sec.

This bounds what ANY orchestration of this kernel can achieve on this
box; the bench's matrix_profile_mpx_w128 stage (see bench_local_r5*.json)
should sit at or near this number — if it does, Spark-side overhead in
the stage is ~zero.

Usage: python BENCH/probe_mp_ceiling.py [n_procs] [n_tasks] [n] [w]
Writes BENCH/probe_mp_ceiling.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PROCS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_TASKS = int(sys.argv[2]) if len(sys.argv) > 2 else 96
N = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
W = int(sys.argv[4]) if len(sys.argv) > 4 else 128


def _one_task(seed: int) -> float:
    from matrixprofiler_spark.kernels.mp import mpx

    rng = np.random.Generator(np.random.Philox(key=7, counter=[0, 0, 0, seed]))
    x = (10000 + np.cumsum(rng.integers(-40, 41, size=N))) % 50257
    t0 = time.time()
    mpx(x.astype(np.float64), W)
    return time.time() - t0


def main() -> None:
    # same accounting as bench.py: (n - w + 1)^2 / 2 half-pairs per doc
    half_pairs_per_task = (N - W + 1) ** 2 / 2
    t0 = time.time()
    with mp.get_context("spawn").Pool(N_PROCS) as pool:
        task_times = pool.map(_one_task, range(N_TASKS))
    wall = time.time() - t0
    agg = half_pairs_per_task * N_TASKS / wall
    out = {
        "n_procs": N_PROCS,
        "n_tasks": N_TASKS,
        "n": N,
        "w": W,
        "wall_sec": round(wall, 3),
        "task_sec_min": round(min(task_times), 3),
        "task_sec_max": round(max(task_times), 3),
        "half_pairs_per_task": int(half_pairs_per_task),
        "agg_half_pairs_per_sec": int(agg),
    }
    print(json.dumps(out))
    (Path(__file__).parent / "probe_mp_ceiling.json").write_text(
        json.dumps(out, indent=1)
    )


if __name__ == "__main__":
    main()
