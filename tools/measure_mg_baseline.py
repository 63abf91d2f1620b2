#!/usr/bin/env python
# measure_mg_baseline.py — time the REFERENCE multigraph pipeline on this
# host, the denominator for bench.py's mg_vs_baseline.
#
# The reference cannot run as committed on this machine:
#   1. it hard-imports shapely (multigraph_generation/generator.py:26),
#      which is not installed here -> tools/shapely_shim provides OUR
#      numpy implementation of the API subset it uses;
#   2. compute_geos_features calls the nonexistent math.lg10
#      (multigraph_generation/multi_combinator.py:127) with no guard on
#      the adjacent path (multi_combinator.py: adjacent() tail), so every
#      sample of the committed 'adjacent' CLI would crash -> we patch
#      math.lg10 = math.log10 (the evident intent).
#   3. the committed CLI main sets use_multiprocessing=False whose branch
#      skips every sample but i==5 (cli.py:60-64) -> we time
#      generate_single(task) directly over N tasks, like the pool path
#      maps them (cli.py:52-58).
#
# Run:  python tools/measure_mg_baseline.py [N] [--pool]
from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/multigraph_generation"


def _setup():
    sys.path.insert(0, os.path.join(REPO, "tools", "shapely_shim"))
    sys.path.insert(0, REF)
    math.lg10 = math.log10  # reference typo for log10 (see header)
    import matplotlib
    matplotlib.use("Agg")


def run_single(n: int, out_dir: str) -> float:
    _setup()
    os.chdir(out_dir)
    os.makedirs("output/images", exist_ok=True)
    os.makedirs("output/params", exist_ok=True)
    import random
    random.seed(0)
    import cli as ref_cli  # noqa: E402  (reference module)
    modes = [random.choice(["adjacent"]) for _ in range(n)]
    tasks = [(i, 1.3, "ERROR", modes[i]) for i in range(n)]
    # warmup: first task pays import/figure-cache costs
    ref_cli.generate_single(tasks[0])
    t0 = time.perf_counter()
    for t in tasks:
        ref_cli.generate_single(t)
    dt = time.perf_counter() - t0
    return n / dt


def run_pool(n: int, out_dir: str) -> float:
    """The reference's multiprocessing path (cli.py:52-58), one process
    per CPU — the most favorable configuration for the reference."""
    import multiprocessing as mp
    os.chdir(out_dir)  # spawned workers inherit this cwd
    os.makedirs("output/images", exist_ok=True)
    os.makedirs("output/params", exist_ok=True)
    ctx = mp.get_context("spawn")
    with ctx.Pool(processes=os.cpu_count(),
                  initializer=_setup) as pool:
        import random
        random.seed(0)
        modes = [random.choice(["adjacent"]) for _ in range(n)]
        tasks = [(i, 1.3, "ERROR", modes[i]) for i in range(n)]
        pool.map(_pool_one, tasks[: os.cpu_count()])  # warm each worker
        t0 = time.perf_counter()
        pool.map(_pool_one, tasks)
        dt = time.perf_counter() - t0
    return n / dt


def _pool_one(task):
    import cli as ref_cli
    return ref_cli.generate_single(task)


def main():
    import tempfile
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    pool = "--pool" in sys.argv
    d = tempfile.mkdtemp(prefix="mg_baseline_")
    cwd = os.getcwd()
    try:
        ips = run_pool(n, d) if pool else run_single(n, d)
    finally:
        os.chdir(cwd)
    print(f"reference mg {'pool' if pool else 'single-proc'}: "
          f"{ips:.3f} imgs/s over {n} samples")


if __name__ == "__main__":
    main()
