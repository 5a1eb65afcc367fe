#!/usr/bin/env python
"""Validate the CPU baseline's linear thread-scaling assumption (VERDICT r3
#4): docs/CPU_BASELINE.json extrapolates a 1-core measurement x16 to stand in
for the Rust reference's Rayon pool (/root/reference/src/nuts.rs:699-729).

This image has ONE core, so true multi-core scaling cannot be measured; what
CAN be measured is the half of the assumption that is falsifiable here —
that throughput is proportional to CPU share with no superlinear degradation
under concurrency (runtime/allocator/threadpool interference, cache
thrash).  N concurrent single-core surrogate processes time-slice the core;
if their AGGREGATE min-ESS/s stays ~equal to the solo throughput, then
per-process throughput scales with allotted CPU time and the x16
extrapolation is the pure-CPU-share prediction.  (What this cannot probe is
cross-core memory-bandwidth contention; at this workload's working set —
4 chains x 100 d, well inside L2 — that is not the binding resource.)

Protocol: one solo measurement, then N in {2, 4} workers.  Every worker
compiles (shared persistent cache) and runs one warm-up rep, signals ready,
spin-waits for a go-file (so all N measure concurrently), then times REPS
back-to-back runs.  Aggregate_N = sum_i reps*min_ess/wall_i; efficiency_N =
aggregate_N / solo.  Results are appended to docs/CPU_BASELINE.json under
"scaling_check"; the x16 baseline itself is kept (reference-favorable: a
HIGHER baseline makes our vs_baseline smaller) unless efficiency is
materially sublinear, in which case rerun measure_cpu_baseline.py with a
derated REF_THREADS and say so in BENCH_HISTORY.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPS = 3
CACHE = "/tmp/gmt_cpu_scaling_cache"


def worker(ready_path: str, go_path: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE)
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from general_mcmc_tpu import (
        NUTS,
        GaussianND,
        NUTSMassMatrixConfig,
        init_with_seed,
    )
    from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), 100)).astype(jnp.float32)
    target = GaussianND(mean=jnp.zeros(100, jnp.float32), cov=scales)
    sampler = NUTS(
        target,
        init_with_seed(4, 100, 0),
        target_accept_p=0.90,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        max_tree_depth=4,
        warmup_tree_depth=4,
        seed=0,
        backend="xla",  # match measure_cpu_baseline.py's pinned surrogate
    )
    sample = sampler.run(1024, 192)  # compile + warm-up rep
    jax.block_until_ready(sample)
    _, ess = split_rhat_mean_ess(sample)
    min_ess = float(jnp.min(ess))

    with open(ready_path, "w") as f:
        f.write("ready")
    while not os.path.exists(go_path):
        time.sleep(0.05)

    t0 = time.perf_counter()
    for _ in range(REPS):
        jax.block_until_ready(sampler.run(1024, 192))
    wall = time.perf_counter() - t0
    print(json.dumps({"min_ess": min_ess, "wall": wall, "reps": REPS}))


def run_group(n: int, tmpdir: str) -> float:
    """Launch n concurrent workers; return aggregate min-ESS/s."""
    go = os.path.join(tmpdir, f"go_{n}")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "JAX_COMPILATION_CACHE_DIR": CACHE,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    readies, procs = [], []
    for i in range(n):
        ready = os.path.join(tmpdir, f"ready_{n}_{i}")
        readies.append(ready)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", ready, go],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True,
        ))
    deadline = time.time() + 1800
    while not all(os.path.exists(r) for r in readies):
        if time.time() > deadline:
            for p in procs:
                p.kill()
            raise RuntimeError(f"group n={n}: workers never became ready")
        time.sleep(0.2)
    with open(go, "w") as f:
        f.write("go")
    agg = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        rec = json.loads(out.strip().splitlines()[-1])
        agg += rec["reps"] * rec["min_ess"] / rec["wall"]
    return agg


def main() -> None:
    import tempfile

    with tempfile.TemporaryDirectory() as tmpdir:
        results = {}
        for n in (1, 2, 4):
            t0 = time.time()
            agg = run_group(n, tmpdir)
            results[n] = agg
            print(f"n={n}: aggregate {agg:,.0f} min-ESS/s "
                  f"(group wall {time.time() - t0:.0f}s)", file=sys.stderr)
        solo = results[1]
        curve = {str(n): round(results[n] / solo, 4) for n in results}
        path = os.path.join(REPO, "docs", "CPU_BASELINE.json")
        with open(path) as f:
            rec = json.load(f)
        rec["scaling_check"] = {
            "aggregate_min_ess_per_sec": {str(n): round(v, 1)
                                          for n, v in results.items()},
            "efficiency_vs_solo": curve,
            "reps_per_worker": REPS,
            "note": (
                "N concurrent single-core surrogate processes time-slicing "
                "the one core; aggregate/solo ~ 1 validates throughput "
                "proportional to CPU share (the falsifiable half of the x16 "
                "linear-scaling extrapolation; cross-core bandwidth "
                "contention is not probeable on 1 core, and this workload's "
                "working set is cache-resident)."
            ),
        }
        with open(path, "w") as f:
            json.dump(rec, f, indent=2)
        print(json.dumps(rec["scaling_check"], indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3])
    else:
        main()
