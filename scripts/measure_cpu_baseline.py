#!/usr/bin/env python
"""Measure a CPU-surrogate baseline for bench.py's ``vs_baseline``.

The Rust reference cannot be timed in this image (no rustc/cargo, no
egress), so the baseline is a faithful CPU surrogate of its multithreaded
NUTS benchmark harness (``/root/reference/src/nuts.rs:699-729``: N chains in
parallel threads, one serial NUTS trajectory loop per chain): this package's
own tree kernel runs a small chain batch on the CPU backend, min-ESS/sec is
measured over a compile-excluded rerun, and the single-core figure is scaled
linearly to the reference's 16 threads.  Linear scaling is the most
reference-favorable assumption (chains are embarrassingly parallel), so the
resulting ``vs_baseline`` is conservative.

Writes docs/CPU_BASELINE.json, which bench.py prefers over its built-in
estimate.  Workload mirrors the bench headline exactly: 100-d Gaussian with
marginal scales 1..10, diagonal mass-matrix warmup (192 steps), accept 0.90,
depth cap 4.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # override the axon sitecustomize

import jax.numpy as jnp

from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed
from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

DIM = 100
N_CHAINS = 4  # timesliced on one core; min-ESS pools across them
N_COLLECT = 1024
N_WARMUP = 192
REF_THREADS = 16  # the reference's assumed Rayon pool (nuts.rs benches)


def main():
    n_cores = os.cpu_count() or 1
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)
    target = GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales)
    sampler = NUTS(
        target,
        init_with_seed(N_CHAINS, DIM, 0),
        target_accept_p=0.90,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        max_tree_depth=4,
        warmup_tree_depth=4,
        seed=0,
    )
    # First run pays the XLA compile (the Rust reference compiles ahead of
    # time, so compile is excluded); the measurement is the BEST of three
    # warm reps — minimum wall maximizes the baseline, i.e. is the
    # reference-favorable choice.
    jax.block_until_ready(sampler.run(N_COLLECT, N_WARMUP))
    wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sample = sampler.run(N_COLLECT, N_WARMUP)
        jax.block_until_ready(sample)
        wall = min(wall, time.perf_counter() - t0)

    rhat, ess = split_rhat_mean_ess(sample)
    min_ess = float(jnp.min(ess))
    rhat_max = float(jnp.max(rhat))
    per_core = min_ess / wall
    baseline = per_core * REF_THREADS

    rec = {
        "min_ess_per_sec": baseline,
        "per_core_min_ess_per_sec": per_core,
        "n_workers": REF_THREADS,
        "measured_cores": n_cores,
        "wall_s": wall,
        "min_ess": min_ess,
        "max_rhat": rhat_max,
        "n_chains": N_CHAINS,
        "n_collect": N_COLLECT,
        "n_warmup": N_WARMUP,
        "note": (
            f"JAX-CPU surrogate of the Rust reference's threaded NUTS: "
            f"{N_CHAINS} chains on {n_cores} core(s), measured "
            f"{per_core:,.0f} min-ESS/s/core, scaled x{REF_THREADS} "
            f"assuming linear thread scaling (reference-favorable)"
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "CPU_BASELINE.json",
    )
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
