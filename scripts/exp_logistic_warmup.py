"""Logistic warmup-budget sweep at the jitter=1.0 config (round 5).

The delta/jitter sweep (exp_logistic_sweep.py) made the leg seed-stable;
this sweep then found the warmup knee.  Measured (v5e, 2026-08-19, both
seeds, wall = best of 2 warm reps of warmup+collection+suffstats):

    warmup   min-ESS/s (s0 / s1)   min_ess (s0 / s1)   max R-hat
    192      2.48M / 2.89M         2.01M / 2.42M       1.0042  under-adapted
    256      3.16M / 3.01M         2.87M / 2.83M       1.0027  <- knee
    320      2.81M / 2.77M         2.76M / 2.74M       1.0028
    384      2.74M / 2.72M         2.72M / 2.73M       1.0028
    512      2.58M / 2.57M         2.73M / 2.71M       1.0029
    768      2.34M / 2.32M         2.71M / 2.71M       1.0029  old default

min-ESS is warmup-invariant from 256 up (the jitter-1.0 adaptation has
converged), so shorter warmup is pure wall profit until 192, where the
adapted state degrades and the seed spread returns.  Bench default:
GMT_BENCH_LOGISTIC_WARMUP=256.

Run on the real TPU: `python scripts/exp_logistic_warmup.py` (serialize
with any other TPU process).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from general_mcmc_tpu import ChEESHMC, init_with_seed
from general_mcmc_tpu.core import run_kernel
from general_mcmc_tpu.diagnostics.stats import combine_suffstats_host
from general_mcmc_tpu.models.regression import (
    HierarchicalLogisticNC,
    make_logistic_data,
)

B, DIM, N_OBS, COLLECT = 10_240, 50, 256, 1024


def measure(warmup, seed):
    X, y, _ = make_logistic_data(jax.random.PRNGKey(1), N_OBS, DIM - 2)
    target = HierarchicalLogisticNC(X, y)
    s = ChEESHMC(target, init_with_seed(B, DIM, seed), target_accept_p=0.95,
                 jitter_amount=1.0, static_collection=True, seed=seed)
    walls = []
    for rep in range(2):
        t0 = time.perf_counter()
        s._prepare_run(COLLECT, warmup)
        out = run_kernel(s._step_fn, s._init_carry(), 0, warmup)
        s._run_static(out.carry, COLLECT, warmup, with_stats=True)
        jax.block_until_ready(s._suffstats)
        walls.append(time.perf_counter() - t0)
        print(f"  rep {rep}: {walls[-1]:.2f}s", file=sys.stderr)
    wall = min(walls)
    rhat, ess, _m, _sd = combine_suffstats_host(*s._suffstats)
    min_ess, max_rhat = float(np.min(ess)), float(np.max(rhat))
    gate = "" if max_rhat < 1.01 else "  ** FAILS R-hat gate **"
    print(f"warmup={warmup} seed={seed}: min-ESS/s {min_ess / wall:12,.0f}   "
          f"min_ess {min_ess:10,.0f}   max_rhat {max_rhat:.4f}   "
          f"wall {wall:.2f}s{gate}", flush=True)


print(f"devices: {jax.devices()}", file=sys.stderr)
for warmup in (192, 256, 320, 384, 512, 768):
    for seed in (0, 1):
        measure(warmup, seed)
