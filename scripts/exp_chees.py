#!/usr/bin/env python
"""ChEES-HMC hardware rehearsal at the headline bench shape.

Measures end-to-end wall (warmup + collection, the bench protocol) and
min-ESS/s for ChEES-HMC on the 100-d ill-conditioned Gaussian at 10,240
chains, sweeping the knobs that trade gradients for ESS-per-draw
(jitter_amount, target_accept, warmup length).  Comparison bar: the
static-NUTS multinomial champion (5.97M min-ESS/s, BENCH_HISTORY round 4).

Usage (TPU, serialize with any other tunnel user):
    python scripts/exp_chees.py [config ...]
where each config is "warmup:collect:jitter:accept[:lr[:maxlf[:static]]]", e.g.
    python scripts/exp_chees.py 400:3072:0.5:0.651 600:3072:1.0:0.651
Defaults to a 3-config sweep.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from general_mcmc_tpu import ChEESHMC, GaussianND, init_with_seed
from general_mcmc_tpu.core import run_kernel
from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

N_CHAINS = int(os.environ.get("GMT_EXP_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_EXP_DIM", 100))
WORKLOAD = os.environ.get("GMT_EXP_WORKLOAD", "gauss")  # gauss | logistic
SEED = 0


def make_target():
    if WORKLOAD == "logistic":
        from general_mcmc_tpu.models.regression import (
            HierarchicalLogisticNC,
            make_logistic_data,
        )

        X, y, _ = make_logistic_data(jax.random.PRNGKey(1), 256, DIM - 2)
        return HierarchicalLogisticNC(X, y), None
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)
    return GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales), scales


def run_config(warmup, collect, jitter, accept, lr=0.025, maxlf=256,
               static=False, static_leapfrog=None, reps=2):
    target, scales = make_target()
    sampler = ChEESHMC(
        target,
        init_with_seed(N_CHAINS, DIM, SEED),
        target_accept_p=accept,
        seed=SEED,
        jitter_amount=jitter,
        adam_lr=lr,
        max_leapfrog=maxlf,
        static_collection=static,
        static_leapfrog=static_leapfrog,
    )
    walls, sample = [], None
    for rep in range(reps):
        if sample is not None:  # free the 12.6 GB buffer BEFORE re-running
            sample.delete()
            sample = None
        t0 = time.perf_counter()
        sampler._prepare_run(collect, warmup)
        if static:  # steps-major, like bench.py's _run_steps_major
            out = run_kernel(sampler._step_fn, sampler._init_carry(), 0, warmup)
            sample = sampler._run_static(out.carry, collect, warmup)
        else:
            out = run_kernel(sampler._step_fn, sampler._init_carry(), collect,
                             warmup)
            sampler._final_carry = out.carry
            sample = out.samples
        jax.block_until_ready(sample)
        walls.append(time.perf_counter() - t0)
        print(f"  rep {rep}: {walls[-1]:.2f}s", file=sys.stderr, flush=True)
    wall = min(walls)
    lf = int(jnp.sum(sampler.leapfrog_count))
    rhat, ess, _mean, std = split_rhat_mean_ess(
        sample, steps_major=True, return_moments=True
    )
    rhat_max = float(jnp.max(rhat))
    min_ess = float(jnp.min(ess))
    mom = (float(jnp.max(jnp.abs(std / scales - 1.0)))
           if scales is not None else float("nan"))
    draws = N_CHAINS * collect
    print(
        f"warmup={warmup} collect={collect} j={jitter} acc={accept} lr={lr}: "
        f"wall={wall:.2f}s min_ess={min_ess:.0f} ({min_ess / draws:.3f}/draw) "
        f"rhat={rhat_max:.4f} moment={mom:.4f} "
        f"grads/draw={lf / (N_CHAINS * (warmup + collect)):.2f} "
        f"grad/s={lf / wall:.3g} min_ess/s={min_ess / wall:,.0f} "
        f"static_L={getattr(sampler, '_static_L', '-')} "
        f"T={float(sampler.adapted_trajectory_length):.2f} "
        f"eps={float(sampler.adapted_step_size):.3f} "
        f"div={int(jnp.sum(sampler.divergences))}",
        flush=True,
    )
    sample.delete()
    return min_ess / wall


def parse(cfg):
    parts = cfg.split(":")
    warmup, collect = int(parts[0]), int(parts[1])
    jitter, accept = float(parts[2]), float(parts[3])
    lr = float(parts[4]) if len(parts) > 4 else 0.025
    maxlf = int(parts[5]) if len(parts) > 5 else 256
    static = bool(int(parts[6])) if len(parts) > 6 else False
    sl = int(parts[7]) if len(parts) > 7 else None
    return warmup, collect, jitter, accept, lr, maxlf, static, sl


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    configs = sys.argv[1:] or ["400:3072:0.5:0.651", "400:3072:1.0:0.651"]
    for cfg in configs:
        run_config(*parse(cfg))
