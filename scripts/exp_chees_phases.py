#!/usr/bin/env python
"""Phase breakdown of the ChEES-HMC bench wall (TPU).

The static-collection step profiles at ~65 us/step on device (1024-step
scan, profile_chees.py GMT_EXP_STATIC=10) = 1.6e9 chain-leapfrogs/s — at
the bare-leapfrog VMEM ceiling.  Yet the bench measures ~316 us/draw
end-to-end, so 3-4x of the wall lives OUTSIDE the unrolled integrator.
This script times each phase of one bench rep (warm, after a throwaway
rep) to locate it:

  init      _init_carry(): eager vgrad + per-chain fold_ins + the jitted
            cross-chain median eps search (vmapped double-while at B=10240)
  warmup    the 192-step adaptive program (run_kernel burn-in dispatch)
  readback  host float() of eps_bar/log_t + static program cache lookup
  collect   the unrolled-L collection program incl. the [steps,B,d] store

Usage: python scripts/exp_chees_phases.py  (env: GMT_EXP_CHAINS/DIM/...)
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

N = int(os.environ.get("GMT_EXP_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_EXP_DIM", 100))
WARMUP = int(os.environ.get("GMT_EXP_WARMUP", 192))
COLLECT = int(os.environ.get("GMT_EXP_COLLECT", 3072))
REPS = int(os.environ.get("GMT_EXP_REPS", 2))


def one_rep(sampler, label):
    t = {}
    t0 = time.perf_counter()
    carry = sampler._init_carry()
    jax.block_until_ready(carry)
    t["init"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = run_kernel(sampler._step_fn, carry, 0, WARMUP)
    jax.block_until_ready(out.carry)
    t["warmup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    eps_bar = float(out.carry["eps_bar"])  # host sync
    t_max = float(jnp.exp(out.carry["log_t"]))
    t["readback"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    sample = sampler._run_static(out.carry, COLLECT, WARMUP)
    jax.block_until_ready(sample)
    t["collect"] = time.perf_counter() - t0

    total = sum(t.values())
    print(
        f"{label}: total={total:.3f}s  "
        + "  ".join(f"{k}={v * 1e3:.0f}ms" for k, v in t.items())
        + f"  (eps={eps_bar:.3f} T={t_max:.2f} L={sampler._static_L}; "
        f"collect/draw={t['collect'] / COLLECT * 1e6:.0f}us)",
        flush=True,
    )
    sample.delete()
    return t


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)
    target = GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales)
    sampler = ChEESHMC(
        target,
        init_with_seed(N, DIM, 0),
        target_accept_p=0.98,
        jitter_amount=0.5,
        static_collection=True,
        static_leapfrog=10,
        seed=0,
    )
    sampler._prepare_run(COLLECT, WARMUP)
    one_rep(sampler, "cold")  # compile everything
    for r in range(REPS):
        one_rep(sampler, f"warm{r}")


if __name__ == "__main__":
    main()
