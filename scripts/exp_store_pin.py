#!/usr/bin/env python
"""Time the ChEES collection program under different sample-buffer layout
pins, end-to-end on the TPU.

Background (exp_store_layout.py, profile_chees.py GMT_EXP_STORE=1): the
shipped program's scan buffer compiles to {1,0,2} (d-major) and every
per-step dynamic_update_slice costs ~217 us (8x write amplification);
with_layout_constraint is emitted with swapped conventions and dropped.
Pinning the ENTRY output layout via jit(out_shardings=Format(...)) is
honored: XLA then lays the loop buffer out {1,2,0} (steps-major —
contiguous per-step stores) and appends one relayout copy (~33 ms) if
the requested entry layout differs.  Variants timed here:

  shipped   as-shipped _run_compiled (baseline, d-major buffer)
  pin_rm    entry pinned row-major (0,1,2) — loop {1,2,0} + one copy
  pin_sm    entry pinned (0,2,1) = XLA's loop choice — copy-free
  flat2d    snapshot flattened to [B*d] in-body, 2-D buffer, entry (0,1)

Run on hardware: timeout 1500 python scripts/exp_store_pin.py
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

N = int(os.environ.get("GMT_EXP_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_EXP_DIM", 100))
STEPS = int(os.environ.get("GMT_EXP_STEPS", 1024))
REPS = int(os.environ.get("GMT_EXP_REPS", 3))


def main():
    from general_mcmc_tpu import ChEESHMC, GaussianND, init_with_seed
    from general_mcmc_tpu.core import _run_compiled, _scan_steps
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)
    target = GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales)
    sampler = ChEESHMC(
        target,
        init_with_seed(N, DIM, 0),
        step_size=0.33,
        trajectory_length=1.83,
        jitter_amount=0.5,
        seed=0,
    )
    sampler._prepare_run(0, 0)
    step_fn = sampler._make_step_fn(step=sampler._static_collect_step(10))
    carry = sampler._init_carry()
    carry["mass_inv"] = jnp.broadcast_to(scales**2, (N, DIM))
    dev = jax.devices()[0]
    sds = SingleDeviceSharding(dev)

    def scan_fn(carry):
        return _scan_steps(step_fn, carry, 0, STEPS, collect=True, thin=1)

    def scan_flat(carry):
        def body(c, m0):
            c = step_fn(c, m0)
            return c, step_fn.extract(c).reshape(-1)

        c, ys = jax.lax.scan(body, carry, jnp.arange(STEPS))
        return c, ys.reshape(STEPS, N, DIM)

    variants = {
        "shipped": lambda c: _run_compiled(step_fn, c, STEPS, 0, 0, 1),
        "pin_rm": jax.jit(
            scan_fn,
            out_shardings=(None, Format(Layout((0, 1, 2)), sds)),
        ),
        "pin_sm": jax.jit(
            scan_fn,
            out_shardings=(None, Format(Layout((0, 2, 1)), sds)),
        ),
        "flat2d": jax.jit(
            scan_flat,
            out_shardings=(None, Format(Layout((0, 1, 2)), sds)),
        ),
    }
    only = os.environ.get("GMT_EXP_ONLY")
    for name, fn in variants.items():
        if only and name != only:
            continue
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(carry))
        t_first = time.perf_counter() - t0
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(carry))
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        print(
            f"{name:8s} first={t_first:7.2f}s best={best:6.3f}s "
            f"({best / STEPS * 1e6:6.1f} us/draw) walls={['%.3f' % w for w in walls]}",
            flush=True,
        )
        del out


if __name__ == "__main__":
    main()
