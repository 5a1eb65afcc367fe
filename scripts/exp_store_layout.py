#!/usr/bin/env python
"""Inspect the compiled layout of the collection program's sample buffer.

The store-path profile (profile_chees.py GMT_EXP_STORE=1) shows
dynamic_update_slice at 217 us/step — the round-3 dim-major write-
amplification signature — despite core._constrain_row_major pinning the
scan output row-major.  AOT-lowering the real program (no allocation)
shows why: jax emits the with_layout_constraint custom-call with swapped
conventions and XLA drops it, leaving the [steps, B, d] buffer at
{1,0,2} (d-major).  This script compiles the program two ways —
(a) as shipped, (b) with the ENTRY OUTPUT layout pinned row-major via
jit(out_shardings=Format(Layout((0,1,2)), SingleDeviceSharding)) — and
prints every HLO line mentioning the buffer plus the memory analysis,
so we can see whether the entry pin propagates back into the while-loop
buffer (ideal) or inserts a one-time post-loop relayout copy (still a
~200x win over per-step amplification, but +4 GiB transient).
"""

import os
import re
import sys

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


def show(compiled, label):
    txt = compiled.as_text()
    pat = re.compile(rf"f32\[{STEPS},{N},{DIM}\]")
    print(f"===== {label} =====")
    shown = 0
    for line in txt.splitlines():
        if pat.search(line):
            print(line.strip()[:300])
            shown += 1
            if shown > 30:
                print("...")
                break
    print("----- memory analysis -----")
    print(compiled.memory_analysis())


def main():
    from general_mcmc_tpu import ChEESHMC, GaussianND, init_with_seed
    from general_mcmc_tpu.core import _run_compiled, _scan_steps

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
    carry_struct = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        carry,
    )

    if os.environ.get("GMT_EXP_BASELINE") == "1":
        lowered = _run_compiled.lower(step_fn, carry_struct, STEPS, 0, 0, 1)
        show(lowered.compile(), "as shipped (with_layout_constraint)")
        return

    # variant (b): entry output layout pinned row-major
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    fmt = Format(Layout(major_to_minor=(0, 1, 2)), SingleDeviceSharding(dev))

    def run(carry):
        return _scan_steps(step_fn, carry, 0, STEPS, collect=True, thin=1)

    jf = jax.jit(run, out_shardings=(None, fmt))
    lowered = jf.lower(carry_struct)
    show(lowered.compile(), "entry-layout pinned row-major")


if __name__ == "__main__":
    main()
