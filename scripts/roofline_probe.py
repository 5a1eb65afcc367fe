#!/usr/bin/env python
"""Measured roofline for the NUTS hot loop (VERDICT round-2 #3).

The question: is the remaining gap to the ≥100× north star sampler
overhead (tree bookkeeping we could still shave) or hardware-bound
(the leapfrog itself saturates the chip)?  This probe MEASURES the
ceiling instead of modeling it:

1. ``leapfrog_ceiling`` — a bare vmapped leapfrog chain inside lax.scan
   (no tree, no U-turn stacks, no per-step RNG, no proposal bookkeeping)
   at the bench batch (10240×100, diagonal mass).  No NUTS-family sampler
   can exceed this grad-evals/s on this target/chip: it is one gradient
   eval plus the minimal phase-space update per step.
2. ``nuts_steady`` — the real NUTS transition (depth cap 4, fixed ε,
   adapted-mass shape) in its post-warmup steady state.
3. The ratio is the measured tree overhead; the ceiling's implied HBM
   traffic (state read+write per leapfrog) against the v5e 819 GB/s peak
   says how much of the chip the ceiling itself uses.

Writes one JSON line per measurement to stdout; detail to stderr.
Run on the TPU (serialize with other tunnel users).
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

N_CHAINS = int(os.environ.get("GMT_RL_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_RL_DIM", 100))
N_STEPS = int(os.environ.get("GMT_RL_STEPS", 256))  # scan length
LEAPFROGS_PER_STEP = int(os.environ.get("GMT_RL_LF", 15))  # ≈ depth-4 tree
HBM_PEAK = 819e9  # v5e


def _target():
    from general_mcmc_tpu import GaussianND

    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)
    return GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales)


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def leapfrog_ceiling():
    """Bare leapfrog chain: the measured speed-of-light for any
    NUTS/HMC-family sampler on this target."""
    from general_mcmc_tpu.models import distributions  # noqa: F401  (import path)
    from general_mcmc_tpu.ops.tree import MassMatrix, leapfrog_chain

    target = _target()
    vg = jax.vmap(jax.value_and_grad(target.unnorm_logp))
    mass = MassMatrix(inv=jnp.ones(DIM, jnp.float32), scale=jnp.ones(DIM, jnp.float32))

    def vg1(x):
        lp, g = jax.value_and_grad(target.unnorm_logp)(x)
        return lp, g

    lf = jax.vmap(
        lambda p, m, g: leapfrog_chain(vg1, p, m, g, jnp.float32(0.01), mass, False)
    )

    @jax.jit
    def run(pos):
        lp, grad = vg(pos)
        mom = jnp.ones_like(pos)

        def body(c, _):
            p, m, g = c
            # LEAPFROGS_PER_STEP leapfrogs per scan step keeps the scan
            # overhead negligible, mirroring one NUTS transition's work
            for _k in range(LEAPFROGS_PER_STEP):
                p, m, _lp, g = lf(p, m, g)
            return (p, m, g), None

        (p, m, g), _ = jax.lax.scan(body, (pos, mom, grad), None, length=N_STEPS)
        return p

    from general_mcmc_tpu import init_with_seed

    pos = init_with_seed(N_CHAINS, DIM, 0)
    wall, _ = _time(run, pos)
    leapfrogs = N_CHAINS * N_STEPS * LEAPFROGS_PER_STEP
    rate = leapfrogs / wall
    # minimal per-leapfrog HBM traffic: read+write pos/mom/grad = 6 [d]
    # passes (the gradient eval reads pos again but XLA fuses it)
    bytes_per = 6 * DIM * 4
    bw = rate * bytes_per
    print(
        f"ceiling: wall={wall:.3f}s grad-evals/s={rate:.3e} "
        f"implied-traffic={bw / 1e9:.0f} GB/s ({bw / HBM_PEAK * 100:.0f}% of peak)",
        file=sys.stderr,
    )
    print(json.dumps({"metric": "leapfrog-ceiling grad-evals/s", "value": rate,
                      "unit": "1/s", "vs_baseline": bw / HBM_PEAK}), flush=True)
    return rate


def nuts_steady():
    """Real NUTS transitions, post-warmup shape (fixed ε, depth cap 4)."""
    from general_mcmc_tpu import NUTS, init_with_seed

    sampler = NUTS(
        _target(),
        init_with_seed(N_CHAINS, DIM, 0),
        step_size=0.12,  # ≈ adapted value at the bench config
        max_tree_depth=4,
        seed=0,
    )
    sampler._prepare_run(N_STEPS, 0)

    def run():
        from general_mcmc_tpu.core import run_kernel

        out = run_kernel(sampler._step_fn, sampler._init_carry(), 0, N_STEPS)
        return out.carry

    carry = run()
    jax.block_until_ready(carry)
    best = float("inf")
    lf_count = None
    for _ in range(3):
        t0 = time.perf_counter()
        carry = run()
        jax.block_until_ready(carry)
        best = min(best, time.perf_counter() - t0)
        lf_count = int(jnp.sum(carry["n_leapfrog"]))
    rate = lf_count / best
    print(
        f"nuts steady: wall={best:.3f}s leapfrogs={lf_count} grad-evals/s={rate:.3e}",
        file=sys.stderr,
    )
    print(json.dumps({"metric": "nuts-steady grad-evals/s", "value": rate,
                      "unit": "1/s", "vs_baseline": 0}), flush=True)
    return rate


def nuts_batch_sweep():
    """Total grad-evals/s vs chain-batch size: if the while-carry became
    VMEM-resident at small batches, per-chain throughput would jump and
    chunking the 10k chains into sequential small blocks would raise
    min-ESS/s (which is otherwise chain-count-invariant)."""
    global N_CHAINS
    saved = N_CHAINS
    out = {}
    for n in (512, 2048, 10_240):
        N_CHAINS = n
        out[n] = nuts_steady()
    N_CHAINS = saved
    for n, r in out.items():
        print(json.dumps({"metric": f"nuts-steady grad-evals/s @ {n} chains",
                          "value": r, "unit": "1/s",
                          "vs_baseline": r / n}), flush=True)
    return out


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    if os.environ.get("GMT_RL_SWEEP") == "1":
        nuts_batch_sweep()
        return
    ceil = leapfrog_ceiling()
    nuts = nuts_steady()
    frac = nuts / ceil
    print(
        f"NUTS achieves {frac * 100:.0f}% of the measured leapfrog ceiling "
        f"— the residual {100 - frac * 100:.0f}% is tree bookkeeping",
        file=sys.stderr,
    )
    print(json.dumps({"metric": "nuts/ceiling fraction", "value": frac,
                      "unit": "ratio", "vs_baseline": 0}), flush=True)


if __name__ == "__main__":
    main()
