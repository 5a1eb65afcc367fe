#!/usr/bin/env python
"""Hardware experiment: fused Pallas NUTS v2 vs the XLA tree (ROADMAP #1).

Steady-state comparison on the headline target (100-d ill-conditioned
Gaussian): both backends run K full NUTS transitions at a fixed step size
with the true diagonal mass matrix (what warmup adaptation converges to),
so the measured quantity is pure transition throughput (grad-evals/s) with
identical tree semantics.

Sweeps (block_chains, vmem_limit_mb) for the v2 kernel; failures (Mosaic
scoped-VMEM overflow) are caught and reported per-config so one OOM does
not kill the sweep.  Run serialized with anything else touching the TPU
(single-client tunnel, CLAUDE.md).

Env knobs: GMT_EXP_CHAINS, GMT_EXP_DIM, GMT_EXP_STEPS, GMT_EXP_DEPTH,
GMT_EXP_BLOCKS (comma list), GMT_EXP_VMEM (comma list, MB), GMT_EXP_EPS,
GMT_EXP_SKIP_XLA=1.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# CPU smoke mode: the axon sitecustomize force-selects the TPU tunnel at
# interpreter start; GMT_EXP_PLATFORM=cpu re-overrides (kernels then need
# GMT_EXP_INTERPRET=1).
if os.environ.get("GMT_EXP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GMT_EXP_PLATFORM"])
INTERPRET = os.environ.get("GMT_EXP_INTERPRET") == "1"

N = int(os.environ.get("GMT_EXP_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_EXP_DIM", 100))
STEPS = int(os.environ.get("GMT_EXP_STEPS", 64))
DEPTH = int(os.environ.get("GMT_EXP_DEPTH", 5))
EPS = float(os.environ.get("GMT_EXP_EPS", 0.5))
BLOCKS = [int(b) for b in os.environ.get("GMT_EXP_BLOCKS", "128,256,512").split(",")]
# vmem entries <= 0 mean None (Mosaic's default scoped-VMEM limit)
VMEMS = [
    (v if v > 0 else None)
    for v in (float(x) for x in os.environ.get("GMT_EXP_VMEM", "100").split(","))
]
SEED = 0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_target():
    from general_mcmc_tpu import GaussianND

    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)
    return GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales), scales


def initial_state(logp):
    from general_mcmc_tpu import init_with_seed

    pos = init_with_seed(N, DIM, SEED).astype(jnp.float32)
    lp, grad = jax.vmap(jax.value_and_grad(logp))(pos)
    return pos, lp.astype(jnp.float32), grad.astype(jnp.float32)


def time_run(fn, *args):
    """Compile (first call) then time a second call."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    wall = time.perf_counter() - t0
    return out, wall, t_compile


def run_xla(logp, scales, pos, lp, grad):
    from general_mcmc_tpu.ops.tree import MassMatrix, nuts_tree_step

    mass = MassMatrix(inv=scales, scale=1.0 / jnp.sqrt(scales))
    eps = jnp.float32(EPS)

    @jax.jit
    def many(pos, lp, grad):
        def body(carry, k):
            p, l, g, total = carry
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(SEED), k), N)
            r = jax.vmap(
                lambda key, p1, l1, g1: nuts_tree_step(
                    key, p1, l1, g1, eps, mass, False, jax.value_and_grad(logp), DEPTH
                )
            )(keys, p, l, g)
            return (r.pos, r.lp, r.grad, total + jnp.sum(r.leapfrogs)), None

        (p, l, g, total), _ = jax.lax.scan(
            body, (pos, lp, grad, jnp.zeros((), jnp.int64 if jax.config.x64_enabled else jnp.int32)), jnp.arange(STEPS)
        )
        return p, total

    (p, total), wall, t_c = time_run(many, pos, lp, grad)
    lf = int(total)
    log(
        f"XLA tree: {STEPS} steps, {lf} leapfrogs, wall {wall:.2f}s "
        f"(compile {t_c:.1f}s) -> {lf / wall:.3g} grad-evals/s"
    )
    return lf / wall


def run_v2(logp, scales, pos, lp, grad, block, vmem):
    from general_mcmc_tpu.ops.pallas_nuts2 import pallas_nuts2_step

    inv = jnp.broadcast_to(scales, (N, DIM))
    scale = jnp.broadcast_to(1.0 / jnp.sqrt(scales), (N, DIM))
    eps = jnp.full((N,), EPS, jnp.float32)

    @jax.jit
    def many(pos, lp, grad):
        def body(carry, s):
            p, l, g, total = carry
            p, l, g, _a, _na, lf, _dep, _div = pallas_nuts2_step(
                logp, p, l, g, eps, inv, scale, seed=s, max_depth=DEPTH,
                block_chains=block, vmem_limit_mb=vmem, interpret=INTERPRET,
            )
            return (p, l, g, total + jnp.sum(lf)), None

        (p, l, g, total), _ = jax.lax.scan(
            body, (pos, lp, grad, jnp.zeros((), jnp.int32)),
            jnp.arange(STEPS, dtype=jnp.int32),
        )
        return p, total

    (p, total), wall, t_c = time_run(many, pos, lp, grad)
    lf = int(total)
    rate = lf / wall
    log(
        f"v2 B={block} vmem={vmem}MB: {STEPS} steps, {lf} leapfrogs, "
        f"wall {wall:.2f}s (compile {t_c:.1f}s) -> {rate:.3g} grad-evals/s"
    )
    return rate


def main():
    log(f"devices: {jax.devices()}  N={N} DIM={DIM} STEPS={STEPS} DEPTH={DEPTH}")
    target, scales = make_target()
    logp = target.unnorm_logp
    pos, lp, grad = initial_state(logp)

    xla_rate = None
    if os.environ.get("GMT_EXP_SKIP_XLA") != "1":
        try:
            xla_rate = run_xla(logp, scales, pos, lp, grad)
        except Exception as e:  # noqa: BLE001
            log(f"XLA tree FAILED: {type(e).__name__}: {str(e)[:500]}")

    for vmem in VMEMS:
        for block in BLOCKS:
            try:
                rate = run_v2(logp, scales, pos, lp, grad, block, vmem)
                if xla_rate:
                    log(f"  -> {rate / xla_rate:.2f}x the XLA tree")
            except Exception as e:  # noqa: BLE001
                log(
                    f"v2 B={block} vmem={vmem}MB FAILED: "
                    f"{type(e).__name__}: {str(e)[:500]}"
                )


if __name__ == "__main__":
    main()
