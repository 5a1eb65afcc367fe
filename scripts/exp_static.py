#!/usr/bin/env python
"""Hardware experiment: static-window NUTS schedule vs the XLA dynamic tree.

Steady-state comparison on the headline target (100-d ill-conditioned
Gaussian, true diagonal mass, fixed ε): K full transitions per backend.
Reports grad-evals/s AND transitions/s — the static schedule always pays
2^J - 1 evals/transition while the dynamic tree averages fewer, so
transitions/s (∝ min-ESS/s at equal transition law) is the decision metric.

Run serialized with anything else touching the TPU (single-client tunnel).

Env knobs: GMT_EXP_CHAINS, GMT_EXP_DIM, GMT_EXP_STEPS, GMT_EXP_DEPTH,
GMT_EXP_EPS, GMT_EXP_SKIP_XLA=1, GMT_EXP_UNROLL (comma list of scan unroll
factors for the static integration phase), GMT_EXP_PLATFORM=cpu.
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

if os.environ.get("GMT_EXP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GMT_EXP_PLATFORM"])

N = int(os.environ.get("GMT_EXP_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_EXP_DIM", 100))
STEPS = int(os.environ.get("GMT_EXP_STEPS", 64))
DEPTH = int(os.environ.get("GMT_EXP_DEPTH", 4))
EPS = float(os.environ.get("GMT_EXP_EPS", 0.5))
UNROLLS = [
    (int(u) if int(u) > 0 else None)
    for u in os.environ.get("GMT_EXP_UNROLL", "0").split(",")
]
SEED = 0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_target():
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    return logp, scales


def initial_state(logp):
    from general_mcmc_tpu import init_with_seed

    pos = init_with_seed(N, DIM, SEED).astype(jnp.float32)
    lp, grad = jax.vmap(jax.value_and_grad(logp))(pos)
    return pos, lp.astype(jnp.float32), grad.astype(jnp.float32)


def time_run(fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    wall = time.perf_counter() - t0
    return out, wall, t_compile


def run_xla(logp, scales, pos, lp, grad):
    from general_mcmc_tpu.ops.tree import MassMatrix, nuts_tree_step

    mass = MassMatrix(inv=scales**2, scale=1.0 / scales)
    eps = jnp.float32(EPS)
    vg = jax.value_and_grad(logp)

    @jax.jit
    def many(pos, lp, grad):
        def body(carry, k):
            p, l, g, total = carry
            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(SEED), k), N
            )
            r = jax.vmap(
                lambda key, p1, l1, g1: nuts_tree_step(
                    key, p1, l1, g1, eps, mass, False, vg, DEPTH
                )
            )(keys, p, l, g)
            return (r.pos, r.lp, r.grad, total + jnp.sum(r.leapfrogs)), None

        (p, l, g, total), _ = jax.lax.scan(
            body, (pos, lp, grad, jnp.zeros((), jnp.int32)), jnp.arange(STEPS)
        )
        return p, total

    (p, total), wall, t_c = time_run(many, pos, lp, grad)
    lf = int(total)
    trans = N * STEPS
    log(
        f"XLA tree: {STEPS} steps, {lf} leapfrogs, wall {wall:.2f}s "
        f"(compile {t_c:.1f}s) -> {lf / wall:.3g} grad-evals/s, "
        f"{trans / wall:.3g} transitions/s"
    )
    return trans / wall


def run_static(logp, scales, pos, lp, grad, unroll):
    from general_mcmc_tpu.ops.static_tree import static_nuts_step

    inv = jnp.broadcast_to(scales**2, (N, DIM))
    mscale = jnp.broadcast_to(1.0 / scales, (N, DIM))
    eps = jnp.full((N,), EPS, jnp.float32)
    vg = jax.value_and_grad(logp)

    @jax.jit
    def many(pos, lp, grad):
        def body(carry, k):
            p, l, g = carry
            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(SEED + 1), k), N
            )
            r = static_nuts_step(
                keys, p, l, g, eps, inv, mscale, vg, DEPTH, unroll=unroll
            )
            return (r.pos, r.lp, r.grad), (jnp.sum(r.depth), jnp.sum(r.diverged))

        (p, l, g), (dsum, div) = jax.lax.scan(
            body, (pos, lp, grad), jnp.arange(STEPS)
        )
        return p, jnp.sum(dsum), jnp.sum(div)

    (p, dsum, div), wall, t_c = time_run(many, pos, lp, grad)
    lf = N * STEPS * ((1 << DEPTH) - 1)
    trans = N * STEPS
    log(
        f"static unroll={unroll}: {STEPS} steps, {lf} leapfrogs, wall {wall:.2f}s "
        f"(compile {t_c:.1f}s) -> {lf / wall:.3g} grad-evals/s, "
        f"{trans / wall:.3g} transitions/s "
        f"(mean depth {float(dsum) / trans:.2f}, div {float(div) / trans:.2%})"
    )
    return trans / wall


def main():
    log(f"devices: {jax.devices()}  N={N} DIM={DIM} STEPS={STEPS} DEPTH={DEPTH} EPS={EPS}")
    logp, scales = make_target()
    pos, lp, grad = initial_state(logp)

    xla_rate = None
    if os.environ.get("GMT_EXP_SKIP_XLA") != "1":
        try:
            xla_rate = run_xla(logp, scales, pos, lp, grad)
        except Exception as e:  # noqa: BLE001
            log(f"XLA tree FAILED: {type(e).__name__}: {str(e)[:500]}")

    for unroll in UNROLLS:
        try:
            rate = run_static(logp, scales, pos, lp, grad, unroll)
            if xla_rate:
                log(f"  -> {rate / xla_rate:.2f}x the XLA tree (transitions/s)")
        except Exception as e:  # noqa: BLE001
            log(f"static unroll={unroll} FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
