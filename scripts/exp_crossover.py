#!/usr/bin/env python
"""Hardware experiment: static vs dynamic NUTS crossover (VERDICT r3 #3
and #6; the round-4 run of this sweep also measured the since-retired
fused-Pallas NUTS kernel's niche out of existence — docs/MOSAIC_RULES.md).

For each (target, depth cap, backend) combo: K full transitions at a fixed
step size and mass matrix — identical transition law across backends — and
report transitions/s (the min-ESS/s proxy at equal law), grad-evals/s, mean
realized depth, and divergence rate.  The static backend always pays
2^J − 1 gradient evaluations per transition; the dynamic tree stops early,
so its mean depth against the cap is the waste model the crossover table
quantifies.

Targets: "gauss" (the headline 100-d ill-conditioned Gaussian, true
diagonal mass) and "funnel" (100-d Neal's funnel, identity mass, a
varied-depth hard geometry).

Env: GMT_EXP_CHAINS (10240), GMT_EXP_DIM (100), GMT_EXP_CAPS (4,5,6,8),
GMT_EXP_TARGETS (gauss,funnel), GMT_EXP_BACKENDS (xla,static),
GMT_EXP_EPS_GAUSS (0.5), GMT_EXP_EPS_FUNNEL (0.2), GMT_EXP_STEPS (64;
scaled down automatically for deep caps), GMT_EXP_PLATFORM=cpu for smoke.

Run serialized with anything else touching the TPU (single-client tunnel).
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
CAPS = [int(c) for c in os.environ.get("GMT_EXP_CAPS", "4,5,6,8").split(",")]
TARGETS = os.environ.get("GMT_EXP_TARGETS", "gauss,funnel").split(",")
BACKENDS = os.environ.get("GMT_EXP_BACKENDS", "xla,static").split(",")
EPS_GAUSS = float(os.environ.get("GMT_EXP_EPS_GAUSS", 0.5))
EPS_FUNNEL = float(os.environ.get("GMT_EXP_EPS_FUNNEL", 0.2))
BASE_STEPS = int(os.environ.get("GMT_EXP_STEPS", 64))
SEED = 0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_target(name):
    if name == "gauss":
        scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)

        def logp(x):
            return -0.5 * jnp.sum((x / scales) ** 2)

        # true diagonal mass: M⁻¹ = cov = scales², momentum scale = 1/scales
        return logp, scales**2, 1.0 / scales, EPS_GAUSS
    if name == "funnel":
        from general_mcmc_tpu.models.distributions import NealsFunnel

        t = NealsFunnel(dim=DIM)
        ones = jnp.ones((DIM,), jnp.float32)
        return t.unnorm_logp, ones, ones, EPS_FUNNEL
    raise ValueError(name)


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


def run_combo(tname, logp, minv, mscale, eps_s, cap, backend, steps):
    eps_b = jnp.full((N,), eps_s, jnp.float32)
    inv_b = jnp.broadcast_to(minv, (N, DIM))
    scale_b = jnp.broadcast_to(mscale, (N, DIM))
    vg = jax.value_and_grad(logp)
    pos, lp, grad = initial_state(logp)

    if backend == "xla":
        from general_mcmc_tpu.ops.tree import MassMatrix, nuts_tree_step

        mass = MassMatrix(inv=minv, scale=mscale)

        def one(keys, p, l, g):
            return jax.vmap(
                lambda key, p1, l1, g1: nuts_tree_step(
                    key, p1, l1, g1, jnp.float32(eps_s), mass, False, vg, cap
                )
            )(keys, p, l, g)

    elif backend == "static":
        from general_mcmc_tpu.ops.static_tree import static_nuts_step

        def one(keys, p, l, g):
            return static_nuts_step(
                keys, p, l, g, eps_b, inv_b, scale_b, vg, cap
            )

    else:
        raise ValueError(
            f"unknown backend {backend!r} (the fused Pallas NUTS kernel was "
            "retired in round 4 — this sweep's funnel results are why; see "
            "docs/MOSAIC_RULES.md)"
        )

    @jax.jit
    def many(pos, lp, grad):
        def body(carry, k):
            p, l, g, lf, dep, div = carry
            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(SEED), k), N
            )
            r = one(keys, p, l, g)
            return (
                r.pos, r.lp, r.grad,
                lf + jnp.sum(r.leapfrogs.astype(jnp.float32)),
                dep + jnp.sum(r.depth.astype(jnp.float32)),
                div + jnp.sum(r.diverged.astype(jnp.float32)),
            ), None

        z = jnp.zeros((), jnp.float32)
        (p, l, g, lf, dep, div), _ = jax.lax.scan(
            body, (pos, lp, grad, z, z, z), jnp.arange(steps, dtype=jnp.int32)
        )
        return p, lf, dep, div

    (p, lf, dep, div), wall, t_c = time_run(many, pos, lp, grad)
    trans = N * steps
    lf = float(lf)
    row = (
        f"{tname:<7} cap={cap} {backend:<7} steps={steps:<3} wall={wall:7.2f}s "
        f"(compile {t_c:6.1f}s)  {trans / wall:12.4g} transitions/s  "
        f"{lf / wall:10.4g} grad-evals/s  mean_depth={float(dep) / trans:5.2f}  "
        f"div={float(div) / trans:7.4%}"
    )
    print(row, flush=True)
    log(row)
    return trans / wall


def main():
    log(f"devices: {jax.devices()}  N={N} DIM={DIM} caps={CAPS} "
        f"targets={TARGETS} backends={BACKENDS}")
    for tname in TARGETS:
        logp, minv, mscale, eps_s = make_target(tname)
        for cap in CAPS:
            # equalize per-combo leapfrog budget: static pays 2^cap-1/step
            steps = max(8, BASE_STEPS * 16 // (1 << cap))
            for backend in BACKENDS:
                if backend == "static" and cap > 8:
                    continue
                try:
                    run_combo(tname, logp, minv, mscale, eps_s, cap, backend, steps)
                except Exception as e:  # noqa: BLE001
                    msg = f"{tname} cap={cap} {backend} FAILED: " \
                          f"{type(e).__name__}: {str(e)[:400]}"
                    print(msg, flush=True)
                    log(msg)


if __name__ == "__main__":
    main()
