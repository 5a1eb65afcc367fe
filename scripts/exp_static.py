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
    # NOTE: the shipped kernel's integration loop is always fully unrolled
    # (the unroll parameter was removed); ``unroll`` here only labels the
    # log line and varies the integration-only probes below.
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
                keys, p, l, g, eps, inv, mscale, vg, DEPTH
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


def run_integration_only(logp, scales, pos, lp, grad, unroll, variant="dual",
                         gram="none"):
    """MEASUREMENT-ONLY stripped probe: the static schedule's integration
    phase alone (no Gram / retro tree / proposal select), consuming the leaf
    stacks with a cheap reduction so XLA cannot DCE them.  Bounds how much of
    the full static step's wall the retrospective phase costs (same role as
    the round-3 STRIPPED-kernel probe, docs/BENCH_HISTORY.md).

    HISTORICAL FORM: this probe still integrates via a lax.scan with
    [T, B, d]-stacked outputs — the layout the shipped kernel used when the
    probe was written.  The shipped kernel now unrolls the loop and stacks
    [B, T, d] (see ops/static_tree.py), so this bounds the old variant;
    treat cross-probe deltas, not absolute walls, as meaningful.

    variant="dual":   the shipped dual-frontier body (9 [B,d] selects/iter).
    variant="single": one current frontier; at i == offset the carry resets
        to the initial state and the step sign flips (3 selects/iter) —
        measures the headroom of a select-slimmed integration schedule.

    gram: additionally compute the U-turn Gram matrix after integration and
        consume it —
        "none":  skip (pure integration bound; stacks vel too, matching the
                 shipped stack-write traffic),
        "bij":   the shipped einsum ``ibd,jbd->bij`` (batched [16,100]@
                 [100,16] tiny matmuls) + both window permutes,
        "ijb":   einsum ``ibd,jbd->ijb`` (keeps chains on the lane axis;
                 lowers to elementwise multiply + lane reduce, the layout
                 the round-2 sweep found beats tiny matvecs) + permutes,
        "loop":  explicit fori over i of ``sum(vel_i[None]*pos_all, -1)``
                 (T elementwise-reduce passes over the pos stack).
    """
    T = 1 << DEPTH
    inv = jnp.broadcast_to(scales**2, (N, DIM))
    mscale = jnp.broadcast_to(1.0 / scales, (N, DIM))
    eps = jnp.full((N,), EPS, jnp.float32)
    vg_b = jax.vmap(jax.value_and_grad(logp))

    @jax.jit
    def many(pos, lp, grad):
        def step(carry, k):
            p0, l0, g0 = carry
            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(SEED + 2), k), N
            )
            ks = jax.vmap(lambda kk: jax.random.split(kk, 3))(keys)
            z = jax.vmap(lambda kk: jax.random.normal(kk, (DIM,), jnp.float32))(
                ks[:, 0]
            )
            mom0 = mscale * z
            offset = jax.vmap(
                lambda kk: jax.random.randint(kk, (), 0, T, jnp.int32)
            )(ks[:, 1])
            off_col = offset[:, None]

            if variant == "dual":
                def body(c, i):
                    pb, mb, gb, pf, mf, gf = c
                    sel = i < off_col
                    e = jnp.where(sel, -eps[:, None], eps[:, None])
                    pp = jnp.where(sel, pb, pf)
                    mm = jnp.where(sel, mb, mf)
                    gg = jnp.where(sel, gb, gf)
                    half = 0.5 * e
                    m1 = mm + gg * half
                    p1 = pp + inv * m1 * e
                    lp1, g1 = vg_b(p1)
                    m1 = m1 + g1.astype(jnp.float32) * half
                    vel1 = inv * m1
                    joint1 = lp1 - 0.5 * jnp.sum(m1 * vel1, axis=-1)
                    pb = jnp.where(sel, p1, pb)
                    mb = jnp.where(sel, m1, mb)
                    gb = jnp.where(sel, g1, gb)
                    pf = jnp.where(sel, pf, p1)
                    mf = jnp.where(sel, mf, m1)
                    gf = jnp.where(sel, gf, g1)
                    return (pb, mb, gb, pf, mf, gf), (p1, vel1, joint1)

                init = (p0, mom0, g0, p0, mom0, g0)
            else:
                def body(c, i):
                    p, m, g = c
                    at_turn = (i == off_col)
                    p = jnp.where(at_turn, p0, p)
                    m = jnp.where(at_turn, mom0, m)
                    g = jnp.where(at_turn, g0, g)
                    e = jnp.where(i < off_col, -eps[:, None], eps[:, None])
                    half = 0.5 * e
                    m1 = m + g * half
                    p1 = p + inv * m1 * e
                    lp1, g1 = vg_b(p1)
                    m1 = m1 + g1.astype(jnp.float32) * half
                    vel1 = inv * m1
                    joint1 = lp1 - 0.5 * jnp.sum(m1 * vel1, axis=-1)
                    return (p1, m1, g1), (p1, vel1, joint1)

                init = (p0, mom0, g0)

            _, (pos_s, vel_s, joint_s) = jax.lax.scan(
                body,
                init,
                jnp.arange(T - 1, dtype=jnp.int32),
                unroll=(T - 1) if unroll is None else unroll,
            )
            gsum = jnp.zeros((N,), jnp.float32)
            if gram != "none":
                pos_all = jnp.concatenate([pos_s, p0[None]], axis=0)
                vel_all = jnp.concatenate(
                    [vel_s, (inv * mom0)[None]], axis=0
                )
                off_col2 = offset[:, None]
                W = jnp.arange(T, dtype=jnp.int32)[None, :]
                perm = jnp.where(
                    W == off_col2,
                    jnp.int32(T - 1),
                    jnp.where(W < off_col2, off_col2 - 1 - W, W - 1),
                )
                if gram == "raw":
                    # einsum only, no window permutes: isolates matmul cost
                    G = jnp.einsum("ibd,jbd->bij", vel_all, pos_all)
                    return (
                        (p0, l0, g0),
                        jnp.sum(joint_s[-1]) + jnp.sum(G[:, 0, :]),
                    )
                if gram == "bij":
                    G = jnp.einsum("ibd,jbd->bij", vel_all, pos_all)
                elif gram == "ijb":
                    G = jnp.einsum("ibd,jbd->ijb", vel_all, pos_all)
                    G = jnp.moveaxis(G, -1, 0)  # [B,T,T], 10 MB relayout
                else:  # "loop"
                    def gbody(i, acc):
                        row = jnp.sum(
                            vel_all[i][None, :, :] * pos_all, axis=-1
                        )  # [T, B]
                        return acc.at[i].set(row.T)

                    G = jax.lax.fori_loop(
                        0, T, gbody, jnp.zeros((T, N, T), jnp.float32)
                    )
                    G = jnp.swapaxes(G, 0, 1)
                G = jnp.take_along_axis(G, perm[:, :, None], axis=1)
                G = jnp.take_along_axis(G, perm[:, None, :], axis=2)
                gsum = jnp.sum(G, axis=(1, 2))
            # consume: pick a pseudo-proposal so the stacks stay live
            pick = offset % (T - 1)
            onehot = (
                jnp.arange(T - 1, dtype=jnp.int32)[:, None] == pick[None, :]
            )[:, :, None]
            p_new = jnp.sum(jnp.where(onehot, pos_s, 0.0), axis=0)
            lp1, g1 = vg_b(p_new)
            return (p_new, lp1, g1), jnp.sum(joint_s[-1] + gsum)

        (p, l, g), js = jax.lax.scan(step, (pos, lp, grad), jnp.arange(STEPS))
        return p, jnp.sum(js)

    (p, _), wall, t_c = time_run(many, pos, lp, grad)
    lf = N * STEPS * ((1 << DEPTH) - 1)
    log(
        f"integration-only[{variant}] unroll={unroll}: wall {wall:.2f}s "
        f"(compile {t_c:.1f}s) -> {lf / wall:.3g} grad-evals/s, "
        f"{N * STEPS / wall:.3g} transitions/s"
    )
    return N * STEPS / wall


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

    stages = os.environ.get("GMT_EXP_STAGES", "full").split(",")
    for unroll in UNROLLS:
        for stage in stages:
            try:
                if stage == "full":
                    rate = run_static(logp, scales, pos, lp, grad, unroll)
                elif stage in ("int_dual", "int_single"):
                    rate = run_integration_only(
                        logp, scales, pos, lp, grad, unroll,
                        variant=stage.split("_")[1],
                    )
                elif stage.startswith("gram_"):
                    rate = run_integration_only(
                        logp, scales, pos, lp, grad, unroll,
                        variant="dual", gram=stage.split("_")[1],
                    )
                else:
                    log(f"unknown stage {stage}")
                    continue
                if xla_rate:
                    log(f"  -> {rate / xla_rate:.2f}x the XLA tree (transitions/s)")
            except Exception as e:  # noqa: BLE001
                log(f"static {stage} unroll={unroll} FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
