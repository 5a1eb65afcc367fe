"""Pallas fused logistic-gradient probe (VERDICT round 4 #3 follow-up).

The round-5 MXU decomposition (docs/BENCH_HISTORY.md "Logistic MXU
decomposition") proved the stretch leg's gradient is HBM-bound on its
[B, n_obs] intermediates (logits/sigmoid/residual), not MXU-limited:
f32 vs bf16 identical, matmul-only ~= elementwise-only ~= full gradient
~= 61 us, all within ~5% of a 48 MB/step bytes model.  The fix XLA cannot
do is fusing ACROSS the two likelihood matmuls; this probe measures that
fusion as a Pallas kernel at the exact bench shape (10240 x 48 x 256):
one kernel iterates theta <- theta + 1e-3 * grad(theta) for 512 steps
with positions AND all intermediates resident in VMEM, so per-step HBM
traffic is zero (vs XLA's ~48 MB).  Mirrors scripts/exp_logistic_mxu.py's
measurement protocol so the numbers are directly comparable (61.38 us/grad
for the XLA f32 chain).

Kernel-facing layout rules (docs/MOSAIC_RULES.md):
- the [mu, log_tau] hypers ride as separate [B, 1] carries (no
  rank-reducing indexing, no lane concat into the carry);
- both hyper lane-reductions (sum g_lik, sum z*g_lik) route through ONE
  [B, 2p] @ [2p, 2] block-diagonal-ones MXU matvec so the [B, 1] loop
  carries keep a concrete (non-replicated) lane layout;
- [B, 1] -> [B, p] broadcasts via pltpu.repeat.

Run on the real TPU: `python scripts/exp_pallas_logistic.py` (serialize
with any other TPU process).  `--interpret` runs the CPU interpreter for
correctness only.
"""

import functools
import sys
import time

if "--interpret" in sys.argv:
    # CPU-only correctness run: the axon sitecustomize force-selects the
    # TPU tunnel via jax.config.update, which OVERRIDES the JAX_PLATFORMS
    # env var — override it back after import (tests/conftest.py pattern)
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from general_mcmc_tpu.models.regression import (  # noqa: E402
    HierarchicalLogisticNC,
    make_logistic_data,
)

B, P, N_OBS, STEPS, REPS = 10240, 48, 256, 512, 3


def _kernel(mu0_ref, lt0_ref, z0_ref, xt_ref, x_ref, y_ref, w_ref,
            mu_out, lt_out, z_out, mu_s, lt_s, z_s, *, lr: float):
    """One gradient-ascent step per grid step (the step axis is the inner,
    sequential grid axis — pallas_hmc.py's structure); state lives in VMEM
    scratch for the whole run.  A single-fori-loop-over-steps form OOMs the
    16 MB scoped-VMEM stack: Mosaic unrolls the static-trip-count loop and
    stacks every step's [B, n_obs] intermediates."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        mu_s[:] = mu0_ref[:]
        lt_s[:] = lt0_ref[:]
        z_s[:] = z0_ref[:]

    xt = xt_ref[:]          # [p, n_obs]
    x = x_ref[:]            # [n_obs, p]
    y_row = y_ref[:]        # [1, n_obs]
    w = w_ref[:]            # [2p, 2] block-diagonal ones

    mu, lt, z = mu_s[:], lt_s[:], z_s[:]
    tau = jnp.exp(lt)
    p_dim = z.shape[1]
    mu_rep = pltpu.repeat(mu, p_dim, axis=1)
    tau_rep = pltpu.repeat(tau, p_dim, axis=1)
    beta = mu_rep + tau_rep * z
    logits = jnp.dot(beta, xt, preferred_element_type=jnp.float32)
    resid = y_row - jax.nn.sigmoid(logits)          # [B, n_obs]
    g_lik = jnp.dot(resid, x, preferred_element_type=jnp.float32)
    packed = jnp.concatenate([g_lik, z * g_lik], axis=1)   # [B, 2p]
    # HIGHEST: the MXU rounds operands to bf16 (measured: ~1e-3 rel err on
    # the hyper sums vs XLA's f32 jnp.sum — the big matmuls agree BITWISE);
    # the 3-pass f32 emulation is free at [B, 2p] @ [2p, 2]
    sums = jnp.dot(packed, w, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    g_mu = -mu + sums[:, 0:1]
    g_lt = -lt + tau * sums[:, 1:2]
    g_z = -z + tau_rep * g_lik
    mu_s[:] = mu + lr * g_mu
    lt_s[:] = lt + lr * g_lt
    z_s[:] = z + lr * g_z

    @pl.when(t == pl.num_programs(1) - 1)
    def _done():
        mu_out[:] = mu_s[:]
        lt_out[:] = lt_s[:]
        z_out[:] = z_s[:]


def fused_chain(theta0, X, y, steps=STEPS, lr=1e-3, block=2048,
                interpret=False):
    n = theta0.shape[0]
    if n % block != 0:
        block = n
    mu0 = theta0[:, 0:1]
    lt0 = theta0[:, 1:2]
    z0 = theta0[:, 2:]
    p = z0.shape[1]
    w = jnp.zeros((2 * p, 2), jnp.float32)
    w = w.at[:p, 0].set(1.0).at[p:, 1].set(1.0)
    xt = jnp.asarray(X.T, jnp.float32)
    x = jnp.asarray(X, jnp.float32)
    y_row = jnp.asarray(y, jnp.float32).reshape(1, -1)

    grid = (n // block, steps)
    row = lambda a: pl.BlockSpec(
        a.shape, lambda b, t: tuple(0 for _ in a.shape),
        memory_space=pltpu.VMEM,
    )
    blk = lambda d: pl.BlockSpec(
        (block, d), lambda b, t: (b, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, lr=lr),
        grid=grid,
        in_specs=[blk(1), blk(1), blk(p), row(xt), row(x), row(y_row),
                  row(w)],
        out_specs=(blk(1), blk(1), blk(p)),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, p), jnp.float32),
        ],
        # the [B, 1] operands/results pad to 128 lanes; at B=10240 the
        # operand+result staging alone exceeds the default 16 MB scoped
        # VMEM — raise the cap (v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(mu0, lt0, z0, xt, x, y_row, w)
    return jnp.concatenate(out, axis=1)


def xla_chain(theta0, X, y, steps=STEPS, lr=1e-3):
    target = HierarchicalLogisticNC(X, y)
    grad = jax.vmap(target.unnorm_logp_grad)

    @jax.jit
    def run(th):
        def body(t, _):
            return t + lr * grad(t), None

        return jax.lax.scan(body, th, None, length=steps)[0]

    return run


def main():
    interpret = "--interpret" in sys.argv
    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(1)
    X, y, _ = make_logistic_data(key, N_OBS, P)
    b = 256 if interpret else B  # interpret mode: correctness only, small
    theta0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (b, P + 2), jnp.float32
    )

    # correctness first: fused vs XLA analytic chain.  The 1-step error is
    # the gate (pure gradient agreement: measured 2.5e-7 on v5e after the
    # HIGHEST-precision hyper matvec); multi-step errors grow by rounding
    # divergence of two equally-valid f32 programs (6.4e-4 at 8 steps) and
    # are reported, not gated.
    errs = {}
    for st in (1, 8):
        want = xla_chain(theta0, X, y, steps=st)(theta0)
        got = jax.jit(
            functools.partial(fused_chain, X=X, y=y, steps=st,
                              interpret=interpret)
        )(theta0)
        errs[st] = float(jnp.max(jnp.abs(got - want)) /
                         (jnp.max(jnp.abs(want)) + 1e-30))
        print(f"{st}-step agreement vs XLA analytic grad: "
              f"max rel err {errs[st]:.2e}")
    assert errs[1] < 1e-5, errs
    if interpret:
        return

    flops_per_step = 4 * B * N_OBS * P
    for block in (1024, 2048, 5120):
        try:
            run = jax.jit(functools.partial(
                fused_chain, X=X, y=y, steps=STEPS, block=block
            ))
            run(theta0).block_until_ready()  # compile
            walls = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                run(theta0).block_until_ready()
                walls.append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — per-block probe, keep going
            print(f"pallas block={block:5d}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        wall = min(walls)
        us = wall / STEPS * 1e6
        tf = flops_per_step * STEPS / wall / 1e12
        print(
            f"pallas block={block:5d}  {us:7.2f} us/grad   {tf:6.2f} TFLOP/s"
            f"   vs XLA 61.38 us: {61.38 / us:.2f}x   "
            f"walls {['%.3f' % w for w in walls]}",
            flush=True,
        )

    xla = xla_chain(theta0, X, y)
    xla(theta0).block_until_ready()
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        xla(theta0).block_until_ready()
        walls.append(time.perf_counter() - t0)
    us = min(walls) / STEPS * 1e6
    print(f"xla f32 (same-session control): {us:7.2f} us/grad")


if __name__ == "__main__":
    main()
