"""Logistic-likelihood MXU experiment (VERDICT round 4 #3).

The stretch workload's analytic gradient does two small-K matmuls per
leapfrog (logits = beta @ X.T, g_lik = resid @ X with K = 48 or 256) and
measured only 17.97-19.6 TFLOP/s ~= 10% of v5e bf16 peak in BENCH_r04.
This experiment times isolated gradient-step chains at the exact bench
shape (10240 chains x 48 features x 256 observations) across operand
precisions:

  f32       -- the current path (XLA f32 matmul on TPU already runs the
               MXU in multi-pass bf16, but with 3x the passes)
  bf16      -- X pre-cast to bf16 once + per-call bf16 cast of the small
               operand, f32 accumulation (preferred_element_type);
               round-3 trap rule: pre-cast BEFORE the program, don't let
               XLA assemble implicit-conversion fusions
  bf16-logits -- bf16 matmul AND the [B, n_obs] intermediates (sigmoid
               input/output) kept bf16 to halve the elementwise HBM bytes

Each variant runs a 512-step scan theta <- theta + 1e-3 * grad(theta) so
work can't be elided and dispatch is amortized; gradient agreement vs f32
is printed so the precision cost is measured, not assumed.

Run on the real TPU: `python scripts/exp_logistic_mxu.py` (serialize with
any other TPU process -- the tunnel is single-client).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from general_mcmc_tpu.models.regression import make_logistic_data  # noqa: E402

B, P, N_OBS, STEPS, REPS = 10240, 48, 256, 512, 3


def make_grad(X, y, mm_dtype, ew_dtype):
    """Per-chain analytic grad of HierarchicalLogisticNC with operand
    precision mm_dtype for the two likelihood matmuls and ew_dtype for the
    [n_obs] elementwise intermediates (regression.py:132-148)."""
    Xc = X.astype(mm_dtype)
    XcT = Xc.T  # pre-transposed, pre-cast: no in-program layout/cast fusion
    yc = y.astype(ew_dtype)

    def grad(theta):
        mu, log_tau = theta[0], theta[1]
        z = theta[2:]
        tau = jnp.exp(log_tau)
        beta = (mu + tau * z).astype(mm_dtype)
        logits = jnp.dot(Xc, beta, preferred_element_type=ew_dtype)
        resid = (yc - jax.nn.sigmoid(logits)).astype(mm_dtype)
        g_lik = jnp.dot(XcT, resid, preferred_element_type=jnp.float32)
        g_mu = -mu + jnp.sum(g_lik)
        g_log_tau = -log_tau + tau * jnp.sum(z * g_lik)
        g_z = -z + tau * g_lik
        return jnp.concatenate([jnp.stack([g_mu, g_log_tau]), g_z])

    return grad


def make_grad_precision(X, y, precision):
    """f32 operands with an explicit matmul precision (DEFAULT on TPU is a
    single bf16 pass -- measured: explicit bf16 casts change NOTHING, err
    0.0 -- so HIGHEST here prices the accuracy upgrade, not a speedup)."""

    def grad(theta):
        mu, log_tau = theta[0], theta[1]
        z = theta[2:]
        tau = jnp.exp(log_tau)
        beta = mu + tau * z
        logits = jnp.dot(X, beta, precision=precision)
        resid = y - jax.nn.sigmoid(logits)
        g_lik = jnp.dot(X.T, resid, precision=precision)
        g_mu = -mu + jnp.sum(g_lik)
        g_log_tau = -log_tau + tau * jnp.sum(z * g_lik)
        g_z = -z + tau * g_lik
        return jnp.concatenate([jnp.stack([g_mu, g_log_tau]), g_z])

    return grad


def make_matmul_only(X):
    """The two likelihood matmuls alone (identity elementwise in between):
    isolates MXU+logits-traffic time from the sigmoid/prior VPU work."""

    def grad(theta):
        beta = theta[2:]
        logits = jnp.dot(X, beta)
        g_lik = jnp.dot(X.T, logits)
        return jnp.concatenate([theta[:2], g_lik])

    return grad


def make_elementwise_only(X, y):
    """The gradient with the matmuls replaced by an O(p) broadcast --
    prices everything that is NOT the matmul pair."""

    def grad(theta):
        mu, log_tau = theta[0], theta[1]
        z = theta[2:]
        tau = jnp.exp(log_tau)
        beta = mu + tau * z
        logits = jnp.sum(beta) * y  # [n_obs], no MXU
        resid = y - jax.nn.sigmoid(logits)
        g_lik = jnp.sum(resid) * z
        g_mu = -mu + jnp.sum(g_lik)
        g_log_tau = -log_tau + tau * jnp.sum(z * g_lik)
        g_z = -z + tau * g_lik
        return jnp.concatenate([jnp.stack([g_mu, g_log_tau]), g_z])

    return grad


def chain_fn(grad):
    @jax.jit
    def run(theta0):
        def body(theta, _):
            return theta + 1e-3 * jax.vmap(grad)(theta), None

        out, _ = jax.lax.scan(body, theta0, None, length=STEPS)
        return out

    return run


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(1)
    X, y, _ = make_logistic_data(key, N_OBS, P)
    theta0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, P + 2), jnp.float32)

    variants = {
        "f32": make_grad(X, y, jnp.float32, jnp.float32),
        "bf16": make_grad(X, y, jnp.bfloat16, jnp.float32),
        "bf16-logits": make_grad(X, y, jnp.bfloat16, jnp.bfloat16),
        "f32-highest": make_grad_precision(X, y, jax.lax.Precision.HIGHEST),
        "matmul-only": make_matmul_only(0.01 * X),
        "ew-only": make_elementwise_only(X, y),
    }

    g_ref = jax.jit(jax.vmap(variants["f32"]))(theta0)
    g_ref.block_until_ready()
    flops_per_step = 4 * B * N_OBS * P  # two matmuls, 2 flops/MAC

    for name, grad in variants.items():
        g = jax.jit(jax.vmap(grad))(theta0)
        err = float(
            jnp.max(jnp.abs(g - g_ref)) / (jnp.max(jnp.abs(g_ref)) + 1e-30)
        )
        run = chain_fn(grad)
        out = run(theta0)
        out.block_until_ready()  # compile
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run(theta0).block_until_ready()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        us = wall / STEPS * 1e6
        tf = flops_per_step * STEPS / wall / 1e12
        print(
            f"{name:12s}  {us:7.2f} us/grad   {tf:6.2f} TFLOP/s   "
            f"max rel err vs f32: {err:.2e}   walls {['%.3f' % w for w in walls]}"
        )


if __name__ == "__main__":
    main()
