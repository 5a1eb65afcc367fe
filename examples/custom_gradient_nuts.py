"""User-supplied analytic gradients via ``jax.custom_vjp``.

The reference lets a target override ``unnorm_logp_and_grad`` to bypass
autodiff (distributions.rs:83-90).  The TPU-native equivalent is JAX's
standard custom-derivative machinery: attach ``jax.custom_vjp`` (or
``jax.custom_jvp``) to the logp function and every sampler in this package
— they all obtain gradients through ``jax.value_and_grad(logp)``
(samplers/nuts.py, samplers/hmc.py) — transparently uses the hand-coded
rule instead of tracing the backward pass.

Use cases: gradients cheaper than autodiff (precomputed factorizations),
numerically-stabilized gradients near singular points, or gradients of
logp implementations autodiff cannot trace (custom C++/Pallas calls).
"""

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import NUTS, init_det


def make_custom_gaussian(mean, cov_diag):
    """Diagonal-Gaussian logp with a HAND-CODED gradient rule."""
    mean = jnp.asarray(mean)
    inv = 1.0 / jnp.asarray(cov_diag)

    @jax.custom_vjp
    def logp(x):
        d = x - mean
        return -0.5 * jnp.sum(d * inv * d)

    def fwd(x):
        d = x - mean
        # residual: the exact gradient, computed our way (no autodiff tape)
        return -0.5 * jnp.sum(d * inv * d), -inv * d

    def bwd(grad_saved, ct):
        return (ct * grad_saved,)

    logp.defvjp(fwd, bwd)
    return logp


def main(n_chains=64, n_collect=400, n_warmup=200, seed=0):
    mean = jnp.array([1.0, -2.0, 3.0])
    var = jnp.array([0.5, 2.0, 4.0])
    logp = make_custom_gaussian(mean, var)

    # Prove the custom rule is what the samplers will use: value_and_grad
    # (exactly the transform NUTS/HMC apply) must return the hand-coded
    # formula, not a traced backward pass.
    x0 = jnp.array([0.3, 0.7, -1.1])
    val, grad = jax.value_and_grad(logp)(x0)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(-(x0 - mean) / var), rtol=1e-6
    )

    sampler = NUTS(logp, init_det(n_chains, 3), 0.8, seed=seed)
    sample, stats = sampler.run_progress(n_collect, n_warmup, progress=False)
    print(stats)
    flat = np.asarray(sample).reshape(-1, 3)
    print("posterior mean:", flat.mean(axis=0), " (target:", np.asarray(mean), ")")
    print("posterior var :", flat.var(axis=0), " (target:", np.asarray(var), ")")
    return sample, stats


if __name__ == "__main__":
    main()
