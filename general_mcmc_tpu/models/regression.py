"""Regression model families for gradient-based samplers.

The BASELINE.json stretch workload: hierarchical logistic regression under
NUTS with thousands of vmapped chains.  Targets follow the framework
convention — a factory binds the data and returns a pure jittable
``logp(params) -> scalar``; the likelihood matmul maps onto the MXU when
vmapped over chains.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = [
    "HierarchicalLogistic",
    "HierarchicalLogisticNC",
    "make_logistic_data",
]


def make_logistic_data(key, n_obs: int, n_features: int, dtype=jnp.float32):
    """Synthetic logistic-regression data with hierarchical coefficients."""
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.normal(k1, (n_obs, n_features), dtype)
    beta_true = 0.5 * jax.random.normal(k2, (n_features,), dtype)
    logits = X @ beta_true
    y = (jax.random.uniform(k3, (n_obs,), dtype) < jax.nn.sigmoid(logits)).astype(
        dtype
    )
    return X, y, beta_true


@dataclasses.dataclass(frozen=True, eq=False)
class HierarchicalLogistic:
    """Hierarchical Bayesian logistic regression.

    Parameter vector ``θ = [μ, log τ, β₁..β_p]`` (dim = p + 2):

        μ ~ N(0, 1);  τ = exp(log τ) with a N(0, 1) prior on log τ
        β_j ~ N(μ, τ²)
        y_i ~ Bernoulli(σ(x_i·β))

    The non-centered ``log τ`` keeps the posterior NUTS-friendly.
    """

    X: jax.Array  # [n_obs, p]
    y: jax.Array  # [n_obs] in {0, 1}

    def __post_init__(self):
        object.__setattr__(self, "X", jnp.asarray(self.X))
        object.__setattr__(self, "y", jnp.asarray(self.y))

    @property
    def dim(self) -> int:
        return self.X.shape[1] + 2

    def unnorm_logp(self, theta):
        mu, log_tau = theta[0], theta[1]
        beta = theta[2:]
        tau = jnp.exp(log_tau)
        lp = -0.5 * mu * mu
        lp = lp - 0.5 * log_tau * log_tau
        lp = lp - 0.5 * jnp.sum(((beta - mu) / tau) ** 2) - beta.shape[0] * log_tau
        logits = self.X @ beta
        # Bernoulli log-likelihood, numerically stable form.
        lp = lp + jnp.sum(self.y * logits - jax.nn.softplus(logits))
        return lp

    def unnorm_logp_grad(self, theta):
        """Analytic ∇logp (see :func:`..models.distributions.as_grad_fn`):
        lets gradient-guided samplers skip the per-leapfrog softplus +
        log-density reduce — the two likelihood matmuls (``Xβ``, ``Xᵀr``)
        are shared with autodiff, but the primal reduce is not.  Matches
        ``jax.grad(unnorm_logp)`` to float rounding (agreement test in
        tests/test_distributions.py)."""
        mu, log_tau = theta[0], theta[1]
        beta = theta[2:]
        inv_tau2 = jnp.exp(-2.0 * log_tau)
        centered = beta - mu
        resid = self.y - jax.nn.sigmoid(self.X @ beta)
        g_beta = self.X.T @ resid - centered * inv_tau2
        quad = jnp.sum(centered * centered) * inv_tau2
        g_mu = -mu + jnp.sum(centered) * inv_tau2
        g_log_tau = -log_tau + quad - beta.shape[0]
        return jnp.concatenate(
            [jnp.stack([g_mu, g_log_tau]), g_beta]
        )

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class HierarchicalLogisticNC:
    """Non-centered reparameterization of :class:`HierarchicalLogistic`.

    Parameter vector ``θ = [μ, log τ, z₁..z_p]`` with ``β = μ + τ·z`` and
    ``z_j ~ N(0, 1)``.  Same posterior over ``(μ, τ, β)``; the funnel
    between ``τ`` and ``β`` becomes a benign standard-normal geometry, so
    NUTS mixes dramatically better (the standard Stan reparameterization
    trick).  Use :meth:`beta` to map sampled ``θ`` back to coefficients.
    """

    X: jax.Array  # [n_obs, p]
    y: jax.Array  # [n_obs] in {0, 1}

    def __post_init__(self):
        object.__setattr__(self, "X", jnp.asarray(self.X))
        object.__setattr__(self, "y", jnp.asarray(self.y))

    @property
    def dim(self) -> int:
        return self.X.shape[1] + 2

    def beta(self, theta):
        """Map ``θ = [μ, log τ, z]`` (trailing axis) to coefficients β."""
        mu, log_tau = theta[..., 0:1], theta[..., 1:2]
        return mu + jnp.exp(log_tau) * theta[..., 2:]

    def unnorm_logp(self, theta):
        mu, log_tau = theta[0], theta[1]
        z = theta[2:]
        lp = -0.5 * mu * mu
        lp = lp - 0.5 * log_tau * log_tau
        lp = lp - 0.5 * jnp.sum(z * z)
        logits = self.X @ (mu + jnp.exp(log_tau) * z)
        lp = lp + jnp.sum(self.y * logits - jax.nn.softplus(logits))
        return lp

    def unnorm_logp_grad(self, theta):
        """Analytic ∇logp (see :func:`..models.distributions.as_grad_fn`):
        with ``β = μ + τz``, the likelihood gradient pulls back through
        the reparameterization as ``∂μ = Σⱼ(Xᵀr)ⱼ``, ``∂logτ = τ·z·Xᵀr``,
        ``∂z = τ·Xᵀr``.  Saves the per-leapfrog softplus + log-density
        reduce on the bench stretch workload's interior leapfrogs.
        Matches ``jax.grad(unnorm_logp)`` to float rounding (agreement
        test in tests/test_distributions.py)."""
        mu, log_tau = theta[0], theta[1]
        z = theta[2:]
        tau = jnp.exp(log_tau)
        resid = self.y - jax.nn.sigmoid(self.X @ (mu + tau * z))
        g_lik = self.X.T @ resid
        g_mu = -mu + jnp.sum(g_lik)
        g_log_tau = -log_tau + tau * jnp.sum(z * g_lik)
        g_z = -z + tau * g_lik
        return jnp.concatenate([jnp.stack([g_mu, g_log_tau]), g_z])

    __call__ = unnorm_logp
