"""Metropolis-adjusted Langevin algorithm (MALA).

Not in the reference's sampler set — included because the gradient
infrastructure makes it nearly free and it fills the gap between
random-walk MH and HMC: proposals drift along ∇log p,

    x' = x + (ε²/2)·∇log p(x) + ε·ξ,   ξ ~ N(0, I),

accepted with the usual MH ratio including the *asymmetric* forward/backward
Gaussian transition densities.  Like HMC, the accepted gradient is carried so
each step costs exactly one gradient evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.distributions import as_logp_fn
from ..rng import step_key
from .base import BatchSampler

__all__ = ["MALA"]


class MALA(BatchSampler):
    """Batched-chain MALA.

    Parameters
    ----------
    target : callable or object with ``unnorm_logp`` (differentiable)
    initial_positions : [n_chains, dim] float array
    step_size : Langevin step ε
    """

    def __init__(self, target, initial_positions, step_size, seed=0):
        self.target = as_logp_fn(target)
        self.initial_positions = jnp.asarray(initial_positions)
        if not jnp.issubdtype(self.initial_positions.dtype, jnp.floating):
            self.initial_positions = self.initial_positions.astype(jnp.float32)
        self.step_size = float(step_size)
        self._vg = jax.value_and_grad(self.target)
        super().__init__(n_chains=self.initial_positions.shape[0], seed=seed)

    def _init_carry(self):
        x0 = self.initial_positions
        lp0, g0 = jax.vmap(self._vg)(x0)
        return (x0, lp0.astype(x0.dtype), g0.astype(x0.dtype), self._chain_keys)

    def _chain_step(self, x, lp, grad, key, m):
        dtype = x.dtype
        eps = jnp.asarray(self.step_size, dtype)
        half_eps2 = 0.5 * eps * eps
        k = step_key(key, m)
        k_prop, k_u = jax.random.split(k)

        drift = x + half_eps2 * grad
        noise = jax.random.normal(k_prop, x.shape, dtype)
        proposed = drift + eps * noise

        lp_prop, grad_prop = self._vg(proposed)
        lp_prop = lp_prop.astype(dtype)
        grad_prop = grad_prop.astype(dtype)

        # asymmetric transition densities q(x'|x), q(x|x')
        back_mean = proposed + half_eps2 * grad_prop
        log_q_fwd = -0.5 * jnp.sum((proposed - drift) ** 2) / (eps * eps)
        log_q_bwd = -0.5 * jnp.sum((x - back_mean) ** 2) / (eps * eps)

        log_accept = (lp_prop + log_q_bwd) - (lp + log_q_fwd)
        u = jax.random.uniform(k_u, (), dtype)
        accept = jnp.log(u) < log_accept
        return (
            jnp.where(accept, proposed, x),
            jnp.where(accept, lp_prop, lp),
            jnp.where(accept, grad_prop, grad),
        )

    def _step(self, carry, m):
        x, lp, grad, keys = carry
        x, lp, grad = jax.vmap(self._chain_step, in_axes=(0, 0, 0, 0, None))(
            x, lp, grad, keys, m
        )
        return (x, lp, grad, keys)

    def _positions(self, carry):
        return carry[0]
