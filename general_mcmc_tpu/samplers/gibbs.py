"""Gibbs sampling from user-supplied full conditionals.

TPU-native rebuild of the reference's Gibbs sampler (gibbs.rs): the
coordinate sweep (GibbsMarkovChain::step, gibbs.rs:95-99) is unrolled over
the (static) state dimension inside the vmapped chain kernel, preserving the
sequential dependence — coordinate ``i`` sees the already-updated values of
coordinates ``0..i-1`` (SURVEY.md §3.5).  Because the coordinate index is a
Python int at trace time, user conditionals may freely branch per coordinate
in plain Python (the ergonomic analog of the reference's ``Conditional``
trait, distributions.rs:489-491).

A conditional is any callable ``sample(key, i, state) -> new_value_i``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rng import step_key
from .base import BatchSampler

__all__ = ["GibbsSampler"]


class GibbsSampler(BatchSampler):
    """Batched-chain Gibbs sampler (gibbs.rs:116-188).

    Parameters
    ----------
    conditional : callable ``(key, i, state) -> value``
        Full conditional sampler for coordinate ``i`` given the current
        state; traced once per coordinate (``i`` is static).
    initial_states : [n_chains, dim] array
    seed : int or PRNG key (the reference's ``seed + i`` per-chain
        derivation, gibbs.rs:179-188, via fold_in)
    """

    def __init__(self, conditional, initial_states, seed=0):
        if hasattr(conditional, "sample"):
            conditional = conditional.sample
        self.conditional = conditional
        self.initial_states = jnp.asarray(initial_states)
        self.dim = self.initial_states.shape[1]
        super().__init__(n_chains=self.initial_states.shape[0], seed=seed)

    def _init_carry(self):
        return (self.initial_states, self._chain_keys)

    def _chain_step(self, x, key, m):
        """One full Gibbs sweep for one chain (gibbs.rs:95-99)."""
        k = step_key(key, m)
        for i in range(self.dim):
            ki = jax.random.fold_in(k, i)
            xi = self.conditional(ki, i, x)
            x = x.at[i].set(xi)
        return x

    def _step(self, carry, m):
        x, keys = carry
        x_new = jax.vmap(self._chain_step, in_axes=(0, 0, None))(x, keys, m)
        return (x_new, keys)

    def _positions(self, carry):
        return carry[0]
