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
        state.  With the default static sweep, ``i`` is a Python int at
        trace time (free per-coordinate Python branching).
    initial_states : [n_chains, dim] array
    seed : int or PRNG key (the reference's ``seed + i`` per-chain
        derivation, gibbs.rs:179-188, via fold_in)
    static_sweep : unroll the sweep (default).  For high-dimensional
        states pass ``False``: the sweep becomes a ``lax.scan`` over a
        *traced* coordinate index, keeping the compiled program O(1) in
        ``dim`` — the conditional must then be traceable in ``i``
        (e.g. branch with ``lax.switch``/``jnp.where``).
    """

    def __init__(self, conditional, initial_states, seed=0, static_sweep=True):
        if hasattr(conditional, "sample"):
            conditional = conditional.sample
        self.conditional = conditional
        self.initial_states = jnp.asarray(initial_states)
        self.dim = self.initial_states.shape[1]
        self.static_sweep = bool(static_sweep)
        super().__init__(n_chains=self.initial_states.shape[0], seed=seed)

    def _init_carry(self):
        return (self.initial_states, self._chain_keys)

    def _chain_step(self, x, key, m):
        """One full Gibbs sweep for one chain (gibbs.rs:95-99); coordinate
        ``i`` always sees the already-updated values of ``0..i-1``."""
        k = step_key(key, m)
        if self.static_sweep:
            for i in range(self.dim):
                ki = jax.random.fold_in(k, i)
                xi = self.conditional(ki, i, x)
                x = x.at[i].set(xi)
            return x

        def body(xc, i):
            ki = jax.random.fold_in(k, i)
            xi = self.conditional(ki, i, xc)
            return xc.at[i].set(xi), None

        x, _ = jax.lax.scan(body, x, jnp.arange(self.dim))
        return x

    def _step(self, carry, m):
        x, keys = carry
        x_new = jax.vmap(self._chain_step, in_axes=(0, 0, None))(x, keys, m)
        return (x_new, keys)

    def _positions(self, carry):
        return carry[0]
