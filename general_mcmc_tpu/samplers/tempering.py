"""Replica-exchange MCMC (parallel tempering) — beyond-reference extension.

The reference has no tempering (its samplers are single-distribution; see
SURVEY.md §2), but multimodal targets defeat every local sampler it ships —
the motivating workload here is the classic two-well mixture on which
random-walk MH mixes between modes essentially never.  The design is
TPU-first: the temperature ladder is just one more batch axis, so the whole
ensemble ``[n_chains, n_temps, dim]`` advances as a single tensor program:

- **within-temperature moves**: one random-walk MH update per replica, all
  replicas at once (a double vmap over chains × temperatures), against the
  tempered density ``β_t · logp(x)``;
- **swap moves**: every ``swap_every`` steps, adjacent temperature pairs
  exchange states with probability ``min(1, exp((β_i − β_j)(lp_j − lp_i)))``.
  Pairs alternate even/odd offsets per swap round (the deterministic
  even-odd scheme; Okabe et al. 2001, arXiv:cond-mat/0012323), which is both
  the fastest-mixing ladder schedule and a perfectly vectorizable one: a
  swap round is one masked pairwise select along the temperature axis — no
  gathers, no host control flow.

``run`` returns the cold (β = 1) replica's states in the standard
``[n_chains, n_collect, dim]`` layout, so diagnostics, IO, checkpointing,
progress, and mesh sharding all compose unchanged.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..models.distributions import as_logp_fn
from ..rng import step_key
from .base import BatchSampler

__all__ = ["ReplicaExchange", "geometric_temperatures"]


def geometric_temperatures(n_temps: int, t_max: float) -> jax.Array:
    """Geometric ladder 1 = T₀ < … < T_{n−1} = t_max (the standard default)."""
    return jnp.logspace(0.0, jnp.log10(t_max), n_temps)


class ReplicaExchange(BatchSampler):
    """Parallel-tempered random-walk MH over a temperature ladder.

    Parameters
    ----------
    target : callable or object with ``unnorm_logp``
    initial_states : [n_chains, dim] — every replica of a chain starts here
    temperatures : [n_temps] ascending, ``temperatures[0] == 1`` (the cold
        chain whose samples are returned)
    scale : random-walk proposal std; each replica's proposal is scaled by
        ``sqrt(T)`` so hot replicas take correspondingly larger steps
    swap_every : steps between swap rounds (1 = swap after every sweep)
    """

    def __init__(self, target, initial_states, temperatures, scale: float = 1.0,
                 swap_every: int = 1, seed=0):
        self.target: Callable = as_logp_fn(target)
        self.initial_states = jnp.asarray(initial_states)
        if not jnp.issubdtype(self.initial_states.dtype, jnp.floating):
            self.initial_states = self.initial_states.astype(jnp.float32)
        self.temperatures = jnp.asarray(temperatures, jnp.float64).astype(
            self.initial_states.dtype
        )
        if self.temperatures.ndim != 1 or self.temperatures.shape[0] < 2:
            raise ValueError("temperatures must be a 1-D ladder of >= 2 rungs")
        t_np = jax.device_get(self.temperatures)
        if abs(float(t_np[0]) - 1.0) > 1e-6:
            raise ValueError(
                f"temperatures[0] must be 1.0 (the cold chain whose samples "
                f"are returned), got {float(t_np[0])}"
            )
        if not (t_np[1:] > t_np[:-1]).all():
            raise ValueError("temperatures must be strictly ascending")
        self.betas = 1.0 / self.temperatures
        self.scale = float(scale)
        self.swap_every = int(swap_every)
        super().__init__(n_chains=self.initial_states.shape[0], seed=seed)

    # -- kernel ---------------------------------------------------------------
    def _init_carry(self):
        n, d = self.initial_states.shape
        t = self.betas.shape[0]
        x0 = jnp.broadcast_to(self.initial_states[:, None, :], (n, t, d))
        lp0 = jax.vmap(jax.vmap(self.target))(x0)  # [n, t] untempered logp
        return (x0, lp0, self._chain_keys)

    def _chain_step(self, x, lp, key, m):
        """One tempered sweep + (possibly) one swap round, for one chain.

        ``x``: [t, d] replica states, ``lp``: [t] untempered logp.
        """
        t, d = x.shape
        dtype = x.dtype
        k = step_key(key, m)
        k_prop, k_acc, k_swap = jax.random.split(k, 3)

        # within-temperature random-walk MH against beta * logp
        step_scale = self.scale * jnp.sqrt(1.0 / self.betas)[:, None]
        proposed = x + step_scale.astype(dtype) * jax.random.normal(
            k_prop, (t, d), dtype
        )
        lp_prop = jax.vmap(self.target)(proposed)
        log_u = jnp.log(jax.random.uniform(k_acc, (t,), dtype))
        accept = log_u < self.betas * (lp_prop - lp)
        x = jnp.where(accept[:, None], proposed, x)
        lp = jnp.where(accept, lp_prop, lp)

        # deterministic even-odd swap rounds every swap_every steps
        do_swap = (m % self.swap_every) == (self.swap_every - 1)
        parity = (m // self.swap_every) % 2  # 0: pairs (0,1),(2,3)…; 1: (1,2),…

        lo = jnp.arange(t - 1)  # candidate pair (i, i+1) for each i
        is_lo = (lo % 2) == parity  # whether rung i leads an active pair
        # swap acceptance per pair: (β_i − β_{i+1}) (lp_{i+1} − lp_i)
        log_alpha = (self.betas[:-1] - self.betas[1:]) * (lp[1:] - lp[:-1])
        u = jnp.log(jax.random.uniform(k_swap, (t - 1,), dtype))
        pair_swap = is_lo & (u < log_alpha) & do_swap

        # realize swaps as one pairwise select along the rung axis
        take_upper = jnp.concatenate([pair_swap, jnp.zeros((1,), bool)])
        take_lower = jnp.concatenate([jnp.zeros((1,), bool), pair_swap])
        x_up = jnp.concatenate([x[1:], x[-1:]])
        x_dn = jnp.concatenate([x[:1], x[:-1]])
        lp_up = jnp.concatenate([lp[1:], lp[-1:]])
        lp_dn = jnp.concatenate([lp[:1], lp[:-1]])
        x = jnp.where(take_upper[:, None], x_up,
                      jnp.where(take_lower[:, None], x_dn, x))
        lp = jnp.where(take_upper, lp_up, jnp.where(take_lower, lp_dn, lp))
        return x, lp

    def _step(self, carry, m):
        x, lp, keys = carry
        x_new, lp_new = jax.vmap(self._chain_step, in_axes=(0, 0, 0, None))(
            x, lp, keys, m
        )
        return (x_new, lp_new, keys)

    def _positions(self, carry):
        return carry[0][:, 0, :]  # the cold replica
