"""Explicit shard_map collectives for cross-chip diagnostics.

The reference merges per-chain sufficient statistics ``(n, mean, m2,
p_accept)`` over mpsc channels into pooled R-hat (core.rs:334-342,
stats.rs:148-188).  Across a device mesh the same protocol is a ``psum``
over ICI: each shard reduces its local chains, then one all-reduce of the
O(params)-sized moment vectors — never the samples themselves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import CHAINS_AXIS

__all__ = ["pooled_rhat_sharded"]


def pooled_rhat_sharded(mean, sm2, n_steps, mesh):
    """Pooled streaming R-hat from per-chain moments sharded over the mesh.

    ``mean``/``sm2`` are [n_chains, params] sharded on axis 0; returns the
    replicated [params] R-hat (within_and_var semantics, stats.rs:320-338,
    reduced with psum instead of channel draining).
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(CHAINS_AXIS, None), P(CHAINS_AXIS, None)),
        out_specs=P(None),
    )
    def _pooled(local_mean, local_sm2):
        c_local = local_mean.shape[0]
        c_total = jax.lax.psum(jnp.asarray(c_local, local_mean.dtype), CHAINS_AXIS)
        sum_mean = jax.lax.psum(jnp.sum(local_mean, axis=0), CHAINS_AXIS)
        grand_mean = sum_mean / c_total
        within = jax.lax.psum(jnp.sum(local_sm2, axis=0), CHAINS_AXIS) / c_total
        between_sum = jax.lax.psum(
            jnp.sum((local_mean - grand_mean) ** 2, axis=0), CHAINS_AXIS
        )
        nf = jnp.asarray(n_steps, local_mean.dtype)
        between = between_sum * (nf / (c_total - 1.0))
        var = within * ((nf - 1.0) / nf) + between * (1.0 / nf)
        return jnp.sqrt(var / within)

    return _pooled(mean, sm2)
