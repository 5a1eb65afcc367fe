"""Device-mesh utilities for scaling chains (and large state dimensions)
across chips.

The reference's only parallelism is single-process chain parallelism —
Rayon work-stealing over chains (core.rs:219-229) and scoped threads with
mpsc channels (core.rs:251-403); see SURVEY.md §2.1.  The TPU-native
equivalents:

- **chains axis** (data parallelism): chains are embarrassingly parallel, so
  sharding the leading ``[n_chains]`` axis over the mesh needs no
  communication during sampling — only diagnostics reduce across it (over
  ICI via psum; see :mod:`.collectives`).
- **dim axis** (the tensor-parallel analog for this workload): for very
  large state dimensions the parameter axis of positions/momenta/gradients
  shards over a second mesh axis; XLA's SPMD partitioner turns the dot
  products inside logp/kinetic-energy into partial sums + all-reduce
  automatically once the arrays carry shardings.

Multi-host: build the mesh over ``jax.devices()`` after
``jax.distributed.initialize``; chains ride DCN-free (independent), and
diagnostics are the only cross-host traffic — matching the reference's
"merge sufficient statistics, not samples" channel protocol (SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["chain_mesh", "make_mesh", "shard_carry", "CHAINS_AXIS", "DIM_AXIS"]

CHAINS_AXIS = "chains"
DIM_AXIS = "dim"


def chain_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first ``n_devices``) devices, chains axis."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (CHAINS_AXIS,))


def make_mesh(n_chain_shards: int, n_dim_shards: int = 1) -> Mesh:
    """2-D ``(chains, dim)`` mesh; ``n_dim_shards=1`` degenerates to DP."""
    n = n_chain_shards * n_dim_shards
    devices = np.asarray(jax.devices()[:n]).reshape(n_chain_shards, n_dim_shards)
    return Mesh(devices, (CHAINS_AXIS, DIM_AXIS))


def _leaf_spec(leaf, shard_dim: bool) -> P:
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0:
        return P()
    dim_axis = DIM_AXIS if shard_dim else None
    if ndim == 1:
        return P(CHAINS_AXIS)
    if ndim == 2:
        return P(CHAINS_AXIS, dim_axis)
    return P(CHAINS_AXIS, dim_axis, *([None] * (ndim - 2)))


def shard_carry(carry, mesh: Mesh, shard_dim: bool = False):
    """Place a sampler carry on the mesh: leading axis over ``chains``; with
    ``shard_dim``, second axes of matrices over ``dim`` as well.  The jitted
    sampling scan then runs SPMD with XLA-inserted collectives only where
    cross-shard reductions exist (none for pure DP).

    Multi-process safe: when the mesh spans other processes' devices,
    host-local leaves are placed shard-by-shard via
    ``make_array_from_callback`` (every process holds the full host value,
    e.g. seeds and replicated scalars, so it can materialize exactly its
    addressable pieces), and leaves that are already global arrays (e.g.
    :func:`~.distributed.init_positions_on_mesh` output) are kept or
    resharded through a jitted identity."""
    shard_dim = shard_dim and DIM_AXIS in mesh.axis_names

    def place(leaf):
        spec = _leaf_spec(leaf, shard_dim)
        sharding = NamedSharding(mesh, spec)
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            if leaf.sharding.is_equivalent_to(sharding, leaf.ndim):
                return leaf
            return jax.jit(lambda x: x, out_shardings=sharding)(leaf)
        if sharding.is_fully_addressable:
            return jax.device_put(leaf, sharding)
        if isinstance(leaf, jax.Array) and jax.dtypes.issubdtype(
            leaf.dtype, jax.dtypes.prng_key
        ):
            # typed PRNG keys: place the uint32 key data (trailing key-data
            # axis replicated), rewrap with the same impl
            host = np.asarray(jax.random.key_data(leaf))
            data_sharding = NamedSharding(mesh, P(*spec, None))
            data = jax.make_array_from_callback(
                host.shape, data_sharding, lambda idx: host[idx]
            )
            return jax.random.wrap_key_data(
                data, impl=jax.random.key_impl(leaf)
            )
        host = np.asarray(leaf)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    return jax.tree.map(place, carry)
