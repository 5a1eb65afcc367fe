"""Multi-host (multi-process) sampling recipe.

The reference is single-node, single-process by design (SURVEY.md §2.1:
Rayon + mpsc, no cluster dimension).  Scaling past one host is therefore a
deliberate extension, and the JAX story is small because chains are
embarrassingly parallel:

1. every process calls :func:`initialize` (a safe, idempotent wrapper over
   ``jax.distributed.initialize``);
2. build one global mesh over ``jax.devices()`` (:func:`global_chain_mesh`);
3. materialize the initial positions *process-locally* with
   :func:`init_positions_on_mesh` — each host computes only the chain rows
   it owns, from per-chain folded keys, so no host ever holds (or sends)
   the full ``[n_chains, dim]`` array and every layout yields bitwise the
   same global initialization (the multi-host analog of the reference's
   ``chain_seed = f(global_seed, chain_idx)`` scheme,
   metropolis_hastings.rs:189-197);
4. run the ordinary jitted sampling scan — chains ride DCN-free, and the
   only cross-host traffic is pooled diagnostics
   (:func:`~.collectives.pooled_rhat_sharded`), mirroring the reference's
   "merge sufficient statistics, not samples" channel protocol
   (SURVEY.md §2.2).

See docs/MULTIHOST.md for the launch recipe.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import CHAINS_AXIS

__all__ = ["initialize", "global_chain_mesh", "init_positions_on_mesh"]

# Environment variables that signal an externally-configured cluster, in
# which case jax.distributed.initialize() can autodetect everything.
_CLUSTER_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_JOB_ID",
    "OMPI_COMM_WORLD_SIZE",
)


def _in_cluster() -> bool:
    if any(os.environ.get(v) for v in _CLUSTER_ENV_VARS):
        return True
    # Single-host TPU VMs also set TPU_WORKER_HOSTNAMES (to one name); only
    # a multi-worker list signals a pod slice.
    return "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Returns True when a multi-process runtime was (or already is)
    initialized, False when this is a plain single-process run and
    initialization was skipped.  Safe to call unconditionally at program
    start: explicit arguments win; otherwise a cluster is only assumed when
    one of the standard coordinator/scheduler environment variables is set.
    """
    if jax.distributed.is_initialized():
        return True
    explicit = coordinator_address is not None or num_processes is not None
    if not explicit and not _in_cluster():
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def global_chain_mesh() -> Mesh:
    """1-D chains mesh over *all* global devices (every process's chips).

    Device order follows ``jax.devices()``, which groups by process — so
    contiguous chain blocks land on one host and sampling traffic never
    crosses DCN.
    """
    return Mesh(np.asarray(jax.devices()), (CHAINS_AXIS,))


def _row_keys(seed: int, lo: int, hi: int) -> jax.Array:
    base = jax.random.key(seed)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(lo, hi))


def init_positions_on_mesh(
    n_chains: int,
    dim: int,
    seed: int,
    mesh: Mesh,
    scale: float = 1.0,
) -> jax.Array:
    """Standard-normal initial positions ``[n_chains, dim]`` sharded over
    ``mesh``'s chains axis, built without ever materializing the global
    array on any single host.

    Row ``i`` is drawn from ``fold_in(key(seed), i)`` regardless of which
    process owns it, so the global initialization is independent of the
    mesh shape and process count (init_with_seed's distribution,
    core.rs:434-475, with a layout-invariant per-chain key derivation).
    """
    n_shards = mesh.shape[CHAINS_AXIS]
    if n_chains % n_shards:
        raise ValueError(
            f"n_chains={n_chains} must be divisible by the mesh's chains "
            f"axis ({n_shards} devices); pad the chain count up — extra "
            "chains are cheap and diagnostics pool across all of them."
        )
    sharding = NamedSharding(mesh, P(CHAINS_AXIS, None))

    def make_block(index):
        rows = index[0]
        lo = 0 if rows.start is None else rows.start
        hi = n_chains if rows.stop is None else rows.stop
        keys = _row_keys(seed, lo, hi)
        draw = jax.vmap(lambda k: scale * jax.random.normal(k, (dim,), jnp.float32))
        return np.asarray(jax.device_get(draw(keys)))

    return jax.make_array_from_callback((n_chains, dim), sharding, make_block)
