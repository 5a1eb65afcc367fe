"""Sharded sampling runs: the multi-chip ChainRunner.

``run_sharded`` executes any :class:`~..samplers.base.BatchSampler` with its
carry distributed over a device mesh — chains over the ``chains`` axis and
(optionally) the state dimension over the ``dim`` axis.  Because the step
functions are pure and the carry arrays hold explicit shardings, the same
jitted scan that runs single-chip runs SPMD here, with XLA inserting
collectives only where genuinely needed (dim-axis dot products); sampling
itself stays communication-free DP, matching the design in SURVEY.md §2.1.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh

from ..core import run_kernel
from .mesh import shard_carry

__all__ = ["run_sharded"]


def run_sharded(
    sampler,
    n_collect: int,
    n_discard: int,
    mesh: Mesh,
    shard_dim: bool = False,
):
    """Run ``sampler`` with chains sharded over ``mesh``.

    Returns ``[n_chains, n_collect, dim]`` samples (sharded on the chain
    axis; reduce or gather as needed downstream).
    """
    sampler._prepare_run(n_collect, n_discard)
    carry = shard_carry(sampler._init_carry(), mesh, shard_dim=shard_dim)
    out = run_kernel(sampler._step_fn, carry, n_collect, n_discard)
    sampler._final_carry = out.carry
    return jnp.swapaxes(out.samples, 0, 1)
