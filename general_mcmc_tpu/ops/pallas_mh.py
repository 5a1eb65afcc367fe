"""Fused Pallas TPU kernel for random-walk Metropolis–Hastings.

The reference's MH throughput ceiling is its serial per-chain hot loop
(run_chain, core.rs:95-115; the 80M-sample stress test,
metropolis_hastings.rs:408-418).  Like :mod:`.pallas_hmc`, this kernel runs
the *entire* sampling loop on-core: grid = (chain blocks, steps), the chain
states and log-densities live in VMEM scratch across a block's whole run,
the target is traced inline, and proposals/accept draws come from the
hardware PRNG.  Per-step HBM traffic is exactly one collected-sample block
write.

Scope: symmetric Gaussian random-walk proposals (RandomWalkProposal /
IsotropicGaussian — the q-ratio cancels, metropolis_hastings.rs:312 reduces
to Δlogp); asymmetric or discrete proposals use the XLA scan path.

Layout: all state is kept **transposed** as ``[dim, chains]`` so the lane
(minor) axis is the chain axis — TPU tiling pads the minor axis to 128, and
MH targets are typically low-dimensional, so a ``[chains, dim]`` layout
would waste up to 64× HBM on the collected output (and the per-step output
block).  The target is traced with ``vmap(in_axes=1)`` to match.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_hmc import _standard_normal, _uniform_01

__all__ = ["fused_mh_run"]


def _mh_kernel(
    x0_ref,
    *refs,
    closed_lp: Callable,
    const_shapes,
    scale: float,
    n_discard: int,
    seed: int,
):
    n_consts = len(const_shapes)
    const_refs = refs[:n_consts]
    out_ref, pos_ref, lp_ref = refs[n_consts:]
    consts = [
        r[:].reshape(shape) if shape else r[0, 0]
        for r, shape in zip(const_refs, const_shapes)
    ]

    def lp_fn(x_dB):
        (lp,) = closed_lp(x_dB, *consts)  # traced with vmap in_axes=1
        return lp.reshape(1, x_dB.shape[1])

    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed + b * pl.num_programs(1) + t)

    @pl.when(t == 0)
    def _init():
        x = x0_ref[:]
        pos_ref[:] = x
        lp_ref[:] = lp_fn(x)

    x = pos_ref[:]  # [d, B]
    lp = lp_ref[:]  # [1, B]

    proposed = x + jnp.float32(scale) * _standard_normal(x.shape)
    lp_prop = lp_fn(proposed)
    u = _uniform_01((1, x.shape[1]))
    accept = jnp.log(u) < (lp_prop - lp)  # symmetric proposal: q cancels

    x = jnp.where(accept, proposed, x)
    lp = jnp.where(accept, lp_prop, lp)
    pos_ref[:] = x
    lp_ref[:] = lp
    out_ref[0] = x


def fused_mh_run(
    logp_fn: Callable,
    initial_positions,
    scale: float,
    n_collect: int,
    n_discard: int = 0,
    seed: int = 0,
    block_chains: int = 1024,
    interpret: bool = False,
):
    """Run random-walk MH entirely inside one Pallas kernel.

    Returns ``[n_chains, n_collect, dim]`` float32 samples.
    """
    x0 = jnp.asarray(initial_positions, jnp.float32).T  # [d, n]
    d, n = x0.shape
    if n % block_chains != 0:
        block_chains = n
    B = block_chains
    n_blocks = n // B
    total = n_collect + n_discard

    def lp_batch(x_dB):
        return (jax.vmap(logp_fn, in_axes=1)(x_dB).astype(jnp.float32),)

    closed_jaxpr = jax.make_jaxpr(lp_batch)(jnp.zeros((d, B), jnp.float32))
    consts = list(closed_jaxpr.consts)
    const_shapes = tuple(jnp.shape(c) for c in consts)
    consts_2d = [jnp.atleast_2d(jnp.asarray(c)) for c in consts]

    def closed_lp(x, *cs):
        return jax.core.eval_jaxpr(closed_jaxpr.jaxpr, list(cs), x)

    kernel = functools.partial(
        _mh_kernel,
        closed_lp=closed_lp,
        const_shapes=const_shapes,
        scale=float(scale),
        n_discard=int(n_discard),
        seed=int(seed),
    )

    full_vmem = lambda a: pl.BlockSpec(
        a.shape, lambda b, t: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, total),
        in_specs=[
            pl.BlockSpec((d, B), lambda b, t: (0, b), memory_space=pltpu.VMEM)
        ]
        + [full_vmem(c) for c in consts_2d],
        out_specs=pl.BlockSpec(
            (1, d, B),
            lambda b, t: (jnp.maximum(t - n_discard, 0), 0, b),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_collect, d, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, B), jnp.float32),  # position
            pltpu.VMEM((1, B), jnp.float32),  # logp
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x0, *consts_2d)
    # [n_collect, d, n] -> [n, n_collect, d]
    return jnp.transpose(out, (2, 0, 1))
