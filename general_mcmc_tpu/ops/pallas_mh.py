"""Fused Pallas TPU kernel for Metropolis–Hastings.

The reference's MH throughput ceiling is its serial per-chain hot loop
(run_chain, core.rs:95-115; the 80M-sample stress test,
metropolis_hastings.rs:408-418).  Like :mod:`.pallas_hmc`, this kernel runs
the *entire* sampling loop on-core: grid = (chain blocks, steps), the chain
states and log-densities live in VMEM scratch across a block's whole run,
the target is traced inline, and proposals/accept draws come from the
hardware PRNG.  Per-step HBM traffic is exactly one collected-sample block
write.

Proposals: the default is the symmetric Gaussian random walk (the q-ratio
cancels, metropolis_hastings.rs:312 reduces to Δlogp).  Asymmetric
continuous proposals are supported through the reparameterization pair
``propose(x, z) -> y`` (deterministic given a standard-normal draw ``z``)
and ``logp(from, to)`` — both are traced and inlined into the kernel
exactly like the target, so the full Hastings ratio
``(lp' + q(y,x)) − (lp + q(x,y))`` (metropolis_hastings.rs:312) is computed
on-core.  Discrete proposals use the XLA scan path.

Layout: all state is kept **transposed** as ``[dim, chains]`` so the lane
(minor) axis is the chain axis — TPU tiling pads the minor axis to 128, and
MH targets are typically low-dimensional, so a ``[chains, dim]`` layout
would waste up to 64× HBM on the collected output (and the per-step output
block).  The target/proposal are traced with ``vmap(in_axes=1)`` to match.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_hmc import _standard_normal, _uniform_01, seed_prng

__all__ = ["fused_mh_run"]


def _inline(fn, *example_args):
    """Trace ``fn`` to a jaxpr and return (closed_fn, consts) so the
    computation can be replayed inside a Pallas kernel with its constants
    passed as kernel inputs."""
    closed = jax.make_jaxpr(fn)(*example_args)
    consts = [jnp.atleast_2d(jnp.asarray(c)) for c in closed.consts]
    shapes = tuple(jnp.shape(c) for c in closed.consts)

    def run(cs, *args):
        vals = [
            r[:].reshape(shape) if shape else r[0, 0]
            for r, shape in zip(cs, shapes)
        ]
        return jax.core.eval_jaxpr(closed.jaxpr, vals, *args)

    return run, consts


def _mh_kernel(
    x0_ref,
    lp0_ref,
    *refs,
    closed_step: Callable,
    n_step_consts: int,
    n_discard: int,
    seed: int,
    interpret: bool,
):
    step_consts = refs[:n_step_consts]
    out_ref, pos_ref, lp_ref = refs[n_step_consts:]

    b = pl.program_id(0)
    t = pl.program_id(1)
    seed_prng(seed + b * pl.num_programs(1) + t, interpret)

    @pl.when(t == 0)
    def _init():
        # initial logp is computed once at the JAX level and fed in — the
        # target's constants then ride into the kernel exactly once (via
        # the step jaxpr), not twice
        pos_ref[:] = x0_ref[:]
        lp_ref[:] = lp0_ref[:]

    x = pos_ref[:]  # [d, B]
    lp = lp_ref[:]  # [1, B]

    z = _standard_normal(x.shape)
    proposed, lp_prop, dq = closed_step(step_consts, x, z)
    lp_prop = lp_prop.reshape(1, x.shape[1])
    dq = dq.reshape(1, x.shape[1])
    u = _uniform_01((1, x.shape[1]))
    # log u < (lp' + q_back) − (lp + q_fwd)  (metropolis_hastings.rs:312)
    accept = jnp.log(u) < (lp_prop - lp + dq)

    x = jnp.where(accept, proposed, x)
    lp = jnp.where(accept, lp_prop, lp)
    pos_ref[:] = x
    lp_ref[:] = lp
    out_ref[0] = x


def fused_mh_run(
    logp_fn: Callable,
    initial_positions,
    scale: float | None,
    n_collect: int,
    n_discard: int = 0,
    seed: int = 0,
    block_chains: int = 1024,
    interpret: bool = False,
    proposal=None,
    thin: int = 1,
):
    """Run MH entirely inside one Pallas kernel.

    ``scale`` selects the symmetric Gaussian random walk; alternatively pass
    ``proposal`` with ``propose(x, z)`` (deterministic reparameterized
    sample) and ``logp(from, to)`` for the general Hastings rule.  With
    ``thin``, every thin-th post-step state is kept: steps within a stride
    share an output block and the sequential TPU grid leaves the stride's
    last write — no extra VMEM or control flow.  Returns
    ``[n_chains, n_collect, dim]`` float32 samples.
    """
    x0 = jnp.asarray(initial_positions, jnp.float32).T  # [d, n]
    d, n = x0.shape
    if n % block_chains != 0:
        block_chains = n
    B = block_chains
    n_blocks = n // B
    total = n_collect * thin + n_discard

    def lp_batch(x_dB):
        return (jax.vmap(logp_fn, in_axes=1)(x_dB).astype(jnp.float32),)

    if proposal is None:
        if scale is None:
            raise ValueError("pass either scale or proposal")
        propose = lambda x, z: x + jnp.float32(scale) * z
        symmetric = True
    else:
        propose = proposal.propose
        symmetric = bool(getattr(proposal, "symmetric", False))

    def step_batch(x_dB, z_dB):
        y = jax.vmap(propose, in_axes=(1, 1), out_axes=1)(x_dB, z_dB)
        (lp,) = lp_batch(y)
        if symmetric or proposal is None:
            dq = jnp.zeros_like(lp)
        else:
            q = lambda a, b: proposal.logp(a, b).astype(jnp.float32)
            q_fwd = jax.vmap(q, in_axes=(1, 1))(x_dB, y)
            q_bwd = jax.vmap(q, in_axes=(1, 1))(y, x_dB)
            dq = q_bwd - q_fwd
        return y, lp, dq

    zeros = jnp.zeros((d, B), jnp.float32)
    closed_step, step_consts = _inline(step_batch, zeros, zeros)
    (lp0,) = lp_batch(x0)  # [n] initial logp, computed outside the kernel

    kernel = functools.partial(
        _mh_kernel,
        closed_step=closed_step,
        n_step_consts=len(step_consts),
        n_discard=int(n_discard),
        seed=int(seed),
        interpret=bool(interpret),
    )

    full_vmem = lambda a: pl.BlockSpec(
        a.shape, lambda b, t: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, total),
        in_specs=[
            pl.BlockSpec((d, B), lambda b, t: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda b, t: (0, b), memory_space=pltpu.VMEM),
        ]
        + [full_vmem(c) for c in step_consts],
        out_specs=pl.BlockSpec(
            (1, d, B),
            lambda b, t: (jnp.maximum(t - n_discard, 0) // thin, 0, b),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_collect, d, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, B), jnp.float32),  # position
            pltpu.VMEM((1, B), jnp.float32),  # logp
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x0, lp0.reshape(1, n), *step_consts)
    # [n_collect, d, n] -> [n, n_collect, d]
    return jnp.transpose(out, (2, 0, 1))
