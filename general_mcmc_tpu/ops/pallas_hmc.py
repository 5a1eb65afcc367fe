"""Fused Pallas TPU kernel for batched HMC sampling.

The hot path the reference identifies as its performance core — the batched
gradient/leapfrog/accept loop (batched_hmc.rs:125-190, SURVEY.md §2 row 6
"the Pallas-kernel candidate: fuse grad+leapfrog+accept") — implemented as a
single ``pallas_call``:

- the whole sampling run is one kernel launch with a sequential grid over
  steps; the ``[n_chains, dim]`` position batch lives in **VMEM scratch for
  the entire run**, so per-step HBM traffic is exactly one output block
  write (collected sample) instead of reading/writing the full phase-space
  state every leapfrog;
- the target's gradient is traced *inline* into the kernel with ``jax.grad``
  — gradient, kick, drift, and the Metropolis mask all fuse into one VMEM
  compute chain on the VPU;
- momenta and accept draws come from the on-core hardware PRNG
  (``pltpu.prng_random_bits`` + Box–Muller), seeded deterministically per
  step, so no RNG state crosses the HBM boundary either.

The RNG stream therefore differs from the Threefry stream of
:class:`~..samplers.hmc.HMC` (statistically equivalent, deterministic given
the seed); results are validated against the reference path by moment and
ESS tests rather than bitwise equality.

Burn-in handling: steps before ``n_discard`` map to output block 0, which is
then overwritten by the first collected step — TPU grids execute
sequentially, so the final content of every block is the intended sample.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_hmc_run"]

_TWO_PI = 6.283185307179586

# Interpret-mode PRNG fallback.  Pallas interpret mode does not model the
# TPU hardware PRNG — ``pltpu.prng_random_bits`` returns a *constant* block
# — which silently degenerates any interpret-mode sampling run.  When a
# kernel seeds via :func:`seed_prng` with ``interpret=True``, draws instead
# come from a stateless murmur3-style hash of (lane/sublane position, a
# trace-time draw counter, the runtime seed, and an optional runtime salt
# for draws inside on-device loops).  Hardware runs are unaffected: they use
# the real PRNG.  The fallback makes interpret-mode tests *statistically*
# meaningful, not just shape-correct.
_FALLBACK: list | None = None

# murmur3 fmix32 constants as wrapped int32 (Mosaic has no uint32 math)
_M1 = 0x85EBCA6B - (1 << 32)
_M2 = 0xC2B2AE35 - (1 << 32)
_GOLD = 0x9E3779B9 - (1 << 32)


def seed_prng(seed, interpret: bool) -> None:
    """Seed this kernel invocation's PRNG stream (call once at kernel top)."""
    global _FALLBACK
    if interpret:
        _FALLBACK = [jnp.asarray(seed, jnp.int32), 0]
    else:
        _FALLBACK = None
        pltpu.prng_seed(seed)


def _fmix(x):
    x = x ^ jax.lax.shift_right_logical(x, jnp.int32(16))
    x = x * jnp.int32(_M1)
    x = x ^ jax.lax.shift_right_logical(x, jnp.int32(13))
    x = x * jnp.int32(_M2)
    x = x ^ jax.lax.shift_right_logical(x, jnp.int32(16))
    return x


def _bits(shape, salt):
    if _FALLBACK is None:
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    base, n = _FALLBACK
    _FALLBACK[1] = n + 1
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    for ax in range(len(shape) - 1):
        idx = idx + (jax.lax.broadcasted_iota(jnp.int32, shape, ax) + 1) * jnp.int32(
            7919 * (ax + 1)
        )
    x = idx * jnp.int32(_GOLD) + base * jnp.int32(_M2) + jnp.int32(n + 1)
    if salt is not None:
        x = x + (jnp.asarray(salt, jnp.int32) + 1) * jnp.int32(_M1)
    return _fmix(_fmix(x))


def _uniform_01(shape, salt=None):
    """Uniform in (0, 1) from raw PRNG bits: 24 mantissa bits, offset to
    avoid exact 0 (log-safe).  ``salt`` (int32 scalar or array broadcastable
    to ``shape``) must be supplied for draws inside on-device loops so the
    interpret-mode fallback advances across iterations."""
    bits = _bits(shape, salt)
    # int32 route: Mosaic has no uint32->f32 cast; a logical shift keeps the
    # top 24 bits non-negative in int32.
    u24 = jax.lax.shift_right_logical(bits, jnp.int32(8))
    return u24.astype(jnp.float32) * jnp.float32(2**-24) + jnp.float32(2**-25)


def _standard_normal(shape, salt=None):
    """Box–Muller from two uniform draws."""
    u1 = _uniform_01(shape, salt)
    u2 = _uniform_01(shape, salt)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(jnp.float32(_TWO_PI) * u2)


def _hmc_kernel(
    x0_ref,
    inv_ref,  # [1, d] diagonal of M⁻¹
    scale_ref,  # [1, d] sqrt of the diagonal of M
    *refs,
    closed_vg: Callable,
    const_shapes,
    step_size: float,
    n_leapfrog: int,
    n_discard: int,
    seed: int,
    interpret: bool,
    use_mass: bool,
):
    n_consts = len(const_shapes)
    const_refs = refs[:n_consts]
    out_ref, pos_ref, lp_ref, grad_ref = refs[n_consts:]
    consts = [
        r[:].reshape(shape) if shape else r[0, 0]
        for r, shape in zip(const_refs, const_shapes)
    ]

    def vg_fn(x):
        lp, g = closed_vg(x, *consts)
        return lp.reshape(x.shape[0], 1), g  # keep everything 2-D for Mosaic

    b = pl.program_id(0)
    t = pl.program_id(1)
    # deterministic, distinct stream per (chain-block, step)
    seed_prng(seed + b * pl.num_programs(1) + t, interpret)

    @pl.when(t == 0)
    def _init():
        x = x0_ref[:]
        lp, g = vg_fn(x)
        pos_ref[:] = x
        lp_ref[:] = lp
        grad_ref[:] = g

    x = pos_ref[:]
    lp = lp_ref[:]
    grad = grad_ref[:]
    eps = jnp.float32(step_size)
    half = jnp.float32(0.5) * eps

    if use_mass:
        # [1, d] rows broadcast over the [B, d] batch's sublanes.  This
        # path is interpret-validated; ``use_mass`` is a trace-time gate so
        # the long-benchmarked identity-mass kernel stays bit-identical.
        inv = inv_ref[:]
        scale = scale_ref[:]
        inv_mul = lambda m: inv * m
        mom = scale * _standard_normal(x.shape)
    else:
        inv_mul = lambda m: m
        mom = _standard_normal(x.shape)
    ke0 = 0.5 * jnp.sum(mom * inv_mul(mom), axis=1, keepdims=True)

    # Fused-kick leapfrog (same transform as samplers/hmc.py): opening
    # half-kick, full kicks in the uniform body, surplus half-kick
    # subtracted after — one fewer [B, d] multiply-add per leapfrog;
    # identical real arithmetic, MH accept keeps the law exact.
    def body(_, carry):
        p, m, g, _lp = carry
        p = p + inv_mul(m) * eps
        lp_new, g = vg_fn(p)
        m = m + g * eps
        return (p, m, g, lp_new)

    p_new, m_new, g_new, lp_new = jax.lax.fori_loop(
        0, n_leapfrog, body, (x, mom + grad * half, grad, lp)
    )
    m_new = m_new - g_new * half

    ke1 = 0.5 * jnp.sum(m_new * inv_mul(m_new), axis=1, keepdims=True)
    log_accept = (lp_new - lp) + (ke0 - ke1)  # [B, 1]
    u = _uniform_01((x.shape[0], 1))
    accept = jnp.log(u) < log_accept  # [B, 1]

    x = jnp.where(accept, p_new, x)
    lp = jnp.where(accept, lp_new, lp)
    grad = jnp.where(accept, g_new, grad)

    pos_ref[:] = x
    lp_ref[:] = lp
    grad_ref[:] = grad
    out_ref[0] = x


def fused_hmc_run(
    logp_fn: Callable,
    initial_positions,
    step_size: float,
    n_leapfrog: int,
    n_collect: int,
    n_discard: int = 0,
    seed: int = 0,
    block_chains: int = 1024,
    interpret: bool = False,
    thin: int = 1,
    mass_inv=None,
):
    """Run batched HMC entirely inside one Pallas kernel.

    ``mass_inv``: optional [dim] diagonal of M⁻¹ (momenta ~ N(0, M), drifts
    M⁻¹p, kinetic energy ½pᵀM⁻¹p); rides as a [1, d] VMEM row broadcast
    over the chain block's sublanes.

    ``logp_fn`` maps a single ``[dim]`` state to a scalar; it is vmapped and
    differentiated at trace time and inlined into the kernel.  Chains are
    tiled over VMEM-sized blocks on the outer grid axis (the step axis is
    the inner, fastest-varying one, so each block's phase-space state stays
    resident in scratch for its whole run).  Returns
    ``[n_chains, n_collect, dim]`` float32 samples.
    """
    x0 = jnp.asarray(initial_positions, jnp.float32)
    n, d = x0.shape
    if n % block_chains != 0:
        block_chains = n
    B = block_chains
    n_blocks = n // B
    # With thin > 1, strides of thin steps share an output block; the
    # sequential grid leaves each stride's last write (same convention as
    # the XLA runner: sample k = post-step state (k+1)·thin - 1).
    total = n_collect * thin + n_discard

    use_mass = mass_inv is not None and bool(
        jnp.any(jnp.asarray(mass_inv, jnp.float32) != 1.0)
    )
    if use_mass:
        inv_row = jnp.asarray(mass_inv, jnp.float32).reshape(1, d)
    else:
        inv_row = jnp.ones((1, d), jnp.float32)
    scale_row = 1.0 / jnp.sqrt(inv_row)

    def vg_fn(x):
        lp, g = jax.vmap(jax.value_and_grad(logp_fn))(x)
        return lp.astype(jnp.float32), g.astype(jnp.float32)

    # Hoist the target's captured parameters (means, covariances, …) into
    # explicit kernel inputs — Pallas kernels cannot close over array
    # constants.  make_jaxpr surfaces every captured array as a jaxpr
    # const; the kernel re-evaluates the jaxpr with consts rebound to the
    # VMEM-loaded values.  Scalar/1-D consts ride as 2-D VMEM blocks.
    closed_jaxpr = jax.make_jaxpr(vg_fn)(jnp.zeros((B, d), jnp.float32))
    consts = list(closed_jaxpr.consts)
    const_shapes = tuple(jnp.shape(c) for c in consts)
    consts_2d = [jnp.atleast_2d(jnp.asarray(c)) for c in consts]

    def closed_vg(x, *cs):
        lp, g = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, list(cs), x)
        return lp, g

    kernel = functools.partial(
        _hmc_kernel,
        closed_vg=closed_vg,
        const_shapes=const_shapes,
        step_size=float(step_size),
        n_leapfrog=int(n_leapfrog),
        n_discard=int(n_discard),
        seed=int(seed),
        interpret=bool(interpret),
        use_mass=use_mass,
    )

    full_vmem = lambda a: pl.BlockSpec(
        a.shape, lambda b, t: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, total),
        in_specs=[
            pl.BlockSpec((B, d), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            full_vmem(inv_row),
            full_vmem(scale_row),
        ]
        + [full_vmem(c) for c in consts_2d],
        out_specs=pl.BlockSpec(
            (1, B, d),
            lambda b, t: (jnp.maximum(t - n_discard, 0) // thin, b, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_collect, n, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32),  # position
            pltpu.VMEM((B, 1), jnp.float32),  # logp
            pltpu.VMEM((B, d), jnp.float32),  # gradient
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x0, inv_row, scale_row, *consts_2d)
    return jnp.swapaxes(out, 0, 1)
