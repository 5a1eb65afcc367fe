"""Fused Pallas NUTS transition, v2: block-synchronized tree schedule.

A retired v1 kernel (removed in round 3; see git history) gave every chain
its own flat leaf/boundary schedule, which made the tree indices per-chain
vectors — checkpoint stores became S-way one-hot blends, the while carry
held ~30 arrays, and Mosaic's scoped-VMEM stack capped the chain block at
64 rows with heavy spilling; it measured ~6× below the XLA tree and was
superseded by this kernel.

v2 restores the *synchronized* schedule of the XLA vmapped tree
(:mod:`.tree`): all chains in a block walk the same (doubling j, leaf i)
sequence with per-chain masks — exactly the semantics JAX's while_loop
batching rule produces for the XLA backend — so

- the leaf index, checkpoint slot, and U-turn node ranges are **scalars**:
  stack stores/loads are single dynamically-indexed rows of [S, B, d]
  scratch refs, not one-hot blends over S slots;
- all chain state lives in **VMEM scratch refs**; loop carries hold only
  scalars, eliminating the carry/yield duplication and the
  replicated-layout relayouts that plagued v1;
- the loop body is ~15 elementwise [B, d] ops per leapfrog, small enough
  for Mosaic to hold without spilling at much larger chain blocks.

Masked-work cost: a block runs every doubling to the longest tree among its
chains (identical to the XLA backend's vmap semantics); the doubling loop
exits early once every chain in the block has terminated.

Mosaic layout rules this jaxlib requires of the kernel body (found by
systematic ablation while hardware-validating v1, preserved here):

- f32 mask algebra throughout; no bool while-loop carries;
- no numeric i32↔f32 casts on [B,1] vectors — counters are carried as f32
  with a parallel i32 copy for bit math (bool→f32/i32 casts are fine);
- lane reductions and carry-init constants are routed through a
  [B,d]@[d,1] MXU matvec: ``jnp.sum(axis=1, keepdims=True)`` produces a
  lane-REPLICATED [B,1] layout, and Mosaic cannot insert the
  replicated↔concrete relayout a while-loop carry requires ("Lane
  broadcast" legalization failure);
- explicit ``pltpu.repeat`` for arithmetic lane broadcasts of [B,1]
  against [B,d] (selects with [B,1] masks are fine);
- per-slot checkpoint arrays / scalar slot indices; no vector shifts; no
  scalar-leaf selects.

STATUS: compiles and samples on v5e.  Round-2 found and fixed a
correctness bug: the checkpoint stacks are scratch VMEM, which starts
UNINITIALIZED, and the stores were then arithmetic blends
``old + (new-old)·mask`` — a NaN/garbage ``old`` poisoned the slot for
mask=1 too, silently disabling every within-subtree U-turn check
(≈57% marginal-std inflation at depth 5).  The round-2 body surgery
converted those stores to plain unconditional writes (every checked slot
is written earlier in the same subtree), so the per-transition stack
zeroing below is now defense-in-depth against dead-lane reads rather
than a correctness requirement.  The kernel is validated bit-exactly
against a sequential numpy oracle driving reference semantics with the
replicated PRNG stream (tests/test_pallas_oracle.py).

Round-2 performance surgery (scripts/exp_nuts2.py, 10240×100 steady
state): raising ``vmem_limit_mb`` to 100 unlocked block_chains up to 512
but throughput was FLAT in both B and the limit (~5.7e6 grad-evals/s =
0.3× the XLA tree) — the body's per-element passes were the bottleneck,
not the block size.  Three changes bought 3.7×:

- ``seld``/``sel1`` are real ``jnp.where`` selects over [B,1] masks, not
  arithmetic blends (no repeat/mul/add passes, no NaN propagation);
- the zero-step trick: inactive lanes leapfrog with ε·act = 0 (identity
  update), so frontier/checkpoint/edge writes are UNCONDITIONAL — the
  masked read-modify-write of [B,d] rows disappears (inactive-lane
  garbage is provably unread: every output path is act-masked);
- the within-subtree U-turn loop needs no lax.cond — even leaves give an
  empty slot range naturally.

Result: 2.1e7 grad-evals/s at depth 5 (1.14× the XLA tree) and 3.3e7 at
depth 4 (0.89× — that config saturates every tree to the cap, so XLA's
batch-sync waste vanishes).  The kernel's structural edge over XLA is
block-level (256-chain) rather than batch-level (10k-chain)
synchronization under VARIED tree depths.  Tracked in docs/ROADMAP.md.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_hmc import _standard_normal, _uniform_01, seed_prng

__all__ = ["pallas_nuts2_step"]


def _popcount_small(x, nbits: int = 12):
    """Portable popcount for small non-negative ints (tree indices)."""
    total = jnp.zeros_like(x)
    for b in range(nbits):
        total = total + ((x >> b) & 1)
    return total


def _trailing_ones_small(x, nbits: int = 12):
    ip1 = x + 1
    mask = (ip1 & -ip1) - 1
    return _popcount_small(mask, nbits)

_DELTA_MAX = 1000.0

# slot indices into the [11, B, d] state scratch ref.  The proposal's
# gradient (and log-density) are NOT stored: they are re-derived from the
# selected position once per transition at the kernel tail — one extra
# gradient eval per transition buys one fewer [B, d] select per leaf, one
# per doubling, and two VMEM slots (the round-3 carry-slimming, mirroring
# ops/tree.py).
_POS_E, _MOM_E, _GRAD_E = 0, 1, 2
_POS_M, _MOM_M, _GRAD_M = 3, 4, 5
_POS_P, _MOM_P, _GRAD_P = 6, 7, 8
_PROP, _SPROP = 9, 10
# rows of the [14, B, 1] per-chain scalar scratch ref
(_V, _N, _NSUB, _ASUB, _NASUB, _AOUT, _NAOUT, _DIV,
 _LF, _S, _ACT, _LOGU, _JOINT0, _DEPTH) = range(14)


def _nuts2_kernel(
    seed_ref,
    pos_ref,
    lp_ref,
    grad_ref,
    eps_ref,
    inv_ref,
    scale_ref,
    *refs,
    closed_vg: Callable,
    const_shapes,
    max_depth: int,
    interpret: bool = False,
):
    n_consts = len(const_shapes)
    const_refs = refs[:n_consts]
    (out_pos, out_lp, out_grad, out_alpha, out_nalpha, out_lf, out_depth,
     out_div) = refs[n_consts : n_consts + 8]
    st, sc, pos_ck, vel_ck, c1_ck = refs[n_consts + 8 :]

    consts = [
        r[:].reshape(shape) if shape else r[0, 0]
        for r, shape in zip(const_refs, const_shapes)
    ]

    def vg(x):
        lp, g = closed_vg(x, *consts)
        return lp.reshape(x.shape[0], 1), g

    seed_prng(seed_ref[0] + pl.program_id(0), interpret)

    x = pos_ref[:]
    lp0 = lp_ref[:]
    g0 = grad_ref[:]
    eps = eps_ref[:]
    inv = inv_ref[:]
    scale = scale_ref[:]
    B, d = x.shape

    ones_d1 = jnp.ones((d, 1), jnp.float32)

    def rsum(t):
        # lane reduction with a concrete [B,1] layout (Mosaic rules in the
        # module docstring: jnp.sum would give a lane-replicated layout)
        return jax.lax.dot_general(
            t, ones_d1,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def f(b):
        return b.astype(jnp.float32)

    def orf(a, b):
        return a + b - a * b

    def seld(m, a, b):
        # [B,1] {0,1}-f32 mask select over [B,d]; a real select (not an
        # arithmetic blend) so the discarded branch cannot poison the
        # result and no repeat/multiply passes are materialized.
        return jnp.where(m > 0.5, a, b)

    def sel1(m, a, b):
        return jnp.where(m > 0.5, a, b)

    # ---- per-transition init -------------------------------------------
    mom0 = _standard_normal((B, d)) * scale
    ke0 = 0.5 * rsum(mom0 * (inv * mom0))
    joint0 = lp0 - ke0
    fzero = rsum(jnp.zeros((B, d), jnp.float32))
    fone = fzero + 1.0

    for slot, val in ((_POS_E, x), (_MOM_E, mom0), (_GRAD_E, g0),
                      (_POS_M, x), (_MOM_M, mom0), (_GRAD_M, g0),
                      (_POS_P, x), (_MOM_P, mom0), (_GRAD_P, g0),
                      (_PROP, x), (_SPROP, x)):
        st[slot] = val
    # Scratch VMEM is UNINITIALIZED at kernel start (NaN under the
    # interpreter, garbage on hardware).  The checkpoint stores are now
    # plain unconditional writes, and every slot a U-turn check reads is
    # written earlier in the same subtree — so this zeroing is defense-
    # in-depth against dead-lane reads (inactive chains' slots), not a
    # correctness requirement.  Keep it: it pins interpret-mode NaN
    # behavior and costs one pass per transition.
    zero_bd = x * 0.0
    for s_ in range(pos_ck.shape[0]):  # stack has max_depth-1 slots
        pos_ck[s_] = zero_bd
        vel_ck[s_] = zero_bd
        c1_ck[s_] = fzero
    sc[_V] = fone
    sc[_N] = fone
    sc[_NSUB] = fzero
    sc[_ASUB] = fzero
    sc[_NASUB] = fzero
    sc[_AOUT] = fzero
    sc[_NAOUT] = fone
    sc[_DIV] = fzero
    sc[_LF] = fzero
    sc[_S] = fone
    sc[_ACT] = fone
    sc[_LOGU] = joint0 + jnp.log(_uniform_01((B, 1)))
    sc[_JOINT0] = joint0
    sc[_DEPTH] = fzero

    # ---- synchronized doubling loop with early exit ---------------------
    def cond(carry):
        j, n_active = carry
        return (j < max_depth) & (n_active > 0.0)

    def doubling_body(carry):
        j, _ = carry
        u_dir = _uniform_01((B, 1), salt=j)
        v = 1.0 - 2.0 * f(u_dir < 0.5)
        sc[_V] = v
        minus = f(v < 0.0)
        # frontier := the edge in the chosen direction.  Direction-masked
        # only: inactive chains' frontier/edges/stacks may hold garbage —
        # every consumer that reaches the outputs is masked by ``act``
        # ([B,1]), and inactive lanes integrate with a zero step below, so
        # the garbage never escapes.
        st[_POS_E] = seld(minus, st[_POS_M], st[_POS_P])
        st[_MOM_E] = seld(minus, st[_MOM_M], st[_MOM_P])
        st[_GRAD_E] = seld(minus, st[_GRAD_M], st[_GRAD_P])
        sc[_NSUB] = fzero
        sc[_ASUB] = fzero
        sc[_NASUB] = fzero

        def leaf_body(i, sub_ok):
            act = sc[_ACT] * sub_ok
            v_ = sc[_V]
            # zero-step trick: inactive lanes leapfrog with ε=0, i.e. an
            # identity update — frontier and checkpoint writes can then be
            # unconditional (no masked read-modify-write of [B,d] rows).
            ev_d = pltpu.repeat(v_ * eps * act, d, axis=1)
            p0 = st[_POS_E]
            m0 = st[_MOM_E]
            gg0 = st[_GRAD_E]
            m1 = m0 + gg0 * (ev_d * 0.5)
            p1 = p0 + inv * m1 * ev_d
            lp1, g1 = vg(p1)
            # Clamp to a finite range BEFORE the second half-kick: the
            # zero-step arithmetic (g1·0) needs g1 finite, and a divergent
            # leaf must leave a finite frontier so frozen lanes stay
            # finite.  Clamped values only ever flow into rejected leaves
            # (leaf_ok = 0 there) and dead subtrees.
            big = jnp.float32(1e30)
            p1 = jnp.clip(p1, -big, big)
            g1 = jnp.clip(g1, -big, big)
            lp1 = jnp.maximum(lp1, -big)
            m1 = jnp.clip(m1 + g1 * (ev_d * 0.5), -big, big)
            vel1 = inv * m1
            joint = lp1 - 0.5 * rsum(m1 * vel1)

            leaf_valid = f(sc[_LOGU] < joint) * act
            leaf_ok = f((sc[_LOGU] - _DELTA_MAX) < joint)
            dj = joint - sc[_JOINT0]
            sc[_ASUB] = sc[_ASUB] + act * jnp.exp(dj * f(dj < 0.0))
            sc[_NASUB] = sc[_NASUB] + act
            sc[_LF] = sc[_LF] + act
            sc[_DIV] = orf(sc[_DIV], act * (1.0 - leaf_ok))
            n_sub = sc[_NSUB] + leaf_valid
            sc[_NSUB] = n_sub

            u_take = _uniform_01((B, 1), salt=j * 1048576 + i)
            first = f(i == 0)  # scalar splat
            take = act * orf(first, leaf_valid * f(u_take * n_sub < 1.0))
            st[_SPROP] = seld(take, p1, st[_SPROP])

            # unconditional frontier advance (identity for inactive lanes)
            st[_POS_E] = p1
            st[_MOM_E] = m1
            st[_GRAD_E] = g1

            # checkpoint bookkeeping with SCALAR indices; stores are
            # unconditional — an inactive lane's slots are never read again
            # within its (dead) subtree
            is_even = i % 2 == 0
            slot = _popcount_small(i >> 1)
            c1 = rsum(p1 * vel1)

            @pl.when(is_even)
            def _store():
                pos_ck[slot] = p1
                vel_ck[slot] = vel1
                c1_ck[slot] = c1

            def check_k(k, turned):
                pk = pos_ck[k]
                vk = vel_ck[k]
                ck = c1_ck[k]
                dot_ck = v_ * (rsum(vk * p1) - ck)
                dot_cur = v_ * (c1 - rsum(pk * vel1))
                return orf(turned, orf(f(dot_ck < 0.0), f(dot_cur < 0.0)))

            # For even leaves trailing_ones(i) = 0 ⇒ idx_min = slot + 1 ⇒
            # the range is empty and the loop is a natural no-op — no
            # lax.cond needed around it.
            idx_min = slot - _trailing_ones_small(i) + 1
            turned = jax.lax.fori_loop(idx_min, slot + 1, check_k, fzero)
            return sub_ok * leaf_ok * (1.0 - turned)

        n_leaves = jax.lax.shift_left(jnp.int32(1), j)
        sub_ok = jax.lax.fori_loop(0, n_leaves, leaf_body, sc[_S] * 0.0 + 1.0)

        # ---- boundary: edges, outer swap, global U-turn -----------------
        # Edge updates are direction-masked only (inactive-lane corruption
        # is harmless, see above); the proposal swap stays act-masked — it
        # is the one path that reaches the outputs.
        at_end = sc[_ACT]
        st[_POS_M] = seld(minus, st[_POS_E], st[_POS_M])
        st[_MOM_M] = seld(minus, st[_MOM_E], st[_MOM_M])
        st[_GRAD_M] = seld(minus, st[_GRAD_E], st[_GRAD_M])
        st[_POS_P] = seld(minus, st[_POS_P], st[_POS_E])
        st[_MOM_P] = seld(minus, st[_MOM_P], st[_MOM_E])
        st[_GRAD_P] = seld(minus, st[_GRAD_P], st[_GRAD_E])

        u_swap = _uniform_01((B, 1), salt=j)
        take_outer = at_end * sub_ok * f(u_swap * sc[_N] < sc[_NSUB])
        st[_PROP] = seld(take_outer, st[_SPROP], st[_PROP])
        sc[_N] = sc[_N] + sc[_NSUB]  # NSUB is act-masked already

        diff = st[_POS_P] - st[_POS_M]
        glob_ok = f(rsum(diff * (inv * st[_MOM_M])) >= 0.0) * f(
            rsum(diff * (inv * st[_MOM_P])) >= 0.0
        )
        s_next = sub_ok * glob_ok

        sc[_AOUT] = sel1(at_end, sc[_ASUB], sc[_AOUT])
        sc[_NAOUT] = sel1(at_end, sc[_NASUB], sc[_NAOUT])
        sc[_DEPTH] = sc[_DEPTH] + at_end
        act_next = at_end * s_next
        sc[_S] = s_next
        sc[_ACT] = act_next
        n_active = jnp.sum(act_next)
        return j + 1, n_active

    jax.lax.while_loop(cond, doubling_body, (jnp.int32(0), jnp.float32(1.0)))

    # Re-derive the selected proposal's (lp, grad) once per transition
    # (see the slot-map comment); same values as the in-loop leaf eval.
    lp_f, g_f = vg(st[_PROP])
    out_pos[:] = st[_PROP]
    out_lp[:] = lp_f
    out_grad[:] = g_f
    out_alpha[:] = sc[_AOUT]
    out_nalpha[:] = sc[_NAOUT].astype(jnp.int32)
    out_lf[:] = sc[_LF].astype(jnp.int32)
    out_depth[:] = sc[_DEPTH].astype(jnp.int32)
    out_div[:] = sc[_DIV].astype(jnp.int32)


def pallas_nuts2_step(
    logp_fn: Callable,
    pos,
    lp,
    grad,
    eps,
    mass_inv,
    mass_scale,
    seed,
    max_depth: int = 10,
    block_chains: int = 256,
    interpret: bool = False,
    vmem_limit_mb: float | None = None,
):
    """One NUTS transition for all chains via the v2 fused kernel.

    Contract: ``(logp_fn, pos[B,d], lp[B], grad[B,d], eps[B], mass_inv[B,d],
    mass_scale[B,d], seed)`` → ``(pos, lp, grad, alpha, n_alpha, leapfrogs,
    depth, diverged)`` — the fused equivalent of one vmapped
    :func:`.tree.nuts_tree_step` transition (identity/diagonal mass only;
    dense falls back to XLA).

    ``vmem_limit_mb`` raises Mosaic's scoped-VMEM budget (the default
    ~16 MB limit is what capped ``block_chains`` at 64 in round 1: the
    compiler keeps every loop-body temporary live, ~21 MB at B=128, even
    though the declared scratch is <2 MB).  v5e VMEM is large enough to
    host much bigger blocks when the cap is lifted.
    """
    n, d = pos.shape
    if n % block_chains != 0:
        block_chains = n
    B = block_chains
    n_blocks = n // B
    # Subtrees at doubling j have depth j ≤ max_depth-1; max checkpoint
    # slot index is depth-1, so max_depth-1 slots suffice (VMEM headroom).
    S = max(1, max_depth - 1)

    def vg_fn(x):
        lpv, g = jax.vmap(jax.value_and_grad(logp_fn))(x)
        return lpv.astype(jnp.float32), g.astype(jnp.float32)

    closed_jaxpr = jax.make_jaxpr(vg_fn)(jnp.zeros((B, d), jnp.float32))
    consts = list(closed_jaxpr.consts)
    const_shapes = tuple(jnp.shape(c) for c in consts)
    consts_2d = [jnp.atleast_2d(jnp.asarray(c)) for c in consts]

    def closed_vg(x, *cs):
        lpv, g = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, list(cs), x)
        return lpv, g

    kernel = functools.partial(
        _nuts2_kernel,
        closed_vg=closed_vg,
        const_shapes=const_shapes,
        max_depth=int(max_depth),
        interpret=bool(interpret),
    )

    blk = lambda width: pl.BlockSpec(
        (B, width), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(
        a.shape, lambda b: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM
    )

    compiler_params = None
    if vmem_limit_mb is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb * 1024 * 1024)
        )

    outs = pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [blk(d), blk(1), blk(d), blk(1), blk(d), blk(d)]
        + [full(c) for c in consts_2d],
        out_specs=(blk(d), blk(1), blk(d), blk(1), blk(1), blk(1), blk(1),
                   blk(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((11, B, d), jnp.float32),  # chain state slots
            pltpu.VMEM((14, B, 1), jnp.float32),  # per-chain scalars
            pltpu.VMEM((S, B, d), jnp.float32),  # position checkpoints
            pltpu.VMEM((S, B, d), jnp.float32),  # velocity checkpoints
            pltpu.VMEM((S, B, 1), jnp.float32),  # position·velocity ckpts
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([seed], jnp.int32),
        pos.astype(jnp.float32),
        lp.reshape(n, 1).astype(jnp.float32),
        grad.astype(jnp.float32),
        eps.reshape(n, 1).astype(jnp.float32),
        mass_inv.astype(jnp.float32),
        mass_scale.astype(jnp.float32),
        *consts_2d,
    )
    new_pos, new_lp, new_grad, alpha, n_alpha, lf, depth, div = outs
    return (
        new_pos,
        new_lp[:, 0],
        new_grad,
        alpha[:, 0],
        n_alpha[:, 0],
        lf[:, 0],
        depth[:, 0],
        div[:, 0].astype(jnp.bool_),
    )
