"""Fused Pallas TPU kernel for the NUTS tree transition.

Why: the XLA `while_loop` tree implementation (:mod:`.tree`) keeps its carry
— positions, momenta, gradients, proposal buffers, checkpoint stacks — in
HBM, so every leapfrog iteration pays full round trips on ~10 × [chains, dim]
arrays.  At 10k chains that is bandwidth-bound; at 1k chains it is
latency-bound.  This kernel keeps the entire tree state **resident in VMEM**
for a block of chains, so one NUTS transition for the block is a single
kernel invocation whose inner loop touches HBM not at all.

Control flow: instead of nested (doubling × leaf) loops, a single flat
``while`` advances every active chain by one leapfrog per iteration; chains
that complete their current subtree run the doubling-boundary bookkeeping
(across-subtree swap, global U-turn test, direction resampling) in the same
masked iteration.  Each chain therefore executes ~its own tree size in
iterations, the block runs to the max over its chains, and blocks are
independent grid steps — small blocks keep the masked tail short.

Semantics match :func:`..ops.tree.nuts_tree_step` (slice-sampler NUTS with
Δ_max = 1000, progressive uniform leaf sampling, min(1, n'/n) doubling swaps,
checkpoint-stack U-turn tests — see that module for reference citations),
with two deviations: randomness comes from the on-core hardware PRNG (a
different — statistically equivalent — stream than Threefry), and only
identity/diagonal mass matrices are supported (dense falls back to XLA).

STATUS: **working on hardware, not yet fast**.  The kernel compiles and
samples correctly on TPU v5e after three Mosaic workarounds discovered by
systematic ablation (each documented inline): (1) no numeric i32<->f32
casts on [B,1] vectors — counters are carried as f32 with a parallel i32
copy for bit math, casts happen outside the loop (bool->f32/i32 casts are
fine); (2) lane reductions and carry-init constants are routed through a
[B,d]@[d,1] MXU matvec because jnp.sum(axis=1, keepdims=True) produces a
lane-REPLICATED [B,1] layout and Mosaic cannot insert the
replicated<->concrete relayout a while-loop carry requires; (3) the
earlier constraints (no bool carries, explicit pltpu.repeat for
arithmetic lane broadcasts, per-slot checkpoint arrays, no vector
shifts, no scalar-leaf selects) still stand.

Performance: at block_chains=64 (the largest block fitting Mosaic's
scoped-VMEM stack for this body) throughput is ~6x BELOW the XLA tree at
2048x100 — the big loop body spills heavily.  SUPERSEDED: round 2
rebuilt this design as the block-synchronized v2 kernel
(:mod:`.pallas_nuts2`, ``NUTS(backend="pallas2")``) with true selects,
zero-step masking and scalar tree indices, reaching parity with the XLA
tree; this flat-schedule v1 is kept as the per-chain-schedule variant
and for its statistical test coverage.  The XLA backend remains the
default.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_nuts_step"]

_TWO_PI = 6.283185307179586
_DELTA_MAX = 1000.0


# Shared kernel PRNG (with the interpret-mode hash fallback documented
# there); re-exported here for pallas_nuts2.
from .pallas_hmc import _standard_normal, _uniform_01, seed_prng  # noqa: E402


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


def _nuts_kernel(
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
    ablate: frozenset = frozenset(),  # debug: disable named sections
):
    n_consts = len(const_shapes)
    const_refs = refs[:n_consts]
    (out_pos, out_lp, out_grad, out_alpha, out_nalpha, out_lf, out_depth,
     out_div) = refs[n_consts : n_consts + 8]
    consts = [
        r[:].reshape(shape) if shape else r[0, 0]
        for r, shape in zip(const_refs, const_shapes)
    ]

    def vg(x):
        lp, g = closed_vg(x, *consts)
        return lp.reshape(x.shape[0], 1), g

    seed_prng(seed_ref[0] + pl.program_id(0), interpret)

    x = pos_ref[:]
    lp = lp_ref[:]  # [B, 1]
    g0 = grad_ref[:]
    eps = eps_ref[:]  # [B, 1]
    inv = inv_ref[:]  # [B, d]
    scale = scale_ref[:]  # [B, d]
    B, d = x.shape
    S = max_depth  # checkpoint slots 0..S-1 plus spare S → S+1 rows

    ones_d1 = jnp.ones((d, 1), jnp.float32)

    def rsum(t):
        # Lane reduction via MXU matvec: jnp.sum(axis=1, keepdims=True)
        # yields a lane-replicated [B,1] layout, and Mosaic cannot insert
        # the replicated<->concrete relayouts the while-loop carry needs
        # ("Not implemented: Lane broadcast" / "Invalid relayout"); the
        # matmul result carries a concrete layout.
        return jax.lax.dot_general(
            t, ones_d1,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    mom0 = _standard_normal((B, d)) * scale
    ke0 = 0.5 * rsum(mom0 * (inv * mom0))
    joint0 = lp - ke0
    logu = joint0 + jnp.log(_uniform_01((B, 1)))  # joint0 - Exp(1)

    # concrete-layout constants for the loop carry (plain (B,1) constant
    # vectors are lane-replicated and mismatch the body's yields)
    fzero = rsum(jnp.zeros((B, d), jnp.float32))
    izero = jnp.zeros((B, 1), jnp.int32)
    fone = fzero + 1.0

    # Pure f32 mask algebra: every Mosaic failure mode hit so far involved
    # bool vectors (carries, selects with scalar leaves, lane broadcasts),
    # so flags live as {0,1} float32 and compose with *, +, 1-x.
    def f(b):  # compare -> {0,1} f32, immediately after the comparison
        return b.astype(jnp.float32)

    def orf(a, b):
        return a + b - a * b

    v0 = 1.0 - 2.0 * f(_uniform_01((B, 1)) < 0.5)

    state = dict(
        # current-direction endpoint (the integration frontier)
        pos_e=x, mom_e=mom0, grad_e=g0,
        # tree edges
        pos_m=x, mom_m=mom0, grad_m=g0,
        pos_p=x, mom_p=mom0, grad_p=g0,
        # outer proposal
        prop=x, prop_lp=lp, prop_g=g0,
        # subtree proposal
        sprop=x, sprop_lp=lp, sprop_g=g0,
        v=v0,
        # Leaf index carried twice: f32 for arithmetic/comparisons and i32
        # for tree-index bit math — numeric i32<->f32 casts of [B,1]
        # vectors are the "Lane broadcast" Mosaic cannot legalize (bool
        # casts are fine; casts outside the loop are fine).
        i_f=fzero,
        i_int=izero,
        rngc=izero,  # monotone draw salt for the interpret-PRNG fallback
        j=fzero,  # doubling counter (f32; cast to i32 after the loop)
        n=fone,
        n_sub=fzero,
        alpha_sub=fzero,
        nalpha_sub=fzero,
        alpha_out=fzero,
        nalpha_out=fone,
        diverged=fzero,
        leapfrogs=fzero,
        done=fzero,
        sublen=fone,  # 2^j, maintained by doubling
        pos_ck=tuple(jnp.zeros((B, d), jnp.float32) for _ in range(S)),
        vel_ck=tuple(jnp.zeros((B, d), jnp.float32) for _ in range(S)),
        c1_ck=tuple(fzero for _ in range(S)),
    )

    def cond(c):
        return jnp.sum(1.0 - c["done"]) > 0.0

    def body(c):
        act = 1.0 - c["done"]
        ev = c["v"] * eps  # [B, 1]
        # [B,1] operands of elementwise [B,d] math need explicit repeats
        # (Mosaic has no arithmetic lane broadcast).
        ev_d = pltpu.repeat(ev, d, axis=1)

        def seld(m, a, b):
            # masked [B,d] blend; m is a {0,1} f32 [B,1] mask
            return b + (a - b) * pltpu.repeat(m, d, axis=1)

        def sel1(m, a, b):
            return b + (a - b) * m

        # --- one leapfrog on the frontier --------------------------------
        m1 = c["mom_e"] + c["grad_e"] * (ev_d * 0.5)
        p1 = c["pos_e"] + inv * m1 * ev_d
        lp1, g1 = vg(p1)
        m1 = m1 + g1 * (ev_d * 0.5)
        vel1 = inv * m1
        joint = lp1 - 0.5 * rsum(m1 * vel1)

        leaf_valid = f(logu < joint) * act
        leaf_ok = f((logu - _DELTA_MAX) < joint)
        # min(1, e^x) = e^{min(0, x)}; min(0, x) = x·1[x<0]
        dj = joint - joint0
        alpha_sub = c["alpha_sub"] + act * jnp.exp(dj * f(dj < 0.0))
        nalpha_sub = c["nalpha_sub"] + act
        leapfrogs = c["leapfrogs"] + act
        n_sub = c["n_sub"] + leaf_valid

        u_take = _uniform_01((B, 1), salt=c["rngc"])
        u_swap = _uniform_01((B, 1), salt=c["rngc"])
        u_dir = _uniform_01((B, 1), salt=c["rngc"])

        # progressive uniform proposal within the subtree
        i = c["i_int"]
        first_leaf = f(i == 0)
        take = act * orf(first_leaf, leaf_valid * f(u_take * n_sub < 1.0))
        sprop = seld(take, p1, c["sprop"])
        sprop_lp = sel1(take, lp1, c["sprop_lp"])
        sprop_g = seld(take, g1, c["sprop_g"])

        # --- checkpoint stack + within-subtree U-turn --------------------
        idx_max = _popcount_small(i >> 1)
        is_even = f((i % 2) == 0)
        idx_min = idx_max - _trailing_ones_small(i) + 1
        c1 = rsum(p1 * vel1)  # [B, 1]

        pos_ck, vel_ck, c1_ck = [], [], []
        turned = fzero
        for k in range(S):
            store_k = act * is_even * f(idx_max == k)
            pk = seld(store_k, p1, c["pos_ck"][k])
            vk = seld(store_k, vel1, c["vel_ck"][k])
            ck = sel1(store_k, c1, c["c1_ck"][k])
            pos_ck.append(pk)
            vel_ck.append(vk)
            c1_ck.append(ck)
            check_k = act * (1.0 - is_even) * f(idx_min <= k) * f(k <= idx_max)
            dot_ck = c["v"] * (rsum(vk * p1) - ck)
            dot_cur = c["v"] * (c1 - rsum(pk * vel1))
            bad = orf(f(dot_ck < 0.0), f(dot_cur < 0.0))
            turned = orf(turned, check_k * bad)
        pos_ck, vel_ck, c1_ck = tuple(pos_ck), tuple(vel_ck), tuple(c1_ck)
        s_sub = leaf_ok * (1.0 - turned)

        # --- frontier advance & boundary detection -----------------------
        if "front" in ablate:
            pos_e, mom_e, grad_e = p1, m1, g1
        else:
            pos_e = seld(act, p1, c["pos_e"])
            mom_e = seld(act, m1, c["mom_e"])
            grad_e = seld(act, g1, c["grad_e"])
        act_i = (act > 0.5).astype(jnp.int32)  # bool->i32 cast is supported
        i_new_f = c["i_f"] + act
        i_new_int = i + act_i
        # subtree length 2^j carried as f32 and doubled at boundaries
        # (vector shifts and numeric i32<->f32 [B,1] casts both trip Mosaic)
        at_end = act * orf(f(i_new_f >= c["sublen"]), 1.0 - s_sub)

        minus = f(c["v"] < 0.0)
        upd_m = at_end * minus
        upd_p = at_end * (1.0 - minus)
        if "edges" in ablate:
            pos_m, mom_m, grad_m = c["pos_m"], c["mom_m"], c["grad_m"]
            pos_p, mom_p, grad_p = c["pos_p"], c["mom_p"], c["grad_p"]
        else:
            pos_m = seld(upd_m, pos_e, c["pos_m"])
            mom_m = seld(upd_m, mom_e, c["mom_m"])
            grad_m = seld(upd_m, grad_e, c["grad_m"])
            pos_p = seld(upd_p, pos_e, c["pos_p"])
            mom_p = seld(upd_p, mom_e, c["mom_p"])
            grad_p = seld(upd_p, grad_e, c["grad_p"])

        # across-doubling swap w.p. min(1, n_sub / n)
        take_outer = at_end * s_sub * f(u_swap * c["n"] < n_sub)
        if "prop" in ablate:
            prop, prop_lp, prop_g = c["prop"], c["prop_lp"], c["prop_g"]
        else:
            prop = seld(take_outer, sprop, c["prop"])
            prop_lp = sel1(take_outer, sprop_lp, c["prop_lp"])
            prop_g = seld(take_outer, sprop_g, c["prop_g"])
        n = c["n"] + at_end * n_sub

        # global U-turn across the full trajectory
        if "glob" in ablate:
            s_next = s_sub
        else:
            diff_dot_m = rsum((pos_p - pos_m) * (inv * mom_m))
            diff_dot_p = rsum((pos_p - pos_m) * (inv * mom_p))
            glob_ok = f(diff_dot_m >= 0.0) * f(diff_dot_p >= 0.0)
            s_next = s_sub * glob_ok

        if "sout" in ablate:
            alpha_out, nalpha_out = c["alpha_out"], c["nalpha_out"]
        else:
            alpha_out = sel1(at_end, alpha_sub, c["alpha_out"])
            nalpha_out = sel1(at_end, nalpha_sub, c["nalpha_out"])
        if "sdone" in ablate:
            j_new = c["j"]
            done = orf(c["done"], f(leapfrogs >= 12.0))
        else:
            j_new = c["j"] + at_end
            depth_capped = f(j_new >= float(max_depth))
            done = orf(c["done"], at_end * orf(1.0 - s_next, depth_capped))

        # next subtree: fresh direction, frontier jumps to the chosen edge
        cont = at_end * (1.0 - done)
        new_v = 1.0 - 2.0 * f(u_dir < 0.5)
        if "sv" in ablate:
            v = c["v"]
        else:
            v = c["v"] + cont * (new_v - c["v"])
        new_minus = cont * f(v < 0.0)
        new_plus = cont * f(v >= 0.0)
        if "frontjump" not in ablate:
            pos_e = seld(new_minus, pos_m, seld(new_plus, pos_p, pos_e))
            mom_e = seld(new_minus, mom_m, seld(new_plus, mom_p, mom_e))
            grad_e = seld(new_minus, grad_m, seld(new_plus, grad_p, grad_e))

        return dict(
            pos_e=pos_e, mom_e=mom_e, grad_e=grad_e,
            pos_m=pos_m, mom_m=mom_m, grad_m=grad_m,
            pos_p=pos_p, mom_p=mom_p, grad_p=grad_p,
            prop=prop, prop_lp=prop_lp, prop_g=prop_g,
            sprop=sprop, sprop_lp=sprop_lp, sprop_g=sprop_g,
            v=v,
            i_f=i_new_f if "siend" in ablate
            else i_new_f * (1.0 - at_end),
            i_int=i_new_int if "siend" in ablate
            else i_new_int * (1 - (at_end > 0.5).astype(jnp.int32)),
            rngc=c["rngc"] + 1,
            j=j_new,
            n=c["n"] if "siend" in ablate else n,
            n_sub=n_sub if "siend" in ablate else n_sub * (1.0 - at_end),
            alpha_sub=alpha_sub if "siend" in ablate
            else alpha_sub * (1.0 - at_end),
            nalpha_sub=nalpha_sub if "siend" in ablate
            else nalpha_sub * (1.0 - at_end),
            alpha_out=alpha_out,
            nalpha_out=nalpha_out,
            diverged=orf(c["diverged"], act * (1.0 - leaf_ok)),
            leapfrogs=leapfrogs,
            done=done,
            sublen=c["sublen"] if "siend" in ablate
            else c["sublen"] * (1.0 + at_end),
            pos_ck=pos_ck,
            vel_ck=vel_ck,
            c1_ck=c1_ck,
        )

    final = jax.lax.while_loop(cond, body, state)

    out_pos[:] = final["prop"]
    out_lp[:] = final["prop_lp"]
    out_grad[:] = final["prop_g"]
    out_alpha[:] = final["alpha_out"]
    out_nalpha[:] = final["nalpha_out"].astype(jnp.int32)
    out_lf[:] = final["leapfrogs"].astype(jnp.int32)
    out_depth[:] = final["j"].astype(jnp.int32)
    out_div[:] = final["diverged"].astype(jnp.int32)


def pallas_nuts_step(
    logp_fn: Callable,
    pos,
    lp,
    grad,
    eps,
    mass_inv,
    mass_scale,
    seed,
    max_depth: int = 10,
    block_chains: int = 64,
    interpret: bool = False,
):
    """One NUTS transition for all chains via the fused kernel.

    ``pos/grad/mass_*``: [n_chains, dim]; ``lp/eps``: [n_chains]; ``seed``:
    int32 scalar (vary per step).  Returns
    ``(pos', lp', grad', alpha, n_alpha, leapfrogs, depth, diverged)``.
    """
    n, d = pos.shape
    if n % block_chains != 0:
        block_chains = n  # single block fallback
    n_blocks = n // block_chains
    B = block_chains

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

    import os as _os

    kernel = functools.partial(
        _nuts_kernel,
        closed_vg=closed_vg,
        const_shapes=const_shapes,
        max_depth=int(max_depth),
        interpret=bool(interpret),
        ablate=frozenset(
            x for x in _os.environ.get("GMT_NUTS_ABL", "").split(",") if x
        ),
    )

    blk = lambda width: pl.BlockSpec(
        (B, width), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(
        a.shape, lambda b: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        kernel,
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
