"""Static-window NUTS transition: all leapfrogs first, tree logic after.

TPU-native alternative schedule for the NUTS transition of
``ops/tree.py`` (reference semantics: generic_nuts.rs:755-880 — slice
variable, leaf weight 1[logu < joint], uniform in-subtree proposal,
min(1, n'/n) across-doubling swaps, mass-weighted U-turn checks,
Δ_max = 1000).  Same transition *law* as the dynamic tree; completely
different execution schedule, motivated by round-3 hardware measurements
(docs/BENCH_HISTORY.md "measured roofline"):

- the dynamic ``lax.while_loop`` tree streams 13-16 [d] carry buffers per
  chain through HBM every leaf pair and spends ~27 VPU passes per leaf
  (U-turn checkpoint stacks, reservoir selects, masks) vs the bare
  leapfrog's ~6 — it reaches ~3% of the measured VMEM-resident leapfrog
  ceiling (1.21e9 grad-evals/s on v5e);
- NUTS's per-doubling direction draws are *exogenous* randomness: the
  doubling directions v_j determine the trajectory's window around the
  initial point, and the window offset ``o = Σ_{j: v_j = -1} 2^j`` is
  exactly **uniform on {0, …, 2^J − 1}**.  Drawing ``o`` up front makes
  the whole trajectory a fixed contiguous window of 2^J integration
  points containing the initial state at per-chain offset ``o``.

Schedule (J = max_depth, T = 2^J leaves):

1. **Integration phase** — T−1 leapfrogs in a fixed-length ``lax.scan``
   with a slim carry: two frontiers (backward / forward), 6 [B, d]
   buffers total, no tree bookkeeping.  Iteration ``i`` advances the
   backward frontier while ``i < o`` (step size −ε) and the forward
   frontier after (+ε) — exactly one gradient evaluation per chain per
   iteration, no masked idle lanes.  Positions, mass-weighted velocities
   and joint log-densities of every leaf are stacked ([T, B, d] / [T, B]).
   With −ε integration the stored momenta are physical forward-time
   momenta, so window order is time order.
2. **Retrospective tree phase** — cheap batched tensor ops:
   a Gram matrix ``G[b, i, j] = vel_i · θ_j`` (one read of the stacks)
   turns every U-turn check — within-subtree balanced nodes *and* the
   per-doubling global check — into [B]-sized lookups:
   node (a, b) in window order turns iff
   ``G[a,b] − G[a,a] < 0  or  G[b,b] − G[b,a] < 0``.
   Divergences, early-exit accounting (the dynamic builder stops a
   subtree at its first bad leaf — replicated via first-failure masks so
   dual-averaging α/n_α statistics match), uniform proposal selection
   among slice-valid leaves, and min(1, n'/n) across-doubling swaps are
   all evaluated per doubling on [B, 2^j] arrays.

Equal in distribution to :func:`..ops.tree.nuts_tree_step` (the in-subtree
reservoir compose to a uniform over valid leaves; here the uniform is drawn
directly).  Documented deviations (module contract, mirrored in
samplers/nuts.py):

- the RNG *stream* differs from the dynamic backend (different draw order;
  both are Threefry so individual trajectories differ chain-by-chain while
  the transition law is identical);
- every transition costs exactly 2^J − 1 gradient evaluations regardless
  of where the trajectory stops; the ``leapfrogs`` counter reports that
  *actual* work (the dynamic backend reports evaluated leaves).  This
  backend is built for small depth caps (the benchmark's cap-4 regime,
  where dynamic trees are ~84% saturated anyway); for max_depth ≥ ~6 the
  always-full window wastes compute and the dynamic tree wins.

Diagonal / identity mass only (like the fused Pallas backend).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .tree import DELTA_MAX

__all__ = ["static_nuts_step", "StaticStepResult", "uturn_nodes"]


class StaticStepResult(NamedTuple):
    pos: jax.Array  # [B, d]
    lp: jax.Array  # [B]
    grad: jax.Array  # [B, d]
    alpha: jax.Array  # [B] last-subtree Σ min(1, exp(joint - joint0))
    n_alpha: jax.Array  # [B] last-subtree evaluated-leaf count
    depth: jax.Array  # [B] doublings executed
    diverged: jax.Array  # [B] bool
    leapfrogs: jax.Array  # [B] actual gradient evals (2^J - 1, constant)


def uturn_nodes(depth: int):
    """Balanced-subtree U-turn node set for a 2^depth-leaf subtree, in
    travel order: for every odd leaf t, the nodes [t+1-2^k, t] for each
    trailing set bit of t+1 — exactly the checks the dynamic builder's
    checkpoint-stack scheme performs (ops/tree.py build_subtree).
    Returns a list of (start_t, end_t) pairs."""
    nodes = []
    n = 1 << depth
    for t in range(1, n, 2):
        span = 2
        while (t + 1) % span == 0:
            nodes.append((t + 1 - span, t))
            span *= 2
    return nodes


def _split_batch(keys, n):
    return jax.vmap(lambda k: jax.random.split(k, n))(keys)


def static_nuts_step(
    keys,
    pos,
    lp,
    grad,
    eps,
    mass_inv,
    mass_scale,
    vg_fn: Callable,
    max_depth: int,
    *,
    unroll: int | None = None,
    randoms: dict | None = None,
) -> StaticStepResult:
    """One NUTS transition for the whole chain batch.

    Parameters
    ----------
    keys : [B] PRNG keys (one per chain, already stepped for this
        transition).
    pos, grad : [B, d];  lp, eps : [B]
    mass_inv, mass_scale : [B, d] diagonal M⁻¹ and momentum scale
        (sqrt M); pass ones for identity mass.
    vg_fn : per-chain ``value_and_grad`` of the target log density
        (vmapped internally).
    max_depth : static doubling cap J ≥ 1; the window holds 2^J leaves.
    unroll : scan unroll factor for the integration phase (default: full
        unroll — the window is short by design).
    randoms : optional dict overriding the per-chain draws (oracle
        testing): ``mom0`` [B, d] momenta, ``expo`` [B] Exp(1) slice
        draws, ``offset`` [B] int window offsets, ``u_sel``/``u_swap``
        [B, J] uniforms.
    """
    if max_depth < 1:
        raise ValueError("static backend requires max_depth >= 1")
    J = int(max_depth)
    T = 1 << J
    B, d = pos.shape
    dtype = pos.dtype
    one = jnp.asarray(1.0, dtype)
    vg_b = jax.vmap(vg_fn)

    # -- per-chain randoms (all exogenous: drawn up front) ------------------
    if randoms is None:
        ks = _split_batch(keys, 5)
        z = jax.vmap(lambda k: jax.random.normal(k, (d,), dtype))(ks[:, 0])
        mom0 = mass_scale * z
        expo = jax.vmap(lambda k: jax.random.exponential(k, (), dtype))(ks[:, 1])
        offset = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, T, jnp.int32)
        )(ks[:, 2])
        u_sel = jax.vmap(lambda k: jax.random.uniform(k, (J,), dtype))(ks[:, 3])
        u_swap = jax.vmap(lambda k: jax.random.uniform(k, (J,), dtype))(ks[:, 4])
    else:
        mom0 = jnp.asarray(randoms["mom0"], dtype)
        expo = jnp.asarray(randoms["expo"], dtype)
        offset = jnp.asarray(randoms["offset"], jnp.int32)
        u_sel = jnp.asarray(randoms["u_sel"], dtype)
        u_swap = jnp.asarray(randoms["u_swap"], dtype)

    vel0 = mass_inv * mom0
    joint0 = lp - 0.5 * jnp.sum(mom0 * vel0, axis=-1)
    logu = joint0 - expo

    # -- integration phase: T-1 leapfrogs, dual frontier --------------------
    # Backward frontier integrates with -ε: the leapfrog map with negated
    # step is the exact inverse of the forward step, so stored momenta stay
    # in the forward-time convention and window order is time order.
    off_col = offset[:, None]

    def body(carry, i):
        pb, mb, gb, pf, mf, gf = carry
        sel = i < off_col  # [B, 1] bool: advance the backward frontier
        # where-selects, not arithmetic blends: a NaN frontier (possible
        # after a divergence overflows) must not poison the other frontier.
        e = jnp.where(sel, -eps[:, None], eps[:, None])
        p0 = jnp.where(sel, pb, pf)
        m0 = jnp.where(sel, mb, mf)
        g0 = jnp.where(sel, gb, gf)
        half = 0.5 * e
        m1 = m0 + g0 * half
        p1 = p0 + mass_inv * m1 * e
        lp1, g1 = vg_b(p1)
        lp1 = lp1.astype(dtype)
        g1 = g1.astype(dtype)
        m1 = m1 + g1 * half
        vel1 = mass_inv * m1
        joint1 = lp1 - 0.5 * jnp.sum(m1 * vel1, axis=-1)
        pb = jnp.where(sel, p1, pb)
        mb = jnp.where(sel, m1, mb)
        gb = jnp.where(sel, g1, gb)
        pf = jnp.where(sel, pf, p1)
        mf = jnp.where(sel, mf, m1)
        gf = jnp.where(sel, gf, g1)
        return (pb, mb, gb, pf, mf, gf), (p1, vel1, joint1)

    init = (pos, mom0, grad, pos, mom0, grad)
    _, (pos_s, vel_s, joint_s) = jax.lax.scan(
        body,
        init,
        jnp.arange(T - 1, dtype=jnp.int32),
        unroll=(T - 1) if unroll is None else unroll,
    )
    # Slot T-1 holds the initial leaf.
    pos_all = jnp.concatenate([pos_s, pos[None]], axis=0)  # [T, B, d]
    vel_all = jnp.concatenate([vel_s, vel0[None]], axis=0)
    joint_all = jnp.concatenate([joint_s, joint0[None]], axis=0)  # [T, B]

    # -- slot -> window permutation -----------------------------------------
    # Iteration i produced window index  o-1-i  (backward phase, i < o)
    # or  i+1  (forward phase); the initial leaf sits at window o.
    W = jnp.arange(T, dtype=jnp.int32)[None, :]
    perm = jnp.where(
        W == off_col,
        jnp.int32(T - 1),
        jnp.where(W < off_col, off_col - 1 - W, W - 1),
    )  # [B, T]: slot holding window w

    # -- Gram matrix: every U-turn dot product in one pass ------------------
    # G[b, i, j] = vel_i · θ_j over slots; permuted to window order so that
    # node (a, b) with a < b (window/time order) turns iff
    #   vel_a·(θ_b-θ_a) = Gw[a,b]-Gw[a,a] < 0   or
    #   vel_b·(θ_b-θ_a) = Gw[b,b]-Gw[b,a] < 0.
    G = jnp.einsum("ibd,jbd->bij", vel_all, pos_all)  # [B, T, T]
    G = jnp.take_along_axis(G, perm[:, :, None], axis=1)
    Gw = jnp.take_along_axis(G, perm[:, None, :], axis=2)
    joint_w = jnp.take_along_axis(joint_all.T, perm, axis=1)  # [B, T]

    bidx = jnp.arange(B)

    def gw(a, b):  # [B] lookups into Gw
        return Gw[bidx, a, b]

    def turned_pair(wa, wb):  # wa < wb elementwise (window order)
        return (gw(wa, wb) - gw(wa, wa) < 0.0) | (gw(wb, wb) - gw(wb, wa) < 0.0)

    # -- retrospective doubling loop ([B]-sized ops, unrolled over j) -------
    delta = jnp.asarray(DELTA_MAX, dtype)
    lo = offset
    hi = offset
    n = jnp.ones((B,), jnp.int32)
    s = jnp.ones((B,), bool)
    prop_w = offset
    diverged = jnp.zeros((B,), bool)
    depth = jnp.zeros((B,), jnp.int32)
    # Dynamic-tree init: alpha = 0, n_alpha = 1 (only read if J were 0).
    alpha_last = jnp.zeros((B,), dtype)
    n_alpha_last = jnp.ones((B,), jnp.int32)

    for j in range(J):
        L = 1 << j
        executed = s
        v_neg = ((offset >> j) & 1) == 1  # direction of doubling j
        t = jnp.arange(L, dtype=jnp.int32)[None, :]
        # members in travel order; window index per leaf  [B, L]
        w_m = jnp.where(v_neg[:, None], lo[:, None] - 1 - t, hi[:, None] + 1 + t)

        joint_t = jnp.take_along_axis(joint_w, w_m, axis=1)  # [B, L]
        ok_t = (logu[:, None] - delta) < joint_t
        valid_t = logu[:, None] < joint_t

        # within-subtree U-turn checks at odd travel leaves
        turned_t = jnp.zeros((B, L), bool)
        for (ta, tb) in uturn_nodes(j):
            wa = w_m[:, ta]
            wb = w_m[:, tb]
            lo_n = jnp.minimum(wa, wb)
            hi_n = jnp.maximum(wa, wb)
            turned_t = turned_t.at[:, tb].set(
                turned_t[:, tb] | turned_pair(lo_n, hi_n)
            )

        fail_t = ~ok_t | turned_t
        any_fail = jnp.any(fail_t, axis=1)
        t_fail = jnp.argmax(fail_t, axis=1).astype(jnp.int32)
        t_last = jnp.where(any_fail, t_fail, L - 1)
        evaluated = t <= t_last[:, None]

        # dual-averaging statistics over evaluated leaves (early exit at
        # the first failing leaf, like the dynamic builder)
        a_t = jnp.minimum(one, jnp.exp(joint_t - joint0[:, None]))
        alpha_j = jnp.sum(jnp.where(evaluated, a_t, 0.0), axis=1)
        n_alpha_j = t_last + 1
        s_sub = ~any_fail
        n_sub = jnp.sum(jnp.where(evaluated, valid_t.astype(jnp.int32), 0), axis=1)

        # uniform proposal among slice-valid leaves (== reservoir law)
        k_idx = jnp.minimum(
            (u_sel[:, j] * n_sub.astype(dtype)).astype(jnp.int32),
            jnp.maximum(n_sub - 1, 0),
        )
        cum = jnp.cumsum(valid_t.astype(jnp.int32), axis=1)
        pick = valid_t & (cum == (k_idx + 1)[:, None])
        t_pick = jnp.argmax(pick, axis=1).astype(jnp.int32)
        w_pick = jnp.take_along_axis(w_m, t_pick[:, None], axis=1)[:, 0]

        # across-doubling swap w.p. min(1, n'/n)
        take = s_sub & (u_swap[:, j] * n.astype(dtype) < n_sub.astype(dtype))
        prop_w = jnp.where(executed & take, w_pick, prop_w)

        lo_new = jnp.where(v_neg, lo - L, lo)
        hi_new = jnp.where(v_neg, hi, hi + L)
        s_new = s_sub & ~turned_pair(lo_new, hi_new)

        not_ok_at_fail = jnp.take_along_axis(~ok_t, t_fail[:, None], axis=1)[:, 0]
        diverged = diverged | (executed & any_fail & not_ok_at_fail)
        n = jnp.where(executed, n + n_sub, n)
        alpha_last = jnp.where(executed, alpha_j, alpha_last)
        n_alpha_last = jnp.where(executed, n_alpha_j, n_alpha_last)
        depth = depth + executed.astype(jnp.int32)
        lo = jnp.where(executed, lo_new, lo)
        hi = jnp.where(executed, hi_new, hi)
        s = executed & s_new

    # -- materialize the accepted proposal ----------------------------------
    # One-hot *where*-select, not an arithmetic one-hot contraction: leaves
    # past a divergence can hold ±Inf/NaN, and Inf·0 = NaN would poison the
    # sum (observed: the first warmup mass-window's transient large-ε phase
    # overflowed unselected leaves and NaN'd the whole batch).
    slot_pick = perm[bidx, prop_w]  # [B]
    onehot = (
        jnp.arange(T, dtype=jnp.int32)[:, None] == slot_pick[None, :]
    )[:, :, None]  # [T, B, 1] bool
    pos_new = jnp.sum(jnp.where(onehot, pos_all, 0.0), axis=0)
    # Re-derive (lp, grad) once per transition, matching the dynamic
    # backend's carry-slimming contract (ops/tree.py nuts_tree_step tail).
    lp_new, grad_new = vg_b(pos_new)

    return StaticStepResult(
        pos=pos_new,
        lp=lp_new.astype(dtype),
        grad=grad_new.astype(dtype),
        alpha=alpha_last,
        n_alpha=n_alpha_last,
        depth=depth,
        diverged=diverged,
        leapfrogs=jnp.full((B,), T - 1, jnp.int32),
    )
