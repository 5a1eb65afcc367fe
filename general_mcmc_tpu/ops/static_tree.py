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

1. **Integration phase** — T−1 leapfrogs, fully unrolled (the window is
   short by design), with a slim carry: two frontiers (backward /
   forward), 6 [B, d] buffers total, no tree bookkeeping.  Iteration
   ``i`` advances the backward frontier while ``i < o`` (step size −ε)
   and the forward frontier after (+ε) — exactly one gradient evaluation
   per chain per iteration, no masked idle lanes.  Positions,
   mass-weighted velocities and joint log-densities of every leaf are
   stacked ([B, T, d] / [T, B]).  With −ε integration the stored momenta
   are physical forward-time momenta, so window order is time order.
2. **Retrospective tree phase** — cheap batched tensor ops:
   a Gram matrix ``G[b, i, j] = vel_i · θ_j`` (one read of the stacks)
   turns every U-turn check — within-subtree balanced nodes *and* the
   per-doubling global check — into [B]-sized lookups:
   node (a, b) in window order turns iff
   ``G[a,b] − G[a,a] < 0  or  G[b,b] − G[b,a] < 0``.

   The tree structure is evaluated **entirely in window coordinates,
   where it is static** (key fact: since direction v_j = bit j of the
   offset, the window after j doublings is exactly the size-2^j dyadic
   block of the window containing the initial leaf, and doubling j's
   subtree is that block's *sibling* — so every U-turn node is one of
   the T−1 static dyadic intervals, checked by plain slices of the
   Gram).  Early-exit accounting (the dynamic builder stops a subtree
   at its first bad leaf in travel order — dual-averaging α/n_α must
   match) becomes segment cumsums over [B, T/L, L] reshapes in both
   travel orientations, and all per-chain choices (active sibling
   block, merged-window check, proposal leaf) are one-hot selects over
   axes of length ≤ T.  No per-chain gathers / advanced indexing
   anywhere: TPU-measured, gather-style retrospective logic cost ~10
   ms/transition at B=10k (65% of the step) vs ~0 for this form.

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
  always-full window wastes compute and the dynamic tree wins;
- on TPU the U-turn dot products run at default matmul precision (bf16
  multiplicands, f32 accumulate — like the dynamic backend's own MXU
  dots), and the one-hot window permute re-rounds the Gram once more:
  borderline turned flags can differ from the exact-f32 CPU path.  The
  rule remains a deterministic symmetric function of the trajectory, so
  the sampler is exactly valid either way;
- non-finite Gram entries are sanitized to 0 before the one-hot permute
  (0·NaN would otherwise poison every entry).  This matches the dynamic
  backend's NaN-compare-False U-turn behavior whenever non-finite leaf
  *positions* imply non-finite joints (lp(±Inf/NaN pos) = −Inf/NaN), which
  holds for every well-posed target: such leaves are flagged bad and the
  first-failure mask stops travel before their node flags are read.  A
  target returning a *finite* lp at a non-finite position violates that
  assumption — its merged-window check could turn where the dynamic tree
  would not.  Both remain valid samplers (the rule stays symmetric and
  deterministic); only exact law agreement needs the assumption.

Identity, diagonal, and dense mass matrices are supported (``dense=True``
switches the velocity maps to per-chain batched matvecs; the Gram and the
retro phase are mass-agnostic).

Beyond-reference extension (``multinomial=True``): Stan's multinomial /
biased-progressive proposal (Betancourt 2017, app. A.3) — the same law as
``ops/tree.py``'s ``multinomial=True`` mode.  The retro machinery is the
count→weight generalization of the slice path: leaf weights
``w = exp(joint − joint₀)`` replace the 0/1 slice indicators, the
in-subtree pick becomes the first weighted-cumsum crossing of
``τ = u·W_sub`` instead of the count crossing of ``⌈u·n_sub⌉``, and the
across-doubling swap ``u·n < n'`` becomes ``u·W < W'`` (= the biased
``min(1, W'/W)`` coin).  All weights are computed relative to the
per-chain window maximum joint (selection and swap ratios are invariant
to that shift), so they live in (0, 1] and cannot overflow; the weight
cumsums and row sums run at ``Precision.HIGHEST`` because real-valued
operands are not bf16-exact (unlike the slice path's {0,1} masks).  The
slice draw ``expo`` is still consumed so the RNG stream is identical
across modes.  Degenerate corner (documented): if the window maximum
exceeds ``joint₀`` by more than ~88 units (f32 exp underflow of the
initial leaf's weight) *and* every subtree weight underflows too, the
chain keeps its current state for that transition — statistically
immaterial (both laws are already degenerate at such energy errors).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as _np

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
    dense: bool = False,
    multinomial: bool = False,
    randoms: dict | None = None,
) -> StaticStepResult:
    """One NUTS transition for the whole chain batch.

    Parameters
    ----------
    keys : [B] PRNG keys (one per chain, already stepped for this
        transition).
    pos, grad : [B, d];  lp, eps : [B]
    mass_inv, mass_scale : diagonal M⁻¹ and momentum scale (sqrt M) as
        [B, d] when ``dense`` is False (pass ones for identity mass); with
        ``dense=True``, [B, d, d] dense M⁻¹ and its momentum-scale
        Cholesky factor (chol M) — velocity maps become well-shaped
        batched matvecs, everything downstream of the leaf velocities
        (Gram, retro phase) is mass-agnostic.
    vg_fn : per-chain ``value_and_grad`` of the target log density
        (vmapped internally).
    max_depth : static doubling cap J ≥ 1; the window holds 2^J leaves.
    multinomial : use Stan's multinomial/biased-progressive proposal
        instead of the reference's slice sampler (module docstring).
    randoms : optional dict overriding the per-chain draws (oracle
        testing): ``mom0`` [B, d] momenta, ``expo`` [B] Exp(1) slice
        draws, ``offset`` [B] int window offsets, ``u_sel``/``u_swap``
        [B, J] uniforms.
    """
    if max_depth < 1:
        raise ValueError("static backend requires max_depth >= 1")
    if max_depth > 8:
        # The index-recovery rowsums (w_pick, slot_pick) are MXU matvecs at
        # default precision: bf16 multiplicands are exact only for integers
        # <= 256 = 2^8, so window indices need T = 2^J <= 256.  The sampler
        # guards this too (samplers/nuts.py), but a direct caller must hit
        # the precondition at the op boundary, not get silently-corrupted
        # proposal indices on TPU.
        raise ValueError(
            "static backend requires max_depth <= 8 (window index recovery "
            "is exact in bf16 only for T = 2^max_depth <= 256); use the "
            "dynamic backend for deeper trees"
        )
    J = int(max_depth)
    T = 1 << J
    B, d = pos.shape
    dtype = pos.dtype
    one = jnp.asarray(1.0, dtype)
    vg_b = jax.vmap(vg_fn)

    if dense:
        # Per-chain [d, d] matvec, matching the dynamic backend's
        # inv_mass_mul (mass.inv @ p under vmap) operation order exactly.
        def inv_mul(m):
            return jnp.einsum("bij,bj->bi", mass_inv, m)

        def scale_mul(z):
            return jnp.einsum("bij,bj->bi", mass_scale, z)
    else:
        def inv_mul(m):
            return mass_inv * m

        def scale_mul(z):
            return mass_scale * z

    # -- per-chain randoms (all exogenous: drawn up front) ------------------
    if randoms is None:
        ks = _split_batch(keys, 5)
        z = jax.vmap(lambda k: jax.random.normal(k, (d,), dtype))(ks[:, 0])
        mom0 = scale_mul(z)
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

    vel0 = inv_mul(mom0)
    joint0 = lp - 0.5 * jnp.sum(mom0 * vel0, axis=-1)
    logu = joint0 - expo

    # -- integration phase: T-1 leapfrogs, dual frontier --------------------
    # Backward frontier integrates with -ε: the leapfrog map with negated
    # step is the exact inverse of the forward step, so stored momenta stay
    # in the forward-time convention and window order is time order.
    off_col = offset[:, None]

    # The T−1 leapfrogs run as a fully-unrolled Python loop (the window is
    # short by design) collecting per-leaf outputs, stacked ONCE into
    # [B, T, d] — the batch-friendly layout the Gram matmul and the
    # proposal select want.  TPU-measured alternatives, both worse: scan-
    # stacked [T, B, d] outputs need a 655 MB-per-stack relayout before the
    # Gram, and per-iteration dynamic_update_slice writes into a [B, T, d]
    # scan carry cost ~0.17 ms each (~5 ms per transition) against ~0.02 ms
    # of raw bytes.
    pb = pf = pos
    mb = mf = mom0
    gb = gf = grad
    pos_l, vel_l, joint_l = [], [], []
    for i in range(T - 1):
        sel = jnp.asarray(i, jnp.int32) < off_col  # [B, 1] bool: backward?
        # where-selects, not arithmetic blends: a NaN frontier (possible
        # after a divergence overflows) must not poison the other frontier.
        e = jnp.where(sel, -eps[:, None], eps[:, None])
        p0 = jnp.where(sel, pb, pf)
        m0 = jnp.where(sel, mb, mf)
        g0 = jnp.where(sel, gb, gf)
        half = 0.5 * e
        m1 = m0 + g0 * half
        p1 = p0 + inv_mul(m1) * e
        lp1, g1 = vg_b(p1)
        lp1 = lp1.astype(dtype)
        g1 = g1.astype(dtype)
        m1 = m1 + g1 * half
        vel1 = inv_mul(m1)
        joint1 = lp1 - 0.5 * jnp.sum(m1 * vel1, axis=-1)
        pb = jnp.where(sel, p1, pb)
        mb = jnp.where(sel, m1, mb)
        gb = jnp.where(sel, g1, gb)
        pf = jnp.where(sel, pf, p1)
        mf = jnp.where(sel, mf, m1)
        gf = jnp.where(sel, gf, g1)
        pos_l.append(p1)
        vel_l.append(vel1)
        joint_l.append(joint1)

    # Slot T-1 holds the initial leaf.
    pos_all = jnp.stack(pos_l + [pos], axis=1)  # [B, T, d]
    vel_all = jnp.stack(vel_l + [vel0], axis=1)
    joint_all = jnp.stack(joint_l + [joint0], axis=0)  # [T, B]

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
    #
    # The window permutation is applied with one-hot *matmuls*, not
    # per-chain gathers: TPU-measured, the take_along_axis form cost ~3 ms
    # per transition at B=10k and its gathers refused to materialize (each
    # downstream static slice re-ran them).  One-hot arithmetic is safe
    # here only because G is sanitized first — rows/columns of post-
    # divergence leaves can be ±Inf/NaN, and 0·NaN would otherwise poison
    # every entry.  Sanitizing to 0 leaves those nodes' turned flags False,
    # exactly like the NaN comparisons they replace, and such nodes are
    # never decisive: a bad leaf always precedes its node's completion leaf
    # in travel order, so the first-failure mask stops before the flag.
    if dtype == jnp.float32 and jax.default_backend() != "cpu":
        # TPU: the default-precision f32 dot converts its operands to bf16
        # anyway, but left implicit XLA assembles the bf16 copies leaf-by-
        # leaf inside the integration loop — 15 strided dynamic-update-
        # slice fusions in matmul layout, ~0.66 ms/transition profiled.
        # Casting the leaves explicitly and barriering the stacks forces
        # two contiguous bf16 concats instead.  The Gram itself is
        # unchanged on TPU (same bf16 operands, f32 accumulate as the
        # implicit default-precision dot); CPU keeps the true-f32 einsum
        # below, which the oracle tests pin.  NOTE on precision: on TPU
        # the U-turn dot products — here AND in the dynamic backend's
        # jnp.dot(p, vel) — run at default matmul precision (bf16
        # multiplicands), and the one-hot permute below re-rounds Gw
        # entries to bf16 once more.  The U-turn rule stays a
        # deterministic, symmetric function of the trajectory, so the
        # sampler remains exactly valid; borderline turned flags can
        # differ from the f32 CPU path (documented deviation).
        vel_bf = jax.lax.optimization_barrier(
            jnp.stack([v.astype(jnp.bfloat16) for v in vel_l]
                      + [vel0.astype(jnp.bfloat16)], axis=1)
        )
        pos_bf = jax.lax.optimization_barrier(pos_all.astype(jnp.bfloat16))
        G = jnp.einsum(
            "bid,bjd->bij", vel_bf, pos_bf,
            preferred_element_type=jnp.float32,
        )  # [B, T, T]
    else:
        G = jnp.einsum("bid,bjd->bij", vel_all, pos_all)  # [B, T, T]
    G = jnp.where(jnp.isfinite(G), G, 0.0)
    P_bool = (
        perm[:, :, None] == jnp.arange(T, dtype=jnp.int32)[None, None, :]
    )  # [B, window, slot] one-hot
    P = P_bool.astype(dtype)
    Gw = jnp.einsum("bvu,bwu->bwv", P, jnp.einsum("bwt,btu->bwu", P, G))
    # Flattened [B, T²] view (entry (w, v) at lane w·T + v), materialized
    # once: every dyadic-node check below is then a STATIC STRIDED LANE
    # SLICE producing a [B, M] f32 array.  TPU-profiled alternatives, both
    # multi-ms: per-node [B]-sized slices of [B, T, T] (B-major) or of
    # [T, T, B] (chain-minor) each emit a tiny-tile slice + packed-pred
    # relayout + unit-axis reduce — 4 check fusions at ~1.5 ms each.  The
    # strided-lane form emits one slice op per level and keeps everything
    # 2-D f32 until one [B, M] compare.
    Gw2 = jax.lax.optimization_barrier(Gw.reshape(B, T * T))
    # joint_w via one-hot *where*-select (sum of one selected element —
    # exact take_along_axis semantics incl. ±Inf/NaN leaves, which a 0·x
    # arithmetic one-hot would poison).  TPU-profiled, the gather form
    # cost 1.7 ms/transition.
    joint_w = jnp.sum(
        jnp.where(P_bool, joint_all.T[:, None, :], jnp.zeros((), dtype)),
        axis=2,
    )  # [B, T]

    # -- static dyadic U-turn nodes (window coordinates) --------------------
    # Level k (block size L = 2^k, k = 1..J) dyadic interval node m =
    # [L·m, L·m + L − 1] =: (a, b) turns iff
    #   Gw[a,b] − Gw[a,a] < 0  or  Gw[b,b] − Gw[b,a] < 0.
    # Flat-lane positions:  Gw[a,b] = 17·L·m + (L−1),
    #   Gw[b,a] = 17·L·m + 16·(L−1), diag Gw[w,w] = 17·w  (T = 16; in
    # general stride (T+1)·L etc.) — all arithmetic progressions, so each
    # level's 4 operand sets are strided slices.
    diag = jax.lax.slice(Gw2, (0, 0), (B, T * T), (1, T + 1))  # [B, T]

    def _strided(start: int, stride: int, count: int):
        return jax.lax.slice(
            Gw2, (0, start), (B, start + (count - 1) * stride + 1), (1, stride)
        )  # [B, count]

    tb_lvl = {}
    for k in range(1, J + 1):
        L = 1 << k
        M = T >> k
        x_ab = _strided(L - 1, (T + 1) * L, M)
        x_ba = _strided(T * (L - 1), (T + 1) * L, M)
        x_aa = jax.lax.slice(diag, (0, 0), (B, T - L + 1), (1, L))
        x_bb = jax.lax.slice(diag, (0, L - 1), (B, T), (1, L))
        tb_lvl[k] = jnp.where(
            (x_ab - x_aa < 0.0) | (x_bb - x_ba < 0.0),
            one,
            jnp.zeros((), dtype),
        )  # [B, M] {0,1} f32

    # -- static per-leaf quantities [B, T] ----------------------------------
    # All masks are {0,1} floats and every within-block cumulative / row
    # reduction below is a dot against a small static matrix: TPU-measured,
    # jnp.cumsum on [B, T/L, L] lowers to reduce-window at ~2.7 ms per call
    # and bool any/sum rows to multi-ms reduce fusions (~45 ms/transition
    # total at B=10k); the same math as [B,T]@[T,T] / [B,T]@[T,1] MXU dots
    # is ~100× cheaper.  Where-selects (not mask multiplication) guard
    # every contact with joint-derived values, which can be NaN.
    delta = jnp.asarray(DELTA_MAX, dtype)
    zero = jnp.zeros((), dtype)
    Wv = jnp.arange(T, dtype=jnp.int32)[None, :]  # [1, T]
    Wf = jnp.arange(T, dtype=dtype)[None, :]  # [1, T] f32
    ones_col = jnp.ones((T, 1), dtype)

    def rowsum(x, exact=False):  # [B, T] f32 -> [B] via MXU matvec
        # The {0,1}-mask and small-integer rowsums are exact even at the
        # TPU default (bf16-multiplicand) precision: their operands are
        # exactly representable in bf16 and accumulation is f32.  Pass
        # exact=True for real-valued operands (the dual-averaging α sum)
        # so those match the dynamic backend's f32 adds.
        return jax.lax.dot_general(
            x, ones_col, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST if exact else None,
        )[:, 0]

    def rowsum_k(x, k):  # [B, T >> k] f32 -> [B]
        return jax.lax.dot_general(
            x, jnp.ones((T >> k, 1), dtype), (((1,), (0,)), ((), ()))
        )[:, 0]

    if multinomial:
        # Divergence reference is joint₀ (module docstring); weights are
        # computed relative to the per-chain window max joint — selection
        # and swap ratios are shift-invariant, and every weight lands in
        # (0, 1] so nothing can overflow.  Non-finite joints get weight 0
        # (such leaves are bad_f and gated by the first-failure mask; the
        # zero weight additionally keeps the cumsums NaN-free).
        bad_f = jnp.where((joint0[:, None] - delta) < joint_w, zero, one)
        jmax = jnp.maximum(
            jnp.max(
                jnp.where(jnp.isfinite(joint_w), joint_w, -jnp.inf), axis=1
            ),
            joint0,
        )
        w_f = jnp.where(
            jnp.isfinite(joint_w), jnp.exp(joint_w - jmax[:, None]), zero
        )
        w_init = jnp.exp(joint0 - jmax)  # the initial leaf, same scaling
    else:
        bad_f = jnp.where((logu[:, None] - delta) < joint_w, zero, one)
        valid_f = jnp.where(logu[:, None] < joint_w, one, zero)
    a_w = jnp.minimum(one, jnp.exp(joint_w - joint0[:, None]))

    # Block-triangular cumulation matrices, one pair per level: forward
    # (travel = ascending window) and reverse, restricted to size-L blocks.
    _idx = _np.arange(T)
    _tri = {}
    for j in range(J):
        L = 1 << j
        same = (_idx[:, None] >> j) == (_idx[None, :] >> j)
        _tri[j] = (
            jnp.asarray((same & (_idx[:, None] <= _idx[None, :])), dtype),
            jnp.asarray((same & (_idx[:, None] >= _idx[None, :])), dtype),
        )

    # Node-failure masks: a level-k node's turned bit, placed at the leaf
    # whose evaluation completes it in travel order (its window-max leaf
    # when travelling forward, window-min when backward).  Built up level
    # by level so that doubling j only ever sees node levels 1..j.
    nf_plus = jnp.zeros((B, T), dtype)
    nf_minus = jnp.zeros((B, T), dtype)

    # -- retrospective doubling loop (all [B, T]-sized ops) -----------------
    # ``n`` is the trajectory total: slice-valid leaf count (int), or the
    # shifted weight total (float) in multinomial mode.
    n = w_init if multinomial else jnp.ones((B,), jnp.int32)
    s = jnp.ones((B,), bool)
    prop_w = offset
    diverged = jnp.zeros((B,), bool)
    depth = jnp.zeros((B,), jnp.int32)
    # Dynamic-tree init: alpha = 0, n_alpha = 1 (only read if J were 0).
    alpha_last = jnp.zeros((B,), dtype)
    n_alpha_last = jnp.ones((B,), jnp.int32)

    for j in range(J):
        L = 1 << j
        if j >= 1:
            lvl = jnp.repeat(tb_lvl[j], L, axis=1)  # [B, T], static repeat
            is_last = jnp.asarray((_idx % L) == (L - 1), dtype)[None, :]
            is_first = jnp.asarray((_idx % L) == 0, dtype)[None, :]
            nf_plus = jnp.maximum(nf_plus, lvl * is_last)
            nf_minus = jnp.maximum(nf_minus, lvl * is_first)

        executed = s
        v_neg = ((offset >> j) & 1) == 1  # direction of doubling j
        vcol = v_neg[:, None]
        # active sibling block: the size-L dyadic block adjacent to the
        # current window (= the level-j block containing the initial leaf,
        # with its last index bit flipped)
        active = jnp.where(
            (Wv >> j) == ((offset >> j) ^ 1)[:, None], one, zero
        )  # [B, T] {0,1}

        # first-failure prefix within every block, both travel orientations
        fail_p = jnp.maximum(bad_f, nf_plus)
        fail_m = jnp.maximum(bad_f, nf_minus)
        cs_p = fail_p @ _tri[j][0]
        cs_m = fail_m @ _tri[j][1]
        ev_p = jnp.where(cs_p - fail_p < 0.5, one, zero)
        ev_m = jnp.where(cs_m - fail_m < 0.5, one, zero)
        ev = jnp.where(vcol, ev_m, ev_p) * active  # evaluated leaves [B, T]
        ff = ev * jnp.where(vcol, fail_m, fail_p)  # the first failing leaf

        any_fail = rowsum(ff) > 0.5
        s_sub = ~any_fail
        # dual-averaging statistics over evaluated leaves (early exit at
        # the first failing leaf, like the dynamic builder); a_w can be
        # NaN at the failing leaf — where-select, then sum
        alpha_j = rowsum(jnp.where(ev > 0.5, a_w, zero), exact=True)
        n_alpha_j = rowsum(ev).astype(jnp.int32)
        div_j = rowsum(ff * bad_f) > 0.5

        if multinomial:
            # multinomial pick ∝ w over the subtree: first weighted-cumsum
            # crossing of τ = u·W_sub.  Real-valued operands are not
            # bf16-exact, so the weight reductions run at HIGHEST (the
            # {0,1}/index rowsums elsewhere stay at the exact default).
            evw = ev * w_f
            w_sub = rowsum(evw, exact=True)
            hi = jax.lax.Precision.HIGHEST
            cum = jnp.where(
                vcol,
                jnp.matmul(evw, _tri[j][1], precision=hi),
                jnp.matmul(evw, _tri[j][0], precision=hi),
            )
            tau = (u_sel[:, j] * w_sub)[:, None]
            pick = active * jnp.where(
                (cum >= tau) & (cum - evw < tau), one, zero
            )
            w_pick = rowsum(pick * Wf).astype(jnp.int32)
            # across-doubling swap w.p. min(1, W'/W); the rowsum(pick)
            # guard covers the measure-~1e-7 f32 corner where τ rounds
            # past the last cumsum entry and no leaf crosses.
            take = (
                s_sub
                & (u_swap[:, j] * n < w_sub)
                & (rowsum(pick) > 0.5)
            )
            n_add = w_sub
        else:
            n_sub_f = rowsum(ev * valid_f)
            n_sub = n_sub_f.astype(jnp.int32)

            # uniform proposal among slice-valid leaves (== reservoir law):
            # the first n_sub valid leaves in travel order are exactly the
            # valid evaluated ones, so an unmasked travel cumsum suffices
            k_idx = jnp.minimum(
                (u_sel[:, j] * n_sub_f).astype(jnp.int32),
                jnp.maximum(n_sub - 1, 0),
            )
            cum = jnp.where(vcol, valid_f @ _tri[j][1], valid_f @ _tri[j][0])
            k1 = (k_idx + 1).astype(dtype)[:, None]
            pick = valid_f * active * jnp.where(
                jnp.abs(cum - k1) < 0.5, one, zero
            )
            w_pick = rowsum(pick * Wf).astype(jnp.int32)

            # across-doubling swap w.p. min(1, n'/n)
            take = s_sub & (u_swap[:, j] * n.astype(dtype) < n_sub_f)
            n_add = n_sub
        prop_w = jnp.where(executed & take, w_pick, prop_w)

        # global U-turn across the merged window = the level-(j+1) dyadic
        # block containing the initial leaf (one-hot select, no gather)
        gsel = jnp.where(
            jnp.arange(T >> (j + 1), dtype=jnp.int32)[None, :]
            == (offset >> (j + 1))[:, None],
            one,
            zero,
        )
        g_turn = rowsum_k(gsel * tb_lvl[j + 1], j + 1) > 0.5
        s_new = s_sub & ~g_turn

        diverged = diverged | (executed & div_j)
        n = jnp.where(executed, n + n_add, n)
        alpha_last = jnp.where(executed, alpha_j, alpha_last)
        n_alpha_last = jnp.where(executed, n_alpha_j, n_alpha_last)
        depth = depth + executed.astype(jnp.int32)
        s = executed & s_new

    # -- materialize the accepted proposal ----------------------------------
    # One-hot *where*-select, not an arithmetic one-hot contraction: leaves
    # past a divergence can hold ±Inf/NaN, and Inf·0 = NaN would poison the
    # sum (observed: the first warmup mass-window's transient large-ε phase
    # overflowed unselected leaves and NaN'd the whole batch).
    slot_pick = rowsum(
        jnp.where(Wv == prop_w[:, None], one, zero) * perm.astype(dtype)
    ).astype(jnp.int32)  # [B] — one-hot, not perm[arange(B), prop_w] (gather)
    onehot = (
        jnp.arange(T, dtype=jnp.int32)[None, :] == slot_pick[:, None]
    )[:, :, None]  # [B, T, 1] bool
    pos_new = jnp.sum(jnp.where(onehot, pos_all, 0.0), axis=1)
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
