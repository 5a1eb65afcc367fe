"""On-device NUTS building blocks: mass-matrix ops, leapfrog, step-size
search, and iterative tree doubling.

TPU-native rebuild of the reference's NUTS core (generic_nuts.rs).  The
reference builds trajectory trees *recursively* on the host with a device
sync per leapfrog (build_tree_with_mass, generic_nuts.rs:1153-1341; the code
itself flags this as slow on GPU, nuts.rs:215-216).  Here the whole
trajectory lives on device: tree doubling is an **iterative**
``lax.while_loop`` using the O(max_depth) checkpoint-stack scheme for U-turn
detection (Phan & Pradhan's iterative NUTS formulation, as used by NumPyro —
see PAPERS.md), so a full NUTS step for *all* chains is one fused XLA
computation under ``vmap``.

Semantics preserved from the reference (same acceptance distribution):

- slice variable ``logu = joint₀ - Exp(1)`` (generic_nuts.rs:764-768);
- leaf weight ``n' = 1[logu < joint]`` and divergence check
  ``(logu - Δ_max) < joint`` with Δ_max = 1000 (generic_nuts.rs:1198-1199);
- progressive uniform sampling over valid leaves (the recursive pairwise
  ``n₂/(n₁+n₂)`` swaps compose to uniform; realized here as reservoir
  sampling), and across-doubling swaps with probability ``min(1, n'/n)``
  (generic_nuts.rs:860-868);
- dual-averaging statistics ``α, n_α`` taken from the *last* subtree built
  (generic_nuts.rs:819-820, 855-856);
- U-turn criterion via mass-weighted velocities
  ``(θ⁺-θ⁻)·M⁻¹p^± ≥ 0`` (generic_nuts.rs:1357-1378).

Deviations (documented): trajectory depth is capped at ``max_depth``
(Stan-style; the reference doubles unboundedly), and the RNG stream is
Threefry-based so individual draws differ from the reference's SmallRng.

Beyond-reference extension (``multinomial=True``, off by default): Stan's
modern multinomial/biased-progressive proposal (Betancourt 2017, app. A.3;
Stan ``base_nuts``) instead of the reference's slice sampler.  Same
trajectories and U-turn rule; what changes is the proposal law —

- leaf weight ``w = exp(joint - joint₀)`` replaces the 0/1 slice
  indicator (the slice variable is still *drawn* so the RNG stream stays
  aligned across modes, but its value is unused);
- within a subtree, progressive weighted reservoir sampling (replace the
  running proposal with leaf i w.p. ``wᵢ / Σ_{k≤i} w_k``) composes to a
  multinomial draw ∝ w over the subtree's leaves;
- across doublings, the new subtree's proposal is taken with the biased
  probability ``min(1, W'/W)`` (favoring jumps away from the start);
- divergence is ``joint - joint₀ < -Δ_max`` (the slice check with
  ``logu`` replaced by ``joint₀``).

All weight accounting runs in log space (``logaddexp`` totals,
``log u < lw' - lw`` comparisons), so large energy errors cannot
overflow the f32 weights.

All functions here are written for a **single chain** and vmapped by the
sampler; JAX's while_loop batching rule handles divergent per-chain control
flow by masked execution.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "MassMatrix",
    "identity_mass",
    "kinetic_energy",
    "inv_mass_mul",
    "sample_momentum",
    "leapfrog_chain",
    "find_reasonable_epsilon",
    "build_subtree",
    "nuts_tree_step",
    "SubtreeResult",
    "TreeStepResult",
]

DELTA_MAX = 1000.0  # divergence threshold (generic_nuts.rs:1199)


class MassMatrix(NamedTuple):
    """Per-chain mass matrix (generic_nuts.rs:177-304).

    ``inv`` is M⁻¹ ([d] diagonal or [d, d] dense); ``scale`` maps standard
    normals to momenta (sqrt of the diagonal, or the Cholesky factor of M).
    Identity is represented as a diagonal of ones; diagonal vs dense is a
    static (trace-time) choice via the ``dense`` flag threaded through.
    """

    inv: jax.Array
    scale: jax.Array


def identity_mass(dim: int, dense: bool, dtype=jnp.float32) -> MassMatrix:
    if dense:
        eye = jnp.eye(dim, dtype=dtype)
        return MassMatrix(inv=eye, scale=eye)
    ones = jnp.ones(dim, dtype)
    return MassMatrix(inv=ones, scale=ones)


def inv_mass_mul(mass: MassMatrix, p: jax.Array, dense: bool) -> jax.Array:
    """v = M⁻¹ p (generic_nuts.rs:258-276)."""
    if dense:
        return mass.inv @ p
    return mass.inv * p


def kinetic_energy(mass: MassMatrix, p: jax.Array, dense: bool) -> jax.Array:
    """½ pᵀ M⁻¹ p (generic_nuts.rs:227-256)."""
    return 0.5 * jnp.dot(p, inv_mass_mul(mass, p, dense))


def sample_momentum(key, mass: MassMatrix, dense: bool) -> jax.Array:
    """p = scale · z with z ~ N(0, I) (generic_nuts.rs:278-304)."""
    d = mass.inv.shape[-1]
    z = jax.random.normal(key, (d,), mass.inv.dtype)
    if dense:
        return mass.scale @ z
    return mass.scale * z


def leapfrog_chain(vg_fn: Callable, pos, mom, grad, eps, mass: MassMatrix,
                   dense: bool):
    """One leapfrog step for one chain (leapfrog_with_mass,
    generic_nuts.rs:1396-1418): half-kick, mass-weighted drift, re-grad,
    half-kick.  ``eps`` carries the direction sign.  Returns
    ``(pos, mom, logp, grad)``.
    """
    half = eps * 0.5
    mom = mom + grad * half
    pos = pos + inv_mass_mul(mass, mom, dense) * eps
    logp, grad = vg_fn(pos)
    # Pin the computation dtype to the position dtype: under x64, targets
    # with f64 parameters would otherwise promote an f32 sampling run.
    logp = logp.astype(pos.dtype)
    grad = grad.astype(pos.dtype)
    mom = mom + grad * half
    return pos, mom, logp, grad


def _all_finite(x) -> jax.Array:
    return jnp.all(jnp.isfinite(x))


def find_reasonable_epsilon(vg_fn: Callable, position, mom, mass: MassMatrix,
                            dense: bool):
    """Heuristic initial step size (find_reasonable_epsilon_with_mass,
    generic_nuts.rs:1025-1102): halve ε until the first leapfrog is finite,
    then double/halve until the log-acceptance crosses ln(1/2).

    Golden behavior: standard normal at [0, 1] with momentum [1, 0] yields
    exactly ε = 2.0 (nuts.rs:508-519).
    """
    dtype = position.dtype
    one = jnp.asarray(1.0, dtype)
    ln_half = jnp.log(jnp.asarray(0.5, dtype))

    ulogp, grad = vg_fn(position)

    def try_eps(eps):
        p, m, lp, g = leapfrog_chain(vg_fn, position, mom, grad, eps, mass, dense)
        return p, m, lp, g

    # Phase 1: shrink until finite (generic_nuts.rs:1057-1070).
    _, mom1, lp1, grad1 = try_eps(one)

    def finite_cond(carry):
        k, lp_p, grad_p, _ = carry
        return ~(jnp.isfinite(lp_p) & _all_finite(grad_p))

    def finite_body(carry):
        k, _, _, _ = carry
        k = k * 0.5
        _, m_p, lp_p, g_p = try_eps(one * k)
        return k, lp_p, g_p, m_p

    k, lp_prime, grad_prime, mom_prime = jax.lax.while_loop(
        finite_cond, finite_body, (one, lp1, grad1, mom1)
    )

    eps = 0.5 * k  # epsilon = half * k * 1.0 (generic_nuts.rs:1072)
    ke0 = kinetic_energy(mass, mom, dense)
    log_accept = lp_prime - ulogp - (kinetic_energy(mass, mom_prime, dense) - ke0)
    a = jnp.where(log_accept > ln_half, one, -one)

    # Phase 2: geometric search until crossing ln(1/2)
    # (generic_nuts.rs:1083-1099).
    def cross_cond(carry):
        eps, log_accept = carry
        return a * log_accept > -a * jnp.log(jnp.asarray(2.0, dtype))

    def cross_body(carry):
        eps, _ = carry
        eps = eps * jnp.asarray(2.0, dtype) ** a
        _, m_p, lp_p, _ = try_eps(eps)
        la = lp_p - ulogp - (kinetic_energy(mass, m_p, dense) - ke0)
        return eps, la

    eps, _ = jax.lax.while_loop(cross_cond, cross_body, (eps, log_accept))
    return eps


# ---------------------------------------------------------------------------
# Iterative tree building
# ---------------------------------------------------------------------------


def _trailing_ones(i):
    ip1 = i + 1
    return jax.lax.population_count((ip1 & -ip1) - 1)


def _ckpt_idx_max(i):
    # number of set bits of the leaf index excluding the lowest bit
    return jax.lax.population_count(i >> 1)


class SubtreeResult(NamedTuple):
    end_pos: jax.Array
    end_mom: jax.Array
    end_grad: jax.Array
    first_pos: jax.Array  # state after the first leapfrog (the near edge)
    first_mom: jax.Array
    first_grad: jax.Array
    prop_pos: jax.Array
    prop_lp: jax.Array
    prop_grad: jax.Array
    n: jax.Array  # number of slice-valid leaves (multinomial: log Σ w, f32)
    s: jax.Array  # subtree still valid (no U-turn, no divergence)
    diverged: jax.Array
    alpha: jax.Array  # Σ min(1, exp(joint - joint₀)) over evaluated leaves
    n_alpha: jax.Array


def build_subtree(
    key,
    pos,
    mom,
    grad,
    v,
    depth,
    eps,
    logu,
    joint0,
    mass: MassMatrix,
    dense: bool,
    vg_fn: Callable,
    max_depth: int,
    collect_edges: bool = False,
    ckpt_dtype=None,
    multinomial: bool = False,
) -> SubtreeResult:
    """Build one subtree of 2^depth leapfrog leaves in direction ``v`` from
    the endpoint ``(pos, mom, grad)``.  Precondition: ``depth < max_depth``
    (the checkpoint stack is sized max_depth-1 — callers double at
    j = 0..max_depth-1, and nuts_tree_step peels j=0).

    Iterative equivalent of build_tree_with_mass (generic_nuts.rs:1153-1341):
    leaves are produced left-to-right in travel order; internal-node U-turn
    checks use a checkpoint stack of at most ``max_depth`` saved states, with
    even leaves pushed at slot popcount(i>>1) and odd leaves checked against
    slots [idx_min, idx_max] — exactly the nodes of the binary tree that end
    at that leaf.  Early exit on divergence or U-turn reproduces the
    recursion's short-circuit (generic_nuts.rs:1251).

    Bandwidth notes (this loop is HBM-bound at 10k-chain batches): stack
    writes are *unconditional* dynamic-slice updates — odd leaves write to a
    spare slot — so no full-stack select copies ever materialize; the stack
    holds (position, velocity, position·velocity) so each U-turn check is
    two [slots, d] matvecs against values already stored.  On the hot path
    (``collect_edges=False``) the proposal's log-density and gradient are
    NOT carried through the loop: only ``prop_pos`` rides the carry, and
    :func:`nuts_tree_step` re-derives ``(lp, grad)`` from the selected
    position once per transition — trading one extra gradient eval per
    transition (~6% at depth 4) for two fewer [d] buffers streamed through
    every leaf-pair iteration of both loops (round-3 carry-slimming;
    ``prop_lp``/``prop_grad`` in the result are zeros then).
    ``collect_edges`` additionally tracks the first-leaf state and the
    in-loop ``prop_lp``/``prop_grad`` (golden tests / reference parity
    only; off on the hot path).
    """
    dtype = pos.dtype
    d = pos.shape[0]
    n_leaves = jnp.asarray(1, jnp.int32) << depth
    eps_v = eps * v.astype(dtype)
    vf = v.astype(dtype)
    delta_max = jnp.asarray(DELTA_MAX, dtype)
    one = jnp.asarray(1.0, dtype)
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    # Divergence reference: the slice variable in slice mode, joint₀ in
    # multinomial mode (module docstring, "Beyond-reference extension").
    div_ref = joint0 if multinomial else logu

    # One checkpoint slot per level.  Slot count: a subtree built at
    # doubling j has depth j ≤ max_depth-1 (the j=0 doubling is peeled),
    # and a depth-js subtree's max slot index is popcount(i>>1) ≤ js-1 —
    # so max_depth-1 slots suffice, one fewer than the doubling cap.  At
    # the HBM-bound bench config (cap 4) that is 2 fewer [d] buffers
    # streamed through every leaf-pair iteration (round-3 carry-slimming;
    # stack contents and RNG are unchanged, trajectories bit-identical).
    # ``ckpt_dtype`` (e.g. bf16) stores the stacks at reduced precision:
    # they feed only the U-turn SIGN tests, which tolerate ~3 decimal
    # digits — halving the dominant stack traffic in the subtree carry.
    # Documented deviation: U-turn decisions near the zero boundary may
    # differ from the f32 path (statistically negligible; R-hat/min-ESS
    # gated on the benchmark).
    n_slots = max(1, max_depth - 1)
    ck_dtype = dtype if ckpt_dtype is None else ckpt_dtype
    zerod = jnp.zeros((d,), dtype)

    init = dict(
        i=jnp.asarray(0, jnp.int32),
        pos=pos,
        mom=mom,
        grad=grad,
        prop_pos=zerod,
        n=neg_inf if multinomial else jnp.asarray(0, jnp.int32),
        s=jnp.asarray(True),
        diverged=jnp.asarray(False),
        alpha=jnp.asarray(0.0, dtype),
        n_alpha=jnp.asarray(0, jnp.int32),
        pos_ck=jnp.zeros((n_slots, d), ck_dtype),
        vel_ck=jnp.zeros((n_slots, d), ck_dtype),
        c1_ck=jnp.zeros((n_slots,), dtype),
        key=key,
    )
    if collect_edges:
        init.update(
            first_pos=zerod, first_mom=zerod, first_grad=zerod,
            prop_lp=jnp.asarray(0.0, dtype), prop_grad=zerod,
        )

    def cond(c):
        return (c["i"] < n_leaves) & c["s"]

    def body(c):
        """Process one even/odd leaf pair per iteration.

        Leaves are evaluated in travel order exactly as in the one-leaf
        formulation, but the checkpoint store (even leaf) and the U-turn
        check (odd leaf) each happen once per iteration instead of being
        masked per leaf — halving the stack traffic per leapfrog.  The odd
        leaf's contributions are masked out when the even leaf diverged or
        the subtree has a single leaf (depth 0).
        """
        i = c["i"]  # even
        key, k_a, k_b = jax.random.split(c["key"], 3)

        # --- leaf A (even): leapfrog + slice accounting + ckpt store -----
        pA, mA, lpA, gA = leapfrog_chain(
            vg_fn, c["pos"], c["mom"], c["grad"], eps_v, mass, dense
        )
        velA = inv_mass_mul(mass, mA, dense)
        jointA = lpA - 0.5 * jnp.dot(mA, velA)
        okA = (div_ref - delta_max) < jointA
        uA = jax.random.uniform(k_a, (), dtype)
        if multinomial:
            # Weighted reservoir: replace w.p. w_A / Σ_{k≤A} w_k, in log
            # space.  A -inf/-inf (empty-total) comparison is NaN → False,
            # which the (i == 0) guard covers for the first leaf.
            lwA = jnp.where(jnp.isfinite(jointA), jointA - joint0, neg_inf)
            nA = jnp.logaddexp(c["n"], lwA)
            takeA = (i == 0) | (jnp.log(uA) < lwA - nA)
        else:
            validA = logu < jointA
            nA = c["n"] + validA.astype(jnp.int32)
            takeA = (i == 0) | (validA & (uA * nA.astype(dtype) < one))
        prop_pos = jnp.where(takeA, pA, c["prop_pos"])

        slot = _ckpt_idx_max(i)  # popcount(i >> 1)
        slots = jnp.arange(n_slots)
        onehot = (slots == slot)[:, None]
        dotA = jnp.dot(pA, velA)
        pos_ck = jnp.where(onehot, pA[None, :].astype(ck_dtype), c["pos_ck"])
        vel_ck = jnp.where(onehot, velA[None, :].astype(ck_dtype), c["vel_ck"])
        c1_ck = jnp.where(onehot[:, 0], dotA, c["c1_ck"])

        # --- leaf B (odd): leapfrog + slice accounting + U-turn check ---
        has_b = i + 1 < n_leaves
        do_b = okA & has_b
        pB, mB, lpB, gB = leapfrog_chain(vg_fn, pA, mA, gA, eps_v, mass, dense)
        velB = inv_mass_mul(mass, mB, dense)
        jointB = lpB - 0.5 * jnp.dot(mB, velB)
        okB = (div_ref - delta_max) < jointB
        uB = jax.random.uniform(k_b, (), dtype)
        if multinomial:
            lwB = jnp.where(
                do_b & jnp.isfinite(jointB), jointB - joint0, neg_inf
            )
            nB = jnp.logaddexp(nA, lwB)
            takeB = jnp.log(uB) < lwB - nB
        else:
            validB = (logu < jointB) & do_b
            nB = nA + validB.astype(jnp.int32)
            takeB = validB & (uB * nB.astype(dtype) < one)
        prop_pos = jnp.where(takeB, pB, prop_pos)

        alpha = c["alpha"] + jnp.minimum(one, jnp.exp(jointA - joint0))
        alpha = alpha + jnp.where(
            do_b, jnp.minimum(one, jnp.exp(jointB - joint0)), 0.0
        )
        n_alpha = c["n_alpha"] + 1 + do_b.astype(jnp.int32)

        # U-turn nodes ending at odd leaf i+1: slots [idx_min, idx_max]
        # with idx_max = popcount((i+1) >> 1) = popcount(i >> 1) = slot,
        # so the check always includes the just-stored leaf A.
        idx_min = slot - _trailing_ones(i + 1) + 1
        active = (slots >= idx_min) & (slots <= slot)
        dotB = jnp.dot(pB, velB)
        dots_ck = vf * (
            jnp.sum(vel_ck.astype(dtype) * pB[None, :], axis=1) - c1_ck
        )
        dots_cur = vf * (
            dotB - jnp.sum(pos_ck.astype(dtype) * velB[None, :], axis=1)
        )
        turned = jnp.any(active & ((dots_ck < 0.0) | (dots_cur < 0.0)))
        okB2 = okB & ~turned

        # pair outcome: endpoint is B when evaluated, else A
        end_pos = jnp.where(do_b, pB, pA)
        end_mom = jnp.where(do_b, mB, mA)
        end_grad = jnp.where(do_b, gB, gA)
        s = okA & (~has_b | okB2)
        diverged = c["diverged"] | ~okA | (do_b & ~okB)

        out = dict(
            i=i + 2,
            pos=end_pos,
            mom=end_mom,
            grad=end_grad,
            prop_pos=prop_pos,
            n=nB,
            s=s,
            diverged=diverged,
            alpha=alpha,
            n_alpha=n_alpha,
            pos_ck=pos_ck,
            vel_ck=vel_ck,
            c1_ck=c1_ck,
            key=key,
        )
        if collect_edges:
            first = i == 0
            out.update(
                first_pos=jnp.where(first, pA, c["first_pos"]),
                first_mom=jnp.where(first, mA, c["first_mom"]),
                first_grad=jnp.where(first, gA, c["first_grad"]),
                prop_lp=jnp.where(takeB, lpB, jnp.where(takeA, lpA, c["prop_lp"])),
                prop_grad=jnp.where(takeB, gB, jnp.where(takeA, gA, c["prop_grad"])),
            )
        return out

    out = jax.lax.while_loop(cond, body, init)
    return SubtreeResult(
        end_pos=out["pos"],
        end_mom=out["mom"],
        end_grad=out["grad"],
        first_pos=out.get("first_pos", zerod),
        first_mom=out.get("first_mom", zerod),
        first_grad=out.get("first_grad", zerod),
        prop_pos=out["prop_pos"],
        prop_lp=out.get("prop_lp", jnp.asarray(0.0, dtype)),
        prop_grad=out.get("prop_grad", zerod),
        n=out["n"],
        s=out["s"],
        diverged=out["diverged"],
        alpha=out["alpha"],
        n_alpha=out["n_alpha"],
    )


def _stop_criterion(pos_m, pos_p, mom_m, mom_p, mass, dense):
    """Global U-turn check (stop_criterion_with_mass,
    generic_nuts.rs:1357-1378)."""
    diff = pos_p - pos_m
    ok_m = jnp.dot(diff, inv_mass_mul(mass, mom_m, dense)) >= 0.0
    ok_p = jnp.dot(diff, inv_mass_mul(mass, mom_p, dense)) >= 0.0
    return ok_m & ok_p


class TreeStepResult(NamedTuple):
    pos: jax.Array
    lp: jax.Array
    grad: jax.Array
    alpha: jax.Array  # last-subtree Σα (dual-averaging numerator)
    n_alpha: jax.Array
    depth: jax.Array  # number of doublings performed
    diverged: jax.Array
    leapfrogs: jax.Array  # total gradient evaluations this step


def _first_doubling(c, eps, logu, joint0, mass, dense, vg_fn,
                    multinomial=False):
    """The j=0 doubling as straight-line code: one leapfrog, no checkpoint
    stack, no leaf-B evaluation.  Consumes the same outer key splits as the
    generic loop body, so the transition's RNG stream (and therefore the
    whole trajectory) is bit-identical to the un-peeled version."""
    dtype = c["pos_m"].dtype
    one = jnp.asarray(1.0, dtype)
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    key, kv, kswap, _ktree = jax.random.split(c["key"], 4)
    v = jnp.where(
        jax.random.uniform(kv, (), dtype) < 0.5,
        jnp.asarray(-1, jnp.int32),
        jnp.asarray(1, jnp.int32),
    )
    backward = v == -1
    eps_v = eps * v.astype(dtype)

    pA, mA, lpA, gA = leapfrog_chain(
        vg_fn, c["pos_m"], c["mom_m"], c["grad_m"], eps_v, mass, dense
    )
    jointA = lpA - 0.5 * jnp.dot(mA, inv_mass_mul(mass, mA, dense))
    div_ref = joint0 if multinomial else logu
    okA = (div_ref - jnp.asarray(DELTA_MAX, dtype)) < jointA
    alphaA = jnp.minimum(one, jnp.exp(jointA - joint0))

    pos_m = jnp.where(backward, pA, c["pos_m"])
    mom_m = jnp.where(backward, mA, c["mom_m"])
    grad_m = jnp.where(backward, gA, c["grad_m"])
    pos_p = jnp.where(backward, c["pos_p"], pA)
    mom_p = jnp.where(backward, c["mom_p"], mA)
    grad_p = jnp.where(backward, c["grad_p"], gA)

    u = jax.random.uniform(kswap, (), dtype)
    if multinomial:
        lwA = jnp.where(jnp.isfinite(jointA), jointA - joint0, neg_inf)
        take = okA & (jnp.log(u) < lwA - c["n"])  # c["n"] = log W = 0 here
        n_new = jnp.logaddexp(c["n"], lwA)
    else:
        nA = (logu < jointA).astype(jnp.int32)
        take = okA & (u * c["n"].astype(dtype) < nA.astype(dtype))
        n_new = c["n"] + nA
    s = okA & _stop_criterion(pos_m, pos_p, mom_m, mom_p, mass, dense)
    return dict(
        j=c["j"] + 1,
        key=key,
        pos_m=pos_m,
        mom_m=mom_m,
        grad_m=grad_m,
        pos_p=pos_p,
        mom_p=mom_p,
        grad_p=grad_p,
        prop_pos=jnp.where(take, pA, c["prop_pos"]),
        n=n_new,
        s=s,
        diverged=c["diverged"] | ~okA,
        alpha=alphaA,
        n_alpha=jnp.asarray(1, jnp.int32),
        leapfrogs=c["leapfrogs"] + 1,
    )


def nuts_tree_step(
    key,
    pos,
    lp,
    grad,
    eps,
    mass: MassMatrix,
    dense: bool,
    vg_fn: Callable,
    max_depth: int,
    ckpt_dtype=None,
    multinomial: bool = False,
) -> TreeStepResult:
    """One full NUTS transition for one chain (GenericNUTSChain::step,
    generic_nuts.rs:755-880): sample momentum and slice variable, then double
    the trajectory in random directions until U-turn/divergence (or the
    ``max_depth`` cap).  With ``multinomial=True``, Stan's multinomial
    proposal replaces the slice sampler (module docstring); the slice
    variable is still drawn so the RNG stream is identical across modes."""
    dtype = pos.dtype
    k_mom, k_slice, k_loop = jax.random.split(key, 3)
    mom0 = sample_momentum(k_mom, mass, dense)
    joint0 = lp - kinetic_energy(mass, mom0, dense)
    logu = joint0 - jax.random.exponential(k_slice, (), dtype)

    init = dict(
        j=jnp.asarray(0, jnp.int32),
        key=k_loop,
        pos_m=pos,
        mom_m=mom0,
        grad_m=grad,
        pos_p=pos,
        mom_p=mom0,
        grad_p=grad,
        prop_pos=pos,
        # log W = 0 (the initial leaf's weight exp(joint₀-joint₀) = 1) in
        # multinomial mode; the slice-valid leaf count (the initial leaf is
        # always slice-valid) otherwise.
        n=jnp.asarray(0.0, dtype) if multinomial else jnp.asarray(1, jnp.int32),
        s=jnp.asarray(True),
        diverged=jnp.asarray(False),
        alpha=jnp.asarray(0.0, dtype),
        n_alpha=jnp.asarray(1, jnp.int32),
        leapfrogs=jnp.asarray(0, jnp.int32),
    )
    if max_depth == 0:
        return TreeStepResult(
            pos=pos, lp=lp, grad=grad, alpha=init["alpha"],
            n_alpha=init["n_alpha"], depth=init["j"],
            diverged=init["diverged"], leapfrogs=init["leapfrogs"],
        )
    # Peel the first doubling (every chain runs it exactly once): its
    # subtree is a single leaf, and the generic pair-iteration in
    # build_subtree would evaluate a second, discarded leapfrog for it
    # (leaf B masked by ``has_b``) — under vmap that is a wasted gradient
    # eval for the whole batch on every transition.  The straight-line
    # single-leaf form below consumes the same outer key splits, so the
    # RNG stream is identical to the un-peeled loop; values agree up to
    # XLA fusion rounding (a few ulp — FMA contraction differs between
    # the loop body and straight-line compilations).
    init = _first_doubling(init, eps, logu, joint0, mass, dense, vg_fn,
                           multinomial=multinomial)

    def cond(c):
        return c["s"] & (c["j"] < max_depth)

    def body(c):
        key, kv, kswap, ktree = jax.random.split(c["key"], 4)
        v = jnp.where(
            jax.random.uniform(kv, (), dtype) < 0.5,
            jnp.asarray(-1, jnp.int32),
            jnp.asarray(1, jnp.int32),
        )
        backward = v == -1
        pos0 = jnp.where(backward, c["pos_m"], c["pos_p"])
        mom0_ = jnp.where(backward, c["mom_m"], c["mom_p"])
        grad0 = jnp.where(backward, c["grad_m"], c["grad_p"])

        sub = build_subtree(
            ktree, pos0, mom0_, grad0, v, c["j"], eps, logu, joint0, mass,
            dense, vg_fn, max_depth, ckpt_dtype=ckpt_dtype,
            multinomial=multinomial,
        )

        pos_m = jnp.where(backward, sub.end_pos, c["pos_m"])
        mom_m = jnp.where(backward, sub.end_mom, c["mom_m"])
        grad_m = jnp.where(backward, sub.end_grad, c["grad_m"])
        pos_p = jnp.where(backward, c["pos_p"], sub.end_pos)
        mom_p = jnp.where(backward, c["mom_p"], sub.end_mom)
        grad_p = jnp.where(backward, c["grad_p"], sub.end_grad)

        # Across-doubling swap w.p. min(1, n'/n) (generic_nuts.rs:860-868);
        # multinomial mode: the biased-progressive min(1, W'/W), log space.
        u = jax.random.uniform(kswap, (), dtype)
        if multinomial:
            take = sub.s & (jnp.log(u) < sub.n - c["n"])
            n_new = jnp.logaddexp(c["n"], sub.n)
        else:
            take = sub.s & (u * c["n"].astype(dtype) < sub.n.astype(dtype))
            n_new = c["n"] + sub.n
        prop_pos = jnp.where(take, sub.prop_pos, c["prop_pos"])

        s = sub.s & _stop_criterion(pos_m, pos_p, mom_m, mom_p, mass, dense)
        return dict(
            j=c["j"] + 1,
            key=key,
            pos_m=pos_m,
            mom_m=mom_m,
            grad_m=grad_m,
            pos_p=pos_p,
            mom_p=mom_p,
            grad_p=grad_p,
            prop_pos=prop_pos,
            n=n_new,
            s=s,
            diverged=c["diverged"] | sub.diverged,
            alpha=sub.alpha,
            n_alpha=sub.n_alpha,
            leapfrogs=c["leapfrogs"] + sub.n_alpha,
        )

    out = jax.lax.while_loop(cond, body, init)
    # Re-derive the selected proposal's log-density and gradient ONCE per
    # transition instead of streaming two [d] proposal buffers through every
    # leaf-pair iteration of both loops (carry-slimming; see build_subtree
    # docstring).  One extra gradient eval per transition, bit-equal values
    # up to XLA fusion rounding.  Not counted in ``leapfrogs`` (that counter
    # mirrors the reference's trajectory gradient evals, the ESS/grad-eval
    # denominator).
    lp_f, grad_f = vg_fn(out["prop_pos"])
    return TreeStepResult(
        pos=out["prop_pos"],
        lp=lp_f.astype(dtype),
        grad=grad_f.astype(dtype),
        alpha=out["alpha"],
        n_alpha=out["n_alpha"],
        depth=out["j"],
        diverged=out["diverged"],
        leapfrogs=out["leapfrogs"],
    )
