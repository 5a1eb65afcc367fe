"""Static-window NUTS backend: numpy-oracle differential test + statistical
equivalence against the dynamic tree.

The oracle reimplements ops/static_tree.py's schedule in pure numpy for a
single chain, consuming the same explicit randoms via the ``randoms=``
override — every output (proposal, depth, divergence, dual-averaging α/n_α)
must match the batched jax implementation exactly (float tolerance only).
Statistical tests then pin the transition law to the dynamic backend's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu.ops.static_tree import static_nuts_step, uturn_nodes
from general_mcmc_tpu.ops.tree import DELTA_MAX, MassMatrix, nuts_tree_step


def _leapfrog_np(vg, pos, mom, grad, eps):
    half = 0.5 * eps
    mom = mom + grad * half
    pos = pos + _MASS_INV * mom * eps
    lp, g = vg(pos)
    mom = mom + g * half
    return pos, mom, lp, g


_MASS_INV = None  # set per-oracle-call (single-chain diagonal)


def oracle_static_step(vg, pos, lp, grad, eps, mass_inv, J, rnd,
                       multinomial=False):
    """Single-chain numpy oracle of the static schedule."""
    global _MASS_INV
    _MASS_INV = mass_inv
    T = 1 << J
    o = int(rnd["offset"])
    mom0 = rnd["mom0"]
    vel0 = mass_inv * mom0
    joint0 = lp - 0.5 * np.dot(mom0, vel0)
    logu = joint0 - rnd["expo"]

    # integration: o backward steps (-eps), T-1-o forward steps (+eps)
    win_pos = np.zeros((T,) + pos.shape, pos.dtype)
    win_vel = np.zeros_like(win_pos)
    win_joint = np.full((T,), np.nan, pos.dtype)
    win_pos[o], win_vel[o], win_joint[o] = pos, vel0, joint0
    p, m, g = pos, mom0, grad
    for k in range(o):
        p, m, lpk, g = _leapfrog_np(vg, p, m, g, -eps)
        w = o - 1 - k
        win_pos[w] = p
        win_vel[w] = mass_inv * m
        win_joint[w] = lpk - 0.5 * np.dot(m, mass_inv * m)
    p, m, g = pos, mom0, grad
    for k in range(T - 1 - o):
        p, m, lpk, g = _leapfrog_np(vg, p, m, g, eps)
        w = o + 1 + k
        win_pos[w] = p
        win_vel[w] = mass_inv * m
        win_joint[w] = lpk - 0.5 * np.dot(m, mass_inv * m)

    def turned(a, b):  # window order a < b
        diff = win_pos[b] - win_pos[a]
        return (np.dot(win_vel[a], diff) < 0) or (np.dot(win_vel[b], diff) < 0)

    if multinomial:
        # f32 weight arithmetic mirroring the jax op (shift by the window
        # max; non-finite joints get weight 0)
        finite = np.isfinite(win_joint)
        jmax = np.float32(
            max(joint0, win_joint[finite].max() if finite.any() else -np.inf)
        )
        wts = np.where(
            finite, np.exp((win_joint - jmax).astype(np.float32)), 0.0
        ).astype(np.float32)
        n = np.float32(np.exp(np.float32(joint0 - jmax)))
    else:
        n = 1

    lo = hi = o
    s = True
    prop_w, diverged, depth = o, False, 0
    alpha_last, n_alpha_last = 0.0, 1
    for j in range(J):
        if not s:
            break
        L = 1 << j
        v_neg = (o >> j) & 1 == 1
        w_m = [lo - 1 - t if v_neg else hi + 1 + t for t in range(L)]
        joint_t = win_joint[w_m]
        div_ref = joint0 if multinomial else logu
        ok_t = (div_ref - DELTA_MAX) < joint_t
        turned_t = np.zeros(L, bool)
        for (ta, tb) in uturn_nodes(j):
            a, b = sorted((w_m[ta], w_m[tb]))
            turned_t[tb] |= turned(a, b)
        fail = ~ok_t | turned_t
        t_fail = int(np.argmax(fail)) if fail.any() else L - 1
        s_sub = not fail.any()
        evaluated = np.arange(L) <= t_fail
        alpha_last = float(
            np.sum(np.minimum(1.0, np.exp(joint_t[evaluated] - joint0)))
        )
        n_alpha_last = t_fail + 1
        if fail.any() and not ok_t[t_fail]:
            diverged = True
        if multinomial:
            w_t = (wts[w_m] * evaluated).astype(np.float32)
            n_sub = np.float32(w_t.sum(dtype=np.float32))
            if s_sub:
                cum = np.cumsum(w_t, dtype=np.float32)
                tau = np.float32(np.float32(rnd["u_sel"][j]) * n_sub)
                cross = (cum >= tau) & ((cum - w_t) < tau)
                if cross.any() and rnd["u_swap"][j] * n < n_sub:
                    prop_w = w_m[int(np.argmax(cross))]
        else:
            valid_t = logu < joint_t
            n_sub = int(valid_t[evaluated].sum())
            if s_sub and n_sub > 0:
                k_idx = min(int(rnd["u_sel"][j] * n_sub), n_sub - 1)
                t_pick = np.flatnonzero(valid_t)[k_idx]
                if rnd["u_swap"][j] * n < n_sub:
                    prop_w = w_m[t_pick]
        n += n_sub
        depth += 1
        if v_neg:
            lo -= L
        else:
            hi += L
        s = s_sub and not turned(lo, hi)
    return dict(
        pos=win_pos[prop_w],
        alpha=alpha_last,
        n_alpha=n_alpha_last,
        depth=depth,
        diverged=diverged,
    )


def _gaussian(d, dtype=np.float32):
    scales = np.exp(np.linspace(0, np.log(10.0), d)).astype(dtype)

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    def logp_np(x):
        return -0.5 * np.sum((x / scales) ** 2)

    def vg_np(x):
        return logp_np(x), (-x / scales**2).astype(dtype)

    return scales, logp, vg_np


@pytest.mark.parametrize(
    "J,eps_scale,multinomial",
    [(3, 0.8, False), (4, 0.5, False), (1, 1.2, False),
     (3, 0.8, True), (4, 0.5, True), (1, 1.2, True)],
)
def test_oracle_exact(J, eps_scale, multinomial):
    d, B = 6, 96
    scales, logp, vg_np = _gaussian(d)
    vg = jax.value_and_grad(logp)
    rng = np.random.default_rng(J * 100 + 1)
    pos = (rng.standard_normal((B, d)) * scales).astype(np.float32)
    lp, grad = jax.vmap(vg)(jnp.asarray(pos))
    mass_inv = np.broadcast_to(scales**2, (B, d)).astype(np.float32)
    eps = (eps_scale * (0.8 + 0.4 * rng.random(B))).astype(np.float32)
    T = 1 << J
    rnd = dict(
        mom0=(rng.standard_normal((B, d)) / np.sqrt(mass_inv)).astype(np.float32),
        expo=rng.exponential(size=B).astype(np.float32),
        offset=rng.integers(0, T, size=B).astype(np.int32),
        u_sel=rng.random((B, J)).astype(np.float32),
        u_swap=rng.random((B, J)).astype(np.float32),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), B)  # unused with randoms=
    out = static_nuts_step(
        keys,
        jnp.asarray(pos),
        lp.astype(jnp.float32),
        grad.astype(jnp.float32),
        jnp.asarray(eps),
        jnp.asarray(mass_inv),
        1.0 / jnp.sqrt(jnp.asarray(mass_inv)),
        vg,
        J,
        multinomial=multinomial,
        randoms=rnd,
    )
    out = {k: np.asarray(v) for k, v in out._asdict().items()}
    n_div = 0
    for b in range(B):
        ob = oracle_static_step(
            vg_np,
            pos[b],
            float(lp[b]),
            np.asarray(grad[b], np.float32),
            float(eps[b]),
            mass_inv[b],
            J,
            {k: v[b] for k, v in rnd.items()},
            multinomial=multinomial,
        )
        assert out["depth"][b] == ob["depth"], b
        assert out["diverged"][b] == ob["diverged"], b
        assert out["n_alpha"][b] == ob["n_alpha"], b
        np.testing.assert_allclose(out["alpha"][b], ob["alpha"], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(out["pos"][b], ob["pos"], rtol=2e-4, atol=2e-5)
        n_div += int(ob["diverged"])
    assert out["leapfrogs"][0] == T - 1
    # keep the fixture in an interesting regime: some trees must terminate
    # early at J>=3 (depth spread) without everything diverging
    if J >= 3:
        assert len(np.unique(out["depth"])) > 1
        assert n_div < B // 2


def _run_chain_stats(step_fn, pos, lp, grad, steps, key):
    @jax.jit
    def run(pos, lp, grad):
        def body(carry, m):
            pos, lp, grad = carry
            keys = jax.random.split(jax.random.fold_in(key, m), pos.shape[0])
            r = step_fn(keys, pos, lp, grad)
            return (r.pos, r.lp, r.grad), (r.pos, r.alpha / r.n_alpha, r.depth)
        _, ys = jax.lax.scan(body, (pos, lp, grad), jnp.arange(steps))
        return ys

    samples, acc, depth = jax.tree.map(np.asarray, run(pos, lp, grad))
    return samples[steps // 4:], acc[steps // 4:], depth[steps // 4:]


def test_matches_dynamic_law():
    """Same transition law as the dynamic tree: marginal moments, mean
    acceptance statistic, and mean tree depth agree on the ill-conditioned
    Gaussian at a fixed step size and true mass."""
    d, B, steps, J = 8, 384, 300, 3
    scales, logp, _ = _gaussian(d)
    vg = jax.value_and_grad(logp)
    mass_inv = jnp.broadcast_to(jnp.asarray(scales**2), (B, d))
    mass_scale = 1.0 / jnp.sqrt(mass_inv)
    eps = jnp.full((B,), 0.8, jnp.float32)
    rng = np.random.default_rng(7)
    pos = jnp.asarray((rng.standard_normal((B, d)) * scales).astype(np.float32))
    lp, grad = jax.vmap(vg)(pos)
    lp, grad = lp.astype(jnp.float32), grad.astype(jnp.float32)

    def step_static(keys, pos, lp, grad):
        return static_nuts_step(
            keys, pos, lp, grad, eps, mass_inv, mass_scale, vg, J
        )

    mass1 = MassMatrix(inv=jnp.asarray(scales**2), scale=1.0 / jnp.asarray(scales))

    def step_dyn(keys, pos, lp, grad):
        return jax.vmap(
            lambda k, p, l, g: nuts_tree_step(
                k, p, l, g, eps[0], mass1, False, vg, J
            )
        )(keys, pos, lp, grad)

    s_s, a_s, d_s = _run_chain_stats(step_static, pos, lp, grad, steps, jax.random.PRNGKey(1))
    s_d, a_d, d_d = _run_chain_stats(step_dyn, pos, lp, grad, steps, jax.random.PRNGKey(2))

    flat_s = s_s.reshape(-1, d)
    flat_d = s_d.reshape(-1, d)
    np.testing.assert_allclose(flat_s.std(0), scales, rtol=0.05)
    np.testing.assert_allclose(flat_s.std(0), flat_d.std(0), rtol=0.05)
    np.testing.assert_allclose(flat_s.mean(0) / scales, 0.0, atol=0.05)
    assert abs(a_s.mean() - a_d.mean()) < 0.02
    assert abs(d_s.mean() - d_d.mean()) < 0.15


def test_multinomial_matches_dynamic_law():
    """proposal='multinomial': the static schedule and the dynamic tree
    agree in law (marginal moments, acceptance statistic, tree depth) —
    pins the two independent implementations of the Stan-style weighted
    proposal against each other (the numpy oracle pins the static one
    exactly; this test transports that to ops/tree.py's log-space form)."""
    d, B, steps, J = 8, 384, 300, 3
    scales, logp, _ = _gaussian(d)
    vg = jax.value_and_grad(logp)
    mass_inv = jnp.broadcast_to(jnp.asarray(scales**2), (B, d))
    mass_scale = 1.0 / jnp.sqrt(mass_inv)
    eps = jnp.full((B,), 0.8, jnp.float32)
    rng = np.random.default_rng(17)
    pos = jnp.asarray((rng.standard_normal((B, d)) * scales).astype(np.float32))
    lp, grad = jax.vmap(vg)(pos)
    lp, grad = lp.astype(jnp.float32), grad.astype(jnp.float32)

    def step_static(keys, pos, lp, grad):
        return static_nuts_step(
            keys, pos, lp, grad, eps, mass_inv, mass_scale, vg, J,
            multinomial=True,
        )

    mass1 = MassMatrix(inv=jnp.asarray(scales**2), scale=1.0 / jnp.asarray(scales))

    def step_dyn(keys, pos, lp, grad):
        return jax.vmap(
            lambda k, p, l, g: nuts_tree_step(
                k, p, l, g, eps[0], mass1, False, vg, J, multinomial=True
            )
        )(keys, pos, lp, grad)

    s_s, a_s, d_s = _run_chain_stats(step_static, pos, lp, grad, steps,
                                     jax.random.PRNGKey(5))
    s_d, a_d, d_d = _run_chain_stats(step_dyn, pos, lp, grad, steps,
                                     jax.random.PRNGKey(6))

    flat_s = s_s.reshape(-1, d)
    flat_d = s_d.reshape(-1, d)
    np.testing.assert_allclose(flat_s.std(0), scales, rtol=0.05)
    np.testing.assert_allclose(flat_s.std(0), flat_d.std(0), rtol=0.05)
    np.testing.assert_allclose(flat_s.mean(0) / scales, 0.0, atol=0.05)
    assert abs(a_s.mean() - a_d.mean()) < 0.02
    assert abs(d_s.mean() - d_d.mean()) < 0.15


def test_multinomial_end_to_end_both_backends():
    """Full adaptive NUTS with proposal='multinomial' reaches the target
    with healthy diagnostics on both backends."""
    from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed
    from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

    scales = jnp.array([1.0, 3.0, 0.5, 7.0], jnp.float32)
    for backend in ("static", "xla"):
        t = GaussianND(mean=jnp.zeros(4, jnp.float32), cov=scales)
        s = NUTS(
            t,
            init_with_seed(64, 4, 0),
            mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
            max_tree_depth=4,
            target_accept_p=0.85,
            seed=0,
            backend=backend,
            proposal="multinomial",
        )
        out = np.asarray(s.run(300, 200))
        flat = out.reshape(-1, 4)
        np.testing.assert_allclose(flat.std(axis=0), scales, rtol=0.12,
                                   err_msg=backend)
        rhat, _ = split_rhat_mean_ess(jnp.asarray(out))
        assert np.asarray(rhat).max() < 1.05, backend
    with pytest.raises(ValueError, match="proposal"):
        NUTS(t, init_with_seed(4, 4, 0), proposal="nope")


def test_divergence_parity():
    """A grossly too-large step size produces divergences on both backends
    at comparable rates, and the static backend flags them per chain."""
    d, B, J = 8, 256, 3
    scales, logp, _ = _gaussian(d)
    vg = jax.value_and_grad(logp)
    mass_inv = jnp.broadcast_to(jnp.asarray(scales**2), (B, d))
    eps = jnp.full((B,), 25.0, jnp.float32)
    rng = np.random.default_rng(3)
    pos = jnp.asarray((rng.standard_normal((B, d)) * scales).astype(np.float32))
    lp, grad = jax.vmap(vg)(pos)
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    out = static_nuts_step(
        keys, pos, lp.astype(jnp.float32), grad.astype(jnp.float32),
        eps, mass_inv, 1.0 / jnp.sqrt(mass_inv), vg, J,
    )
    div = np.asarray(out.diverged)
    assert div.mean() > 0.5
    # diverged chains must keep a finite state (proposal never a NaN leaf)
    assert np.isfinite(np.asarray(out.pos)).all()
    assert np.isfinite(np.asarray(out.lp)).all()


def test_static_backend_end_to_end():
    """The full adaptive NUTS pipeline (eps search, warmup windows, dual
    averaging, mass adaptation) through backend='static' reaches the target
    distribution with healthy diagnostics."""
    from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed
    from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

    scales = jnp.array([1.0, 3.0, 0.5, 7.0], jnp.float32)
    t = GaussianND(mean=jnp.zeros(4, jnp.float32), cov=scales)
    s = NUTS(
        t,
        init_with_seed(64, 4, 0),
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        max_tree_depth=4,
        target_accept_p=0.85,
        seed=0,
        backend="static",
    )
    out = np.asarray(s.run(300, 200))
    assert out.shape == (64, 300, 4)
    flat = out.reshape(-1, 4)
    np.testing.assert_allclose(flat.std(axis=0), scales, rtol=0.12)
    rhat, _ = split_rhat_mean_ess(jnp.asarray(out))
    assert np.asarray(rhat).max() < 1.05
    # leapfrog counter reports the static schedule's actual work
    assert int(np.asarray(s.leapfrog_count)[0]) == 500 * 15


def test_static_backend_warmup_depth_switch():
    """warmup_tree_depth != max_tree_depth compiles the phase-switch cond."""
    from general_mcmc_tpu import NUTS, GaussianND, init_with_seed

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.ones(2, jnp.float32))
    s = NUTS(
        t, init_with_seed(8, 2, 0), max_tree_depth=3, warmup_tree_depth=2,
        step_size=0.7, seed=1, backend="static",
    )
    out = np.asarray(s.run(10, 6))
    assert out.shape == (8, 10, 2)
    assert np.isfinite(out).all()
    # 6 warmup steps at 2^2-1=3 evals + 10 collection at 2^3-1=7
    assert int(np.asarray(s.leapfrog_count)[0]) == 6 * 3 + 10 * 7


def test_static_backend_guards():
    from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.ones(2, jnp.float32))
    with pytest.raises(ValueError, match="static"):
        NUTS(t, init_with_seed(4, 2, 0), backend="static")  # depth 10 default
    # The op itself enforces the bf16 index-recovery exactness bound
    # (ADVICE r3: a direct caller must not silently corrupt indices at J>8).
    from general_mcmc_tpu.ops.static_tree import static_nuts_step

    with pytest.raises(ValueError, match="max_depth <= 8"):
        static_nuts_step(
            jax.random.split(jax.random.PRNGKey(0), 4),
            jnp.zeros((4, 2)), jnp.zeros(4), jnp.zeros((4, 2)),
            jnp.ones(4), jnp.ones((4, 2)), jnp.ones((4, 2)),
            lambda x: (-0.5 * jnp.sum(x * x), -x), 9,
        )
    with pytest.raises(ValueError, match="retired"):
        NUTS(  # the fused NUTS kernel was retired round 4 (MOSAIC_RULES.md)
            t, init_with_seed(4, 2, 0), backend="pallas", max_tree_depth=4,
            mass_config=NUTSMassMatrixConfig(adaptation="dense", dense_max_dim=8),
        )


def test_static_dense_mass_matches_dynamic_law():
    """Dense mass through the static schedule: same transition law as the
    dynamic tree with the same dense metric (correlated Gaussian, true
    covariance as M⁻¹, fixed ε)."""
    d, B, steps, J = 4, 256, 250, 3
    rng = np.random.default_rng(11)
    A = rng.standard_normal((d, d)).astype(np.float32)
    cov = (A @ A.T + d * np.eye(d, dtype=np.float32)).astype(np.float32)
    cov_j = jnp.asarray(cov)
    prec = np.linalg.inv(cov).astype(np.float32)
    chol_m = np.linalg.cholesky(prec).astype(np.float32)  # chol(M), M = Σ⁻¹

    def logp(x):
        return -0.5 * x @ jnp.asarray(prec) @ x

    vg = jax.value_and_grad(logp)
    eps = jnp.full((B,), 0.9, jnp.float32)
    pos = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32)
                      @ np.linalg.cholesky(cov).T.astype(np.float32))
    lp, grad = jax.vmap(vg)(pos)
    lp, grad = lp.astype(jnp.float32), grad.astype(jnp.float32)
    inv_b = jnp.broadcast_to(cov_j, (B, d, d))
    scale_b = jnp.broadcast_to(jnp.asarray(chol_m), (B, d, d))

    def step_static(keys, pos, lp, grad):
        return static_nuts_step(
            keys, pos, lp, grad, eps, inv_b, scale_b, vg, J, dense=True
        )

    mass1 = MassMatrix(inv=cov_j, scale=jnp.asarray(chol_m))

    def step_dyn(keys, pos, lp, grad):
        return jax.vmap(
            lambda k, p, l, g: nuts_tree_step(
                k, p, l, g, eps[0], mass1, True, vg, J
            )
        )(keys, pos, lp, grad)

    s_s, a_s, d_s = _run_chain_stats(step_static, pos, lp, grad, steps,
                                     jax.random.PRNGKey(3))
    s_d, a_d, d_d = _run_chain_stats(step_dyn, pos, lp, grad, steps,
                                     jax.random.PRNGKey(4))
    flat_s = s_s.reshape(-1, d)
    flat_d = s_d.reshape(-1, d)
    np.testing.assert_allclose(flat_s.std(0), np.sqrt(np.diag(cov)), rtol=0.06)
    np.testing.assert_allclose(flat_s.std(0), flat_d.std(0), rtol=0.06)
    # correlation structure reproduced
    np.testing.assert_allclose(
        np.corrcoef(flat_s.T), np.corrcoef(flat_d.T), atol=0.05
    )
    assert abs(a_s.mean() - a_d.mean()) < 0.03
    assert abs(d_s.mean() - d_d.mean()) < 0.2


def test_static_backend_dense_adaptation_end_to_end():
    """Full dense-mass warmup (Welford dense windows, jittered Cholesky)
    through backend='static' on a correlated target."""
    from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed
    from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

    cov = jnp.asarray(
        [[2.0, 1.2, 0.0], [1.2, 1.5, 0.4], [0.0, 0.4, 1.0]], jnp.float32
    )
    t = GaussianND(mean=jnp.zeros(3, jnp.float32), cov=cov)
    s = NUTS(
        t,
        init_with_seed(64, 3, 2),
        mass_config=NUTSMassMatrixConfig(adaptation="dense", dense_max_dim=8),
        max_tree_depth=4,
        target_accept_p=0.85,
        seed=2,
        backend="static",
    )
    out = np.asarray(s.run(300, 200))
    assert out.shape == (64, 300, 3)
    flat = out.reshape(-1, 3)
    np.testing.assert_allclose(
        flat.std(axis=0), np.sqrt(np.diag(np.asarray(cov))), rtol=0.12
    )
    np.testing.assert_allclose(
        np.corrcoef(flat.T), np.asarray(cov / jnp.sqrt(
            jnp.outer(jnp.diag(cov), jnp.diag(cov)))), atol=0.08
    )
    rhat, _ = split_rhat_mean_ess(jnp.asarray(out))
    assert np.asarray(rhat).max() < 1.05


def test_static_backend_composes_with_track_thin_chain():
    """Runtime features compose with the static schedule: track() derived
    quantities, thinned runs (RNG position-indexed: a thinned run visits the
    unthinned run's states), and incremental chain() driving."""
    from general_mcmc_tpu import NUTS, GaussianND, init_det

    def mk():
        t = GaussianND(mean=jnp.zeros(3, jnp.float32),
                       cov=jnp.array([1.0, 4.0, 0.25], jnp.float32))
        return NUTS(t, init_det(8, 3), 0.8, max_tree_depth=3, step_size=0.4,
                    backend="static").seed(21)

    # thin=2 visits exactly the unthinned run's states, strided
    full = np.asarray(mk().run(20, 6))
    thinned = np.asarray(mk().run(10, 6, thin=2))
    np.testing.assert_array_equal(thinned, full[:, 1::2])

    # track(): derived quantity recorded in-scan
    tracked = np.asarray(mk().track(lambda x: x[:, :1] + x[:, 1:2]).run(20, 6))
    np.testing.assert_allclose(tracked[:, :, 0], full[:, :, 0] + full[:, :, 1],
                               rtol=1e-6)

    # chain(): incremental stepping reproduces the one-shot run
    ch = mk().chain(n_warmup=6)
    ch.step(6)
    block = np.asarray(ch.step(20))
    np.testing.assert_allclose(block, full, rtol=1e-6)
