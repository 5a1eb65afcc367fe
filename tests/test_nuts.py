"""NUTS tests: golden values from nuts.rs / generic_nuts.rs test modules plus
statistical envelopes.

Golden anchors:
- ``find_reasonable_epsilon`` == 2.0 exactly on the standard normal at
  position [0,1], momentum [1,0] (nuts.rs:508-519);
- the depth-3 ``build_tree`` trajectory endpoints / α-statistics
  (nuts.rs:521-586) — deterministic given the deterministic leapfrog chain,
  since that configuration yields n' = 0 at every leaf (no random swaps).
"""

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import DiffableGaussian2D, GaussianND, Rosenbrock2D, init_det
from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess
from general_mcmc_tpu.ops.tree import (
    build_subtree,
    find_reasonable_epsilon,
    identity_mass,
    nuts_tree_step,
)
from general_mcmc_tpu.samplers.nuts import NUTS, NUTSMassMatrixConfig


def _std_normal_logp(x):
    return -0.5 * jnp.sum(x * x)


def test_find_reasonable_epsilon_golden():
    # nuts.rs:508-519: exact ε = 2.0
    vg = jax.value_and_grad(_std_normal_logp)
    pos = jnp.array([0.0, 1.0])
    mom = jnp.array([1.0, 0.0])
    mass = identity_mass(2, dense=False, dtype=pos.dtype)
    eps = find_reasonable_epsilon(vg, pos, mom, mass, dense=False)
    assert float(eps) == 2.0


def test_build_tree_golden_depth3():
    # nuts.rs:521-586: 8 backwards leapfrog steps with ε=0.01 from a fixed
    # phase-space point; all deterministic quantities pinned to 1e-5/1e-6.
    target = DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )
    vg = jax.value_and_grad(target.unnorm_logp)
    pos = jnp.array([0.0, 1.0])
    mom = jnp.array([2.0, 3.0])
    grad = jnp.array([4.0, 5.0])
    mass = identity_mass(2, dense=False, dtype=pos.dtype)
    res = build_subtree(
        key=jax.random.key(0),
        pos=pos,
        mom=mom,
        grad=grad,
        v=jnp.asarray(-1, jnp.int32),
        depth=jnp.asarray(3, jnp.int32),
        eps=jnp.asarray(0.01),
        logu=jnp.asarray(-2.0),
        joint0=jnp.asarray(0.1),
        mass=mass,
        dense=False,
        vg_fn=vg,
        max_depth=10,
        collect_edges=True,
    )
    tol = dict(rtol=1e-5, atol=1e-6)
    # Far (minus) endpoint of the backwards trajectory:
    np.testing.assert_allclose(res.end_pos, [-0.1584001, 0.76208336], **tol)
    np.testing.assert_allclose(res.end_mom, [1.9800036, 2.9718253], **tol)
    np.testing.assert_allclose(res.end_grad, [-7.912_36e-5, 7.935_829_5e-2], **tol)
    # Near (plus) edge — the state after the first backwards step:
    np.testing.assert_allclose(res.first_pos, [-0.0198, 0.97025], **tol)
    np.testing.assert_allclose(res.first_mom, [1.98, 2.9749503], **tol)
    np.testing.assert_allclose(res.first_grad, [-1.250e-05, 9.925e-03], **tol)
    # With logu=-2 no leaf enters the slice: proposal stays the first leaf.
    np.testing.assert_allclose(res.prop_pos, [-0.0198, 0.97025], **tol)
    np.testing.assert_allclose(res.prop_grad, [-1.250e-05, 9.925e-03], **tol)
    assert abs(float(res.prop_lp) - (-2.877_745_4)) < 1e-6
    assert int(res.n) == 0
    assert bool(res.s)
    assert int(res.n_alpha) == 8
    assert abs(float(res.alpha) - 0.000_686_661_7) < 1e-8


def test_tree_step_vmap_matches_single_chain():
    """vmapped tree step must equal per-chain evaluation (masked while_loop
    correctness)."""
    target = DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )
    vg = jax.value_and_grad(target.unnorm_logp)
    n = 5
    pos = init_det(n, 2, dtype=jnp.float64)
    lp, grad = jax.vmap(jax.value_and_grad(target.unnorm_logp))(pos)
    keys = jax.random.split(jax.random.key(3), n)
    mass = jax.vmap(lambda _: identity_mass(2, False, pos.dtype))(jnp.arange(n))
    eps = jnp.full((n,), 0.2)

    step = lambda k, p, l, g, e, m: nuts_tree_step(k, p, l, g, e, m, False, vg, 10)
    batched = jax.vmap(step)(keys, pos, lp, grad, eps, mass)
    for i in range(n):
        single = step(
            keys[i], pos[i], lp[i], grad[i], eps[i],
            jax.tree.map(lambda a: a[i], mass),
        )
        np.testing.assert_allclose(batched.pos[i], single.pos, atol=1e-10)
        np.testing.assert_allclose(batched.lp[i], single.lp, atol=1e-10)
        assert int(batched.depth[i]) == int(single.depth)


def _gauss_target():
    return DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )


def test_nuts_shapes_and_finiteness():
    # nuts.rs:589-697 smoke tier
    sampler = NUTS(_gauss_target(), init_det(3, 2), 0.8).set_seed(42)
    sample = sampler.run(20, 20)
    assert sample.shape == (3, 20, 2)
    assert np.isfinite(np.asarray(sample)).all()
    assert np.abs(np.asarray(sample)).max() < 100.0


def test_nuts_gaussian_moments_and_ess():
    sampler = NUTS(_gauss_target(), init_det(4, 2), 0.8).set_seed(42)
    sample = sampler.run(1000, 500)
    rhat, ess = split_rhat_mean_ess(sample)
    assert float(jnp.max(rhat)) < 1.05
    assert float(jnp.min(ess)) > 200.0  # NUTS mixes far better than MH here
    flat = np.asarray(sample).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.3)
    np.testing.assert_allclose(
        np.cov(flat.T), [[4.0, 2.0], [2.0, 3.0]], atol=0.7
    )


def test_track_extract_matches_posthoc_transform():
    """The Trace hook (core.rs:34-72): a tracked run must collect exactly the
    transform of the untracked run's draws (same seed → same RNG stream →
    same trajectories), across run(), run_progress(), and both progress
    modes."""
    def fn(x):
        return jnp.stack([x[:, 0] + x[:, 1], x[:, 0] * 2.0], axis=1)

    base = NUTS(_gauss_target(), init_det(4, 2), 0.8).set_seed(7)
    raw = base.run(60, 40)

    tracked = NUTS(_gauss_target(), init_det(4, 2), 0.8).set_seed(7).track(fn)
    got = tracked.run(60, 40)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fn(raw.reshape(-1, 2)).reshape(4, 60, 2)), rtol=1e-6)

    # run_progress (both modes) tracks the transformed quantity too
    for mode in ("chunked", "stream"):
        s2 = NUTS(_gauss_target(), init_det(4, 2), 0.8).set_seed(7).track(fn)
        got2, stats = s2.run_progress(60, 40, progress=False, mode=mode)
        assert got2.shape == (4, 60, 2)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(got), rtol=1e-6)

    # track(None) restores raw positions, with a fresh compilation identity
    assert tracked.track(None).run(60, 40).shape == raw.shape


def test_nuts_rosenbrock_smoke():
    # examples/minimal_nuts.rs configuration (scaled down)
    sampler = NUTS(Rosenbrock2D(1.0, 100.0), init_det(4, 2), 0.95).set_seed(42)
    sample = sampler.run(100, 100)
    assert sample.shape == (4, 100, 2)
    assert np.isfinite(np.asarray(sample)).all()


def test_nuts_progress_matches_run():
    s1 = NUTS(_gauss_target(), init_det(3, 2), 0.8).set_seed(5)
    s2 = NUTS(_gauss_target(), init_det(3, 2), 0.8).set_seed(5)
    a = s1.run(30, 30)
    b, _ = s2.run_progress(30, 30, progress=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_nuts_diag_mass_adaptation():
    """Diagonal warmup on an ill-conditioned Gaussian must learn the scales
    (generic_nuts.rs:1458-1489 analog, but end-to-end)."""
    scales = jnp.array([1.0, 10.0])
    target = GaussianND(mean=jnp.zeros(2), cov=scales)
    sampler = NUTS(
        target,
        init_det(4, 2),
        0.8,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
    ).set_seed(42)
    sample = sampler.run(500, 600)
    assert np.isfinite(np.asarray(sample)).all()
    inv = np.asarray(sampler._final_carry["mass"].inv)
    # Stan metric: inverse mass ≈ sample variance per coordinate ([1, 100]).
    assert np.median(inv[:, 1]) > 5 * np.median(inv[:, 0])
    flat = np.asarray(sample).reshape(-1, 2)
    assert abs(flat[:, 1].std() - 10.0) < 3.0


def test_nuts_dense_mass_adaptation():
    cov = jnp.array([[4.0, 2.0], [2.0, 3.0]])
    target = GaussianND(mean=jnp.zeros(2), cov=cov)
    sampler = NUTS(
        target,
        init_det(4, 2),
        0.8,
        mass_config=NUTSMassMatrixConfig(adaptation="dense"),
    ).set_seed(42)
    sample = sampler.run(500, 600)
    assert np.isfinite(np.asarray(sample)).all()
    flat = np.asarray(sample).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(flat.T), np.asarray(cov), atol=1.0)
    # Stan metric: the adapted inverse mass approximates the covariance.
    inv = np.asarray(sampler._final_carry["mass"].inv)
    np.testing.assert_allclose(np.median(inv, axis=0), np.asarray(cov), atol=2.0)


def test_nuts_divergence_counter():
    sampler = NUTS(_gauss_target(), init_det(2, 2), 0.8).set_seed(0)
    sampler.run(50, 50)
    div = sampler.divergences
    assert div is not None and div.shape == (2,)
    assert int(jnp.sum(div)) == 0  # a well-conditioned Gaussian never diverges


def test_nuts_adapted_step_size_reasonable():
    sampler = NUTS(_gauss_target(), init_det(4, 2), 0.8).set_seed(1)
    sampler.run(200, 300)
    eps = np.asarray(sampler.adapted_step_size)
    assert np.all(eps > 0.05) and np.all(eps < 10.0)


def test_nuts_marginals_ks():
    """Kolmogorov–Smirnov distance of pooled NUTS samples against the exact
    marginal CDFs — a stronger distributional check than moment envelopes."""
    from scipy import stats as sps

    scales = jnp.array([1.0, 4.0])
    target = GaussianND(mean=jnp.zeros(2), cov=scales)
    sampler = NUTS(
        target, init_det(8, 2), 0.8,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
    ).set_seed(7)
    sample = np.asarray(sampler.run(1500, 500))
    for j, sd in enumerate([1.0, 4.0]):
        # thin to reduce autocorrelation before the KS test
        draws = sample[:, ::5, j].ravel()
        stat, pvalue = sps.kstest(draws, "norm", args=(0.0, sd))
        assert stat < 0.03, (j, stat, pvalue)


def test_nuts_funnel_divergences():
    """Neal's funnel with a deliberately coarse fixed step size must trip
    the divergence detector; a well-conditioned Gaussian must not."""
    from general_mcmc_tpu import NealsFunnel

    funnel = NealsFunnel(dim=8)
    sampler = NUTS(
        funnel, init_det(16, 8), 0.8, step_size=1.2, max_tree_depth=6
    ).set_seed(3)
    sampler.run(150, 0)
    assert int(jnp.sum(sampler.divergences)) > 0


def test_nuts_warmup_tree_depth_knob():
    """Shallower warmup cap must not change post-warmup sampling quality."""
    target = _gauss_target()
    sampler = NUTS(
        target, init_det(4, 2), 0.8, warmup_tree_depth=4, max_tree_depth=10
    ).set_seed(42)
    sample = sampler.run(800, 400)
    rhat, ess = split_rhat_mean_ess(sample)
    assert float(jnp.max(rhat)) < 1.05
    flat = np.asarray(sample).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.3)


def test_nuts_thinning_with_adaptation_equals_strided():
    """thin=k on NUTS (with mass warmup) matches the strided unthinned run
    exactly — guards the schedule-index clamp for steps past the schedule
    (silent XLA gather-clamping previously made thinned/resumed runs reuse
    the last warmup entry)."""
    import numpy as np

    from general_mcmc_tpu import NUTSMassMatrixConfig

    def make():
        target = DiffableGaussian2D(
            mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
        )
        return NUTS(
            target, init_det(4, 2), 0.8,
            mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        ).set_seed(9)

    full = np.asarray(make().run(30, 60))
    thin = np.asarray(make().run(10, 60, thin=3))
    np.testing.assert_array_equal(thin, full[:, 2::3])


def test_incremental_chain_api_matches_fused_run():
    """chain(K) + step(K) + step(N) visits exactly the states of run(N, K)
    (NUTSChain per-step driving, nuts.rs:311-438), and current_state tracks
    the frontier."""
    from general_mcmc_tpu import NUTSMassMatrixConfig

    def mk():
        return NUTS(
            _gauss_target(), init_det(4, 2), 0.8,
            mass_config=NUTSMassMatrixConfig(
                adaptation="diagonal", start_buffer=4, end_buffer=3,
                initial_window=2,
            ),
        ).set_seed(11)

    K, N = 16, 24
    ref = np.asarray(mk().run(N, K))  # [4, N, 2]

    c = mk().chain(n_warmup=K)
    warm = c.step(K)
    assert warm.shape == (4, K, 2) and c.steps_done == K
    got = np.asarray(c.step(N))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(c.current_state()), ref[:, -1], rtol=1e-6, atol=1e-8
    )

    # sub-block stepping reuses the same trajectory too (absolute indices)
    c2 = mk().chain(n_warmup=K)
    c2.step(K)
    parts = [np.asarray(c2.step(8)) for _ in range(3)]
    np.testing.assert_allclose(np.concatenate(parts, axis=1), ref, rtol=1e-6, atol=1e-8)


def test_incremental_chain_checkpoint_resume(tmp_path):
    """A chain-driven sampler stays checkpointable at the stepped frontier."""
    s = NUTS(_gauss_target(), init_det(3, 2), 0.8).set_seed(5)
    c = s.chain()
    c.step(20)
    p = str(tmp_path / "chain.npz")
    s.save_checkpoint(p)

    ref = np.asarray(NUTS(_gauss_target(), init_det(3, 2), 0.8).set_seed(5).run(35))
    rest = np.asarray(NUTS(_gauss_target(), init_det(3, 2), 0.8).set_seed(5).resume(p, 15))
    np.testing.assert_allclose(rest, ref[:, 20:], rtol=1e-6, atol=1e-8)


def test_chain_schedule_survives_interleaved_run():
    """Review finding: a BatchChain's lazily-traced step fn must keep the
    warmup schedule it was created with, even if the sampler runs with a
    DIFFERENT schedule in between (the schedules are bound into the step fn
    at _prepare_run time, not read from mutable sampler attributes)."""
    from general_mcmc_tpu import NUTSMassMatrixConfig

    def mk():
        return NUTS(
            _gauss_target(), init_det(4, 2), 0.8,
            mass_config=NUTSMassMatrixConfig(
                adaptation="diagonal", start_buffer=4, end_buffer=3,
                initial_window=2,
            ),
        ).set_seed(13)

    K, N = 16, 20
    ref = np.asarray(mk().run(N, K))

    s = mk()
    c = s.chain(n_warmup=K)
    s.run(10, 50)  # overwrites the sampler's schedule attrs BEFORE c traces
    c.step(K)
    got = np.asarray(c.step(N))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)
