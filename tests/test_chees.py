"""ChEES-HMC tests (samplers/chees.py — beyond-reference extension).

Covers the Halton jitter stream, moment correctness on a correlated
Gaussian, adaptation quality on the ill-conditioned headline-style target
(ε, trajectory length, cross-chain variance metric), determinism,
run/chain composition, and jitter/adaptation invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu import ChEESHMC, DiffableGaussian2D, GaussianND, init_det
from general_mcmc_tpu.core import init_with_seed
from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess
from general_mcmc_tpu.samplers.chees import halton_base2


def _gauss_target():
    return DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )


def test_halton_base2_prefix():
    # base-2 radical inverse of 1..8: the classic van der Corput prefix
    got = [float(halton_base2(m)) for m in range(8)]
    np.testing.assert_allclose(
        got, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625]
    )


def test_halton_base2_uniform_and_jittable():
    u = jax.jit(jax.vmap(halton_base2))(jnp.arange(4096))
    u = np.asarray(u)
    assert (u > 0).all() and (u < 1).all()
    # low-discrepancy: every one of 16 equal bins gets exactly 256 of 4096
    hist, _ = np.histogram(u, bins=16, range=(0.0, 1.0))
    assert (hist == 256).all()


def test_chees_shapes_and_finiteness():
    sampler = ChEESHMC(_gauss_target(), init_det(3, 2), seed=42)
    sample = sampler.run(50, 20)
    assert sample.shape == (3, 50, 2)
    assert np.isfinite(np.asarray(sample)).all()
    assert int(jnp.sum(sampler.leapfrog_count)) >= 70 * 3  # >= 1 leapfrog/step
    assert sampler.adapted_trajectory_length is not None


def test_chees_gaussian_moments():
    sampler = ChEESHMC(_gauss_target(), init_det(64, 2), seed=1)
    sample = np.asarray(sampler.run(400, 400)).reshape(-1, 2)
    np.testing.assert_allclose(sample.mean(axis=0), [0.0, 1.0], atol=0.3)
    emp_cov = np.cov(sample.T)
    np.testing.assert_allclose(emp_cov, [[4.0, 2.0], [2.0, 3.0]], atol=0.6)


@pytest.mark.parametrize("static_collection", [False, True])
def test_chees_analytic_grad_interior_matches_autodiff(static_collection):
    """The analytic-gradient interior (as_grad_fn: no per-leapfrog primal
    reduce) must produce the same chain as the value_and_grad path — under
    the f64 test config the two programs agree far below accept-flip
    scale, so trajectories match to tight tolerance."""
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(5.0), 8))
    target = GaussianND(mean=jnp.zeros(8), cov=scales)

    def run(disable_override):
        s = ChEESHMC(
            target, init_with_seed(32, 8, 3), step_size=0.3, seed=7,
            static_collection=static_collection,
            static_leapfrog=5 if static_collection else None,
        )
        assert s._ggrad is not None  # GaussianND provides the hook
        if disable_override:
            s._ggrad = None
        return np.asarray(s.run(16, 0))

    np.testing.assert_allclose(
        run(False), run(True), rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("static_collection", [False, True])
def test_chees_falsification_wrong_target(static_collection):
    """The accept/falsify pairing the reference uses for MH
    (tests/metrohast_2d_gaussian_test.rs:73-102), applied to the flagship:
    sampling a WRONG target (9·I Gaussian) must not satisfy the moment
    envelope of test_chees_gaussian_moments, guarding against vacuous
    tolerances — in both the adaptive and the static-collection
    (bench-path) law."""
    wrong = DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[9.0, 0.0], [0.0, 9.0]])
    )
    sampler = ChEESHMC(
        wrong, init_det(64, 2), seed=1, static_collection=static_collection
    )
    sample = np.asarray(sampler.run(400, 400)).reshape(-1, 2)
    emp_cov = np.cov(sample.T)
    assert np.max(np.abs(emp_cov - np.array([[4.0, 2.0], [2.0, 3.0]]))) > 1.0


def test_chees_adaptation_ill_conditioned():
    # miniature of the headline bench target: 10-d, marginal scales 1..10
    dim = 10
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), dim))
    target = GaussianND(mean=jnp.zeros(dim), cov=scales)
    sampler = ChEESHMC(target, init_with_seed(128, dim, 0), seed=0)
    sample = sampler.run(400, 400)
    rhat, ess, _mean, std = split_rhat_mean_ess(sample, return_moments=True)
    assert float(jnp.max(rhat)) < 1.05
    assert float(jnp.min(ess)) > 2000.0
    # moment audit vs the analytic marginals (R-hat alone cannot see a
    # globally-wrong stationary distribution)
    assert float(jnp.max(jnp.abs(std / scales - 1.0))) < 0.15
    # the cross-chain variance metric recovers the marginal variances
    mass_rel = np.asarray(sampler.adapted_mass_inv / scales**2)
    assert (np.abs(mass_rel - 1.0) < 0.5).all()
    # trajectory length adapted away from its 1.0 init, into a sane range
    t_max = float(sampler.adapted_trajectory_length)
    assert 0.5 < t_max < 20.0
    assert float(sampler.adapted_step_size) > 0.05
    assert int(jnp.sum(sampler.divergences)) == 0


def test_chees_determinism():
    a = ChEESHMC(_gauss_target(), init_det(4, 2), seed=7).run(60, 30)
    b = ChEESHMC(_gauss_target(), init_det(4, 2), seed=7).run(60, 30)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = ChEESHMC(_gauss_target(), init_det(4, 2), seed=8).run(60, 30)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_chees_chain_equals_run():
    # incremental driving visits exactly the states of a fused run,
    # including the warmup-schedule binding (the NUTS _Sched pattern)
    ref = ChEESHMC(_gauss_target(), init_det(4, 2), seed=3).run(40, 25)
    chain = ChEESHMC(_gauss_target(), init_det(4, 2), seed=3).chain(n_warmup=25)
    chain.step(25)
    got = chain.step(40)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-6)


def test_chees_thin_strides_unthinned_stream():
    ref = ChEESHMC(_gauss_target(), init_det(4, 2), seed=5).run(60, 20)
    thinned = ChEESHMC(_gauss_target(), init_det(4, 2), seed=5).run(
        20, 20, thin=3
    )
    np.testing.assert_allclose(
        np.asarray(ref[:, 2::3]), np.asarray(thinned), rtol=1e-6
    )


def test_chees_jitter_amount_validation():
    with pytest.raises(ValueError):
        ChEESHMC(_gauss_target(), init_det(2, 2), jitter_amount=0.0)
    with pytest.raises(ValueError):
        ChEESHMC(_gauss_target(), init_det(2, 2), jitter_amount=1.5)
    with pytest.raises(ValueError):
        ChEESHMC(_gauss_target(), init_det(2, 2), trajectory_length=-1.0)
    with pytest.raises(ValueError):
        ChEESHMC(_gauss_target(), init_det(2, 2), max_leapfrog=0)


def test_chees_partial_jitter_law():
    # jitter_amount < 1 keeps trajectories in ((1-j)T, T]: leapfrog counts
    # per step must exceed the full-jitter law's short-trajectory draws
    full = ChEESHMC(
        _gauss_target(), init_det(16, 2), seed=2, jitter_amount=1.0,
        step_size=0.3, trajectory_length=2.4, mass_adaptation=False,
    )
    part = ChEESHMC(
        _gauss_target(), init_det(16, 2), seed=2, jitter_amount=0.25,
        step_size=0.3, trajectory_length=2.4, mass_adaptation=False,
    )
    full.run(50, 0)  # n_discard=0: adaptation frozen, fixed T and eps
    part.run(50, 0)
    # partial jitter: every trajectory uses >= (1-0.25)*2.4/0.3 = 6 steps
    assert int(jnp.min(part.leapfrog_count)) >= 6 * 50
    # full jitter: halton u=0.5 first -> some trajectories far shorter
    assert int(jnp.min(full.leapfrog_count)) < int(jnp.min(part.leapfrog_count))


def test_chees_no_adaptation_post_warmup():
    sampler = ChEESHMC(_gauss_target(), init_det(8, 2), seed=11)
    sampler.run(30, 25)
    carry = sampler._final_carry
    eps_bar = float(carry["eps_bar"])
    log_t = float(carry["log_t"])
    mass = np.asarray(carry["mass_inv"])
    # continue post-warmup via resume-style run: adapted state must be frozen
    out = jax.tree_util.tree_map(
        lambda x: x, sampler._step_fn(carry, jnp.asarray(60))
    )
    assert float(out["eps_bar"]) == eps_bar
    assert float(out["log_t"]) == log_t
    np.testing.assert_array_equal(np.asarray(out["mass_inv"]), mass)
    assert float(out["eps"]) == eps_bar


def test_chees_static_collection_moments():
    # the static-L / jittered-eps collection law samples the same target
    sampler = ChEESHMC(
        _gauss_target(), init_det(64, 2), seed=1, static_collection=True
    )
    sample = np.asarray(sampler.run(400, 400)).reshape(-1, 2)
    np.testing.assert_allclose(sample.mean(axis=0), [0.0, 1.0], atol=0.3)
    emp_cov = np.cov(sample.T)
    np.testing.assert_allclose(emp_cov, [[4.0, 2.0], [2.0, 3.0]], atol=0.6)
    assert sampler._static_L >= 1
    # leapfrog accounting: exactly L per collected step
    lf = np.asarray(sampler.leapfrog_count)
    assert (lf == lf[0]).all()


def test_chees_static_collection_determinism_and_resume(tmp_path):
    def make():
        return ChEESHMC(
            _gauss_target(), init_det(8, 2), seed=9, static_collection=True
        )

    ref = np.asarray(make().run(30, 24))
    again = np.asarray(make().run(30, 24))
    np.testing.assert_array_equal(ref, again)

    # resume == uninterrupted: L re-derives identically from the frozen
    # carry, and the Halton/step-key streams are position-indexed
    part = make()
    first = np.asarray(part.run(18, 24))
    path = str(tmp_path / "chees_static.npz")
    part.save_checkpoint(path)
    rest = np.asarray(make().resume(path, 12))
    np.testing.assert_array_equal(first, ref[:, :18])
    np.testing.assert_array_equal(rest, ref[:, 18:])


def test_chees_static_collection_ill_conditioned():
    dim = 10
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), dim))
    target = GaussianND(mean=jnp.zeros(dim), cov=scales)
    sampler = ChEESHMC(
        target, init_with_seed(128, dim, 0), seed=0, target_accept_p=0.9,
        jitter_amount=0.5, static_collection=True,
    )
    sample = sampler.run(400, 400)
    rhat, ess, _mean, std = split_rhat_mean_ess(sample, return_moments=True)
    assert float(jnp.max(rhat)) < 1.05
    assert float(jnp.max(jnp.abs(std / scales - 1.0))) < 0.15
    assert int(jnp.sum(sampler.divergences)) == 0


def test_chees_dual_averaging_overflow_guard():
    """A long run of all-accepts (tiny initial ε) drives the dual-averaging
    exponent past f32 overflow; without the log-space clamp ε̄ latches at
    inf through its own log (observed on the hierarchical logistic target
    on TPU).  f32 state reproduces it on CPU."""
    sampler = ChEESHMC(
        _gauss_target(),
        init_det(16, 2),  # float32 — the overflow dtype
        step_size=1e-6,
        seed=0,
    )
    sample = sampler.run(10, 250)
    assert np.isfinite(np.asarray(sample)).all()
    eps = float(sampler.adapted_step_size)
    assert np.isfinite(eps) and 1e-8 < eps < 3e3


def test_chees_criterion_nan_guard():
    """A rejected proposal with FINITE log-density but huge coordinates
    (the NC logistic prior keeps lp finite out to |z| ~ 1e19) contributes
    w·a_gap² = 0·inf = NaN to the ChEES criterion means; without the
    finite-gradient guard, Adam latches log T at NaN and the adapted state
    is unusable (observed under jit on the round-4 hierarchical-logistic
    rehearsal: eps_bar ≈ e⁸ clamp, T = nan).  Reproduce the jitted warmup
    on the real target and assert the adapted state stays finite."""
    from general_mcmc_tpu.core import run_kernel
    from general_mcmc_tpu.models.regression import (
        HierarchicalLogisticNC,
        make_logistic_data,
    )

    dim, n_obs, n = 50, 256, 256
    X, y, _ = make_logistic_data(jax.random.PRNGKey(1), n_obs, dim - 2)
    sampler = ChEESHMC(
        HierarchicalLogisticNC(X, y),
        init_with_seed(n, dim, 0).astype(jnp.float32),
        target_accept_p=0.9,
        seed=0,
    )
    sampler._prepare_run(0, 192)
    out = run_kernel(sampler._step_fn, sampler._init_carry(), 0, 192)
    log_t = float(out.carry["log_t"])
    eps_bar = float(out.carry["eps_bar"])
    assert np.isfinite(log_t), f"log T latched non-finite: {log_t}"
    assert np.isfinite(eps_bar) and eps_bar < 10.0, (
        f"eps_bar ran away: {eps_bar}"
    )


def test_chees_tracked_quantities():
    # the Trace hook composes like every other sampler (core.rs:34-72)
    sampler = ChEESHMC(_gauss_target(), init_det(4, 2), seed=6).track(
        lambda x: x[:, :1] ** 2
    )
    sample = sampler.run(30, 10)
    assert sample.shape == (4, 30, 1)
    assert np.isfinite(np.asarray(sample)).all()


def test_chees_static_collection_with_stats_fused():
    """_run_static(with_stats=True) routes through core.run_kernel_stats:
    samples must be bit-identical to the plain path, and the in-program
    sufficient statistics must reproduce split_rhat_mean_ess through the
    pure-numpy host combine (the bench stretch line's no-second-compile
    diagnostics, VERDICT round 4 #1)."""
    from general_mcmc_tpu.core import run_kernel
    from general_mcmc_tpu.diagnostics.stats import combine_suffstats_host

    def make():
        return ChEESHMC(
            _gauss_target(), init_det(16, 2), seed=3, static_collection=True
        )

    ref = np.asarray(make().run(64, 32))  # [chains, steps, dim]

    s2 = make()
    s2._prepare_run(64, 32)
    out = run_kernel(s2._step_fn, s2._init_carry(), 0, 32)
    samples = s2._run_static(out.carry, 64, 32, with_stats=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.swapaxes(samples, 0, 1)), ref
    )
    ms, sqs, acs = s2._suffstats
    r_h, e_h, m_h, sd_h = combine_suffstats_host(ms, sqs, acs)
    r_ref, e_ref, m_ref, sd_ref = split_rhat_mean_ess(
        samples, steps_major=True, return_moments=True
    )
    np.testing.assert_allclose(r_h, np.asarray(r_ref), rtol=1e-5)
    np.testing.assert_allclose(e_h, np.asarray(e_ref), rtol=1e-4)
    np.testing.assert_allclose(m_h, np.asarray(m_ref), atol=1e-6)
    np.testing.assert_allclose(sd_h, np.asarray(sd_ref), rtol=1e-5)
    # plain path leaves no stale stats behind
    s3 = make()
    s3._prepare_run(8, 8)
    out3 = run_kernel(s3._step_fn, s3._init_carry(), 0, 8)
    s3._run_static(out3.carry, 8, 8)
    assert s3._suffstats is None
