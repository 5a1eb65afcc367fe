"""Benchmark-tier tests (the analog of the reference's #[ignore]d benchmark
tests, SURVEY.md §4 tier 3) — statistical-efficiency envelopes plus
throughput stress.  Marked ``slow``; run with ``pytest -m slow``.  The
fast variants below (unmarked) exercise the same harnesses at reduced scale
so the tier stays covered in CI.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu import (
    DiffableGaussian2D,
    Gaussian2D,
    HMC,
    IsotropicGaussian,
    MetropolisHastings,
    RosenbrockND,
    init_det,
    init_with_seed,
)
from general_mcmc_tpu.diagnostics.stats import basic_stats, split_rhat_mean_ess


def _mh_ess_distribution(n_runs, n_chains=3, collected=1000, burn_in=500):
    """ESS-over-runs harness (metropolis_hastings.rs:420-522)."""
    target = Gaussian2D(mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]]))
    ess_x1, ess_x2 = [], []
    for r in range(n_runs):
        mh = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(n_chains, 2))
        mh = mh.seed(1000 + r)
        sample = mh.run(collected, burn_in)
        _, ess = split_rhat_mean_ess(sample)
        ess_x1.append(float(ess[0]))
        ess_x2.append(float(ess[1]))
    return basic_stats("ESS(x1)", jnp.array(ess_x1)), basic_stats(
        "ESS(x2)", jnp.array(ess_x2)
    )


def test_mh_ess_distribution_fast():
    """Reduced-scale version of the 100-run envelope
    (metropolis_hastings.rs:506-521: mean ESS(x1) ∈ [65, 125])."""
    s1, s2 = _mh_ess_distribution(n_runs=10)
    assert 50.0 <= s1.mean <= 160.0, s1
    assert 60.0 <= s2.mean <= 180.0, s2


@pytest.mark.slow
def test_mh_ess_distribution_full():
    # metropolis_hastings.rs:506-521 envelopes at full run count
    s1, s2 = _mh_ess_distribution(n_runs=100)
    assert 65.0 <= s1.mean <= 125.0, s1
    assert 83.0 <= s2.mean <= 143.0, s2
    assert 20.0 <= s1.std <= 40.0, s1


def _hmc_ess_distribution(n_runs):
    """hmc.rs:513-669: 2D Gaussian, 3 chains × 1000 (500 warmup), ε=0.1, L=10."""
    target = DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )
    ess_all, rhat_all = [], []
    for r in range(n_runs):
        sampler = HMC(target, init_det(3, 2), 0.1, 10).set_seed(2000 + r)
        sample = sampler.run(1000, 500)
        rhat, ess = split_rhat_mean_ess(sample)
        ess_all.append(np.asarray(ess))
        rhat_all.append(np.asarray(rhat))
    return np.stack(ess_all), np.stack(rhat_all)


def test_hmc_ess_distribution_fast():
    ess, rhat = _hmc_ess_distribution(n_runs=5)
    # hmc.rs:509-510 single-run floor on every run; R-hat near 1
    assert ess.min() > 50.0
    assert 0.95 <= rhat.mean() <= 1.05


@pytest.mark.slow
def test_hmc_ess_distribution_full():
    ess, rhat = _hmc_ess_distribution(n_runs=100)
    # hmc.rs:646-668 envelopes
    assert 110.0 <= ess[:, 0].mean() <= 260.0
    assert 110.0 <= ess[:, 1].mean() <= 280.0
    assert 0.95 <= rhat.mean() <= 1.05


def test_mh_throughput_stress_fast():
    """Scaled-down analog of the 80M-sample stress run
    (metropolis_hastings.rs:408-418): 16 chains × 20k steps completes and
    reports throughput."""
    target = Gaussian2D(mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]]))
    mh = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(16, 2)).seed(7)
    t0 = time.perf_counter()
    sample = mh.run(20_000, 500)
    jax.block_until_ready(sample)
    wall = time.perf_counter() - t0
    n = sample.shape[0] * sample.shape[1]
    print(f"MH throughput: {n/wall:.3g} samples/s ({n} in {wall:.2f}s)")
    assert sample.shape == (16, 20_000, 2)


@pytest.mark.slow
def test_hmc_high_dim_stress():
    """hmc.rs:756-791: 10,000-d RosenbrockND, 6 chains × 200 steps, L=50."""
    sampler = HMC(RosenbrockND(), 0.1 * init_with_seed(6, 10_000, 3), 1e-4, 50)
    sample = sampler.run(200, 0)
    assert sample.shape == (6, 200, 10_000)
    assert np.isfinite(np.asarray(sample)).all()
